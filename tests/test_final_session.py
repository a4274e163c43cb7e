"""Edge cases for the final-session operator wave: order-sensitive
journeys (equal-timestamp ties), path trigrams (short streams), Simpson
concentration extremes, weekly retention with returning/lapsed users,
basket triples support threshold, readability degenerate text."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_utils import to_pandas


@pytest.fixture(scope="module")
def tiny_events_dir(tmp_path_factory):
    """Hand-built event log: user 1 has equal-timestamp ties (order must
    fall back to event_id), user 2 has a single event (no trigram, no
    transition), user 3 is single-type (simpson = 10^6)."""
    d = tmp_path_factory.mktemp("tiny_events")
    base = pd.Timestamp("2024-01-01 00:00:00")
    week = pd.Timedelta(days=7)
    rows = [
        # user 1: ts tie between event_id 1 and 2 — journey must read a>b>c>d
        {"event_id": 0, "user_id": 1, "event_type": "a", "ts": base},
        {"event_id": 1, "user_id": 1, "event_type": "b", "ts": base + pd.Timedelta(minutes=1)},
        {"event_id": 2, "user_id": 1, "event_type": "c", "ts": base + pd.Timedelta(minutes=1)},
        {"event_id": 3, "user_id": 1, "event_type": "d", "ts": base + pd.Timedelta(minutes=2)},
        # user 2: one event
        {"event_id": 4, "user_id": 2, "event_type": "x", "ts": base},
        # user 3: same type 3 times, spread over weeks 0, 2 (skips week 1)
        {"event_id": 5, "user_id": 3, "event_type": "y", "ts": base},
        {"event_id": 6, "user_id": 3, "event_type": "y", "ts": base + 2 * week},
        {"event_id": 7, "user_id": 3, "event_type": "y", "ts": base + 2 * week},
    ]
    df = pd.DataFrame(rows)
    df["value"] = 1.0
    df["props"] = "{}"
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t.column("ts").cast(pa.timestamp("us"))
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return str(d)


def test_journeys_tie_break_and_singletons(tiny_events_dir):
    from kgw_ray.pipelines.relational import events_user_journeys

    df = (
        to_pandas(events_user_journeys(tiny_events_dir))
        .set_index("user_id")
        .sort_index()
    )
    assert df.loc[1, "journey"] == "a>b>c>d"  # event_id breaks the ts tie
    assert df.loc[1, "n_events"] == 4
    assert df.loc[2, "journey"] == "x"
    assert df.loc[3, "journey"] == "y>y>y"


def test_path_trigrams_short_streams(tiny_events_dir):
    from kgw_ray.pipelines.relational import events_path_trigrams

    df = to_pandas(events_path_trigrams(tiny_events_dir))
    got = {tuple(r) for r in df[["t1", "t2", "t3", "n"]].itertuples(index=False)}
    # user 1 contributes a>b>c and b>c>d; user 3 contributes y>y>y;
    # user 2 (length-1 stream) contributes nothing
    assert got == {("a", "b", "c", 1), ("b", "c", "d", 1), ("y", "y", "y", 1)}


def test_simpson_extremes(tiny_events_dir):
    from kgw_ray.pipelines.relational import events_user_simpson

    df = (
        to_pandas(events_user_simpson(tiny_events_dir))
        .set_index("user_id")
        .sort_index()
    )
    # user 1: 4 distinct types of 4 events -> 4*1^2 * 1e6 // 16 = 250000
    assert df.loc[1, "simpson_micro"] == 250_000
    # single event and single-type users are maximally concentrated
    assert df.loc[2, "simpson_micro"] == 1_000_000
    assert df.loc[3, "simpson_micro"] == 1_000_000


def test_weekly_retention_lapse_and_return(tiny_events_dir):
    from kgw_ray.pipelines.relational import events_weekly_retention

    df = to_pandas(events_weekly_retention(tiny_events_dir))
    by = {
        (int(r.cohort_week), int(r.week_offset)): int(r.n_users)
        for r in df.itertuples(index=False)
    }
    offs = sorted(k[1] for k in by)
    # all users share the same cohort week; everyone active at offset 0,
    # only user 3 returns at offset 2, nobody at offset 1 (no zero-fill row)
    assert offs == [0, 2]
    cohort = next(iter(by))[0]
    assert by[(cohort, 0)] == 3
    assert by[(cohort, 2)] == 1


def test_basket_triples_support_threshold(tmp_path):
    import numpy as np

    from kgw_ray.pipelines.relational import orders_basket_triples

    # order 1 and 2 both carry brands A,B,C; order 3 carries A,B,D (once)
    part = pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4],
            "p_brand": ["A", "B", "C", "D"],
            "p_name": ["n"] * 4,
            "p_type": ["t"] * 4,
            "p_size": np.array([1, 1, 1, 1], dtype="int32"),
            "p_retailprice": [1.0] * 4,
        }
    )
    line = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 2, 2, 2, 3, 3, 3],
            "l_partkey": [1, 2, 3, 1, 2, 3, 1, 2, 4],
        }
    )
    pq.write_table(pa.Table.from_pandas(part, preserve_index=False), str(tmp_path / "part.parquet"))
    pq.write_table(pa.Table.from_pandas(line, preserve_index=False), str(tmp_path / "lineitem.parquet"))
    df = to_pandas(orders_basket_triples(str(tmp_path)))
    assert len(df) == 1  # (A,B,D) has support 1 < 2 and is filtered out
    row = df.iloc[0]
    assert (row["brand_a"], row["brand_b"], row["brand_c"]) == ("A", "B", "C")
    assert row["n_orders"] == 2


def test_readability_degenerate_text(tmp_path):
    from kgw_ray.pipelines.training_data import text_readability

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["", "no terminators here", "Cat sat. Dog ran!"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [0, 19, 17],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    df = to_pandas(text_readability(str(tmp_path))).set_index("doc_id").sort_index()
    # empty text: all counts 0, score = bare constant
    assert df.loc[0, "n_words"] == 0 and df.loc[0, "flesch_milli"] == 206_835
    # no sentence terminators: words-per-sentence denominator clamps to 1
    assert df.loc[1, "n_sentences"] == 0
    w, y = int(df.loc[1, "n_words"]), int(df.loc[1, "n_syllables"])
    assert df.loc[1, "flesch_milli"] == 206_835 - 1015 * w - (84_600 * y) // w
    # two plain sentences: spot-check the closed form
    w, s, y = (
        int(df.loc[2, "n_words"]),
        int(df.loc[2, "n_sentences"]),
        int(df.loc[2, "n_syllables"]),
    )
    assert (w, s, y) == (4, 2, 4)
    assert df.loc[2, "flesch_milli"] == 206_835 - (1015 * 4) // 2 - (84_600 * 4) // 4


def test_stickiness_gap_days_and_window(tmp_path):
    """Gap day inside the trailing window: dau=0 row appears with the
    carried-over WAU; window expires after 7 days."""
    from kgw_ray.pipelines.relational import events_dau_wau_stickiness

    base = pd.Timestamp("2024-01-01 00:00:00")  # epoch day boundary-safe
    rows = [
        # two users on day 0, one user on day 2, nothing else until day 9
        {"event_id": 0, "user_id": 1, "ts": base},
        {"event_id": 1, "user_id": 2, "ts": base + pd.Timedelta(hours=1)},
        {"event_id": 2, "user_id": 1, "ts": base + pd.Timedelta(days=2)},
        {"event_id": 3, "user_id": 3, "ts": base + pd.Timedelta(days=9)},
    ]
    df = pd.DataFrame(rows)
    df["event_type"] = "view"
    df["value"] = 1.0
    df["props"] = "{}"
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t.column("ts").cast(pa.timestamp("us"))
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = to_pandas(events_dau_wau_stickiness(str(tmp_path)))
    day0 = int(out["day"].min())
    by = {int(r.day) - day0: (int(r.dau), int(r.wau)) for r in out.itertuples(index=False)}
    assert by[0] == (2, 2)
    assert by[1] == (0, 2)       # gap day: dau 0, both users still in window
    assert by[2] == (1, 2)       # user 1 returns; user 2 still windowed
    assert by[6] == (0, 2)       # last day user 1/2 activity is windowed
    assert by[7] == (0, 1)       # day-0 activity expired; day-2 remains
    assert by[8] == (0, 1)
    assert by[9] == (1, 1)       # only user 3
    assert max(by) == 9          # no rows past the corpus max day


def test_chi2_zero_cell_and_exactness(tmp_path):
    """The margin cross product includes zero-observed cells, and the
    integer chi-square terms match the hand formula."""
    from kgw_ray.pipelines.training_data import docs_lang_source_chi2

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": ["t"] * 6,
            # en appears in both sources, de only in src0 -> (de, src1) is
            # a zero cell that must still be emitted
            "lang": ["en", "en", "en", "en", "de", "de"],
            "source": ["src0", "src1", "src1", "src1", "src0", "src0"],
            "n_chars": [1] * 6,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        os.path.join(tmp_path, "documents.parquet"),
    )
    out = to_pandas(docs_lang_source_chi2(str(tmp_path)))
    assert len(out) == 4  # 2 langs x 2 sources, zero cell included
    cell = out.set_index(["lang", "source"])
    assert cell.loc[("de", "src1"), "observed"] == 0
    # hand check (de, src1): o=0, r=2 (de), c=3 (src1), n=6 -> d = 0*6 - 6
    assert cell.loc[("de", "src1"), "expected_milli"] == (1000 * 2 * 3) // 6
    assert cell.loc[("de", "src1"), "chi2_term_micro"] == (1_000_000 * 36) // (6 * 2 * 3)
