"""events_hourly_gapfill (the gap rows the sf corpora never produce) and
docs_compact_small_files / sinks/compact.py invariants."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_utils import assert_matches, run_oracle, to_pandas


@pytest.fixture(scope="module")
def gappy_dir(tmp_path_factory):
    """An events table whose hours 1 and 3 (of 0..4) are EMPTY."""
    d = tmp_path_factory.mktemp("gappy")
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    eid = 0
    for hour, n in [(0, 3), (2, 1), (4, 2)]:
        for i in range(n):
            rows.append(
                {
                    "event_id": eid,
                    "user_id": eid % 5,
                    "event_type": "click",
                    "ts": base + pd.Timedelta(hours=hour, minutes=i),
                    "value": 1.5 + eid,
                    "properties": "{}",
                }
            )
            eid += 1
    t = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        t.column("ts").cast(pa.timestamp("us")),
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return str(d)


def test_gapfill_fills_empty_hours(gappy_dir):
    from kgw_ray.pipelines.relational import events_hourly_gapfill

    df = to_pandas(events_hourly_gapfill(gappy_dir)).sort_values("hour")
    assert len(df) == 5  # dense spine hours 0..4
    assert list(df["n"]) == [3, 0, 1, 0, 2]
    # zero-filled rows carry 0.0 sums, not NaN
    assert df.loc[df["n"] == 0, "sum_value"].tolist() == [0.0, 0.0]


def test_gapfill_matches_oracle_on_gappy_corpus(gappy_dir):
    from kgw_ray.pipelines.relational import (
        EVENTS_GAPFILL_SQL,
        events_hourly_gapfill,
    )

    assert_matches(
        to_pandas(events_hourly_gapfill(gappy_dir)),
        run_oracle(EVENTS_GAPFILL_SQL, gappy_dir),
        "events_hourly_gapfill/gappy",
    )


def test_gapfill_empty_events(tmp_path):
    """An empty events table returns the typed empty result (no min/max
    to bound a spine) instead of crashing on None bounds."""
    from kgw_ray.pipelines.relational import events_hourly_gapfill

    t = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
            "value": pa.array([], pa.float64()),
            "properties": pa.array([], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    df = to_pandas(events_hourly_gapfill(str(tmp_path)))
    assert len(df) == 0
    assert sorted(df.columns) == ["hour", "n", "sum_value"]


def test_compact_file_count_and_content(tmp_path, sf_smoke):
    import ray.data as rd

    from kgw_ray.sinks.compact import compact_parquet
    from kgw_ray.sources.readers import read_table
    from kgw_ray.stages.agg import table_checksum

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = read_table(sf_smoke, "documents", columns=cols)
    n = ds.count()
    out = str(tmp_path / "compacted")
    stats = compact_parquet(ds, out, target_rows_per_file=7)
    assert stats["n_rows"] == n
    assert stats["n_files"] == -(-n // 7)
    # read-back fingerprint identical to the source fingerprint
    src = table_checksum(read_table(sf_smoke, "documents", columns=cols), cols)
    dst = table_checksum(rd.read_parquet(out, columns=cols), cols)
    assert src == dst


def test_compact_rejects_bad_target(tmp_path, sf_smoke):
    from kgw_ray.sinks.compact import compact_parquet
    from kgw_ray.sources.readers import read_table

    ds = read_table(sf_smoke, "documents", columns=["doc_id"])
    with pytest.raises(ValueError):
        compact_parquet(ds, str(tmp_path / "x"), target_rows_per_file=0)
