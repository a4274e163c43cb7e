"""Line-level corpus dedup (RefinedWeb boilerplate-line removal): kernel
edge cases, brute-force agreement on a crafted multi-line corpus (the sf
corpora are single-line docs — drops there come from WET headers), and
broadcast vs forced-shuffle path parity."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from kgw_ray.pipelines.webkg import line_dedup, wet_line_dedup
from kgw_ray.stages.corpus import (
    line_df_partial,
    line_dedup_mark_batch,
    line_rows_batch,
)

# crafted corpus: "ad" boilerplate in 3 docs (dropped at max_df=3),
# "promo" in 2 (kept), blank separators always kept, one doc all-dropped,
# one empty doc
_DOCS = pa.table(
    {
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(
            [
                "ad\nalpha\n\nbeta",
                "ad\npromo\ngamma",
                "ad\npromo\n",
                "ad",  # every line boilerplate → all dropped
                "",  # one blank line → kept
            ]
        ),
    }
)


def _brute(max_df: int = 3) -> pd.DataFrame:
    texts = _DOCS.column("text").to_pylist()
    ids = _DOCS.column("doc_id").to_pylist()
    df = {}
    for t in texts:
        for ln in set(t.split("\n")):
            if ln != "":
                df[ln] = df.get(ln, 0) + 1
    drop = {ln for ln, n in df.items() if n >= max_df}
    rows = []
    for i, t in zip(ids, texts):
        lines = t.split("\n")
        kept = [ln for ln in lines if ln == "" or ln not in drop]
        rows.append(
            {
                "doc_id": i,
                "n_lines": len(lines),
                "n_dropped": len(lines) - len(kept),
                "kept_md5": hashlib.md5("\n".join(kept).encode()).hexdigest(),
            }
        )
    return pd.DataFrame(rows)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"n_lines": "int64", "n_dropped": "int64"})
    )


@pytest.mark.parametrize("broadcast_limit", [5_000_000, 0])
def test_line_dedup_brute_force(broadcast_limit):
    got = _sorted(
        line_dedup(
            rd.from_arrow(_DOCS), max_df=3, broadcast_limit=broadcast_limit
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, _sorted(_brute()))


def test_line_dedup_oracle_on_synthetic(tmp_path):
    """Run the SQL oracle's core (line split/df/string_agg shape) over the
    crafted corpus in DuckDB and compare with the engine — pins the DROP
    path two-engine, which the sf gate (single-line docs) exercises only
    via WET headers."""
    import duckdb

    from kgw_ray.pipelines.training_data import _MD5_LE_UINT64

    con = duckdb.connect()
    con.register("documents_raw", _DOCS)
    sql = f"""
WITH lines AS (
  SELECT doc_id, unnest(l) AS line, unnest(range(1, len(l) + 1)) AS pos
  FROM (SELECT doc_id, string_split(COALESCE(text, ''), chr(10)) AS l
        FROM documents_raw)
),
lh AS (
  SELECT doc_id, pos, line, {_MD5_LE_UINT64} AS lh
  FROM (SELECT doc_id, pos, line, md5(line) AS hx FROM lines)
),
ds AS (SELECT lh FROM lh WHERE line <> ''
       GROUP BY lh HAVING COUNT(DISTINCT doc_id) >= 3),
kept AS (SELECT doc_id, pos, line FROM lh
         WHERE line = '' OR lh NOT IN (SELECT lh FROM ds)),
base AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT b.doc_id, CAST(b.n_lines AS BIGINT) AS n_lines,
       CAST(b.n_lines - COALESCE(k.n_kept, 0) AS BIGINT) AS n_dropped,
       md5(COALESCE(k.txt, '')) AS kept_md5
FROM base b
LEFT JOIN (SELECT doc_id, COUNT(*) AS n_kept,
                  string_agg(line, chr(10) ORDER BY pos) AS txt
           FROM kept GROUP BY doc_id) k USING (doc_id)
"""
    oracle = _sorted(con.sql(sql).df())
    got = _sorted(line_dedup(rd.from_arrow(_DOCS), max_df=3).to_pandas())
    pd.testing.assert_frame_equal(got, oracle)


def test_line_kernels_zero_row_batch():
    empty = _DOCS.slice(0, 0)
    assert line_df_partial(empty).num_rows == 0
    assert line_dedup_mark_batch(empty, np.zeros(0, np.uint64)).num_rows == 0
    assert line_rows_batch(empty).num_rows == 0


def test_mark_batch_blank_only_doc_never_drops():
    batch = pa.table(
        {"doc_id": pa.array([9], pa.int64()), "text": pa.array(["\n\n"])}
    )
    out = line_dedup_mark_batch(batch, np.array([0], dtype=np.uint64))
    assert out.column("n_lines").to_pylist() == [3]
    assert out.column("n_dropped").to_pylist() == [0]


def test_wet_line_dedup_drops_headers(sf_smoke):
    """At sf scale every Content-Language header repeats ≥ 3× → every doc
    drops at least one line, and no doc loses its URI/text lines (n_lines
    = 5 for newline-free payloads)."""
    df = wet_line_dedup(sf_smoke).to_pandas()
    assert (df["n_dropped"] >= 1).all()
    assert (df["n_lines"] == 5).all()
    assert (df["n_dropped"] <= 2).all()  # URI/blank/text always survive


# --- property-based: kernels vs pure-Python brute force -------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_line = st.text(alphabet="ab\n ", max_size=8)


@settings(max_examples=60, deadline=None)
@given(
    texts=st.lists(_line, min_size=1, max_size=8),
    max_df=st.integers(min_value=1, max_value=4),
)
def test_line_kernels_match_brute(texts, max_df):
    """df partial + mark batch over ONE batch == the brute-force rule for
    any corpus (exercises blank runs, whitespace-only and dup lines)."""
    batch = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    )
    # brute drop set
    df = {}
    for t in texts:
        for ln in set(t.split("\n")):
            if ln != "":
                df[ln] = df.get(ln, 0) + 1
    drop_lines = {ln for ln, n in df.items() if n >= max_df}

    # engine drop set from the partial (single batch → df is exact)
    part = line_df_partial(batch)
    import numpy as np
    from kgw_ray.functions.porthash import md5_le_u64

    lh = part.column("lh").to_numpy(zero_copy_only=False)
    n = part.column("n").to_numpy(zero_copy_only=False)
    drop_sorted = np.sort(lh[n >= max_df])
    expect_drop_hashes = (
        set(md5_le_u64(sorted(drop_lines)).tolist()) if drop_lines else set()
    )
    assert set(drop_sorted.tolist()) == expect_drop_hashes

    out = line_dedup_mark_batch(batch, drop_sorted).to_pandas()
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [ln for ln in lines if ln == "" or ln not in drop_lines]
        row = out[out["doc_id"] == i].iloc[0]
        assert int(row["n_lines"]) == len(lines)
        assert int(row["n_dropped"]) == len(lines) - len(kept)
        assert row["kept_md5"] == hashlib.md5(
            "\n".join(kept).encode()
        ).hexdigest()


# --- prefix-redundant docs: crafted cases vs the oracle rule --------------


def test_dedup_prefix_docs_crafted(tmp_path):
    import os

    import duckdb
    import pyarrow.parquet as pq

    from kgw_ray.pipelines.training_data import (
        DEDUP_PREFIX_SQL,
        dedup_prefix_docs,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "text": pa.array(
                [
                    "hello world",      # extended by 2 → flagged
                    "hello world and more",
                    "hello",            # prefix of 1 and 2 → flagged
                    "zebra",            # no extension → clean
                    "",                 # empty: prefix of everything → flagged
                    "hello world and more",  # exact dup of 2 → flagged
                    "x",                # no extension → clean
                ]
            ),
        }
    )
    d = tmp_path / "corpus"
    os.makedirs(d)
    pq.write_table(t, str(d / "documents.parquet"))
    got = sorted(dedup_prefix_docs(str(d)).to_pandas()["doc_id"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    want = sorted(con.sql(DEDUP_PREFIX_SQL).df()["doc_id"])
    assert got == want
    assert 1 in got and 3 in got and 5 in got
    assert 4 not in got and 7 not in got
    # exactly one of the two exact-dup copies is flagged (its successor is
    # the other copy); the LAST copy's successor is a non-prefix
    assert (2 in got) != (6 in got)


def test_dedup_prefix_all_empty(tmp_path):
    import os

    import pyarrow.parquet as pq

    from kgw_ray.pipelines.training_data import dedup_prefix_docs

    t = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array(["", "", ""]),
        }
    )
    d = tmp_path / "corpus"
    os.makedirs(d)
    pq.write_table(t, str(d / "documents.parquet"))
    got = sorted(dedup_prefix_docs(str(d)).to_pandas()["doc_id"])
    assert got == [10, 11]  # the (text, doc_id)-last empty is unflagged
