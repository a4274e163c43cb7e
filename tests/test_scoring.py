"""Warm-model actor-pool contract (stages/scoring.py): weights load once
per actor in __init__, __call__ is pure vectorized inference, and the
integer-micro-unit logits match the independent DuckDB oracle."""

import pyarrow as pa
import pyarrow.parquet as pq

from kgw_ray.stages.scoring import QualityModelScorer


def _docs_table(sf_dir):
    import os

    return pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def test_call_does_no_setup(sf_smoke):
    """The actor-pool contract: ONE weight load at construction, zero
    loads per batch — repeated __call__ must not touch the file again."""
    before = QualityModelScorer.LOADS
    sc = QualityModelScorer()
    assert QualityModelScorer.LOADS == before + 1
    t = _docs_table(sf_smoke)
    for _ in range(3):
        sc(t.slice(0, 50))
    assert QualityModelScorer.LOADS == before + 1


def test_scores_match_oracle(sf_smoke):
    import duckdb
    import os
    import pandas as pd

    from kgw_ray.stages.scoring import quality_model_sql

    out = (
        QualityModelScorer()(_docs_table(sf_smoke))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    path = os.path.join(sf_smoke, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    oracle = (
        con.execute(quality_model_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["doc_id", "logit_micro", "label"]],
        oracle[["doc_id", "logit_micro", "label"]],
        check_dtype=False,
    )
    # the model must actually discriminate (an all-one-label corpus would
    # let a broken threshold stay green)
    assert set(out["label"]) == {"keep", "drop"}


def test_null_text_scores_as_empty():
    """NULL text must score like '' (logit = bias, never NaN-garbage) —
    mirrored by the oracle's COALESCE."""
    import json

    from kgw_ray.stages.scoring import _WEIGHTS_PATH

    sc = QualityModelScorer()
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([None, ""], pa.string()),
        }
    )
    out = sc(batch).to_pandas()
    bias = json.load(open(_WEIGHTS_PATH))["bias_micro"]
    assert list(out["logit_micro"]) == [bias, bias]
    assert list(out["label"]) == ["keep" if bias >= 0 else "drop"] * 2


def test_empty_batch_passes_through():
    sc = QualityModelScorer()
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    out = sc(empty)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "logit_micro", "label"]
