"""Recency feature engineering: decayed engagement + L28 activity bitmap
invariants (value parity vs SQL rides test_oracle_parity)."""

import numpy as np

from kgw_ray.pipelines.relational import (
    users_activity_bitmap,
    users_decayed_engagement,
)


def test_activity_bitmap_popcount_consistency(sf_correct):
    df = users_activity_bitmap(sf_correct).to_pandas()
    assert len(df) > 0
    for _, r in df.iterrows():
        bm = int(r["l28_bitmap"])
        assert 0 < bm < (1 << 28)
        assert bin(bm).count("1") == int(r["n_active_days"])


def test_decayed_engagement_bounds(sf_correct):
    """Decayed total is positive and bounded by the undecayed cents total
    per user (each term is cents >> age_weeks <= cents)."""
    import duckdb

    dec = users_decayed_engagement(sf_correct).to_pandas()
    raw = duckdb.sql(
        f"SELECT user_id, SUM(CAST(ROUND(value*100) AS BIGINT)) AS cents, "
        f"COUNT(*) AS n FROM read_parquet('{sf_correct}/events.parquet') "
        f"GROUP BY user_id"
    ).df()
    m = dec.merge(raw, on="user_id")
    assert len(m) == len(dec)
    assert (m["decayed_cents"] <= m["cents"]).all()
    assert (m["decayed_cents"] >= 0).all()
    assert (m["n_events"] == m["n"]).all()
    # the corpus spans ~30 days, so decay weights 1/1..1/16 all occur and
    # at least one user must actually be decayed below its raw total
    assert (m["decayed_cents"] < m["cents"]).any()


def test_span_corruption_mask_fraction(sf_correct):
    from kgw_ray.pipelines.training_data import docs_span_corruption

    df = docs_span_corruption(sf_correct).to_pandas()
    assert (df["n_masked"] <= df["n_tokens"]).all()
    # every merged island covers >= 3 tokens (spans are length-3 and only
    # full spans start, so clipping can't occur)
    assert (df["n_masked"] >= 3 * df["n_spans"]).all()
    # corpus-level mask rate lands near the planned ~15% (span 3 / rate 20)
    rate = df["n_masked"].sum() / df["n_tokens"].sum()
    assert 0.08 < rate < 0.22, rate
