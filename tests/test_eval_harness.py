"""Evaluation-harness queries: ann_recall_at_k and dedup_ivf_recall."""


def test_dedup_ivf_recall_invariants(sf_smoke):
    """Every IVF pair is computed with the exact cosine inside its cell,
    so the IVF pair set is a SUBSET of the exact all-pairs set: hits must
    equal the IVF pair count, and recall ≤ 1000."""
    from kgw_ray.pipelines.registry import QUERIES

    df = QUERIES["dedup_ivf_recall"](sf_smoke).to_pandas()
    r = df.iloc[0]
    assert r["n_hits"] == r["n_ivf_pairs"]
    assert r["n_ivf_pairs"] <= r["n_exact_pairs"]
    assert 0 <= r["recall_permille"] <= 1000
    assert r["recall_permille"] == 1000 * r["n_hits"] // r["n_exact_pairs"]


def test_ann_recall_at_k_invariants(sf_smoke):
    from kgw_ray.pipelines.registry import QUERIES

    df = QUERIES["ann_recall_at_k"](sf_smoke).to_pandas()
    assert len(df) == 4  # one row per query vector
    assert (df["n_hits"] <= df["k"]).all()
    assert (df["recall_permille"] == 1000 * df["n_hits"] // df["k"]).all()
    # exhaustive-probe IVF is exact (pinned elsewhere); the reduced probe
    # must still find a usable share on the smoke corpus
    assert df["recall_permille"].mean() >= 300
