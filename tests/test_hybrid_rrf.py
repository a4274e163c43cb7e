"""Reciprocal-rank fusion invariants (value parity vs the SQL oracle rides
test_oracle_parity; these pin the fusion arithmetic and ranking contract)."""

from kgw_ray.pipelines.training_data import (
    _RRF_K,
    _RRF_TOPN,
    docs_hybrid_search_rrf,
)


def test_rrf_fusion_invariants(sf_correct):
    df = docs_hybrid_search_rrf(sf_correct).to_pandas()
    assert 0 < len(df) <= _RRF_TOPN
    # every hit came from at least one ranking
    assert ((df["kw_rank"] > 0) | (df["q_rank"] > 0)).all()
    # rrf_micro is exactly the integer fusion of the reported ranks
    for _, r in df.iterrows():
        expect = 0
        if r["kw_rank"] > 0:
            expect += 1_000_000 // (_RRF_K + int(r["kw_rank"]))
        if r["q_rank"] > 0:
            expect += 1_000_000 // (_RRF_K + int(r["q_rank"]))
        assert int(r["rrf_micro"]) == expect
    # output ordered by (rrf desc, doc_id asc)
    ordered = df.sort_values(
        ["rrf_micro", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    assert (df.reset_index(drop=True) == ordered).all().all()
    # a doc in BOTH rankings beats one holding the same single rank twice
    both = df[(df["kw_rank"] > 0) & (df["q_rank"] > 0)]
    single = df[(df["kw_rank"] == 0) | (df["q_rank"] == 0)]
    if len(both) and len(single):
        assert both["rrf_micro"].max() > single["rrf_micro"].min()
