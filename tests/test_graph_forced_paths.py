"""Forced-distributed-path parity for the graph-analytics operators the
round-4 review flagged for driver-side folds (VERDICT r4 "What's wrong"
#1-#5). Each operator's default physical plan is oracle-gated in
test_oracle_parity; here the SAME input runs with every size-hybrid
join/fold forced onto the shuffle/exchange path (broadcast_limit=0 /
force_exchange=True) and must produce identical results — pinning the
10^9-edge plan, including the zero-row blocks the shuffle filters emit."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _kg_edges(sf_dir):
    from kgw_ray.pipelines.webkg import edges_from_triples, triples_dataset

    return edges_from_triples(triples_dataset(sf_dir))


def _sorted_df(obj, cols):
    if isinstance(obj, rd.Dataset):
        df = obj.to_pandas()
    elif isinstance(obj, pa.Table):
        df = obj.to_pandas()
    else:
        df = obj
    return df.sort_values(cols).reset_index(drop=True)


def test_motif_census_shuffle_path(sf_smoke):
    from kgw_ray.stages.graph_metrics import motif_census

    edges = _kg_edges(sf_smoke)
    a = motif_census(edges).to_pandas()
    b = motif_census(edges, broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert int(a["n_wedges"][0]) > 0


def test_k_truss_shuffle_path(sf_smoke):
    from kgw_ray.stages.graph_metrics import k_truss

    edges = _kg_edges(sf_smoke)
    a = _sorted_df(k_truss(edges, k=3, rounds=4), ["a", "b"])
    b = _sorted_df(k_truss(edges, k=3, rounds=4, broadcast_limit=0), ["a", "b"])
    pd.testing.assert_frame_equal(a, b)


def test_betweenness_exchange_path(sf_smoke):
    from kgw_ray.stages.graph_metrics import (
        betweenness_from_counts,
        sssp_counts,
    )

    apsp = sssp_counts(_kg_edges(sf_smoke), rounds=6).materialize()
    a = _sorted_df(betweenness_from_counts(apsp), ["id"])
    b = _sorted_df(betweenness_from_counts(apsp, force_exchange=True), ["id"])
    pd.testing.assert_frame_equal(a, b)
    assert (a["betweenness_micro"] > 0).any()


def test_luby_mis_shuffle_path(sf_smoke):
    from kgw_ray.stages.graph_metrics import luby_mis

    edges = _kg_edges(sf_smoke)
    cols = ["id", "status", "round_decided"]
    a = _sorted_df(luby_mis(edges, rounds=3), ["id"])[cols]
    b = _sorted_df(luby_mis(edges, rounds=3, broadcast_limit=0), ["id"])[cols]
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    assert (a["status"] == "mis").any()


def test_luby_mis_zero_row_blocks():
    """The ADVICE r4 crash mode: semi/anti-join filter paths emit
    zero-row blocks in rounds >= 2; every per-batch kernel must pass
    typed empties through. A path graph over many tiny blocks forces
    empty blocks once most nodes decide in round 1."""
    from kgw_ray.stages.graph_metrics import luby_mis

    n = 40
    edges = rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([f"v{i:03d}" for i in range(n - 1)]),
                "target_id": pa.array([f"v{i + 1:03d}" for i in range(n - 1)]),
            }
        )
    ).repartition(16)
    out = luby_mis(edges, rounds=4).to_pandas()
    assert len(out) == n
    mis = set(out.loc[out["status"] == "mis", "id"])
    # independence: no path edge inside the MIS
    for i in range(n - 1):
        assert not (f"v{i:03d}" in mis and f"v{i + 1:03d}" in mis)


def test_closeness_landmarks_blockwise(sf_smoke):
    """Landmark selection folds per-block min-k partials, never the full
    node vocabulary: repartitioning the input (different block layout)
    must not change the chosen landmarks or the result."""
    from kgw_ray.stages.graph_metrics import multi_bfs_closeness

    edges = _kg_edges(sf_smoke).materialize()
    a = _sorted_df(multi_bfs_closeness(edges, n_sources=4, max_rounds=6), ["id"])
    b = _sorted_df(
        multi_bfs_closeness(edges.repartition(13), n_sources=4, max_rounds=6),
        ["id"],
    )
    pd.testing.assert_frame_equal(a, b)


def test_eigenvector_shuffle_path(sf_smoke):
    """eigenvector_centrality: forced large-join rank attachment must
    match the broadcast path bit-exactly (micro-unit integers)."""
    from kgw_ray.pipelines.tpch_kg import tpch_graph
    from kgw_ray.stages.graph import eigenvector_centrality

    nodes, edges = tpch_graph(sf_smoke)
    a = _sorted_df(eigenvector_centrality(nodes, edges), ["id"])
    b = _sorted_df(
        eigenvector_centrality(nodes, edges, broadcast_limit=0), ["id"]
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["eig_micro"] > 0).any()


def test_eigenvector_known_graph():
    """Hand-checkable cycle a->b->c->a with chords c->d, d->a: after 3
    exact-integer rounds a=b=c=1e6, d=5e5, and the isolated node reads 0.
    (On a pure DAG the undamped iterate correctly washes out to all-zero
    — that's eigenvector centrality, not a bug; hence the cycle.)"""
    from kgw_ray.stages.graph import eigenvector_centrality

    nodes = rd.from_arrow(
        pa.table({"id": pa.array(["a", "b", "c", "d", "e"], pa.string())})
    )
    edges = rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array(["a", "b", "c", "c", "d"], pa.string()),
                "target_id": pa.array(["b", "c", "a", "d", "a"], pa.string()),
            }
        )
    )
    df = (
        eigenvector_centrality(nodes, edges)
        .to_pandas()
        .set_index("id")["eig_micro"]
    )
    assert df["a"] == df["b"] == df["c"] == 1_000_000
    assert df["d"] == 500_000
    assert df["e"] == 0  # isolated
