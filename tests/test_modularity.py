"""Exact-integer LPA modularity (stages/graph_metrics.py:modularity).

Covers: a two-cluster graph with clearly positive Q, the zero-intra-edge
partition (the typed-empty broadcast guard in _hybrid_attach), the
forced-shuffle join path, and the Q reconstruction arithmetic.
"""

import pyarrow as pa
import ray.data as rd

from kgw_ray.stages.graph_metrics import modularity, nodes_from_edges


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([a for a, _ in pairs], pa.string()),
                "target_id": pa.array([b for _, b in pairs], pa.string()),
            }
        )
    ).materialize()


# two K4 cliques joined by one bridge edge — LPA(3) keeps the cliques as
# separate min-label communities and modularity is clearly positive
_TWO_CLIQUES = (
    [("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"), ("a2", "a4"), ("a3", "a4")]
    + [("b1", "b2"), ("b1", "b3"), ("b1", "b4"), ("b2", "b3"), ("b2", "b4"), ("b3", "b4")]
    + [("a4", "b1")]
)


def _q_value(df):
    m = int(df["intra_edges"].sum() + 0)  # intra sums ≤ m; recompute m below
    # m = half the degree sum (each undirected edge contributes 2)
    m = int(df["degree_sum"].sum()) // 2
    return float(df["q_num"].sum()) / (4.0 * m * m)


def test_two_clique_modularity_positive():
    edges = _edges(_TWO_CLIQUES)
    df = modularity(nodes_from_edges(edges), edges, iters=3).to_pandas()
    df = df.sort_values("community").reset_index(drop=True)
    assert list(df["community"]) == ["a1", "b1"]
    assert list(df["n_nodes"]) == [4, 4]
    assert list(df["intra_edges"]) == [6, 6]
    # degrees: within-clique 3 each + the two bridge endpoints get +1
    assert list(df["degree_sum"]) == [13, 13]
    m = 13
    assert list(df["q_num"]) == [4 * m * 6 - 13 * 13] * 2
    q = _q_value(df)
    # analytic: 2 * (6/13 - (13/26)^2) ≈ 0.4231
    assert abs(q - 2 * (6 / 13 - 0.25)) < 1e-12
    assert q > 0.4


def test_forced_shuffle_path_matches_broadcast():
    edges = _edges(_TWO_CLIQUES)
    nodes = nodes_from_edges(edges).materialize()
    bc = (
        modularity(nodes, edges, iters=3)
        .to_pandas()
        .sort_values("community")
        .reset_index(drop=True)
    )
    sh = (
        modularity(nodes, edges, iters=3, broadcast_limit=0)
        .to_pandas()
        .sort_values("community")
        .reset_index(drop=True)
    )
    assert bc.equals(sh)


def test_zero_intra_edge_partition():
    """A star graph: LPA(3) oscillates leaves/hub into labels where no
    edge is intra — the empty intra table must pass through the typed
    broadcast guard and produce all-negative q_num rows."""
    star = [("hub", f"leaf{i}") for i in range(6)]
    edges = _edges(star)
    df = modularity(nodes_from_edges(edges), edges, iters=3).to_pandas()
    assert len(df) >= 2  # several communities
    assert (df["intra_edges"] >= 0).all()
    if int(df["intra_edges"].sum()) == 0:
        assert (df["q_num"] <= 0).all()
    # degree sums must account for every edge endpoint exactly once
    assert int(df["degree_sum"].sum()) == 2 * len(star)


def test_conductance_two_cliques():
    """Bridge edge between two K4 cliques: cut = 1, vol = 13 per clique →
    conductance = 1000·1 // 13 = 76‰; a whole-graph community (denominator
    0) reads 0."""
    from kgw_ray.stages.graph_metrics import conductance

    edges = _edges(_TWO_CLIQUES)
    df = (
        conductance(nodes_from_edges(edges), edges, iters=3)
        .to_pandas()
        .sort_values("community")
        .reset_index(drop=True)
    )
    assert list(df["cut_edges"]) == [1, 1]
    assert list(df["conductance_permille"]) == [76, 76]

    tri = _edges([("x", "y"), ("y", "z"), ("x", "z")])
    one = conductance(nodes_from_edges(tri), tri, iters=3).to_pandas()
    assert list(one["conductance_permille"]) == [0]


def test_single_community_q_zero():
    """A triangle collapses to one community: e_c = m and d_c = 2m, so
    q_num = 4m·m − (2m)² = 0 exactly."""
    tri = [("x", "y"), ("y", "z"), ("x", "z")]
    edges = _edges(tri)
    df = modularity(nodes_from_edges(edges), edges, iters=3).to_pandas()
    assert len(df) == 1
    assert int(df["q_num"].iloc[0]) == 0
