"""Vertex cover (from matching) and 4-cycle counting invariants."""

import itertools

import pyarrow as pa
import ray.data as rd

from kgw_ray.pipelines.registry import q_kg_four_cycles, q_webkg_vertex_cover


def test_vertex_cover_covers_every_edge(sf_smoke):
    from kgw_ray.pipelines.webkg import link_graph

    cover = set(q_webkg_vertex_cover(sf_smoke).to_pandas()["id"])
    edges = link_graph(sf_smoke).to_pandas()
    for _, r in edges.iterrows():
        s, t = str(r["src_doc_id"]), str(r["dst_doc_id"])
        if s == t:
            continue
        assert s in cover or t in cover, (s, t)


def test_four_cycles_matches_brute_force():
    """The Σ C(codeg,2)/2 identity vs direct enumeration on a cube graph
    (Q3 has exactly C(3,2)·2^(3-2) = 6 four-cycles — its 6 faces)."""
    from kgw_ray.stages.graph import common_neighbor_counts

    cube = [
        ("000", "001"), ("000", "010"), ("000", "100"),
        ("011", "001"), ("011", "010"), ("011", "111"),
        ("101", "001"), ("101", "100"), ("101", "111"),
        ("110", "010"), ("110", "100"), ("110", "111"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([a for a, b in cube], pa.string()),
                "target_id": pa.array([b for a, b in cube], pa.string()),
            }
        )
    )
    cn = common_neighbor_counts(ds).to_pandas()
    total = int(sum(n * (n - 1) // 2 for n in cn["n_common"])) // 2

    # brute force: count 4-node cycles in the adjacency
    adj = {}
    for a, b in cube:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    brute = 0
    for quad in itertools.combinations(nodes, 4):
        for perm in itertools.permutations(quad[1:]):
            cyc = (quad[0],) + perm
            if all(
                cyc[i + 1] in adj[cyc[i]] for i in range(3)
            ) and cyc[0] in adj[cyc[3]]:
                brute += 1
    # with a fixed anchor each 4-cycle appears exactly twice (two
    # traversal directions)
    brute //= 2
    assert total == brute == 6


def test_four_cycles_nonnegative(sf_smoke):
    t = q_kg_four_cycles(sf_smoke)
    assert t.column("n_four_cycles").to_pylist()[0] >= 0
