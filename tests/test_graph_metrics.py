"""Structural graph metrics (stages/graph_metrics.py): reciprocity, degree
moments, Jaccard link prediction, fixed-round k-core — synthetic-graph
truths plus the at-scale path pins the oracles can't see."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kgw_ray.stages.graph_metrics import (
    _attach_degrees,
    _degree_table,
    degree_moments,
    jaccard_link_prediction,
    kcore,
    reciprocity,
)
from kgw_ray.stages.graph import _distinct_undirected_pairs


def _edges(pairs):
    s, t = zip(*pairs)
    return rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array(s, pa.string()),
                "target_id": pa.array(t, pa.string()),
            }
        )
    )


def test_reciprocity_known_graph(ray_session):
    # a<->b reciprocal, a->c b->c one-way, self-loop dropped, duplicate edge
    # collapsed: 4 distinct ordered simple edges, 2 reciprocal
    ds = _edges([("a", "b"), ("b", "a"), ("a", "c"), ("b", "c"), ("c", "c"), ("a", "b")])
    row = reciprocity(ds).to_pylist()[0]
    assert row == {"n_edges": 4, "n_reciprocal": 2, "recip_permille": 500}


def test_reciprocity_empty(ray_session):
    ds = _edges([("a", "a")])  # only a self-loop → zero simple edges
    row = reciprocity(ds).to_pylist()[0]
    assert row == {"n_edges": 0, "n_reciprocal": 0, "recip_permille": 0}


def test_degree_moments_triangle_plus_tail(ray_session):
    # triangle a-b-c plus tail c-d: deg a=2 b=2 c=3 d=1
    ds = _edges([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    row = degree_moments(ds).to_pylist()[0]
    assert row["n_nodes"] == 4 and row["m_edges"] == 4
    assert row["sum_deg2"] == 4 + 4 + 9 + 1
    assert row["sum_deg3"] == 8 + 8 + 27 + 1
    # edges: ab 2*2, bc 2*3, ca 3*2, cd 3*1
    assert row["sum_dudv"] == 4 + 6 + 6 + 3


def test_jaccard_link_pred_square(ray_session):
    # 4-cycle a-b-c-d-a: opposite corners share BOTH neighbors
    # J(a,c) = |{b,d}| / |{b,d}| = 1 → 1000 permille; adjacent pairs share
    # none (no output row)
    ds = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    out = {
        (r["x"], r["y"]): (r["n_common"], r["jaccard_permille"])
        for r in jaccard_link_prediction(ds).take_all()
    }
    assert out == {("a", "c"): (2, 1000), ("b", "d"): (2, 1000)}


def test_jaccard_hash_join_path_matches_broadcast(ray_session):
    rng = np.random.default_rng(7)
    pairs = {(f"n{a}", f"n{b}") for a, b in rng.integers(0, 30, (120, 2)) if a != b}
    ds = _edges(sorted(pairs))
    bc = {
        (r["x"], r["y"]): (r["n_common"], r["jaccard_permille"])
        for r in jaccard_link_prediction(ds).take_all()
    }
    sh = {
        (r["x"], r["y"]): (r["n_common"], r["jaccard_permille"])
        for r in jaccard_link_prediction(ds, broadcast_limit=0).take_all()
    }
    assert bc == sh and len(bc) > 0


def test_kcore_peels_tail_keeps_clique(ray_session):
    # K4 clique (3-core) with a pendant path hanging off it: the path peels
    # away over multiple rounds, the clique survives with degree 3
    clique = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    tail = [("d", "e"), ("e", "f"), ("f", "g")]
    out = {r["id"]: r["degree"] for r in kcore(_edges(clique + tail), k=3, rounds=8).take_all()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_fully_peeled_graph_is_empty(ray_session):
    # a tree has no 2-core
    out = kcore(_edges([("a", "b"), ("b", "c"), ("c", "d")]), k=2, rounds=8)
    rows = out.to_pylist() if isinstance(out, pa.Table) else out.take_all()
    assert rows == []


def test_kcore_converges_on_fixture(ray_session, sf_smoke):
    """The registered rounds=8 run IS the exact k-core at fixture scale:
    one more round changes nothing (the convergence claim in the
    registry docstring)."""
    from kgw_ray.pipelines.webkg import edges_from_triples, triples_dataset

    edges = edges_from_triples(triples_dataset(sf_smoke))
    r8 = {(r["id"], r["degree"]) for r in kcore(edges, k=3, rounds=8).take_all()}
    r9 = {(r["id"], r["degree"]) for r in kcore(edges, k=3, rounds=9).take_all()}
    assert r8 == r9 and len(r8) > 0


def test_attach_degrees_paths_agree(ray_session):
    ds = _edges([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    pairs = _distinct_undirected_pairs(ds, "source_id", "target_id").materialize()
    degrees = _degree_table(pairs).materialize()
    bc = sorted(
        (r["a"], r["b"], r["deg_a"], r["deg_b"])
        for r in _attach_degrees(pairs, degrees).take_all()
    )
    sh = sorted(
        (r["a"], r["b"], r["deg_a"], r["deg_b"])
        for r in _attach_degrees(pairs, degrees, broadcast_limit=0).take_all()
    )
    assert bc == sh == [
        ("a", "b", 2, 2),
        ("a", "c", 2, 3),
        ("b", "c", 2, 3),
        ("c", "d", 3, 1),
    ]


def test_multi_bfs_closeness_path_graph(ray_session):
    # path a-b-c-d-e, landmarks = 2 smallest ids (a, b):
    # depths from a: a0 b1 c2 d3 e4; from b: a1 b0 c1 d2 e3
    from kgw_ray.stages.graph_metrics import multi_bfs_closeness

    ds = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    out = {
        r["id"]: (r["n_reached"], r["sum_depth"])
        for r in multi_bfs_closeness(ds, n_sources=2).take_all()
    }
    assert out == {
        "a": (2, 1),
        "b": (2, 1),
        "c": (2, 3),
        "d": (2, 5),
        "e": (2, 7),
    }


def test_multi_bfs_closeness_disconnected(ray_session):
    # landmarks a, b live in one component; x-y is unreachable from them
    from kgw_ray.stages.graph_metrics import multi_bfs_closeness

    ds = _edges([("a", "b"), ("x", "y")])
    out = {
        r["id"]: (r["n_reached"], r["sum_depth"])
        for r in multi_bfs_closeness(ds, n_sources=2).take_all()
    }
    assert out == {"a": (2, 1), "b": (2, 1)}


# ---------------------------------------------------------------------------
# r4 continuation: HITS, label propagation, adjacency lists
# ---------------------------------------------------------------------------


def _nodes(ids):
    return rd.from_arrow(pa.table({"id": pa.array(list(ids), pa.string())}))


class TestHits:
    def test_two_round_integer_hits_by_hand(self):
        # star + chain: A->B, A->C, B->C, D isolated-ish (in-edge only)
        from kgw_ray.stages.graph_metrics import hits_scores

        e = _edges([("A", "B"), ("A", "C"), ("B", "C"), ("C", "D")])
        out = (
            hits_scores(_nodes("ABCD"), e)
            .to_pandas()
            .set_index("id")
            .sort_index()
        )
        # h1: A=2, B=1, C=1 ; a1: B=h1(A)=2, C=h1(A)+h1(B)=3, D=h1(C)=1
        # h2: A=a1(B)+a1(C)=5, B=a1(C)=3, C=a1(D)=1
        # a2: B=h2(A)=5, C=h2(A)+h2(B)=8, D=h2(C)=1
        assert out.loc["A", ["hub", "auth"]].tolist() == [5, 0]
        assert out.loc["B", ["hub", "auth"]].tolist() == [3, 5]
        assert out.loc["C", ["hub", "auth"]].tolist() == [1, 8]
        assert out.loc["D", ["hub", "auth"]].tolist() == [0, 1]

    def test_duplicate_edges_collapse(self):
        from kgw_ray.stages.graph_metrics import hits_scores

        e1 = _edges([("A", "B")])
        e2 = _edges([("A", "B"), ("A", "B"), ("A", "B")])
        a = hits_scores(_nodes("AB"), e1).to_pandas().sort_values("id")
        b = hits_scores(_nodes("AB"), e2).to_pandas().sort_values("id")
        assert a.values.tolist() == b.values.tolist()


class TestLabelPropagation:
    def test_tie_breaks_to_min_label(self):
        from kgw_ray.stages.graph_metrics import label_propagation

        # path graph B - A - C: A's neighbors {B, C} tie at count 1 → min B
        e = _edges([("B", "A"), ("A", "C")])
        out = (
            label_propagation(_nodes("ABC"), e, iters=1)
            .to_pandas()
            .set_index("id")["community"]
        )
        assert out["A"] == "B"
        # B and C each have the single neighbor A
        assert out["B"] == "A" and out["C"] == "A"

    def test_isolated_node_keeps_own_label(self):
        from kgw_ray.stages.graph_metrics import label_propagation

        e = _edges([("A", "B")])
        out = (
            label_propagation(_nodes("ABZ"), e, iters=3)
            .to_pandas()
            .set_index("id")["community"]
        )
        assert out["Z"] == "Z"

    def test_clique_converges_to_min_id(self):
        from kgw_ray.stages.graph_metrics import label_propagation

        clique = [("A", "B"), ("A", "C"), ("B", "C")]
        out = (
            label_propagation(_nodes("ABC"), _edges(clique), iters=3)
            .to_pandas()["community"]
            .tolist()
        )
        # round 1: each node takes its min neighbor; round 2+: mode
        # stabilizes — every member ends on the same community label
        assert len(set(out)) == 1


class TestAdjacencyLists:
    def test_sorted_joined_lists(self):
        from kgw_ray.stages.graph_metrics import adjacency_lists

        e = _edges(
            [("A", "C"), ("A", "B"), ("A", "C"), ("B", "A"), ("A", "D")]
        )
        out = adjacency_lists(e).to_pandas().set_index("id")
        assert out.loc["A", "neighbors"] == "B,C,D"
        assert int(out.loc["A", "outdeg"]) == 3
        assert out.loc["B", "neighbors"] == "A"

    def test_many_sources_across_shards(self):
        from kgw_ray.stages.graph_metrics import adjacency_lists

        pairs = [(f"s{i:03d}", f"t{j}") for i in range(200) for j in range(3)]
        out = adjacency_lists(_edges(pairs)).to_pandas()
        assert len(out) == 200
        assert set(out["neighbors"]) == {"t0,t1,t2"}
        assert set(out["outdeg"]) == {3}


class TestBellmanFord:
    def _edges_w(self, triples):
        s, t, w = zip(*triples)
        return rd.from_arrow(
            pa.table(
                {
                    "s": pa.array(s, pa.string()),
                    "t": pa.array(t, pa.string()),
                    "w": pa.array(list(w), pa.int64()),
                }
            )
        )

    def test_cheaper_long_path_beats_direct_edge(self):
        from kgw_ray.stages.graph_metrics import bellman_ford

        # source = 'A' (lexicographic min). A->D direct costs 10;
        # A->B->C->D costs 3. Directed: no route back to A.
        e = self._edges_w(
            [("A", "D", 10), ("A", "B", 1), ("B", "C", 1), ("C", "D", 1)]
        )
        out = (
            bellman_ford(e, rounds=6).to_pandas().set_index("id")["dist"]
        )
        assert out.to_dict() == {"A": 0, "B": 1, "C": 2, "D": 3}

    def test_round_cap_limits_path_length(self):
        from kgw_ray.stages.graph_metrics import bellman_ford

        # chain of 4 edges; rounds=2 reaches only 2 hops
        e = self._edges_w(
            [("A", "B", 1), ("B", "C", 1), ("C", "D", 1), ("D", "E", 1)]
        )
        out = bellman_ford(e, rounds=2).to_pandas().set_index("id")["dist"]
        assert out.to_dict() == {"A": 0, "B": 1, "C": 2}

    def test_unreachable_nodes_absent(self):
        from kgw_ray.stages.graph_metrics import bellman_ford

        e = self._edges_w([("A", "B", 5), ("Z", "Y", 1)])
        out = bellman_ford(e, rounds=4).to_pandas().set_index("id")["dist"]
        assert out.to_dict() == {"A": 0, "B": 5}


def test_sssp_counts_bruteforce():
    """σ table on a hand graph vs exhaustive path enumeration: diamond
    A→B→D, A→C→D (two shortest A→D paths), plus a longer A→E→F→D path
    that must NOT be counted, and an isolated edge X→Y."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages.graph_metrics import sssp_counts

    raw = [
        ("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"),
        ("A", "E"), ("E", "F"), ("F", "D"), ("X", "Y"),
        ("A", "B"),  # parallel edge: must NOT double the count
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([a for a, _ in raw]),
                "target_id": pa.array([b for _, b in raw]),
            }
        )
    )
    got = {
        (r.src, r.id): (int(r.dist), int(r.n_paths))
        for r in sssp_counts(ds, rounds=6).to_pandas().itertuples()
    }
    # brute force: enumerate simple paths up to length 6
    adj = {}
    for a, b in set(raw):
        adj.setdefault(a, set()).add(b)
    nodes = sorted({x for e in raw for x in e})
    want = {}
    for s in nodes:
        best: dict = {}
        paths = [[s]]
        for _ in range(6):
            nxt = []
            for p in paths:
                for b in adj.get(p[-1], ()):
                    if b in p:
                        continue
                    q = p + [b]
                    d = len(q) - 1
                    if b not in best or d < best[b][0]:
                        best[b] = (d, 1)
                    elif d == best[b][0]:
                        best[b] = (d, best[b][1] + 1)
                    nxt.append(q)
            paths = nxt
        want[s] = best
    expected = {(s, v): dv for s in nodes for v, dv in want[s].items()}
    expected.update({(s, s): (0, 1) for s in nodes})
    assert got == expected


def test_betweenness_path_graph():
    """On the directed path A→B→C→D, interior nodes carry exactly the
    pair-dependency mass: B sits on (A,C),(A,D); C on (A,D),(B,D) —
    2·10^6 micro-units each; endpoints 0."""
    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages.graph_metrics import (
        betweenness_from_counts,
        sssp_counts,
    )

    ds = rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array(["A", "B", "C"]),
                "target_id": pa.array(["B", "C", "D"]),
            }
        )
    )
    got = {
        r.id: int(r.betweenness_micro)
        for r in betweenness_from_counts(sssp_counts(ds)).to_pandas().itertuples()
    }
    assert got == {"A": 0, "B": 2_000_000, "C": 2_000_000, "D": 0}


def test_scc_bruteforce():
    """SCC on a hand graph: cycle {A,B,C}, 2-cycle {D,E} reachable from the
    first, singleton F (no cycle), self-loop G (its own SCC), isolated
    2-cycle {X,Y}."""
    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages.graph_metrics import strongly_connected_components

    raw = [
        ("A", "B"), ("B", "C"), ("C", "A"),
        ("C", "D"), ("D", "E"), ("E", "D"),
        ("E", "F"),
        ("G", "G"),
        ("X", "Y"), ("Y", "X"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([a for a, _ in raw]),
                "target_id": pa.array([b for _, b in raw]),
            }
        )
    )
    got = {
        r.id: r.scc
        for r in strongly_connected_components(ds).to_pandas().itertuples()
    }
    assert got == {
        "A": "A", "B": "A", "C": "A",
        "D": "D", "E": "D",
        "F": "F", "G": "G",
        "X": "X", "Y": "X",
    }


def test_ktruss_k4_bruteforce():
    """4-truss on K4 plus a pendant triangle: the pendant's edges carry
    support 1 and peel away; all six K4 edges (support 2) survive."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages.graph_metrics import k_truss

    k4 = list(itertools.combinations("ABCD", 2))
    pend = [("D", "E"), ("D", "F"), ("E", "F")]
    raw = k4 + pend
    ds = rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([x for x, _ in raw]),
                "target_id": pa.array([y for _, y in raw]),
            }
        )
    )
    got = k_truss(ds, k=4, rounds=6).to_pandas()
    assert sorted(zip(got.a, got.b)) == sorted(k4)
    assert (got.support == 2).all()


def test_rich_club_clique_plus_pendant(ray_session):
    # triangle a-b-c (deg 2,2,3 with pendant d on a): deg a=3, b=2, c=2, d=1
    # k=1: N={a,b,c}, E={ab,ac,bc} → 2000*3//(3*2) = 1000
    # k=2: N={a} → fewer than 2 nodes → 0
    from kgw_ray.stages.graph_metrics import rich_club

    ds = _edges([("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")])
    rows = {r["k"]: r for r in rich_club(ds, max_k=3).to_pylist()}
    assert rows[1] == {"k": 1, "n_nodes": 3, "n_edges": 3, "rich_club_pm": 1000}
    # k=2: only a (deg 3) qualifies — a single node has no club edges
    assert rows[2] == {"k": 2, "n_nodes": 1, "n_edges": 0, "rich_club_pm": 0}
    assert rows[3] == {"k": 3, "n_nodes": 0, "n_edges": 0, "rich_club_pm": 0}


def test_rich_club_hub_interlink(ray_session):
    # two hubs x,y each with 3 pendants, linked to each other:
    # deg x=y=4, pendants=1. k=1..3: N={x,y}, E={xy} → 2000*1//2 = 1000
    from kgw_ray.stages.graph_metrics import rich_club

    ds = _edges(
        [("x", "y")]
        + [("x", f"p{i}") for i in range(3)]
        + [("y", f"q{i}") for i in range(3)]
    )
    rows = {r["k"]: r for r in rich_club(ds, max_k=4).to_pylist()}
    for k in (1, 2, 3):
        assert rows[k] == {"k": k, "n_nodes": 2, "n_edges": 1, "rich_club_pm": 1000}
    assert rows[4]["n_nodes"] == 0 and rows[4]["rich_club_pm"] == 0


def test_luby_mis_independent_and_dominating(ray_session):
    """On a known graph the deterministic MIS output must be (a) an
    independent set — no edge joins two 'mis' nodes — and (b) dominating:
    every 'dominated' node has at least one 'mis' neighbor, and with
    enough rounds nothing stays undecided."""
    from kgw_ray.stages.graph_metrics import luby_mis

    edge_list = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),  # 4-cycle
        ("c", "e"), ("e", "f"),                            # tail
        ("g", "h"),                                        # separate edge
    ]
    rows = luby_mis(_edges(edge_list), rounds=6).take_all()
    status = {r["id"]: r["status"] for r in rows}
    assert set(status) == {"a", "b", "c", "d", "e", "f", "g", "h"}
    assert "undecided" not in status.values()
    mis = {v for v, s in status.items() if s == "mis"}
    adj = {}
    for x, y in edge_list:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    # independence
    assert all(not (adj[v] & mis) for v in mis)
    # domination
    for v, s in status.items():
        if s == "dominated":
            assert adj[v] & mis
