"""Bow-tie decomposition (stages/graph_metrics.py:bowtie_profile) on a
hand-built graph exercising all four classes, plus the reach helper."""

import pyarrow as pa
import ray.data as rd

from kgw_ray.stages.graph_metrics import _reach_from, bowtie_profile


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([p[0] for p in pairs], pa.string()),
                "target_id": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def test_bowtie_all_four_classes():
    # core: a<->b (2-cycle). in: i -> a. out: b -> o. other: x -> y
    # (disconnected), tendril t -> i is also 'in'-side? no: t reaches core
    # via i, so t is IN. w hangs off OUT? o -> w makes w OUT. Keep a pure
    # 'other' pair (x, y) plus a tendril-from-OUT that cannot reach core.
    ed = _edges(
        [
            ("a", "b"),
            ("b", "a"),
            ("i", "a"),
            ("t", "i"),
            ("b", "o"),
            ("o", "w"),
            ("x", "y"),
        ]
    )
    out = bowtie_profile(ed).to_pandas().set_index("class")["n_nodes"].to_dict()
    assert out == {"core": 2, "in": 2, "out": 2, "other": 2}


def test_bowtie_pure_chain_core_is_smallest_label():
    # no cycle: every SCC is a singleton; the (size desc, label asc) rule
    # picks node 'a' as the 1-node core; everything downstream is OUT
    ed = _edges([("a", "b"), ("b", "c")])
    out = bowtie_profile(ed).to_pandas().set_index("class")["n_nodes"].to_dict()
    assert out == {"core": 1, "out": 2}


def test_reach_from_directions():
    ed = _edges([("a", "b"), ("b", "c"), ("z", "a")])
    from kgw_ray.stages.graph_metrics import _distinct_ordered_pairs

    pairs = _distinct_ordered_pairs(ed).materialize()
    seeds = rd.from_arrow(pa.table({"id": pa.array(["a"], pa.string())}))
    fwd = sorted(r["id"] for r in _reach_from(pairs, seeds).take_all())
    bwd = sorted(
        r["id"] for r in _reach_from(pairs, seeds, forward=False).take_all()
    )
    assert fwd == ["a", "b", "c"]
    assert bwd == ["a", "z"]
