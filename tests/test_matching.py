"""Greedy maximal matching: validity invariants + forced-distributed-path
parity (value parity vs the unrolled SQL rides test_oracle_parity)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgw_ray.stages.graph_metrics import greedy_maximal_matching


def _edges(rows):
    return rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([a for a, b in rows], pa.string()),
                "target_id": pa.array([b for a, b in rows], pa.string()),
            }
        )
    )


_PATH = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
_STAR = [("hub", f"leaf{i}") for i in range(6)]


def _check_valid_matching(matched: pd.DataFrame, edge_rows):
    # a matching: no node appears twice
    ends = pd.concat([matched["a"], matched["b"]])
    assert not ends.duplicated().any()
    # matched edges come from the (undirected) edge set
    eset = {tuple(sorted(e)) for e in edge_rows}
    for _, r in matched.iterrows():
        assert tuple(sorted((r["a"], r["b"]))) in eset


def test_matching_path_graph():
    m = greedy_maximal_matching(_edges(_PATH)).to_pandas()
    _check_valid_matching(m, _PATH)
    # a 6-node path has a maximal matching of size 2 or 3; 4 rounds of the
    # min-both-ends rule always saturate it (no live edge remains)
    assert len(m) in (2, 3)
    matched_nodes = set(m["a"]) | set(m["b"])
    for a, b in _PATH:  # maximality: no edge with both endpoints unmatched
        assert a in matched_nodes or b in matched_nodes


def test_matching_star_graph():
    m = greedy_maximal_matching(_edges(_STAR)).to_pandas()
    _check_valid_matching(m, _STAR)
    assert len(m) == 1  # star: exactly one edge can match


def test_matching_forced_shuffle_parity():
    a = (
        greedy_maximal_matching(_edges(_PATH))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    b = (
        greedy_maximal_matching(_edges(_PATH), broadcast_limit=0)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns].astype(a.dtypes.to_dict()))


def test_matching_empty_graph():
    ds = greedy_maximal_matching(_edges([]))
    assert ds.count() == 0
    # a zero-row to_pandas drops columns (the repo-wide empty-pull
    # hazard), so assert the typed schema on the Dataset itself
    assert sorted(ds.schema().names) == ["a", "b", "round_matched"]
