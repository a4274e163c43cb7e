"""Jones–Plassmann coloring: proper-coloring invariant + forced-shuffle
parity (value parity vs the unrolled SQL rides test_oracle_parity)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgw_ray.stages.graph_metrics import jones_plassmann_coloring


def _edges(rows):
    return rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([a for a, b in rows], pa.string()),
                "target_id": pa.array([b for a, b in rows], pa.string()),
            }
        )
    )


_WHEEL = [("hub", f"r{i}") for i in range(5)] + [
    (f"r{i}", f"r{(i + 1) % 5}") for i in range(5)
]


def _assert_proper(df: pd.DataFrame, rows):
    color = dict(zip(df["id"], df["color"]))
    for a, b in rows:
        ca, cb = color[a], color[b]
        if ca >= 0 and cb >= 0:
            assert ca != cb, (a, b, ca)


def test_coloring_wheel_proper():
    df = jones_plassmann_coloring(_edges(_WHEEL)).to_pandas()
    assert len(df) == 6
    _assert_proper(df, _WHEEL)
    # a wheel W5 needs 4 colors; 5 rounds decide every node here
    decided = df[df["color"] >= 0]
    assert len(decided) == 6
    assert decided["color"].max() <= 4


def test_coloring_path_two_colors_max():
    path = [(f"v{i}", f"v{i + 1}") for i in range(6)]
    df = jones_plassmann_coloring(_edges(path)).to_pandas()
    _assert_proper(df, path)
    decided = df[df["color"] >= 0]
    # greedy with any order uses at most Δ+1 = 3 colors on a path
    assert decided["color"].max() <= 2


def test_coloring_forced_shuffle_parity():
    a = (
        jones_plassmann_coloring(_edges(_WHEEL))
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    b = (
        jones_plassmann_coloring(_edges(_WHEEL), broadcast_limit=0)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns].astype(a.dtypes.to_dict()))
