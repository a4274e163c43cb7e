"""Persistent Parquet graph hub (VERDICT r3 task 3): the kg_* family is
served from a written ``<hub>/nodes`` + ``<hub>/edges`` Parquet directory —
built once per input ACROSS processes, mirroring the reference's
every-sink-reads-kg.sqlite architecture (kgw/_shared/tasks.py:144-149)."""

import os

import pandas as pd

from kgw_ray.pipelines import tpch_kg


def _frame(ds, cols):
    return (
        ds.to_pandas()[cols]
        .sort_values(cols, kind="mergesort")
        .reset_index(drop=True)
    )


def test_hub_round_trip_identical(sf_smoke):
    """The hub-read path must return exactly the build path's graph."""
    built_nodes, built_edges = tpch_kg.tpch_graph(sf_smoke)
    hub = tpch_kg.hub_path_for(sf_smoke)
    assert os.path.exists(os.path.join(hub, "_HUB_OK")), "hub was not written"

    # evict the in-process memo → the next call exercises the fresh-process
    # read_parquet path against the published hub
    tpch_kg._GRAPH_CACHE.clear()
    read_nodes, read_edges = tpch_kg.tpch_graph(sf_smoke)

    ncols = ["id", "type", "properties"]
    ecols = ["source_id", "target_id", "type", "properties"]
    pd.testing.assert_frame_equal(_frame(built_nodes, ncols), _frame(read_nodes, ncols))
    pd.testing.assert_frame_equal(_frame(built_edges, ecols), _frame(read_edges, ecols))


def test_hub_digest_tracks_inputs(tmp_path, sf_smoke):
    """A different input dir (different content identity) must map to a
    DIFFERENT hub path — staleness by construction, no replace races."""
    import shutil

    other = tmp_path / "sfcopy"
    other.mkdir()
    for t in tpch_kg._HUB_SOURCES:
        shutil.copy(os.path.join(sf_smoke, f"{t}.parquet"), other / f"{t}.parquet")
    assert tpch_kg.hub_path_for(sf_smoke) != tpch_kg.hub_path_for(str(other))
    # same dir stat'd twice → same path (deterministic)
    assert tpch_kg.hub_path_for(sf_smoke) == tpch_kg.hub_path_for(sf_smoke)
