"""HyperLogLog register sketch: estimation accuracy vs exact distinct, and
mergeability (register-table max-merge == one-shot registers)."""

import duckdb
import numpy as np
import pandas as pd

from kgw_ray.pipelines.relational import (
    _HLL_P,
    events_hll_registers,
    hll_estimate,
)


def test_hll_estimate_within_tolerance(sf_correct):
    regs = events_hll_registers(sf_correct).to_pandas()
    con = duckdb.connect()
    exact = con.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n FROM "
        f"read_parquet('{sf_correct}/events.parquet') GROUP BY event_type"
    ).df()
    for et, grp in regs.groupby("event_type"):
        est = hll_estimate(grp, _HLL_P)
        true = int(exact.loc[exact["event_type"] == et, "n"].iloc[0])
        assert abs(est - true) / true < 0.10, (et, est, true)


def test_hll_registers_merge_associatively(sf_correct):
    """Max-merging per-half register tables equals the one-shot table —
    the property that makes HLL state shippable between cluster nodes."""
    full = (
        events_hll_registers(sf_correct)
        .to_pandas()
        .sort_values(["event_type", "reg"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    halves = []
    for pred in ("event_id % 2 = 0", "event_id % 2 = 1"):
        import pyarrow as pa
        import tempfile, os

        half = con.sql(
            f"SELECT * FROM read_parquet('{sf_correct}/events.parquet') WHERE {pred}"
        ).arrow()
        d = tempfile.mkdtemp()
        import pyarrow.parquet as pq

        pq.write_table(half, os.path.join(d, "events.parquet"))
        # the query only reads events.parquet, so a dir with just it works
        halves.append(events_hll_registers(d).to_pandas())
    merged = (
        pd.concat(halves)
        .groupby(["event_type", "reg"], as_index=False)["max_rho"]
        .max()
        .sort_values(["event_type", "reg"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        full, merged[full.columns].astype(full.dtypes.to_dict())
    )


def test_hll_rho_range(sf_correct):
    regs = events_hll_registers(sf_correct).to_pandas()
    assert regs["reg"].between(0, (1 << _HLL_P) - 1).all()
    assert regs["max_rho"].between(1, 64 - _HLL_P + 1).all()
    assert not regs.duplicated(["event_type", "reg"]).any()
