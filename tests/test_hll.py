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


def test_trailing_hll_estimates_track_exact_wau(sf_correct):
    """The trailing-merged registers must estimate the exact trailing-7-day
    distinct within HLL tolerance for days fully inside the corpus span."""
    import pyarrow.compute  # noqa: F401

    from kgw_ray.pipelines.relational import events_daily_hll_trailing

    regs = events_daily_hll_trailing(sf_correct).to_pandas()
    con = duckdb.connect()
    exact = con.sql(
        f"""
        WITH d AS (SELECT DISTINCT user_id,
                     CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                          AS BIGINT) AS d
                   FROM read_parquet('{sf_correct}/events.parquet')),
        days AS (SELECT DISTINCT d FROM d)
        SELECT t.d AS day, COUNT(DISTINCT x.user_id) AS n
        FROM days t JOIN d x ON x.d BETWEEN t.d - 6 AND t.d
        GROUP BY t.d
        """
    ).df()
    checked = 0
    for _, r in exact.iterrows():
        day, true = int(r["day"]), int(r["n"])
        grp = regs[regs["day"] == day][["reg", "max_rho"]]
        if len(grp) == 0 or true < 50:
            continue
        est = hll_estimate(grp)
        assert abs(est - true) / true < 0.12, (day, est, true)
        checked += 1
    assert checked > 5
