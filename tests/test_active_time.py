"""Interval-union active time: brute-force agreement on crafted intervals
(value parity vs the SQL oracle rides test_oracle_parity)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _run(rows):
    """rows: (user_id, ts_us). Run the operator over an in-memory table by
    monkey-patching the reader? No — exercise per_shard directly through
    the public pipeline on a temp parquet dir."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from kgw_ray.pipelines.relational import events_user_active_time

    t = pa.table(
        {
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array([ts for _, ts in rows], pa.timestamp("us")),
        }
    )
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return (
        events_user_active_time(d)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


_W = 300_000_000  # 5 min in us


def test_active_time_brute():
    rows = [
        # user 1: two overlapping + one separate
        (1, 0),
        (1, 100_000_000),  # overlaps [0, 300s)
        (1, 1_000_000_000),  # separate island
        # user 2: exact-touching intervals (start == prev end) do NOT merge
        (2, 0),
        (2, _W),
        # user 3: duplicate timestamps
        (3, 42),
        (3, 42),
    ]
    df = _run(rows)
    got = {
        int(r["user_id"]): (
            int(r["active_us"]),
            int(r["n_intervals"]),
            int(r["n_islands"]),
        )
        for _, r in df.iterrows()
    }
    assert got[1] == (_W + 100_000_000 + _W, 3, 2)
    # the break rule is STRICT (s > prev_max_e), so exactly-touching
    # intervals [0,W) and [W,2W) merge into one island of length 2W
    assert got[2] == (2 * _W, 2, 1)
    assert got[3] == (_W, 2, 1)
