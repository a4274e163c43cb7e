"""Portable-hash parity: the numpy splitmix64 and its DuckDB UHUGEINT
expression must agree on every bit — this is what lets Luby priorities,
walk argmins and sampling draws be vectorized in BOTH engines."""

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kgw_ray.functions.porthash import (
    MIX64_GOLDEN,
    md5_le_u64,
    mix64,
    mix64_sql,
    u64_to_key20,
)


def test_mix64_goldens():
    ins = np.array(sorted(MIX64_GOLDEN), dtype=np.uint64)
    outs = mix64(ins)
    assert [int(o) for o in outs] == [MIX64_GOLDEN[int(i)] for i in ins]


def test_mix64_sql_matches_numpy_on_goldens_and_randoms():
    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [
            np.array(sorted(MIX64_GOLDEN), dtype=np.uint64),
            rng.randint(0, 2**63, size=50, dtype=np.int64).astype(np.uint64),
            (rng.randint(0, 2**63, size=50, dtype=np.int64).astype(np.uint64) << 1)
            + 1,
        ]
    )
    con = duckdb.connect()
    rows = ",".join(f"(CAST({int(v)} AS UBIGINT))" for v in vals)
    got = np.array(
        [
            r[0]
            for r in con.execute(
                f"SELECT {mix64_sql('x')} FROM (VALUES {rows}) v(x)"
            ).fetchall()
        ],
        dtype=np.uint64,
    )
    assert np.array_equal(got, mix64(vals))


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1), st.integers(1, 64))
def test_mix64_sql_round_xor_matches(base, r):
    """The per-round derivation mix64(base ^ r) — the Luby/walk scheme —
    agrees between engines for arbitrary bases."""
    con = duckdb.connect()
    expr = mix64_sql(f"xor(CAST({base} AS UBIGINT), CAST({r} AS UBIGINT))")
    got = con.execute(f"SELECT {expr}").fetchone()[0]
    want = int(mix64(np.array([base ^ r], dtype=np.uint64))[0])
    assert int(got) == want


def test_md5_le_u64_matches_duckdb_md5():
    """The string→uint64 base hash equals the oracle's md5-LE fold."""
    from kgw_ray.pipelines.training_data import _MD5_LE_UINT64

    vals = ["", "a", "host0.example.org", "ünïcode", "doc|123"]
    con = duckdb.connect()
    rows = ",".join("(?)" for _ in vals)
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {_MD5_LE_UINT64} FROM (SELECT md5(x) AS hx FROM "
            f"(VALUES {rows}) v(x))",
            vals,
        ).fetchall()
    ]
    want = md5_le_u64(np.array(vals, dtype=object))
    assert [int(g) for g in got] == [int(w) for w in want]


def test_u64_to_key20_orders_like_integers():
    rng = np.random.RandomState(3)
    v = rng.randint(0, 2**63, size=200, dtype=np.int64).astype(np.uint64)
    keys = u64_to_key20(v)
    order_int = np.argsort(v, kind="stable")
    order_str = np.argsort(keys, kind="stable")
    assert np.array_equal(order_int, order_str)
    assert u64_to_key20(np.zeros(0, np.uint64)).shape == (0,)


def test_dedup_mix64_is_the_canonical_copy():
    from kgw_ray.stages.dedup import _mix64

    assert _mix64 is mix64
