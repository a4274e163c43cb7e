"""Driver-gate replica: every registered query with an oracle must match
DuckDB on sf0.01 (row count + schema + order-insensitive values)."""

import pytest

from kgw_ray.pipelines.registry import ORACLES, QUERIES
from tests.oracle_utils import assert_matches, run_oracle, to_pandas


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, sf_correct):
    ray_df = to_pandas(QUERIES[name](sf_correct))
    oracle_df = run_oracle(ORACLES[name], sf_correct)
    assert_matches(ray_df, oracle_df, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, sf_smoke):
    """Queries without a SQL oracle must run AND return nonempty results
    on the smoke corpus (an all-empty regression must not stay green)."""
    df = to_pandas(QUERIES[name](sf_smoke))
    assert df is not None and len(df.columns) > 0
    assert len(df) > 0, f"{name} returned 0 rows at smoke scale"


def test_anti_join_shuffle_path_parity(sf_correct):
    """The left_anti shuffle path must agree with the broadcast path and
    the oracle (pins the 10^9-key physical plan)."""
    from kgw_ray.pipelines.relational import (
        EVENTS_NO_PURCHASE_SQL,
        events_users_no_purchase,
    )

    a = to_pandas(events_users_no_purchase(sf_correct))
    b = to_pandas(events_users_no_purchase(sf_correct, force_shuffle=True))
    oracle = run_oracle(EVENTS_NO_PURCHASE_SQL, sf_correct)
    assert sorted(a["user_id"]) == sorted(b["user_id"]) == sorted(oracle["user_id"])


def test_anti_join_both_paths_nonempty():
    """Synthetic case with real non-buyers: both anti-join paths return
    exactly the keyless rows."""
    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages.joins import anti_join

    left = rd.from_arrow(pa.table({"k": pa.array(range(10), pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([0, 2, 4, 6, 8], pa.int64())}))
    bc = sorted(anti_join(left, right, on="k").to_pandas()["k"])
    sh = sorted(anti_join(left, right, on="k", broadcast_limit=0).to_pandas()["k"])
    assert bc == sh == [1, 3, 5, 7, 9]


def test_semi_and_anti_join_empty_keys():
    """Empty key sets: semi keeps nothing, anti keeps everything — both
    previously KeyError'd on the schema-less empty to_pandas (review)."""
    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages.joins import anti_join, semi_join_dataset

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    empty = left.filter(expr="k > 99")
    assert semi_join_dataset(left, empty, on="k").count() == 0
    assert sorted(anti_join(left, empty, on="k").to_pandas()["k"]) == [1, 2, 3]


def test_neighborhood_unknown_node_returns_empty(sf_correct):
    """A node with no edges must yield an empty result with the edge
    schema intact, not an ArrowTypeError from a null-typed value set."""
    from kgw_ray.pipelines.tpch_kg import tpch_graph
    from kgw_ray.stages.graph import neighborhood

    out = neighborhood(tpch_graph(sf_correct)[1], "NO_SUCH_NODE")
    df = out.to_pandas()
    assert len(df) == 0


def test_range_join_boundaries_and_equi_key():
    """Bucketed range join: pairs exactly on the window boundaries are
    kept, pairs just outside are dropped (including across bucket edges),
    and an equi-key restricts matches — brute-force comparison."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages.joins import range_join

    W = 100  # microseconds
    lts = [0, 37, 99, 100, 101, 250, 999]
    rts = [0, 36, 99, 100, 137, 199, 200, 350, 1099, 1100]
    left = rd.from_arrow(
        pa.table(
            {
                "lid": pa.array(range(len(lts)), pa.int64()),
                "lt": pa.array(lts, pa.int64()),
                "k": pa.array([i % 2 for i in range(len(lts))], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "rid": pa.array(range(len(rts)), pa.int64()),
                "rt": pa.array(rts, pa.int64()),
                "k": pa.array([i % 2 for i in range(len(rts))], pa.int64()),
            }
        )
    )
    out = range_join(
        left, right, left_ts="lt", right_ts="rt", lower_us=0, upper_us=W
    ).to_pandas()
    got = set(zip(out["lid"], out["rid"]))
    want = {
        (i, j)
        for i, j in itertools.product(range(len(lts)), range(len(rts)))
        if 0 <= rts[j] - lts[i] <= W
    }
    assert got == want
    # equi-key path: same range predicate AND k equality
    out2 = range_join(
        left, right, left_ts="lt", right_ts="rt", lower_us=0, upper_us=W, on=("k",)
    ).to_pandas()
    got2 = set(zip(out2["lid"], out2["rid"]))
    want2 = {(i, j) for i, j in want if i % 2 == j % 2}
    assert got2 == want2
