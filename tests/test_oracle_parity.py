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
    """Queries without a SQL oracle must at least run and return rows."""
    df = to_pandas(QUERIES[name](sf_smoke))
    assert df is not None and len(df.columns) > 0
