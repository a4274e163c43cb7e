"""Empty-corpus smoke for this round's operators: a filter chain or a
partition can hand any stage zero rows — every query must return a typed
empty (or well-defined) result, never crash."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    """Every corpus table, zero rows, real schemas (taken from the
    sf0.001 fixtures so the empties track the driver's schemas)."""
    from kgw_ray.sources.readers import TABLES

    d = tmp_path_factory.mktemp("empty_sf")
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        sch = pq.read_schema(os.path.join(sf, f"{t}.parquet"))
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    return str(d)


def _all_names():
    from kgw_ray.pipelines.registry import QUERIES

    return list(QUERIES)


@pytest.mark.parametrize("name", _all_names())
def test_registry_runs_on_empty_corpus(name, empty_sf):
    """EVERY registered query must survive an all-empty corpus — the
    zero-row regime a filter chain or partition hands any stage. Most
    return zero rows; ~20 scalar/fixed-shape reports legitimately emit
    their aggregate row(s) (COUNT/SUM-over-empty, quantile placeholders)
    — the bound rejects anything corpus-shaped either way."""
    from kgw_ray.pipelines.registry import QUERIES

    import ray.data as rd

    r = QUERIES[name](empty_sf)
    n = r.count() if isinstance(r, rd.Dataset) else len(r)
    assert n <= 24, f"{name} produced corpus-shaped rows from empty input"
