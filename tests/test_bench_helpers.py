"""Bench corpus-prep helpers: the rendered-pages cache must produce the
input_hint schema across many shard files and reuse the cache on a second
call (a re-render would silently double every scaling run's setup)."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def test_prepare_rendered_pages_schema_shards_and_cache(sf_smoke):
    from bench import _prepare_rendered_pages, _warm_page_cache

    out = _prepare_rendered_pages(sf_smoke, 2)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    # many shard files even for a tiny corpus (the read-parallelism rule)
    assert len(files) >= 16
    schema = pq.read_schema(os.path.join(out, files[0]))
    assert schema.field("html").type == pa.binary()
    assert schema.field("url").type == pa.string()
    n = sum(
        pq.read_metadata(os.path.join(out, f)).num_rows for f in files
    )
    assert n == 2 * pq.read_metadata(
        os.path.join(sf_smoke, "documents.parquet")
    ).num_rows
    # second call: pure cache hit (no re-render)
    t0 = time.monotonic()
    assert _prepare_rendered_pages(sf_smoke, 2) == out
    assert time.monotonic() - t0 < 1.0
    _warm_page_cache(out)  # smoke: reads every byte without error
