"""Bench corpus-prep helpers: the rendered-pages cache must produce the
input_hint schema across many shard files and reuse the cache on a second
call (a re-render would silently double every scaling run's setup)."""

import os

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
    # second call: pure cache hit — no shard is rewritten (mtime check is
    # deterministic where a wall-clock bound would flake under ambient load)
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in files}
    assert _prepare_rendered_pages(sf_smoke, 2) == out
    assert {
        f: os.path.getmtime(os.path.join(out, f)) for f in files
    } == mtimes
    # removing a shard while the sibling marker survives must invalidate
    # the cache (a partial corpus would otherwise be benchmarked silently)
    os.remove(os.path.join(out, files[0]))
    out2 = _prepare_rendered_pages(sf_smoke, 2)
    n2 = sum(
        pq.read_metadata(os.path.join(out2, f)).num_rows
        for f in os.listdir(out2)
        if f.endswith(".parquet")
    )
    assert n2 == n
    _warm_page_cache(out)  # smoke: reads every byte without error
