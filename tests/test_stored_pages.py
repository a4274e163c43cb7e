"""Stored-pages flagship path: rendering pages to Parquet once and reading
them back (the BASELINE.json input_hint shape) must produce EXACTLY the
same knowledge graph as the in-line synthesis path."""

import os

import pandas as pd
import ray.data as rd


def test_stored_pages_edges_match_synth(tmp_path, sf_smoke):
    from kgw_ray.pipelines.webkg import (
        edges_from_triples,
        triples_dataset,
        triples_from_pages,
    )
    from kgw_ray.sources.pages import pages_dataset

    out = str(tmp_path / "pages")
    pages_dataset(sf_smoke, repeat=2).write_parquet(out)
    stored = rd.read_parquet(out, columns=["doc_id", "html"])

    a = (
        edges_from_triples(triples_from_pages(stored))
        .to_pandas()
        .sort_values(["source_id", "target_id", "type"])
        .reset_index(drop=True)
    )
    b = (
        edges_from_triples(triples_dataset(sf_smoke, repeat=2))
        .to_pandas()
        .sort_values(["source_id", "target_id", "type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_stored_pages_schema_is_input_hint(tmp_path, sf_smoke):
    """The rendered table carries the exact input_hint columns
    (url, warc_ts, html:binary, text, lang) plus the doc_id join key."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgw_ray.sources.pages import pages_dataset

    out = str(tmp_path / "pages")
    pages_dataset(sf_smoke).write_parquet(out)
    f = next(p for p in os.listdir(out) if p.endswith(".parquet"))
    schema = pq.read_schema(os.path.join(out, f))
    assert schema.field("url").type == pa.string()
    assert pa.types.is_timestamp(schema.field("warc_ts").type)
    assert schema.field("html").type == pa.binary()
    assert schema.field("text").type == pa.string()
    assert schema.field("lang").type == pa.string()
