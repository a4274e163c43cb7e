"""docs_partitioned_export: hive-layout directories + gated read-back."""

import os


def test_partitioned_layout_and_counts(tmp_path, sf_smoke):
    import ray.data as rd

    from kgw_ray.sources.readers import read_table

    docs = read_table(sf_smoke, "documents", columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "lake")
    docs.write_parquet(out, partition_cols=["lang"])
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    langs = sorted(set(docs.to_pandas()["lang"]))
    assert dirs == [f"lang={l}" for l in langs]
    # read-back re-derives the partition column and loses no rows
    back = rd.read_parquet(out)
    assert back.count() == docs.count()
    assert "lang" in back.schema().names


def test_partitioned_export_query_matches_source_counts(sf_smoke):
    from kgw_ray.pipelines.registry import QUERIES
    from kgw_ray.sources.readers import read_table

    df = (
        QUERIES["docs_partitioned_export"](sf_smoke)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    want = (
        read_table(sf_smoke, "documents", columns=["lang"])
        .to_pandas()["lang"]
        .value_counts()
        .sort_index()
    )
    assert list(df["lang"]) == list(want.index)
    assert list(df["n_docs"]) == [int(v) for v in want.to_numpy()]
