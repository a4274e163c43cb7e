"""File-source tests: TSV reader, JSON document reader, archive
decompression, checksums, generic adapter normalizers (SURVEY.md §2.1/§2.2)."""

import bz2
import gzip
import hashlib
import json
import tarfile
import zipfile

import pytest

from kgw_ray.sources import files as fs


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    (d / "t.tsv").write_text("id\tname\tscore\na\tAlice\t1.5\nb\tBob\t\n")
    doc = [
        {"entity": "e1", "type": "gene", "name": "G1", "empty": "", "nan": None},
        {"entity": "e2", "type": "disease", "name": "D1"},
    ]
    (d / "doc.json").write_text(json.dumps({"records": doc}))
    (d / "list.json").write_text(json.dumps(doc))
    payload = b"hello compressed world" * 10
    (d / "x.bz2").write_bytes(bz2.compress(payload))
    (d / "x.txt.gz").write_bytes(gzip.compress(payload))
    with zipfile.ZipFile(d / "x.zip", "w") as zf:
        zf.writestr("inner/a.txt", payload)
        zf.writestr("b.txt", b"second")
    with tarfile.open(d / "x.tar.gz", "w:gz") as tf:
        import io

        info = tarfile.TarInfo("member.txt")
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    return d, payload


def test_read_tsv(data_dir):
    d, _ = data_dir
    ds = fs.read_tsv(str(d / "t.tsv"), columns=["id", "score"])
    rows = ds.to_pandas()
    assert list(rows.columns) == ["id", "score"]
    # row ORDER of a consumed dataset is not guaranteed (streaming executor
    # preserve_order=False by default) — look the row up by key
    assert rows.set_index("id").loc["a", "score"] == 1.5


def test_read_json_documents(data_dir):
    d, _ = data_dir
    ds = fs.read_json_documents(str(d / "doc.json"), records_key="records")
    recs = [json.loads(r) for r in ds.to_pandas()["record"]]
    assert {r["entity"] for r in recs} == {"e1", "e2"}
    ds2 = fs.read_json_documents(str(d / "list.json"))
    assert ds2.count() == 2


def test_archives(data_dir):
    d, payload = data_dir
    for name, n_members in [("x.bz2", 1), ("x.txt.gz", 1), ("x.zip", 2), ("x.tar.gz", 1)]:
        ds = fs.read_archive_members(str(d / name))
        rows = ds.to_pandas()
        assert len(rows) == n_members, name
        contents = set(rows["bytes"])
        assert payload in contents, name


def test_checksums(data_dir):
    d, _ = data_dir
    ds = fs.checksum_files(str(d / "t.tsv"))
    row = ds.to_pandas().iloc[0]
    raw = (d / "t.tsv").read_bytes()
    assert row["md5"] == hashlib.md5(raw).hexdigest()
    assert row["sha256"] == hashlib.sha256(raw).hexdigest()
    assert row["n_bytes"] == len(raw)


def test_json_record_nodes(data_dir):
    """Adapter semantics replicate the reference (_hald.py:79-108): id/type
    projected out, informative-only properties kept."""
    d, _ = data_dir
    recs = fs.read_json_documents(str(d / "doc.json"), records_key="records")
    nodes = fs.json_record_nodes(recs, id_key="entity", type_key="type")
    rows = {r["id"]: r for r in nodes.to_pandas().to_dict(orient="records")}
    assert rows["e1"]["type"] == "gene"
    props = json.loads(rows["e1"]["properties"])
    assert props == {"name": "G1"}  # empty + None dropped (is_informative)


def test_tsv_edges(data_dir):
    import pyarrow as pa
    import ray.data as rd

    rows = rd.from_arrow(
        pa.table(
            {
                "subject": ["a", "b"],
                "object": ["x", "y"],
                "predicate": ["rel1", "rel2"],
                "extra": ["k", ""],
            }
        )
    )
    edges = fs.tsv_edges(
        rows, source_col="subject", target_col="object", type_col="predicate"
    )
    out = edges.to_pandas().sort_values("source_id").to_dict(orient="records")
    assert out[0] == {
        "source_id": "a",
        "target_id": "x",
        "type": "rel1",
        "properties": '{"extra":"k"}',
    }
    assert json.loads(out[1]["properties"]) == {}  # "" dropped


def test_fetch_url_table_file_scheme(tmp_path):
    """The real fetch branch (urllib) exercised via file:// urls — retries,
    checksum validation and the Range-ignored fallback all run for real."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.sources.http import fetch_url, fetch_url_table

    p1 = tmp_path / "a.bin"
    p1.write_bytes(b"hello kgw_ray " * 10)
    p2 = tmp_path / "b.bin"
    p2.write_bytes(b"other content")
    urls = rd.from_arrow(
        pa.table({"url": [p1.as_uri(), p2.as_uri()]})
    )
    out = fetch_url_table(urls).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(out["n_bytes"]) == [140, 13]
    assert bytes(out["content"][0]) == p1.read_bytes()
    # checksum validation (reference DownloadFile.run)
    md5 = hashlib.md5(p1.read_bytes()).hexdigest()
    st, data, validated = fetch_url(p1.as_uri(), md5=md5)
    assert data == p1.read_bytes() and validated is True
    # resume offset: file:// ignores Range; the fallback slices locally
    st, tail, validated = fetch_url(p1.as_uri(), offset=100)
    assert tail == p1.read_bytes()[100:]
    assert validated is False  # no checksum requested


def test_fetch_url_retry_then_record_error(tmp_path):
    import time

    import pyarrow as pa
    import pytest
    import ray.data as rd

    from kgw_ray.sources.http import fetch_url, fetch_url_table

    missing = (tmp_path / "nope.bin").as_uri()
    t0 = time.time()
    with pytest.raises(Exception):
        fetch_url(missing, max_retries=3, backoff_s=0.05)
    assert time.time() - t0 >= 0.15 - 0.01  # 0.05 + 0.1 backoff ran
    out = fetch_url_table(
        rd.from_arrow(pa.table({"url": [missing]})), max_retries=1
    ).to_pandas()
    assert list(out["status"]) == [-1] and list(out["n_bytes"]) == [0]


def test_fetch_url_fake_mode_deterministic():
    from kgw_ray.sources.http import fetch_url

    s1, d1, _ = fetch_url("https://example.org/x", fake=True)
    s2, d2, _ = fetch_url("https://example.org/x", fake=True)
    _, d3, _ = fetch_url("https://example.org/y", fake=True)
    assert d1 == d2 and d1 != d3 and len(d1) == 256
    _, tail, _ = fetch_url("https://example.org/x", fake=True, offset=200)
    assert tail == d1[200:]


def test_fetch_url_resume_validates_when_range_ignored(tmp_path):
    """A resumed fetch whose server ignores Range (full body received)
    must still validate checksums against the full body (review)."""
    import hashlib

    import pytest

    from kgw_ray.sources.http import fetch_url

    p = tmp_path / "c.bin"
    p.write_bytes(b"0123456789abcdef")
    good = hashlib.md5(p.read_bytes()).hexdigest()
    st, tail, validated = fetch_url(p.as_uri(), offset=4, md5=good, max_retries=1)
    assert tail == b"456789abcdef" and validated is True
    with pytest.raises(ValueError):
        fetch_url(p.as_uri(), offset=4, md5="0" * 32, max_retries=1)


def test_checksum_mismatch_skips_backoff_ladder(tmp_path):
    """A wrong expected hash is deterministic: at most one re-download,
    no exponential backoff — max_retries=5 with a huge backoff must fail
    fast (and a validated fetch_url_table row reports validated=True)."""
    import hashlib
    import time

    import pyarrow as pa
    import pytest
    import ray.data as rd

    from kgw_ray.sources.http import fetch_url, fetch_url_table

    p = tmp_path / "d.bin"
    p.write_bytes(b"payload")
    t0 = time.time()
    with pytest.raises(ValueError):
        fetch_url(p.as_uri(), md5="0" * 32, max_retries=5, backoff_s=30.0)
    assert time.time() - t0 < 5.0  # two reads, zero sleeps
    good = hashlib.md5(b"payload").hexdigest()
    out = fetch_url_table(
        rd.from_arrow(pa.table({"url": [p.as_uri()], "md5": [good]})),
        md5_col="md5",
    ).to_pandas()
    assert list(out["validated"]) == [True]


def test_version_and_metadata_fetchers(tmp_path):
    """Generic version/metadata fetchers (reference extract.py:220-301)
    against local JSON / HTML indexes served over file://."""
    import json

    from kgw_ray.sources.http import (
        get_metadata_from_json_index,
        get_versions_from_html_index,
        get_versions_from_json_index,
    )

    vj = tmp_path / "versions.json"
    vj.write_text(json.dumps([{"version": 1}, {"version": 2}, {"version": 3}]))
    assert get_versions_from_json_index(vj.as_uri()) == ["1", "2", "3"]

    mj = tmp_path / "meta.json"
    mj.write_text(
        json.dumps(
            {
                "created_date": "2024-01-01",
                "files": [
                    {
                        "name": "kg.tsv.gz",
                        "download_url": "https://x/kg.tsv.gz",
                        "size": 123,
                        "computed_md5": "ff" * 16,
                    }
                ],
            }
        )
    )
    meta = get_metadata_from_json_index(mj.as_uri())
    assert meta == {
        "kg.tsv.gz": {"url": "https://x/kg.tsv.gz", "size": 123, "md5": "ff" * 16}
    }

    hx = tmp_path / "index.html"
    hx.write_text(
        "<html><body>"
        '<a href="https://d/2024-03-01/index.html">2024-03-01</a>'
        '<a href="https://d/2024-04-01/index.html">2024-04-01</a>'
        '<a href="https://d/other">not a version</a>'
        "</body></html>"
    )
    assert get_versions_from_html_index(hx.as_uri()) == ["2024-03-01", "2024-04-01"]


def test_read_table_directory_of_shards(tmp_path):
    """Tables may be DIRECTORIES of shard files (Common-Crawl layout; the
    scaling bench corpus) — the clean-schema read must handle both."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgw_ray.sources.readers import read_table

    d = tmp_path / "documents.parquet"
    d.mkdir()
    for i in range(3):
        pq.write_table(
            pa.table({"doc_id": pa.array([i * 10, i * 10 + 1], pa.int64()),
                      "text": ["a", "b"]}),
            d / f"shard_{i}.parquet",
        )
    ds = read_table(str(tmp_path), "documents", columns=["doc_id"])
    assert ds.count() == 6
    assert ds.schema().names == ["doc_id"]


def test_html_index_implicit_anchor_close(tmp_path):
    """An <a> implicitly closed by the next <a> (missing </a>) must still
    yield BOTH links, as the reference's BeautifulSoup parser would."""
    from kgw_ray.sources.http import get_versions_from_html_index

    hx = tmp_path / "sloppy.html"
    hx.write_text(
        '<a href="https://d/2024-03-01/">2024-03-01'
        '<a href="https://d/2024-04-01/">2024-04-01</a>'
    )
    assert get_versions_from_html_index(hx.as_uri()) == ["2024-03-01", "2024-04-01"]


def test_adapters_drop_null_members(tmp_path):
    """JSON null ids/types and null TSV triple members must be dropped or
    defaulted — not rendered as the literal string 'None' (review)."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    recs = rd.from_arrow(
        pa.table(
            {
                "record": [
                    _json.dumps({"id": 7, "type": None, "x": 1}),
                    _json.dumps({"id": None, "type": "g"}),
                    _json.dumps({"type": "g", "x": 2}),  # id missing
                    _json.dumps({"id": "ok", "type": "g"}),
                ]
            }
        )
    )
    nodes = fs.json_record_nodes(recs, id_key="id", type_key="type").to_pandas()
    assert sorted(nodes["id"]) == ["7", "ok"]
    assert nodes.set_index("id").loc["7", "type"] == "record"  # default_type

    rows = rd.from_arrow(
        pa.table(
            {
                "s": ["a", None, "c"],
                "o": ["x", "y", None],
                "p": ["r1", "r2", "r3"],
            }
        )
    )
    edges = fs.tsv_edges(rows, source_col="s", target_col="o", type_col="p").to_pandas()
    assert len(edges) == 1 and edges.iloc[0]["source_id"] == "a"


class TestRobots:
    def test_parse_groups_and_precedence(self):
        from kgw_ray.sources.robots import parse_robots_txt

        txt = (
            "# comment\n"
            "User-agent: *\n"
            "Disallow: /private\n"
            "Allow: /private/ok\n"
            "\n"
            "User-agent: special-bot\n"
            "Disallow: /\n"
        )
        r = parse_robots_txt(txt)
        assert not r.is_allowed("/private/x")
        assert r.is_allowed("/private/ok/page")  # longest match wins
        assert r.is_allowed("/public")
        rb = parse_robots_txt(txt, user_agent="special-bot")
        assert not rb.is_allowed("/anything")

    def test_empty_disallow_allows_everything(self):
        from kgw_ray.sources.robots import parse_robots_txt

        r = parse_robots_txt("User-agent: *\nDisallow:\n")
        assert r.is_allowed("/anything")

    def test_equal_length_tie_prefers_allow(self):
        from kgw_ray.sources.robots import RobotsRules

        r = RobotsRules(disallow=["/doc/a"], allow=["/doc/b"])
        assert not r.is_allowed("/doc/a1")
        assert r.is_allowed("/doc/b1")
        tie = RobotsRules(disallow=["/x"], allow=["/x"])
        assert tie.is_allowed("/x/page")

    def test_synth_rule_band(self):
        from kgw_ray.sources.robots import parse_robots_txt, synth_robots_txt

        r = parse_robots_txt(synth_robots_txt("src7.example.org"))  # K = 2
        assert not r.is_allowed("/doc/00002000")
        assert not r.is_allowed("/doc/00002899")
        assert r.is_allowed("/doc/00002900")  # the Allow exception
        assert r.is_allowed("/doc/00001999")
        assert r.is_allowed("/doc/00012345")  # outside the 4-zero pad band
