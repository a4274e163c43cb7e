"""WARC source reader (kgw_ray/sources/warc.py): synthetic shards only —
the sandbox has no crawl data, so fixtures are built with the module's own
record serializer and verified against hand-known values."""

import gzip

from kgw_ray.sources.warc import (
    gzip_member,
    parse_warc_records,
    read_warc,
    split_http_response,
    write_warc_record,
)

_HTML = b"<html><body><p>hello crawl</p></body></html>"
_HTTP = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + _HTML


def _shard() -> bytes:
    return (
        write_warc_record("warcinfo", "", b"software: test\r\n")
        + write_warc_record("request", "http://a.example/x", b"GET /x HTTP/1.1\r\n")
        + write_warc_record("response", "http://a.example/x", _HTTP)
        + write_warc_record("response", "http://b.example/y", _HTTP)
    )


def test_parse_warc_records_roundtrip():
    recs = list(parse_warc_records(_shard()))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo",
        "request",
        "response",
        "response",
    ]
    assert recs[2]["url"] == "http://a.example/x"
    assert recs[2]["payload"] == _HTTP  # exact Content-Length slice


def test_parse_warc_truncated_tail_dropped():
    data = _shard() + write_warc_record("response", "http://c.example/z", _HTTP)[:40]
    # the partial trailing record is dropped, never a crash or a short payload
    assert len(list(parse_warc_records(data))) == 4


def test_split_http_response():
    status, body = split_http_response(_HTTP)
    assert status == "HTTP/1.1 200 OK" and body == _HTML
    # non-HTTP payloads pass through untouched (e.g. resource records)
    assert split_http_response(b"raw bytes") == ("", b"raw bytes")


def test_read_warc_plain_and_gzip(tmp_path):
    plain = tmp_path / "shard0.warc"
    plain.write_bytes(_shard())
    # member-per-record gzip (Common Crawl layout) AND whole-file gzip
    member_gz = tmp_path / "shard1.warc.gz"
    records = [
        write_warc_record("warcinfo", "", b"software: test\r\n"),
        write_warc_record("request", "http://a.example/x", b"GET /x HTTP/1.1\r\n"),
        write_warc_record("response", "http://a.example/x", _HTTP),
        write_warc_record("response", "http://b.example/y", _HTTP),
    ]
    member_gz.write_bytes(b"".join(gzip_member(r) for r in records))
    whole_gz = tmp_path / "shard2.warc.gz"
    whole_gz.write_bytes(gzip.compress(_shard()))

    ds = read_warc([str(plain), str(member_gz), str(whole_gz)])
    df = ds.to_pandas().sort_values(["shard", "url"]).reset_index(drop=True)
    # default filter: response records only, HTTP headers split off
    assert len(df) == 6  # 2 responses x 3 shards
    assert set(df["warc_type"]) == {"response"}
    assert set(df["http_status"]) == {"HTTP/1.1 200 OK"}
    assert all(bytes(p) == _HTML for p in df["payload"])


def test_read_warc_unfiltered_raw(tmp_path):
    p = tmp_path / "s.warc"
    p.write_bytes(_shard())
    df = read_warc([str(p)], record_types=None, split_http=False).to_pandas()
    assert len(df) == 4
    resp = df[df["warc_type"] == "response"]
    assert all(bytes(x).startswith(b"HTTP/1.1 200 OK") for x in resp["payload"])


def test_pages_from_warc_into_extract_chain(tmp_path):
    """WARC shard → pages schema → the real HTML extract stage: the
    crawl-archive ingest path is load-bearing, not a dangling reader."""
    from kgw_ray.sources.warc import pages_from_warc
    from kgw_ray.stages.extract import extract_batch

    p = tmp_path / "s.warc"
    p.write_bytes(_shard())
    pages = pages_from_warc([str(p)])
    df = pages.to_pandas()
    assert list(df.columns) == ["url", "warc_ts", "html", "doc_id"]
    assert len(df) == 2 and df["doc_id"].nunique() == 2
    assert all(bytes(h) == _HTML for h in df["html"])
    assert str(df["warc_ts"].iloc[0]) == "2026-01-01 00:00:00"
    out = pages.map_batches(extract_batch, batch_format="pyarrow").to_pandas()
    assert "extracted_text" in out.columns and len(out) == 2
