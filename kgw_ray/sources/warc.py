"""WARC source: the canonical web-crawl archive format a 100 TB webtext
pipeline ingests (Common-Crawl-style shards). Pure-stdlib parser — no
warcio in this container, and the format is simple enough that a
dependency buys nothing: a WARC file is a concatenation of records, each

    WARC/1.0\r\n
    <Name>: <value>\r\n ...          (headers; Content-Length is required)
    \r\n
    <Content-Length payload bytes>
    \r\n\r\n                          (record terminator)

gzip variants (.warc.gz) are member-per-record or whole-file; both
decompress to the same concatenation, so one ``gzip.decompress`` loop
covers them.

Scale design: shards distribute as whole files via
``ray.data.read_binary_files`` (a WARC shard is written to be the unit of
parallelism — Common Crawl targets ~1 GiB/shard), and each file parses
inside ONE ``map_batches`` task into (url, warc_type, warc_date,
payload) rows; HTTP response bodies are split from their HTTP headers
vectorized-per-record. Nothing is pulled to the driver; downstream stages
(HtmlExtract, page_text_extraction) consume the payload column as a
normal Arrow binary column.

Reference analog: kgw's archive extract stage (kgw/_shared/extract.py:
82-97) decompresses fetched dumps before the transform stage; read_warc
plays that role for crawl archives.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator, Optional, Sequence

import pyarrow as pa
import ray.data as rd

_CRLF = b"\r\n"


def _gunzip_all_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — member-per-record
    WARCs concatenate one gzip stream per record."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:  # truncated trailing member: stop rather than loop
            break
        data = d.unused_data.lstrip(b"\x00")
    return b"".join(out)


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record: ``warc_type``, ``url``,
    ``warc_date``, ``record_id``, ``content_type``, ``payload`` (bytes).
    Tolerant of leading noise between records (skips to the next
    ``WARC/`` magic); raises on a record missing Content-Length (the
    format requires it — without it record boundaries are undefined)."""
    pos = 0
    n = len(data)
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        if "content-length" not in headers:
            raise ValueError("WARC record without Content-Length")
        length = int(headers["content-length"])
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) < length:  # truncated shard tail: drop the partial
            return
        yield {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "record_id": headers.get("warc-record-id", ""),
            "content_type": headers.get("content-type", ""),
            "payload": payload,
        }
        pos = min(body_start + length, n)


def split_http_response(payload: bytes) -> tuple[str, bytes]:
    """Split an HTTP response record payload into (status_line, body) —
    response records carry the raw HTTP exchange, and downstream text
    extraction wants only the entity body."""
    if not payload.startswith(b"HTTP/"):
        return "", payload
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return payload.split(_CRLF, 1)[0].decode("ascii", "replace"), b""
    status = payload[: payload.find(_CRLF)].decode("ascii", "replace")
    return status, payload[sep + 4 :]


def read_warc(
    paths,
    *,
    record_types: Optional[Sequence[str]] = ("response",),
    split_http: bool = True,
) -> rd.Dataset:
    """Distributed WARC reader: one row per (filtered) record with columns
    ``(shard, url, warc_type, warc_date, content_type, http_status,
    payload)``. ``record_types=None`` keeps every record type;
    ``split_http=False`` keeps raw HTTP exchanges in ``payload``."""
    wanted = None if record_types is None else frozenset(record_types)
    files = rd.read_binary_files(paths, include_paths=True)

    def parse_files(batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {
            "shard": [],
            "url": [],
            "warc_type": [],
            "warc_date": [],
            "record_id": [],
            "content_type": [],
            "http_status": [],
            "payload": [],
        }
        for path, blob in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            data = bytes(blob)
            if data[:2] == b"\x1f\x8b":
                data = _gunzip_all_members(data)
            for rec in parse_warc_records(data):
                if wanted is not None and rec["warc_type"] not in wanted:
                    continue
                status, body = (
                    split_http_response(rec["payload"])
                    if split_http
                    else ("", rec["payload"])
                )
                rows["shard"].append(path)
                rows["url"].append(rec["url"])
                rows["warc_type"].append(rec["warc_type"])
                rows["warc_date"].append(rec["warc_date"])
                rows["record_id"].append(rec["record_id"])
                rows["content_type"].append(rec["content_type"])
                rows["http_status"].append(status)
                rows["payload"].append(body)
        return pa.table(
            {
                "shard": pa.array(rows["shard"], pa.string()),
                "url": pa.array(rows["url"], pa.string()),
                "warc_type": pa.array(rows["warc_type"], pa.string()),
                "warc_date": pa.array(rows["warc_date"], pa.string()),
                "record_id": pa.array(rows["record_id"], pa.string()),
                "content_type": pa.array(rows["content_type"], pa.string()),
                "http_status": pa.array(rows["http_status"], pa.string()),
                "payload": pa.array(rows["payload"], pa.binary()),
            }
        )

    return files.map_batches(parse_files, batch_format="pyarrow")


def write_warc_record(
    warc_type: str,
    url: str,
    payload: bytes,
    *,
    date: str = "2026-01-01T00:00:00Z",
    record_id: str = "<urn:uuid:0>",
    extra_headers: Optional[dict] = None,
) -> bytes:
    """Serialize one WARC/1.0 record (test fixture / round-trip support)."""
    headers = {
        "WARC-Type": warc_type,
        "WARC-Target-URI": url,
        "WARC-Date": date,
        "WARC-Record-ID": record_id,
        "Content-Length": str(len(payload)),
        **(extra_headers or {}),
    }
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers.items()
    )
    return head + _CRLF + payload + _CRLF + _CRLF


def gzip_member(record: bytes) -> bytes:
    """One gzip member per record — the Common Crawl .warc.gz layout that
    makes records independently seekable."""
    return gzip.compress(record)


def pages_from_warc(
    paths,
    *,
    record_types: Sequence[str] = ("response",),
) -> rd.Dataset:
    """Adapt WARC response records to the webkg pages schema
    ``(url, warc_ts, html, doc_id)`` so a crawl archive flows straight
    into the extract chain (``stages/extract.py:extract_batch`` →
    triples → edges). ``doc_id`` is a stable 63-bit blake2b of
    ``record_id|url`` — deterministic across runs and cluster layouts,
    and distinct even for writers that reuse record ids;
    ``warc_ts`` parses the ISO-8601 WARC-Date. All columns build
    vectorized except the per-record date parse (pandas to_datetime over
    the batch, not per row)."""
    import hashlib

    import numpy as np
    import pandas as pd

    recs = read_warc(paths, record_types=record_types, split_http=True)

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = [
            int.from_bytes(
                hashlib.blake2b(
                    f"{rid}|{url}".encode(), digest_size=8
                ).digest()[:8],
                "little",
            )
            >> 1
            for rid, url in zip(
                batch.column("record_id").to_pylist(),
                batch.column("url").to_pylist(),
            )
        ]
        ts = pd.to_datetime(
            pd.Series(batch.column("warc_date").to_pylist()),
            errors="coerce",
            utc=True,
            format="ISO8601",
        ).dt.tz_localize(None)
        return pa.table(
            {
                "url": batch.column("url"),
                "warc_ts": pa.array(ts.to_numpy(), pa.timestamp("us")),
                "html": batch.column("payload"),
                "doc_id": pa.array(np.array(ids, dtype=np.int64)),
            }
        )

    return recs.map_batches(to_pages, batch_format="pyarrow")
