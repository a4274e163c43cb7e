"""File sources beyond Parquet (SURVEY.md §2.1): TSV/CSV readers, JSON
document readers, archive decompression, checksum validation.

Reference equivalents: csv streaming readers with header-index projection
(kgw/biomedicine/_monarchkg.py:125-149, _pharmebinet.py:148-166 — very wide
records), whole-file orjson reads (kgw/_shared/transform.py:4-7), bz2/zip/
tar.gz decompression (kgw/_shared/extract.py:82-97), MD5/SHA256 validation
(extract.py:203-214).

Scale notes: TSV/CSV reads are native ``ray.data.read_csv`` with pushed-down
column projection and a raised block size for wide records; archives are
``read_binary_files`` + a decompress ``flat_map``-shaped batch fn (one
archive may fan out to many member files); checksums are a stateless
``map_batches``.
"""

from __future__ import annotations

import bz2
import gzip
import hashlib
import io
import tarfile
import zipfile
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data as rd

from kgw_ray.functions.scalars import filter_informative, json_dumps, json_loads


def read_tsv(
    paths,
    *,
    columns: Optional[Sequence[str]] = None,
    delimiter: str = "\t",
    block_size: int = 64 << 20,
) -> rd.Dataset:
    """TSV/CSV reader with projection; large ``block_size`` accommodates very
    wide records (the reference raises csv.field_size_limit to sys.maxsize
    for PharMeBINet, _pharmebinet.py:149)."""
    ds = rd.read_csv(
        paths,
        parse_options=pacsv.ParseOptions(delimiter=delimiter),
        read_options=pacsv.ReadOptions(block_size=block_size),
    )
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds


def read_json_documents(paths, *, records_key: Optional[str] = None) -> rd.Dataset:
    """Whole-file JSON reader: each file is ONE JSON document (the reference
    shape, transform.py:4-7 — not JSONL). Emits one row per record with the
    record re-serialized as a canonical JSON string column ``record``.

    ``records_key``: if given, the document is an object and its ``records_key``
    value is the list of records; otherwise the document itself must be a list.
    """
    files = rd.read_binary_files(paths, include_paths=True)

    def explode(batch: pa.Table) -> pa.Table:
        out_path, out_rec = [], []
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            doc = json_loads(data)
            records = doc[records_key] if records_key else doc
            for r in records:
                out_path.append(path)
                out_rec.append(json_dumps(r))
        return pa.table(
            {
                "path": pa.array(out_path, pa.string()),
                "record": pa.array(out_rec, pa.large_string()),
            }
        )

    return files.map_batches(explode, batch_format="pyarrow")


def _is_bz2(data: bytes) -> bool:
    return data[:3] == b"BZh"


def _is_gzip(data: bytes) -> bool:
    return data[:2] == b"\x1f\x8b"


def read_archive_members(paths) -> rd.Dataset:
    """Decompress bz2 / gzip / zip / tar.gz binary files into one row per
    member file: (archive, member, bytes). Single-stream formats (bz2, gz)
    yield one member named after the archive sans suffix."""
    files = rd.read_binary_files(paths, include_paths=True)

    def explode(batch: pa.Table) -> pa.Table:
        a_out, m_out, b_out = [], [], []

        def add(a, m, b):
            a_out.append(a)
            m_out.append(m)
            b_out.append(b)

        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            lower = path.lower()
            # NOTE: ray.data.read_binary_files auto-decompresses single-stream
            # .bz2/.gz via Arrow's extension inference, so by the time bytes
            # reach this fn a ".tar.gz" holds plain tar and a ".bz2" holds
            # the decompressed payload; only containers need unpacking here.
            if lower.endswith((".tar.gz", ".tgz", ".tar.bz2", ".tar")):
                with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
                    for m in tf.getmembers():
                        if m.isfile():
                            add(path, m.name, tf.extractfile(m).read())
            elif lower.endswith(".zip"):
                with zipfile.ZipFile(io.BytesIO(data)) as zf:
                    for name in zf.namelist():
                        if not name.endswith("/"):
                            add(path, name, zf.read(name))
            elif lower.endswith(".bz2"):
                name = path.rsplit("/", 1)[-1][: -len(".bz2")]
                add(path, name, data if not _is_bz2(data) else bz2.decompress(data))
            elif lower.endswith(".gz"):
                name = path.rsplit("/", 1)[-1][: -len(".gz")]
                add(path, name, data if not _is_gzip(data) else gzip.decompress(data))
            else:
                add(path, path.rsplit("/", 1)[-1], data)
        return pa.table(
            {
                "archive": pa.array(a_out, pa.string()),
                "member": pa.array(m_out, pa.string()),
                "bytes": pa.array(b_out, pa.large_binary()),
            }
        )

    return files.map_batches(explode, batch_format="pyarrow")


def checksum_files(paths) -> rd.Dataset:
    """Whole-file MD5 + SHA256 digests (reference extract.py:203-214)."""
    files = rd.read_binary_files(paths, include_paths=True)

    def digest(batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        return pa.table(
            {
                "path": batch.column("path"),
                "md5": pa.array([hashlib.md5(d).hexdigest() for d in data]),
                "sha256": pa.array([hashlib.sha256(d).hexdigest() for d in data]),
                "n_bytes": pa.array([len(d) for d in data], pa.int64()),
            }
        )

    return files.map_batches(digest, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Generic adapter normalizers (the per-project projection maps, §2.2)
# ---------------------------------------------------------------------------


def json_record_nodes(
    records: rd.Dataset,
    *,
    id_key: str,
    type_key: str,
    skip_keys: Sequence[str] = (),
    default_type: str = "record",
) -> rd.Dataset:
    """JSON records → IR node rows, replicating the reference adapter
    semantics (_hald.py:79-108): ``id_key``→id (str-coerced), ``type_key``→
    type, every other key → properties if informative; ``skip_keys``
    dropped."""
    skip = set(skip_keys) | {id_key, type_key}

    def project(batch: pa.Table) -> pa.Table:
        ids, types, props = [], [], []
        for rec in batch.column("record").to_pylist():
            d = json_loads(rec)
            rid = d.get(id_key)
            if rid is None:
                continue  # null id = uninformative record, dropped (not "None")
            t = d.get(type_key)
            ids.append(str(rid))
            # a JSON null type falls back to default_type instead of the
            # literal string "None" (d.get's default only covers MISSING)
            types.append(str(t) if t is not None else default_type)
            props.append(
                json_dumps(
                    filter_informative({k: v for k, v in d.items() if k not in skip})
                )
            )
        return pa.table(
            {
                "id": pa.array(ids, pa.string()),
                "type": pa.array(types, pa.string()),
                "properties": pa.array(props, pa.string()),
            }
        )

    return records.map_batches(project, batch_format="pyarrow")


def tsv_edges(
    rows: rd.Dataset,
    *,
    source_col: str,
    target_col: str,
    type_col: str,
    property_cols: Optional[Sequence[str]] = None,
) -> rd.Dataset:
    """Tabular rows → IR edge rows (the MonarchKG subject/predicate/object
    projection, _monarchkg.py:152-186): named columns → triple, remaining
    (or listed) columns → informative-filtered properties."""

    def project(batch: pa.Table) -> pa.Table:
        names = batch.column_names
        pcols = (
            list(property_cols)
            if property_cols is not None
            else [c for c in names if c not in (source_col, target_col, type_col)]
        )
        cols = {c: batch.column(c).to_pylist() for c in set([source_col, target_col, type_col] + pcols)}
        n = batch.num_rows
        src, tgt, typ, props = [], [], [], []
        for i in range(n):
            s, t, ty = cols[source_col][i], cols[target_col][i], cols[type_col][i]
            if s is None or t is None or ty is None:
                continue  # null triple member = uninformative row, dropped
            src.append(str(s))
            tgt.append(str(t))
            typ.append(str(ty))
            props.append(
                json_dumps(filter_informative({c: cols[c][i] for c in pcols}))
            )
        return pa.table(
            {
                "source_id": pa.array(src, pa.string()),
                "target_id": pa.array(tgt, pa.string()),
                "type": pa.array(typ, pa.string()),
                "properties": pa.array(props, pa.string()),
            }
        )

    return rows.map_batches(project, batch_format="pyarrow")
