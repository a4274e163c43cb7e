"""Export sinks over the unified graph IR (SURVEY.md §2.6; reference
kgw/_shared/load.py).

Every sink reads the hub (nodes/edges Datasets with schema
``(id,type,properties)`` / ``(source_id,target_id,type,properties)``) and
writes the reference's output formats:

- ``write_statistics`` — statistics.json (load.py:10-81)
- ``write_csv_export`` — kg_nodes.csv / kg_edges.csv, excel dialect,
  QUOTE_ALL, header row (load.py:294-315)
- ``write_jsonl_export`` — one JSON object per row, properties nested
  (load.py:318-364)
- ``write_graphml`` — key decls + nodes + edges, XML-escaped, sequential
  edge ids (load.py:367-535)
- ``write_metta_repr1/2/3`` — S-expression exports (load.py:548-842)
- ``write_sql_dump`` — CREATE TABLE + INSERT statements (load.py:286-291)

Physical strategy: **render-parallel, assemble-serial**. Row formatting runs
distributed in ``map_batches`` (each block → one rendered UTF-8 fragment);
the driver streams fragments IN ORDER to the single output file with O(block)
memory, assigning global sequential counters (GraphML edge ids, MeTTa
repr2/3 ids) from a running offset as it goes — the "single writer owns the
counter" strategy for order-dependent formats (SURVEY.md §7 hard part 1/3).
All files are written atomically (temp + rename), mirroring the reference's
``temp_output_path`` (kgw/_shared/tasks.py:13-28).
"""

from __future__ import annotations

import csv
import io
import json
import os
from typing import Callable, Iterator
from xml.sax import saxutils

import pyarrow as pa
import ray.data as rd

from kgw_ray.functions.scalars import clean, json_dumps, json_loads


def _atomic_write(path: str, chunks: Iterator[str]) -> None:
    tmp = f"{path}.partial"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "w", encoding="utf-8", newline="") as f:
        for c in chunks:
            f.write(c)
    os.replace(tmp, path)


def _fragments(ds: rd.Dataset, render: Callable[[pa.Table], str]) -> rd.Dataset:
    """Distributed render: each block → one fragment string row."""

    def to_frag(batch: pa.Table) -> pa.Table:
        return pa.table({"frag": pa.array([render(batch)], pa.large_string())})

    return ds.map_batches(to_frag, batch_format="pyarrow")


def _stream_fragments(frags: rd.Dataset) -> Iterator[str]:
    for b in frags.iter_batches(batch_format="pyarrow", batch_size=1):
        for s in b.column("frag").to_pylist():
            yield s


# ---------------------------------------------------------------------------
# statistics.json
# ---------------------------------------------------------------------------


def write_statistics(nodes: rd.Dataset, edges: rd.Dataset, path: str) -> dict:
    """statistics.json with total + per-type counts (reference shape,
    load.py:69-76)."""
    from kgw_ray.stages.graph import statistics_dict

    stats = statistics_dict(nodes, edges)
    _atomic_write(path, iter([json.dumps(stats, indent=2)]))
    return stats


# ---------------------------------------------------------------------------
# CSV (excel dialect, QUOTE_ALL, header — load.py:294-315)
# ---------------------------------------------------------------------------


def _csv_fragment(batch: pa.Table) -> str:
    buf = io.StringIO()
    w = csv.writer(buf, dialect="excel", quoting=csv.QUOTE_ALL)
    cols = [batch.column(c).to_pylist() for c in batch.column_names]
    for row in zip(*cols):
        w.writerow(row)
    return buf.getvalue()


def write_csv_export(ds: rd.Dataset, path: str) -> None:
    """Single CSV file: header + QUOTE_ALL rows; parallel per-block render,
    ordered assembly."""
    header_cols = ds.schema().names
    buf = io.StringIO()
    csv.writer(buf, dialect="excel", quoting=csv.QUOTE_ALL).writerow(header_cols)
    frags = _fragments(ds, _csv_fragment)

    def chunks():
        yield buf.getvalue()
        yield from _stream_fragments(frags)

    _atomic_write(path, chunks())


# ---------------------------------------------------------------------------
# JSONL (properties nested — load.py:318-364)
# ---------------------------------------------------------------------------


def _jsonl_fragment(batch: pa.Table) -> str:
    names = batch.column_names
    cols = [batch.column(c).to_pylist() for c in names]
    out = []
    for row in zip(*cols):
        d = dict(zip(names, row))
        if "properties" in d and isinstance(d["properties"], str):
            d["properties"] = json_loads(d["properties"])
        out.append(json_dumps(d))
    return "\n".join(out) + "\n" if out else ""


def write_jsonl_export(ds: rd.Dataset, path: str) -> None:
    _atomic_write(path, _stream_fragments(_fragments(ds, _jsonl_fragment)))


# ---------------------------------------------------------------------------
# GraphML (load.py:367-535)
# ---------------------------------------------------------------------------

_GRAPHML_TYPES = {bool: "boolean", int: "long", float: "double", str: "string"}


def _graphml_type(v) -> str:
    # bool before int: bool is an int subclass (reference load.py:394-402)
    if isinstance(v, bool):
        return "boolean"
    for t, name in _GRAPHML_TYPES.items():
        if isinstance(v, t):
            return name
    return "string"


def _collect_attr_schema(ds: rd.Dataset, owner: str) -> list[tuple[str, str, str]]:
    """Pass 1: union of property keys + inferred type, first-seen order
    (reference load.py:404-459). Distributed: each block emits its local
    (key, type, first_ordinal) set; driver merges by min ordinal."""

    def local(batch: pa.Table) -> pa.Table:
        seen: dict[str, tuple[str, int]] = {}
        base = 0
        for props in batch.column("properties").to_pylist():
            if not props:
                base += 1
                continue
            d = json_loads(props)
            for i, (k, v) in enumerate(d.items()):
                if k not in seen:
                    seen[k] = (_graphml_type(v), base * 1000 + i)
            base += 1
        return pa.table(
            {
                "key": pa.array(list(seen.keys()), pa.string()),
                "gtype": pa.array([v[0] for v in seen.values()], pa.string()),
                "ord": pa.array([v[1] for v in seen.values()], pa.int64()),
            }
        )

    merged: dict[str, tuple[str, int]] = {}
    for b in ds.map_batches(local, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for k, t, o in zip(
            b.column("key").to_pylist(),
            b.column("gtype").to_pylist(),
            b.column("ord").to_pylist(),
        ):
            if k not in merged or o < merged[k][1]:
                merged[k] = (t, o)
    ordered = sorted(merged.items(), key=lambda kv: kv[1][1])
    return [(k, owner, t) for k, (t, _) in ordered]


def _esc(s) -> str:
    return saxutils.escape(str(s))


def _graphml_value(v) -> str:
    if isinstance(v, (list, dict)):
        return _esc(json_dumps(v))  # compound → JSON string (load.py:376-378)
    if isinstance(v, bool):
        return "true" if v else "false"
    return _esc(v)


def write_graphml(nodes: rd.Dataset, edges: rd.Dataset, path: str) -> None:
    """GraphML export: 2 passes (attribute schema, then streamed rendering
    with a single-writer sequential edge counter — load.py:503)."""
    node_attrs = _collect_attr_schema(nodes, "node")
    edge_attrs = _collect_attr_schema(edges, "edge")

    def node_frag(batch: pa.Table) -> str:
        out = []
        for nid, ntype, props in zip(
            batch.column("id").to_pylist(),
            batch.column("type").to_pylist(),
            batch.column("properties").to_pylist(),
        ):
            out.append(f'    <node id="{_esc(nid)}">')
            out.append(f'      <data key="node_type">{_esc(ntype)}</data>')
            if props:
                for k, v in json_loads(props).items():
                    out.append(
                        f'      <data key="node_{_esc(k)}">{_graphml_value(v)}</data>'
                    )
            out.append("    </node>")
        return "\n".join(out) + "\n" if out else ""

    # edges carry a per-row placeholder; the driver rewrites ids in order
    def edge_frag(batch: pa.Table) -> str:
        out = []
        for s, t, etype, props in zip(
            batch.column("source_id").to_pylist(),
            batch.column("target_id").to_pylist(),
            batch.column("type").to_pylist(),
            batch.column("properties").to_pylist(),
        ):
            out.append(
                f'    <edge id="\x00" source="{_esc(s)}" target="{_esc(t)}">'
            )
            out.append(f'      <data key="edge_type">{_esc(etype)}</data>')
            if props:
                for k, v in json_loads(props).items():
                    out.append(
                        f'      <data key="edge_{_esc(k)}">{_graphml_value(v)}</data>'
                    )
            out.append("    </edge>")
        return "\n".join(out) + "\n" if out else ""

    def chunks():
        yield '<?xml version="1.0" encoding="UTF-8"?>\n'
        yield (
            '<graphml xmlns="http://graphml.graphdrawing.org/xmlns" '
            'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
            'xsi:schemaLocation="http://graphml.graphdrawing.org/xmlns '
            "http://graphml.graphdrawing.org/xmlns/1.0/graphml.xsd\">\n"
        )
        yield '  <key id="node_type" for="node" attr.name="type" attr.type="string"/>\n'
        yield '  <key id="edge_type" for="edge" attr.name="type" attr.type="string"/>\n'
        for k, owner, t in node_attrs:
            yield (
                f'  <key id="node_{_esc(k)}" for="node" attr.name="{_esc(k)}" '
                f'attr.type="{t}"/>\n'
            )
        for k, owner, t in edge_attrs:
            yield (
                f'  <key id="edge_{_esc(k)}" for="edge" attr.name="{_esc(k)}" '
                f'attr.type="{t}"/>\n'
            )
        yield '  <graph edgedefault="directed">\n'
        yield from _stream_fragments(_fragments(nodes, node_frag))
        # single-writer counter: replace placeholders in order
        counter = 0
        for frag in _stream_fragments(_fragments(edges, edge_frag)):
            parts = frag.split("\x00")
            buf = [parts[0]]
            for p in parts[1:]:
                buf.append(f"e{counter}")
                buf.append(p)
                counter += 1
            yield "".join(buf)
        yield "  </graph>\n</graphml>\n"

    _atomic_write(path, chunks())


# ---------------------------------------------------------------------------
# MeTTa exports (load.py:548-842)
# ---------------------------------------------------------------------------


def _distinct_types(ds: rd.Dataset) -> list[str]:
    return sorted(ds.unique("type"))


def write_metta_repr1(nodes: rd.Dataset, edges: rd.Dataset, path: str) -> None:
    """repr1 "spo": type decls, node type atoms, (s p o) triples
    (load.py:548-607)."""
    ntypes = _distinct_types(nodes)

    def node_frag(batch: pa.Table) -> str:
        return (
            "".join(
                f"(: {clean(i)} {clean(t)})\n"
                for i, t in zip(
                    batch.column("id").to_pylist(), batch.column("type").to_pylist()
                )
            )
        )

    def edge_frag(batch: pa.Table) -> str:
        return (
            "".join(
                f"({clean(s)} {clean(t)} {clean(o)})\n"
                for s, t, o in zip(
                    batch.column("source_id").to_pylist(),
                    batch.column("type").to_pylist(),
                    batch.column("target_id").to_pylist(),
                )
            )
        )

    def chunks():
        for t in ntypes:
            yield f"(: {clean(t)} NodeType)\n"
        yield from _stream_fragments(_fragments(nodes, node_frag))
        yield from _stream_fragments(_fragments(edges, edge_frag))

    _atomic_write(path, chunks())


def write_metta_repr2(nodes: rd.Dataset, edges: rd.Dataset, path: str) -> None:
    """repr2: + (has_property id (k v)) lines and synthetic edge ids e{i}
    assigned by the single writer (load.py:610-716)."""

    def node_frag(batch: pa.Table) -> str:
        out = []
        for nid, ntype, props in zip(
            batch.column("id").to_pylist(),
            batch.column("type").to_pylist(),
            batch.column("properties").to_pylist(),
        ):
            out.append(f"(: {clean(nid)} {clean(ntype)})")
            if props:
                for k, v in json_loads(props).items():
                    out.append(f"(has_property {clean(nid)} ({clean(k)} {clean(v)}))")
        return "\n".join(out) + "\n" if out else ""

    def edge_frag(batch: pa.Table) -> str:
        out = []
        for s, t, o, props in zip(
            batch.column("source_id").to_pylist(),
            batch.column("type").to_pylist(),
            batch.column("target_id").to_pylist(),
            batch.column("properties").to_pylist(),
        ):
            out.append(f"(: \x00 {clean(t)})")
            out.append(f"(source \x00 {clean(s)})")
            out.append(f"(target \x00 {clean(o)})")
            if props:
                for k, v in json_loads(props).items():
                    out.append(f"(has_property \x00 ({clean(k)} {clean(v)}))")
            out.append("\x01")  # end-of-edge marker
        return "\n".join(out) + "\n" if out else ""

    def chunks():
        yield from _stream_fragments(_fragments(nodes, node_frag))
        counter = 0
        for frag in _stream_fragments(_fragments(edges, edge_frag)):
            # one edge id per \x01-delimited segment; all \x00 in a segment
            # share the same id
            segs = frag.split("\x01")
            out = []
            for seg in segs[:-1]:
                out.append(seg.replace("\x00", f'"e{counter}"').rstrip("\n"))
                counter += 1
            tailing = segs[-1]
            out.append(tailing.lstrip("\n"))
            yield "\n".join(s for s in out if s or s == "")

    _atomic_write(path, chunks())


def write_metta_repr3(nodes: rd.Dataset, edges: rd.Dataset, path: str) -> None:
    """repr3: fully expanded nested-property S-expressions with global
    monotone numeric ids (load.py:719-842); nesting walker ≤ 5 list levels."""

    def expand(eid: int, d: dict) -> list[str]:
        out = []

        def walk(prefix: str, v, depth: int = 0):
            if isinstance(v, dict):
                for k, vv in v.items():
                    walk(f"{prefix} {clean(k)}", vv, depth)
            elif isinstance(v, list) and depth < 5:
                for i, vv in enumerate(v):
                    walk(f"{prefix} {i}", vv, depth + 1)
            else:
                out.append(f"({eid}{prefix} {clean(v)})")

        walk("", d)
        return out

    def node_frag(batch: pa.Table) -> str:
        out = []
        for nid, ntype, props in zip(
            batch.column("id").to_pylist(),
            batch.column("type").to_pylist(),
            batch.column("properties").to_pylist(),
        ):
            out.append(f"(node \x00 {clean(nid)} {clean(ntype)})")
            if props:
                for k, v in json_loads(props).items():
                    out.append(f"(prop \x00 {clean(k)} {clean(json_dumps(v)) if isinstance(v,(list,dict)) else clean(v)})")
            out.append("\x01")
        return "\n".join(out) + "\n" if out else ""

    def edge_frag(batch: pa.Table) -> str:
        out = []
        for s, t, o, props in zip(
            batch.column("source_id").to_pylist(),
            batch.column("type").to_pylist(),
            batch.column("target_id").to_pylist(),
            batch.column("properties").to_pylist(),
        ):
            out.append(f"(edge \x00 {clean(s)} {clean(t)} {clean(o)})")
            if props:
                for k, v in json_loads(props).items():
                    out.append(f"(prop \x00 {clean(k)} {clean(json_dumps(v)) if isinstance(v,(list,dict)) else clean(v)})")
            out.append("\x01")
        return "\n".join(out) + "\n" if out else ""

    def numbered(frag_ds: rd.Dataset, start: int):
        counter = start
        for frag in _stream_fragments(frag_ds):
            segs = frag.split("\x01")
            out = []
            for seg in segs[:-1]:
                out.append(seg.replace("\x00", str(counter)).rstrip("\n"))
                counter += 1
            tail = segs[-1].lstrip("\n")
            out.append(tail)
            yield "\n".join(s for s in out if s), counter

    def chunks():
        counter = 0
        for text, counter2 in numbered(_fragments(nodes, node_frag), 0):
            counter = counter2
            if text:
                yield text + "\n"
        for text, _ in numbered(_fragments(edges, edge_frag), counter):
            if text:
                yield text + "\n"

    _atomic_write(path, chunks())


# ---------------------------------------------------------------------------
# SQL dump (load.py:286-291 via conn.iterdump())
# ---------------------------------------------------------------------------

_SCHEMA_SQL = """BEGIN TRANSACTION;
CREATE TABLE nodes (
    id TEXT PRIMARY KEY,
    type TEXT NOT NULL,
    properties TEXT
);
CREATE TABLE edges (
    source_id TEXT,
    target_id TEXT,
    type TEXT NOT NULL,
    properties TEXT,
    FOREIGN KEY (source_id) REFERENCES nodes (id),
    FOREIGN KEY (target_id) REFERENCES nodes (id)
);
"""


def _sql_quote(v) -> str:
    if v is None:
        return "NULL"
    return "'" + str(v).replace("'", "''") + "'"


def write_sql_dump(nodes: rd.Dataset, edges: rd.Dataset, path: str) -> None:
    """SQLite-compatible dump: the reference's schema (transform.py:10-30)
    + INSERT per row, indexes, COMMIT."""

    def node_frag(batch: pa.Table) -> str:
        return "".join(
            f"INSERT INTO nodes VALUES({_sql_quote(i)},{_sql_quote(t)},{_sql_quote(p)});\n"
            for i, t, p in zip(
                batch.column("id").to_pylist(),
                batch.column("type").to_pylist(),
                batch.column("properties").to_pylist(),
            )
        )

    def edge_frag(batch: pa.Table) -> str:
        return "".join(
            f"INSERT INTO edges VALUES({_sql_quote(s)},{_sql_quote(t)},"
            f"{_sql_quote(ty)},{_sql_quote(p)});\n"
            for s, t, ty, p in zip(
                batch.column("source_id").to_pylist(),
                batch.column("target_id").to_pylist(),
                batch.column("type").to_pylist(),
                batch.column("properties").to_pylist(),
            )
        )

    def chunks():
        yield _SCHEMA_SQL
        yield from _stream_fragments(_fragments(nodes, node_frag))
        yield from _stream_fragments(_fragments(edges, edge_frag))
        yield "CREATE INDEX idx_edges_source ON edges (source_id);\n"
        yield "CREATE INDEX idx_edges_target ON edges (target_id);\n"
        yield "COMMIT;\n"

    _atomic_write(path, chunks())


# ---------------------------------------------------------------------------
# Parquet hub writers (the scale-native sink)
# ---------------------------------------------------------------------------


def _bucket_of(ids, num_buckets: int):
    """Deterministic hash bucket of a string-id column (stable across
    processes — NOT Python hash())."""
    import pandas as pd

    h = pd.util.hash_array(
        ids.to_numpy(zero_copy_only=False), hash_key="kgw_ray_bucket00"
    )
    return (h % num_buckets).astype("int64")


def write_hub(
    nodes: rd.Dataset,
    edges: rd.Dataset,
    out_dir: str,
    *,
    num_buckets: int = 0,
) -> None:
    """Partitioned Parquet hub — the kg.sqlite analog (transform.py:10-30).

    With ``num_buckets`` > 0, edges are written under
    ``edges/bucket=<hash(source_id) % B>/`` — the reference's
    ``idx_edges_source`` B-tree analog (transform.py:27-28): an adjacency
    lookup then reads ONE bucket directory instead of the whole table
    (``read_adjacency``). Nodes are bucketed by id the same way. At 100 TB,
    B is sized so one bucket ≈ a few GB (e.g. B=4096)."""
    if num_buckets <= 0:
        nodes.write_parquet(os.path.join(out_dir, "nodes"))
        edges.write_parquet(os.path.join(out_dir, "edges"))
        return

    def tag(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "bucket", pa.array(_bucket_of(batch.column(col), num_buckets))
            )

        return fn

    nodes.map_batches(tag("id"), batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "nodes"), partition_cols=["bucket"]
    )
    edges.map_batches(tag("source_id"), batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "edges"), partition_cols=["bucket"]
    )


def read_adjacency(out_dir: str, node_id: str, *, num_buckets: int) -> rd.Dataset:
    """Out-edges of ``node_id`` reading ONLY its hash bucket (partition
    pruning at the path level — the point of the bucketed hub layout)."""
    import pandas as pd
    import pyarrow.compute as pc
    import numpy as np

    # modulo on the ARRAY: a numpy uint64 SCALAR % python int promotes to
    # float64 and corrupts the bucket number
    b = int(
        (
            pd.util.hash_array(
                np.array([node_id], dtype=object), hash_key="kgw_ray_bucket00"
            )
            % num_buckets
        )[0]
    )
    ds = rd.read_parquet(os.path.join(out_dir, "edges", f"bucket={b}"))
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["source_id"], node_id)),
        batch_format="pyarrow",
    )
