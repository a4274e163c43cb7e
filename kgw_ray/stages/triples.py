"""(subj, pred, obj) triple extraction from extracted text.

The flagship analog of the reference's edge-map transforms — MonarchKG's
``subject/predicate/object`` projection IS the triple-extractor shape
(kgw/biomedicine/_monarchkg.py:152-186). Here triples come from open text via
a deterministic rule grammar (OpenIE-style pattern matching): a token
trigram ``ENTITY RELATION ENTITY`` yields the triple
``(tokens[i], tokens[i+1], tokens[i+2])``. Matches may overlap (each window
position is tested independently).

Stateless, vectorized-per-batch: tokenization is a single split per row,
window scan is numpy boolean algebra over the token stream — no Python loop
over tokens in the hot path. SQL-oracle-expressible (list indexing +
generate_series in DuckDB), which is what the correctness gate uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Deterministic rule lexicon over the synthetic web-text vocabulary.
RELATIONS = frozenset({"join", "merge", "group", "sort", "filter", "scan"})
ENTITIES = frozenset(
    {
        "customer",
        "part",
        "order",
        "line",
        "table",
        "column",
        "row",
        "key",
        "value",
        "data",
        "query",
        "window",
        "batch",
        "stream",
        "spark",
        "vector",
        "hash",
        "agg",
    }
)

# Entity categorization for node typing (graph materialize step).
ENTITY_TYPE = {
    **{w: "business" for w in ("customer", "part", "order", "line")},
    **{w: "data" for w in ("table", "column", "row", "key", "value", "data")},
    **{w: "exec" for w in ("query", "window", "batch", "stream")},
    **{w: "compute" for w in ("spark", "vector", "hash", "agg")},
}


def extract_triples_batch(batch: pa.Table, carry_url: bool = False) -> pa.Table:
    """pages/docs batch (doc_id, text or extracted_text) → triples batch.

    Output columns: doc_id:int64, subj:string, pred:string, obj:string,
    pos:int64 (token index of the subject — provenance within the doc).
    With ``carry_url=True`` (pass via ``fn_kwargs``) the input's ``url``
    column is repeated onto every emitted triple — page-level provenance
    for the carry-through edge build. Default False keeps the hot path
    two-column even though pages always have a url.

    Arrow-native hot path: tokenization (``split_pattern``), flattening and
    lexicon membership (``is_in``) stay in Arrow C space — the token
    strings never materialize as Python objects (measured 32→8ms per
    1250-doc batch vs the np.object_ version, and roughly half the heap
    traffic, which is what the 32-worker memory-bandwidth ceiling taxes).
    Only fixed-width int/bool numpy arrays (zero-copy views) carry the
    trigram window scan.
    """
    import pyarrow.compute as pc

    col = "extracted_text" if "extracted_text" in batch.column_names else "text"
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(flat)

    def _empty() -> pa.Table:
        cols = {
            "doc_id": pa.array([], pa.int64()),
            "subj": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "obj": pa.array([], pa.string()),
            "pos": pa.array([], pa.int64()),
        }
        if carry_url:
            cols["url"] = pa.array([], pa.string())
        return pa.table(cols)

    if n < 3:
        return _empty()
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    doc_of = doc_ids[parent]
    # token offset within its own document: flat index − first flat index
    # of the owning doc (null token lists — absent here — count as 0-length)
    lens = (
        pc.fill_null(pc.list_value_length(toks), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos_in_doc = np.arange(n, dtype=np.int64) - starts[parent]

    # dictionary-encode the token stream ONCE (one hash pass): lexicon
    # membership then runs over the tiny per-batch VOCABULARY (Heaps' law)
    # and fans back out through the int32 code array — replaces two is_in
    # hash passes over every token and three string-array takes with
    # integer indexing + takes from the small dictionary. Measured ~35%
    # off this stage's per-doc cost, which is heap-bandwidth the 32-worker
    # ceiling taxes directly.
    denc = pc.dictionary_encode(flat)
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = denc.dictionary
    ent_v = pc.is_in(vocab, value_set=_ENT_SET).to_numpy(zero_copy_only=False)
    rel_v = pc.is_in(vocab, value_set=_REL_SET).to_numpy(zero_copy_only=False)
    is_ent = ent_v[codes]
    is_rel = rel_v[codes]
    # trigram windows fully inside one document: doc_of[i] == doc_of[i+2]
    ok = is_ent[:-2] & is_rel[1:-1] & is_ent[2:] & (doc_of[:-2] == doc_of[2:])
    idx = np.nonzero(ok)[0]
    cols = {
        "doc_id": pa.array(doc_of[idx], pa.int64()),
        "subj": pc.take(vocab, pa.array(codes[idx])),
        "pred": pc.take(vocab, pa.array(codes[idx + 1])),
        "obj": pc.take(vocab, pa.array(codes[idx + 2])),
        "pos": pa.array(pos_in_doc[idx], pa.int64()),
    }
    if carry_url:
        url = batch.column("url")
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        cols["url"] = pc.take(url, pa.array(parent[idx]))
    return pa.table(cols)


_ENT_SET = pa.array(sorted(ENTITIES), pa.string())
_REL_SET = pa.array(sorted(RELATIONS), pa.string())
