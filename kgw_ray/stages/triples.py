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
    """
    col = "extracted_text" if "extracted_text" in batch.column_names else "text"
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column(col).to_pylist()

    # flatten all tokens of the batch into one array with doc boundaries
    tok_lists = [t.split(" ") if t else [] for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    if lens.sum() == 0:
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
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists])
    doc_of = np.repeat(doc_ids, lens)
    # token offset within its own document
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos_in_doc = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lens)

    is_ent = np.isin(flat, _ENT_ARR)
    is_rel = np.isin(flat, _REL_ARR)
    n = len(flat)
    if n < 3:
        ok = np.zeros(0, dtype=bool)
        idx = np.nonzero(ok)[0]
    else:
        # trigram windows fully inside one document: doc_of[i] == doc_of[i+2]
        ok = is_ent[:-2] & is_rel[1:-1] & is_ent[2:] & (doc_of[:-2] == doc_of[2:])
        idx = np.nonzero(ok)[0]
    cols = {
        "doc_id": pa.array(doc_of[idx], pa.int64()),
        "subj": pa.array(flat[idx], pa.string()),
        "pred": pa.array(flat[idx + 1], pa.string()),
        "obj": pa.array(flat[idx + 2], pa.string()),
        "pos": pa.array(pos_in_doc[idx], pa.int64()),
    }
    if carry_url:
        urls = np.repeat(
            batch.column("url").to_numpy(zero_copy_only=False), lens
        )
        cols["url"] = pa.array(urls[idx], pa.string())
    return pa.table(cols)


_ENT_ARR = np.asarray(sorted(ENTITIES), dtype=object)
_REL_ARR = np.asarray(sorted(RELATIONS), dtype=object)
