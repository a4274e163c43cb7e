"""Query registry: every implemented operator/pipeline as a named callable
``fn(sf_dir) -> Dataset | DataFrame | pyarrow.Table`` plus (where SQL can
express it) a DuckDB oracle string over the same Parquet tables.

This is the correctness surface the driver checks (``__ray_entry__.py``):
column names are kept identical between the Ray result and the oracle SQL,
and float aggregates are rounded identically on both sides.
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa
import ray.data as rd

from kgw_ray.sources.readers import read_table
from kgw_ray.stages.triples import ENTITIES, ENTITY_TYPE, RELATIONS

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# SQL fragments shared by the flagship oracles
# ---------------------------------------------------------------------------

_ENT_SQL = ", ".join(f"'{w}'" for w in sorted(ENTITIES))
_REL_SQL = ", ".join(f"'{w}'" for w in sorted(RELATIONS))
_TYPE_CASE_TPL = (
    "CASE "
    + " ".join(
        "WHEN {col} = '%s' THEN '%s'" % (w, t) for w, t in sorted(ENTITY_TYPE.items())
    )
    + " ELSE 'code' END"
)

TRIPLES_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
win AS (
    SELECT doc_id, i, w[i] AS subj, w[i+1] AS pred, w[i+2] AS obj
    FROM toks, UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
)
SELECT doc_id, subj, pred, obj, CAST(i - 1 AS BIGINT) AS pos
FROM win
WHERE subj IN ({_ENT_SQL}) AND pred IN ({_REL_SQL}) AND obj IN ({_ENT_SQL})
"""

_URL_SQL = "'https://' || source || '.example.org/doc/' || lpad(CAST(doc_id AS VARCHAR), 8, '0')"


# ---------------------------------------------------------------------------
# Flagship web-KG pipeline (BASELINE.json north_star)
# ---------------------------------------------------------------------------


@register(
    "page_text_extraction",
    oracle=f"SELECT doc_id, {_URL_SQL} AS url, text FROM documents",
)
def q_page_text_extraction(sf_dir: str) -> rd.Dataset:
    """HTML→text extraction; byte-identical per url vs the source text.

    The oracle is the original ``documents.text`` — equality proves the
    per-row invariant from BASELINE.json input_hint.
    """
    from kgw_ray.pipelines.webkg import extracted_pages

    ds = extracted_pages(sf_dir)
    return ds.select_columns(["doc_id", "url", "extracted_text"]).rename_columns(
        {"extracted_text": "text"}
    )


@register("triple_mentions", oracle=TRIPLES_SQL)
def q_triple_mentions(sf_dir: str) -> rd.Dataset:
    """All (subj, pred, obj) mentions with doc + token-position provenance."""
    from kgw_ray.pipelines.webkg import triples_dataset

    return triples_dataset(sf_dir).select_columns(
        ["doc_id", "subj", "pred", "obj", "pos"]
    )


@register(
    "kg_edges",
    oracle=f"""
WITH tr AS ({TRIPLES_SQL})
SELECT 'E:' || subj AS source_id, 'E:' || obj AS target_id, pred AS type,
       '{{"n_obs":' || COUNT(*) || ',"first_doc":' || MIN(doc_id) || '}}' AS properties
FROM tr GROUP BY subj, pred, obj
""",
)
def q_kg_edges(sf_dir: str) -> rd.Dataset:
    """Deduplicated edge table of the unified graph IR (triple dedup +
    provenance merge; reference analog _oregano.py:226-237)."""
    from kgw_ray.pipelines.webkg import edges_from_triples, triples_dataset

    return edges_from_triples(triples_dataset(sf_dir))


@register(
    "kg_nodes",
    oracle=f"""
WITH tr AS ({TRIPLES_SQL}),
m AS (SELECT subj AS s FROM tr UNION ALL SELECT obj AS s FROM tr)
SELECT 'E:' || s AS id, {_TYPE_CASE_TPL.format(col='s')} AS type,
       '{{"surface":"' || s || '","n_mentions":' || COUNT(*) || '}}' AS properties
FROM m GROUP BY s
""",
)
def q_kg_nodes(sf_dir: str) -> rd.Dataset:
    """Node table of the unified graph IR: distinct entities + type +
    mention-count properties (reference node-map analog, transform.py:12-16)."""
    from kgw_ray.pipelines.webkg import nodes_from_triples, triples_dataset

    return nodes_from_triples(triples_dataset(sf_dir))
