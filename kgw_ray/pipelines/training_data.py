"""Training-data pipeline operators over ``documents`` / ``embeddings``:
dedup (exact / MinHash-LSH / SimHash / embedding-cosine), similarity search
(brute-force + IVF), text analysis (tokens / quality / lang-ID /
fingerprint), multimodal plumbing.

Each public function is a registry query ``fn(sf_dir) -> Dataset | Table``;
SQL-expressible ones have a DuckDB oracle string alongside (identical column
names + identical rounding — the driver hashes values).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from kgw_ray.sources.readers import read_table


def _docs(sf_dir: str, cols=("doc_id", "text")) -> rd.Dataset:
    return read_table(sf_dir, "documents", columns=list(cols))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def text_token_stats(sf_dir: str) -> rd.Dataset:
    from kgw_ray.stages.textstats import token_stats_batch

    return _docs(sf_dir).map_batches(token_stats_batch, batch_format="pyarrow")


def text_quality(sf_dir: str) -> rd.Dataset:
    from kgw_ray.stages.textstats import quality_stats_batch

    return _docs(sf_dir).map_batches(quality_stats_batch, batch_format="pyarrow")


def text_lang_id(sf_dir: str) -> rd.Dataset:
    """Heuristic language ID (task map with per-process singleton profiles;
    rows-only check + accuracy test)."""
    from kgw_ray.stages.textstats import lang_id_batch

    return _docs(sf_dir).map_batches(lang_id_batch, batch_format="pyarrow")


def text_fingerprint(sf_dir: str) -> rd.Dataset:
    from kgw_ray.stages.textstats import fingerprint_batch

    ds = _docs(sf_dir).map_batches(fingerprint_batch, batch_format="pyarrow")
    # uint64 fingerprint → decimal string so pandas/duckdb canon agree
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.set_column(
            t.column_names.index("fingerprint"),
            "fingerprint",
            pc.cast(t["fingerprint"], pa.string()),
        ),
        batch_format="pyarrow",
    )


FINGERPRINT_MD5_SQL = "SELECT doc_id, md5(text) AS content_md5 FROM documents"


def text_content_md5(sf_dir: str) -> rd.Dataset:
    """Exact-dedup content hash only (oracle: DuckDB md5)."""
    from kgw_ray.stages.textstats import fingerprint_batch

    return (
        _docs(sf_dir)
        .map_batches(fingerprint_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "content_md5"])
    )


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

EXACT_DEDUP_SQL = """
SELECT MIN(doc_id) AS doc_id, md5(text) AS content_md5
FROM documents GROUP BY text
"""


def dedup_exact(sf_dir: str) -> rd.Dataset:
    from kgw_ray.stages.dedup import exact_dedup_keep

    return exact_dedup_keep(_docs(sf_dir))


def dedup_minhash_lsh(sf_dir: str) -> rd.Dataset:
    """Near-dup survivors via MinHash-LSH → Jaccard ≥ 0.5 → components.

    Rows-only driver check; exactness is covered by the brute-force-Jaccard
    comparison test (tests/test_training_data.py).
    """
    from kgw_ray.stages.dedup import minhash_dedup_keep

    return minhash_dedup_keep(_docs(sf_dir), threshold=0.5)


def dedup_simhash_pairs(sf_dir: str) -> rd.Dataset:
    """SimHash near-dup candidate pairs (Hamming ≤ 3), exact-verified."""
    from kgw_ray.stages.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_docs(sf_dir))


# Pair membership only: margins vs the threshold are ≥5e-4 on this data, so
# the set is stable across numpy-f64 vs DuckDB float paths; the rounded
# cosine VALUE is not hash-stable (engines differ at ~1e-7) and is excluded.
EMBED_NEAR_DUP_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
"""


def dedup_embedding_pairs(sf_dir: str) -> rd.Dataset:
    """Exact embedding-cosine near-dup pairs (cos ≥ 0.4); matmul vs the
    broadcast matrix per batch — DuckDB cross-join oracle."""
    from kgw_ray.stages.dedup import embedding_near_dup_pairs

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dup_pairs(emb, threshold=0.4).select_columns(["a", "b"])


def dedup_embedding_pairs_ivf(sf_dir: str) -> rd.Dataset:
    """IVF-bucketed near-dup pairs — the reduced-recall scale path."""
    from kgw_ray.stages.similarity import ivf_near_dup_pairs

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_near_dup_pairs(emb, threshold=0.4)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_N_QUERIES = 4
_TOPK = 10

# rank/membership only — float cosine excluded for hash stability (see above);
# rank margins on this data are ≥2e-4, far above cross-engine float error.
ANN_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES}),
s AS (
    SELECT q.query_id, e.vec_id,
           list_cosine_similarity(q.embedding, e.embedding) AS sim
    FROM q JOIN embeddings e ON true
)
SELECT query_id, vec_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
FROM s
QUALIFY rank <= {_TOPK}
ORDER BY query_id, rank
"""


def _query_matrix(sf_dir: str):
    """Driver-side input prep (4 query vectors) — a direct pyarrow read
    with a pushed filter, not a Ray pipeline execution."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    qt = (
        pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
            filters=pads.field("vec_id") < _N_QUERIES,
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    return np.vstack(qt["embedding"].to_numpy()), qt["vec_id"].to_numpy()


def ann_cosine_topk(sf_dir: str) -> pa.Table:
    """Brute-force exact cosine top-k for the first 4 vectors as queries."""
    from kgw_ray.stages.similarity import brute_force_topk

    Q, qids = _query_matrix(sf_dir)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return brute_force_topk(emb, Q, qids, k=_TOPK).select(
        ["query_id", "vec_id", "rank"]
    )


def ann_ivf_topk(sf_dir: str) -> pa.Table:
    """IVF approximate top-k (same queries; recall measured in tests).
    Cell count auto-scales to ~sqrt(N); nprobe scales with it so the
    probed fraction stays roughly constant."""
    from kgw_ray.stages.similarity import IVFIndex

    Q, qids = _query_matrix(sf_dir)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    idx = IVFIndex.build(emb)
    # ~1/3 of cells: the synthetic embeddings are near-uniform (worst case
    # for IVF), so a constant probed FRACTION keeps recall stable as cells
    # scale; clustered real data can probe far fewer
    return idx.topk(Q, qids, k=_TOPK, nprobe=max(4, -(-idx.n_cells // 3)))


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


def media_metadata(sf_dir: str) -> rd.Dataset:
    """Binary payload sidecar metadata (n_bytes / sha256 / crc32)."""
    from kgw_ray.stages.multimodal import media_metadata_batch, synth_media_dataset

    return synth_media_dataset(sf_dir).map_batches(
        media_metadata_batch, batch_format="pyarrow", batch_size=64
    )


def media_decode_features(sf_dir: str) -> rd.Dataset:
    """Decode stub → 8-dim features (fake decoder; real plumbing)."""
    from kgw_ray.stages.multimodal import DecodeImage, synth_media_dataset

    return synth_media_dataset(sf_dir).map_batches(
        DecodeImage,
        fn_constructor_kwargs={"use_fake": True},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 4),
    )


def curate_documents(sf_dir: str) -> rd.Dataset:
    """End-to-end training-data curation: quality filter → exact dedup →
    MinHash near-dedup, returning surviving (doc_id, n_tokens,
    quality_score). The composite pipeline a 100 TB pretraining corpus
    runs; each stage is the operator verified individually above.

    Fully distributed chain — the corpus is read ONCE, stats + content
    hash come from one enrichment pass, the quality filter runs inline,
    exact-dedup winners semi-join back via the size-hybrid
    ``semi_join_dataset`` (broadcast ids under the limit, hash join
    beyond), and the near-dup stage selects survivors with the
    size-hybrid ``anti_join`` against its drop-set Dataset. No
    driver-side O(N) id materialization anywhere; the ``materialize()``
    calls (quality-filtered set here, shingle hub inside
    ``minhash_dedup_keep``) are object-store checkpoints for datasets
    consumed twice (they spill, never sit in driver heap).

    Ordering note: cheap vectorized filters run FIRST so the expensive
    shingle/LSH stage sees only the quality-surviving subset.
    """
    from ray.data.aggregate import Min

    from kgw_ray.stages.dedup import minhash_dedup_keep
    from kgw_ray.stages.joins import semi_join_dataset
    from kgw_ray.stages.textstats import content_md5_list, quality_stats_batch

    def enrich(batch: pa.Table) -> pa.Table:
        # ONE pass: quality stats + exact-dedup hash, text kept for LSH
        stats = quality_stats_batch(batch)
        md5s = content_md5_list(batch.column("text").to_pylist())
        return stats.append_column(
            "content_md5", pa.array(md5s, pa.string())
        ).append_column("text", batch.column("text"))

    enriched = _docs(sf_dir).map_batches(enrich, batch_format="pyarrow")
    good = enriched.filter(expr="n_tokens >= 10 and quality_score >= 0.2").materialize()
    # exact dedup: first-wins winner ids (16-byte keys shuffle, never text)
    winners = (
        good.groupby("content_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )
    # no materialize here: minhash_dedup_keep consumes its input exactly
    # once (into its shingle hub), so a second corpus-sized checkpoint
    # between the semi join and the hub would be pure overhead
    exact_docs = semi_join_dataset(good, winners, on="doc_id")
    return minhash_dedup_keep(
        exact_docs,
        threshold=0.5,
        keep_columns=["doc_id", "n_tokens", "quality_score"],
    )


def shuffle_documents(sf_dir: str) -> rd.Dataset:
    """Seeded global corpus shuffle (`Dataset.random_shuffle`) — the
    pre-training epoch-order op. All-to-all exchange; at 100 TB prefer
    `randomize_block_order` + windowed local shuffles unless a true global
    permutation is required. Oracle compares the multiset (order-insensitive
    driver check); permutation-ness asserted in tests."""
    return _docs(sf_dir, cols=("doc_id",)).random_shuffle(seed=42)


SHUFFLE_DOCS_SQL = "SELECT doc_id FROM documents"


def sample_documents_every_k(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Deterministic systematic sample (reference tests/utils.py:60-61 takes
    evenly spaced samples): every k-th doc_id, as a pushed-down filter."""
    import numpy as np

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def keep(batch: pa.Table) -> pa.Table:
        # modulo never prunes row groups (every group holds multiples of k),
        # so a vectorized in-map filter IS the pushdown-equivalent here
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % k == 0))

    return ds.map_batches(keep, batch_format="pyarrow")


SAMPLE_DOCS_SQL = "SELECT doc_id, n_chars FROM documents WHERE doc_id % 10 = 0"
