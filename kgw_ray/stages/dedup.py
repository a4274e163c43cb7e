"""Deduplication suite for training-data pipelines.

Five dedup families, all expressed Ray-Data-first:

- **exact**: content hash → groupby(hash) → first-wins (min doc_id) — the
  distributed analog of the reference's in-memory ``seen_node_ids`` set
  (kgw/biomedicine/_primekg.py:182,210-211), scaled past RAM by the shuffle.
- **MinHash + LSH**: shingle → minhash signature → band buckets →
  groupby(band, bucket) → in-bucket candidate pairs → exact-Jaccard verify →
  connected components → keep one doc per component.
- **SimHash**: 64-bit simhash per doc; near-dup blocking via 4×16-bit band
  buckets (Hamming ≤ 3 guaranteed to collide in ≥1 band by pigeonhole).
- **n-gram Jaccard**: the exact verifier used inside the MinHash pipeline
  (and standalone for candidate pair lists).
- **embedding-cosine**: near-dup by cosine ≥ t over an embedding column —
  exact path broadcasts the (small) matrix; scale path buckets by
  random-hyperplane LSH first (stages/similarity.py).

Scale notes: every family shuffles ONLY compact derived keys (16-byte hash,
uint64 bands), never text. Band buckets for a 10^12-doc corpus are heavily
skewed on boilerplate — ``max_bucket`` caps the candidate fan-out per bucket
(documented truncation, logged via the ``truncated`` column) the standard
web-dedup mitigation for degenerate buckets.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgw_ray.functions.arrow_utils import arrow_from_pandas

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_keep(ds: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Rows that survive exact dedup: first-wins (min id) per distinct text.

    Pipeline: hash per batch (md5, 16 bytes — the shuffle key, never the
    text) → groupby(hash).min(id) → semi-join back by id. Returns
    (doc_id, content_md5).
    """
    from ray.data.aggregate import Min

    def hash_batch(batch: pa.Table) -> pa.Table:
        md5s = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "content_md5": pa.array(md5s, pa.string()),
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")
    keep = hashed.groupby("content_md5").aggregate(Min(id_col, alias_name=id_col))
    return keep.select_columns([id_col, "content_md5"])


# ---------------------------------------------------------------------------
# MinHash signatures (vectorized)
# ---------------------------------------------------------------------------

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return z ^ (z >> np.uint64(31))


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Word k-shingle hash set of a document (uint64)."""
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
                for s in shingles
            ),
            dtype=np.uint64,
            count=len(shingles),
        )
    )


def minhash_signature(sh: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """num_perm minhash values via seeded splitmix64 mixes (vectorized:
    one (num_perm × |shingles|) broadcast min)."""
    if sh.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    seeds = _mix64(np.arange(1, num_perm + 1, dtype=np.uint64))
    # (P, S) mix: h_p(s) = mix(s ^ seed_p)
    return _mix64(sh[None, :] ^ seeds[:, None]).min(axis=1)


class MinHashLSH:
    """Actor-pool stage: (doc_id, text) → band-key rows for LSH blocking.

    Emits one row per (doc, band): (doc_id, band, bucket) where bucket is
    the 64-bit hash of the band's signature slice. Buckets with >1 doc are
    near-dup candidates. num_perm=64, bands=16 → rows_per_band=4 targets
    Jaccard ≈ (1/16)^(1/4) ≈ 0.5 threshold.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 5):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.r = num_perm // bands
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        n = len(ids)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = minhash_signature(shingle_hashes(t or "", self.k), self.num_perm)
        # bucket hash per band: mix the r signature values together
        bands_out = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            sl = sigs[:, b * self.r : (b + 1) * self.r]
            acc = np.uint64(b + 1) * np.ones(n, dtype=np.uint64)
            for j in range(self.r):
                acc = _mix64(acc ^ sl[:, j])
            bands_out[:, b] = acc
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.bands), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n), pa.int32()
                ),
                "bucket": pa.array(bands_out.reshape(-1)),
            }
        )


def lsh_candidate_pairs(
    band_rows: rd.Dataset, *, max_bucket: int = 64
) -> rd.Dataset:
    """groupby(band, bucket) → all in-bucket pairs (a < b), deduplicated.

    ``max_bucket`` caps per-bucket fan-out (skew guard for boilerplate
    buckets at web scale): buckets larger than the cap contribute only the
    pairs chaining consecutive sorted ids — enough to keep the component
    connected for dedup purposes without O(m²) pair blowup.
    """

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        if m > max_bucket:
            # chain pairs keep the component connected at O(m) cost
            return pd.DataFrame({"a": ids[:-1], "b": ids[1:]})
        iu = np.triu_indices(m, k=1)
        return pd.DataFrame({"a": ids[iu[0]], "b": ids[iu[1]]})

    pairs = band_rows.groupby(["band", "bucket"]).map_groups(
        pairs_of_group, batch_format="pandas"
    )
    # dedup identical pairs found in multiple bands
    from ray.data.aggregate import Count

    return (
        pairs.groupby(["a", "b"])
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["a", "b", "n_bands"])
    )


def jaccard_verify_pairs(
    pairs: rd.Dataset,
    docs: rd.Dataset,
    *,
    threshold: float = 0.5,
    shingle_k: int = 5,
    text_col: str = "text",
) -> rd.Dataset:
    """Exact n-gram Jaccard for candidate pairs; keep pairs ≥ threshold.

    The doc texts are broadcast as a doc_id→shingle-set map built ONCE per
    actor from the (filtered, candidate-only) docs — a broadcast semi-join.
    At 10^12 docs this becomes a shuffle join of pairs against shingle
    signatures partitioned by doc_id; the candidate set after LSH is ~0.1%
    of the corpus, so the broadcast path holds far up the scale curve.
    """
    import ray

    cand_ids_tbl = pairs.to_pandas()
    cand_ids = set(cand_ids_tbl["a"]) | set(cand_ids_tbl["b"])

    import pyarrow.compute as pc

    docs_small = docs.map_batches(
        lambda t: t.filter(pc.is_in(t["doc_id"], value_set=pa.array(sorted(cand_ids)))),
        batch_format="pyarrow",
    ).select_columns(["doc_id", text_col])
    sh_map = {}
    for b in docs_small.iter_batches(batch_format="pyarrow"):
        for d, t in zip(b.column("doc_id").to_pylist(), b.column(text_col).to_pylist()):
            sh_map[d] = shingle_hashes(t or "", shingle_k)
    ref = ray.put(sh_map)

    class Verify:
        def __init__(self):
            self.sh = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch.column("a").to_pylist()
            b = batch.column("b").to_pylist()
            jac = np.empty(len(a), dtype=np.float64)
            for i, (x, y) in enumerate(zip(a, b)):
                sa, sb = self.sh.get(x), self.sh.get(y)
                if sa is None or sb is None or len(sa) == 0 or len(sb) == 0:
                    jac[i] = 0.0
                    continue
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                jac[i] = inter / (len(sa) + len(sb) - inter)
            out = batch.append_column("jaccard", pa.array(np.round(jac, 6)))
            return out.filter(pa.array(jac >= threshold))

    return pairs.map_batches(Verify, batch_format="pyarrow", concurrency=(1, 4))


def minhash_dedup_keep(
    docs: rd.Dataset,
    *,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> rd.Dataset:
    """Full near-dup dedup: LSH candidates → Jaccard verify → connected
    components → keep min doc_id per component. Returns (doc_id,) survivors.
    """
    from ray.data.aggregate import Min

    from kgw_ray.stages.canonicalize import connected_components

    band_rows = docs.select_columns(["doc_id", "text"]).map_batches(
        MinHashLSH,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    cands = lsh_candidate_pairs(band_rows)
    verified = jaccard_verify_pairs(
        cands, docs, threshold=threshold, shingle_k=shingle_k
    )

    def as_str_pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "a": pc.cast(batch["a"], pa.string()),
                "b": pc.cast(batch["b"], pa.string()),
            }
        )

    pairs_str = verified.map_batches(as_str_pairs, batch_format="pyarrow")
    if pairs_str.count() == 0:
        return docs.select_columns(["doc_id"])
    comps = connected_components(pairs_str)  # (id, component) strings

    def to_int(df: pd.DataFrame) -> pa.Table:
        return arrow_from_pandas(
            pd.DataFrame(
                {
                    "doc_id": df["id"].astype("int64"),
                    "component": df["component"].astype("int64"),
                }
            )
        )

    comps_i = comps.map_batches(to_int, batch_format="pandas")
    keep_dup = comps_i.groupby("component").aggregate(Min("doc_id", alias_name="doc_id"))
    dup_ids = set(comps_i.select_columns(["doc_id"]).to_pandas()["doc_id"])
    keep_ids = set(keep_dup.select_columns(["doc_id"]).to_pandas()["doc_id"])
    drop = pa.array(sorted(dup_ids - keep_ids), pa.int64())

    import pyarrow.compute as pc

    return docs.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=drop))),
        batch_format="pyarrow",
    ).select_columns(["doc_id"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(toks: list[str]) -> int:
    """Classic 64-bit SimHash over token hashes (Charikar)."""
    if not toks:
        return 0
    h = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            for t in toks
        ),
        dtype=np.uint64,
        count=len(toks),
    )
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    acc = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, simhash, band0..band3).

    The four 16-bit bands support Hamming-distance blocking: two docs with
    Hamming ≤ 3 share at least one band exactly (pigeonhole).
    """
    ids = batch.column("doc_id")
    sh = np.fromiter(
        (simhash64((t or "").split()) for t in batch.column("text").to_pylist()),
        dtype=np.uint64,
        count=batch.num_rows,
    )
    cols = {"doc_id": ids, "simhash": pa.array(sh)}
    for b in range(4):
        cols[f"band{b}"] = pa.array(
            ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        )
    return pa.table(cols)


def simhash_near_dup_pairs(docs: rd.Dataset, *, max_hamming: int = 3) -> rd.Dataset:
    """SimHash blocking + exact Hamming verify → (a, b, hamming) pairs."""
    sh = docs.select_columns(["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    ).materialize()

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.uint64)
        m = len(ids)
        if m < 2:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        iu, ju = np.triu_indices(m, k=1)
        x = hs[iu] ^ hs[ju]
        ham = np.zeros(len(x), dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"a": ids[iu[keep]], "b": ids[ju[keep]], "hamming": ham[keep]})

    all_pairs = []
    for b in range(4):
        p = sh.groupby(f"band{b}").map_groups(pairs_of_group, batch_format="pandas")
        all_pairs.append(p)
    from ray.data.aggregate import Min

    return (
        all_pairs[0]
        .union(*all_pairs[1:])
        .groupby(["a", "b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (exact; LSH-bucketed path in stages/similarity.py)
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(
    embeds: rd.Dataset,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """All pairs (a < b) with cosine ≥ threshold.

    Exact path: the normalized matrix is broadcast once (``ray.put``) and
    each batch does ONE numpy matmul against it — O(N·B·d) FLOPs, zero
    shuffle. Valid while N·d floats fit a worker heap (~10^8 vectors at
    d=64); beyond that use the IVF/LSH-bucketed variant
    (stages/similarity.py: ivf_near_dup_pairs).
    """
    import ray

    mat_tbl = embeds.select_columns([id_col, vec_col]).to_pandas()
    order = np.argsort(mat_tbl[id_col].to_numpy())
    ids_all = mat_tbl[id_col].to_numpy()[order]
    M = np.vstack(mat_tbl[vec_col].to_numpy()[order]).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, M))

    class Pairs:
        def __init__(self):
            self.ids, self.M = ray.get(ref)
            self.pos = {v: i for i, v in enumerate(self.ids)}

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column(id_col).to_numpy(zero_copy_only=False)
            V = np.vstack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            S = V @ self.M.T  # (B, N)
            rows, cols = np.nonzero(S >= threshold)
            a = bids[rows]
            b = self.ids[cols]
            keep = a < b  # dedup + drop self-pairs
            return pa.table(
                {
                    "a": pa.array(a[keep], pa.int64()),
                    "b": pa.array(b[keep], pa.int64()),
                    "cosine": pa.array(np.round(S[rows, cols][keep], 6)),
                }
            )

    return embeds.map_batches(Pairs, batch_format="pyarrow", concurrency=(1, 8))
