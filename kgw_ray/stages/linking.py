"""Entity linking: surface form → canonical entity id.

Analog of the reference's broadcast-small-side lookup joins (Oregano
annotation join, kgw/biomedicine/_oregano.py:157-201; PrimeKG features join,
_primekg.py:155-172,218-239): the small side (the KB) is loaded ONCE per
actor in ``__init__`` (via a ``ray.put`` broadcast handle), then probed per
batch — never a shuffle, never re-shipped per batch.

Two linkers:

- ``link_triples_batch`` — exact-dictionary link for the flagship pipeline
  (deterministic, SQL-oracle-expressible): ``entity_id = "E:" + surface``.
- ``EntityLinker`` — the scale path: MinHash-LSH candidate blocking over
  character shingles of KB aliases + embedding-cosine scoring with
  deterministic hash-projection embeddings (stub for a real encoder — the
  Ray-side plumbing, batching and actor signature are real).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kgw_ray.stages.triples import ENTITIES as _KB_ENTITIES


def link_triples_batch(batch: pa.Table) -> pa.Table:
    """Add subj_id/obj_id columns: 'E:' + surface (vectorized Arrow concat)."""
    subj_id = pc.binary_join_element_wise(pa.scalar("E:"), batch.column("subj"), "")
    obj_id = pc.binary_join_element_wise(pa.scalar("E:"), batch.column("obj"), "")
    return batch.append_column("subj_id", subj_id).append_column("obj_id", obj_id)


# ---------------------------------------------------------------------------
# Scale-path linker: MinHash-LSH blocking + cosine scoring
# ---------------------------------------------------------------------------

_DIM = 64


def _shingles(s: str, k: int = 3) -> set[str]:
    s = f"^{s}$"
    if len(s) <= k:
        return {s}
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def hash_embed(s: str, dim: int = _DIM) -> np.ndarray:
    """Deterministic pseudo-embedding: hashed char-shingle projection.

    Stands in for a neural encoder (not available in this container); the
    actor/batch plumbing is identical to a real model.
    """
    v = np.zeros(dim, dtype=np.float64)
    for sh in _shingles(s):
        h = int.from_bytes(hashlib.md5(sh.encode()).digest()[:8], "little")
        v[h % dim] += 1.0 if (h >> 32) & 1 else -1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _minhash_sig(shingles: set[str], num_perm: int) -> np.ndarray:
    """num_perm minhash values via k independent 64-bit hash mixes."""
    if not shingles:
        return np.zeros(num_perm, dtype=np.uint64)
    base = np.fromiter(
        (
            int.from_bytes(hashlib.md5(sh.encode()).digest()[:8], "little")
            for sh in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )
    out = np.empty(num_perm, dtype=np.uint64)
    x = base.copy()
    for i in range(num_perm):
        # splitmix64-style mix, vectorized over shingles
        x = x + np.uint64(0x9E3779B97F4A7C15)
        z = x.copy()
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        out[i] = z.min()
    return out


# ---------------------------------------------------------------------------
# Exhaustive exact-Jaccard linker (the deterministic ground-truth scorer)
# ---------------------------------------------------------------------------

_EXACT_KB: list[tuple[str, frozenset]] | None = None  # per-process singleton


def _exact_kb() -> list[tuple[str, frozenset]]:
    """(entity_id, alias char-3-shingle set) for the built-in entity lexicon,
    sorted by entity_id — built once per worker process (trivial state, so a
    task map + module singleton beats an actor pool; see stages/extract.py)."""
    global _EXACT_KB
    if _EXACT_KB is None:
        _EXACT_KB = [
            (f"E:{w}", frozenset(_shingles(w))) for w in sorted(_KB_ENTITIES)
        ]
    return _EXACT_KB


def exact_link_batch(batch: pa.Table, column: str = "variant") -> pa.Table:
    """Exhaustively score every mention against EVERY KB entity by exact
    char-3-gram Jaccard; keep the argmax (ties → smallest entity_id).

    The deterministic counterpart of ``EntityLinker`` (whose MinHash-LSH
    blocking is approximate): scoring all |KB| entities makes the result a
    pure function of the input, so the correctness gate can hash it against
    a DuckDB oracle (registry.LINK_EXACT_SQL). Integer score columns
    (inter_ct, union_ct) avoid float-hash fragility; the argmax compares
    Jaccard fractions by integer cross-multiplication — no float compare
    anywhere. Exhaustive scoring is O(|KB|) per distinct mention: the right
    physical plan whenever the KB is broadcast-sized (alias lexicons are);
    the LSH linker is the scale path for KBs too large to scan per mention.
    """
    kb = _exact_kb()
    surfaces = batch.column(column).to_pylist()
    memo: dict[str, tuple[str, int, int]] = {}
    ids, inters, unions = [], [], []
    for s in surfaces:
        hit = memo.get(s)
        if hit is None:
            sh = _shingles(s)
            best = None
            bi, bu = 0, 1
            for eid, ksh in kb:
                i = len(sh & ksh)
                u = len(sh) + len(ksh) - i
                # i/u > bi/bu  ⟺  i*bu > bi*u   (u, bu ≥ 1); strict >, so
                # on ties the first (smallest) entity_id in sorted order
                # wins — including the all-zero-score case, where the
                # alphabetically-first entity is kept with its own union
                if best is None or i * bu > bi * u:
                    best, bi, bu = (eid, i, u), i, u
            hit = memo[s] = best
        ids.append(hit[0])
        inters.append(hit[1])
        unions.append(hit[2])
    return (
        batch.append_column("entity_id", pa.array(ids, pa.string()))
        .append_column("inter_ct", pa.array(inters, pa.int64()))
        .append_column("union_ct", pa.array(unions, pa.int64()))
    )


class EntityLinker:
    """Actor-pool linker: KB broadcast once, LSH-blocked cosine scoring per batch.

    Parameters
    ----------
    kb_ref : ray.ObjectRef to a list[dict(entity_id, aliases: list[str])]
        Broadcast with ``ray.put`` on the driver; fetched once per actor.
    column : the surface-form column to link.
    """

    def __init__(self, kb_ref, column: str = "surface", num_perm: int = 16, bands: int = 16):
        # default r=1 (one minhash per band): detection ≈ 1-(1-J)^16, i.e.
        # >99% at J≥0.3 — typo-level variants block reliably; candidate sets
        # grow accordingly, fine for alias KBs (they are small relative to
        # the corpus); raise rows-per-band for stricter blocking.
        import ray

        kb = ray.get(kb_ref)
        self.column = column
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.buckets: dict[tuple[int, bytes], list[int]] = {}
        self.kb_ids: list[str] = []
        self.kb_vecs: list[np.ndarray] = []
        for ent in kb:
            for alias in ent["aliases"]:
                idx = len(self.kb_ids)
                self.kb_ids.append(ent["entity_id"])
                self.kb_vecs.append(hash_embed(alias))
                sig = _minhash_sig(_shingles(alias), num_perm)
                for b in range(bands):
                    key = (b, sig[b * self.rows_per_band : (b + 1) * self.rows_per_band].tobytes())
                    self.buckets.setdefault(key, []).append(idx)
        self.kb_mat = (
            np.vstack(self.kb_vecs) if self.kb_vecs else np.zeros((0, _DIM))
        )

    def link_one(self, surface: str) -> tuple[str | None, float]:
        sig = _minhash_sig(_shingles(surface), self.num_perm)
        cand: set[int] = set()
        for b in range(self.bands):
            key = (b, sig[b * self.rows_per_band : (b + 1) * self.rows_per_band].tobytes())
            cand.update(self.buckets.get(key, ()))
        if not cand:
            return None, 0.0
        idxs = sorted(cand)
        v = hash_embed(surface)
        scores = self.kb_mat[idxs] @ v
        best = int(np.argmax(scores))
        return self.kb_ids[idxs[best]], float(scores[best])

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch.column(self.column).to_pylist()
        # memoize within the batch — surfaces repeat heavily in web text
        memo: dict[str, tuple[str | None, float]] = {}
        ids, scores = [], []
        for s in surfaces:
            if s not in memo:
                memo[s] = self.link_one(s)
            eid, sc = memo[s]
            ids.append(eid)
            scores.append(sc)
        return batch.append_column(
            "entity_id", pa.array(ids, pa.string())
        ).append_column("link_score", pa.array(scores, pa.float64()))
