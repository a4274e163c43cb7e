"""Similarity search over embedding columns (``list<float>``).

- ``brute_force_topk``: exact cosine top-k per query — the baseline. The
  query matrix (small) is broadcast once; each batch does one numpy matmul
  and emits its LOCAL top-k per query; a tiny final reduce keeps the global
  top-k. Work is O(N·Q·d) spread over all workers; nothing but (Q·k) rows
  per batch crosses the wire.
- ``ivf_topk``: the scale path — IVF (inverted-file) index: k-means-style
  centroids (deterministically seeded sample), each vector assigned to its
  nearest centroid at build; queries probe only ``nprobe`` nearest cells.
  Recall < 1 by design; bench measures the recall/speed trade.
- ``ivf_near_dup_pairs``: cell-bucketed near-dup (the companion to
  stages/dedup.py:embedding_near_dup_pairs for corpora whose matrix no
  longer broadcasts).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgw_ray.functions.arrow_utils import arrow_from_pandas


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _empty_topk_table() -> pa.Table:
    """Typed empty result — empty Ray pulls drop their schema (pc.is_in
    pruning can legitimately empty the probed set: dead IVF cells)."""
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64()),
        }
    )


_TIE_MARGIN = 32


def _topk_partial(
    bids: np.ndarray, V: np.ndarray, Q: np.ndarray, qids: np.ndarray, k: int
) -> pd.DataFrame:
    """Local top-k of one batch against all queries. V, Q pre-normalized.

    Vectorized and exact: ONE argpartition narrows each query to k +
    ``_TIE_MARGIN`` candidates, then a single row-wise lexsort orders only
    that slice by the global (sim DESC, vec_id ASC) tie-break. A query
    whose candidate window is saturated by boundary-sim ties (the only
    case where ties could hide outside the window — duplicate-heavy data)
    falls back to a full lexsort for that query alone, so an exact
    duplicate with a smaller id can never be dropped locally."""
    S = Q @ V.T  # (nq, B)
    nq, B = S.shape
    kk = min(k, B)
    P = min(B, kk + _TIE_MARGIN)
    if P >= B:
        cand = np.broadcast_to(np.arange(B), (nq, B)).copy()
    else:
        cand = np.argpartition(-S, P - 1, axis=1)[:, :P]
    csims = np.take_along_axis(S, cand, axis=1)
    cbids = bids[cand]
    order = np.lexsort((cbids, -csims), axis=1)  # per-row (sim DESC, id ASC)
    top = np.take_along_axis(cand, order[:, :kk], axis=1)
    if P < B:
        sorted_sims = np.take_along_axis(csims, order, axis=1)
        saturated = np.nonzero(sorted_sims[:, kk - 1] == sorted_sims[:, P - 1])[0]
        for qi in saturated:  # rare: > _TIE_MARGIN exact ties at the boundary
            top[qi] = np.lexsort((bids, -S[qi]))[:kk]
    rows = np.repeat(np.arange(nq), kk)
    cols = top.reshape(-1)
    return pd.DataFrame(
        {
            "query_id": qids[rows],
            "vec_id": bids[cols],
            "cosine": S[rows, cols],
        }
    )


def brute_force_topk(
    embeds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k per query. Returns (query_id, vec_id, cosine, rank)
    sorted by (query_id, rank); ties broken by vec_id ascending."""
    import ray

    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put((Qn, np.asarray(query_ids)))

    # task map, not an actor pool: the broadcast query matrix is trivial
    # state read zero-copy from plasma per task; pools pay startup+rampup
    # and cap concurrency (the repo-wide actor-vs-task rule, joins.py)
    def local(batch: pa.Table) -> pa.Table:
        Q, qids = ray.get(ref)
        bids = batch.column(id_col).to_numpy(zero_copy_only=False)
        V = _normalize(
            np.vstack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        return arrow_from_pandas(_topk_partial(bids, V, Q, qids, k))

    partials = embeds.map_batches(local, batch_format="pyarrow")
    # final reduce: ≤ (#blocks × nq × k) rows — tiny
    df = partials.to_pandas()
    if len(df) == 0 or "query_id" not in df.columns:
        return _empty_topk_table()
    df = df.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["cosine"] = df["cosine"].round(6)
    return arrow_from_pandas(
        df[["query_id", "vec_id", "cosine", "rank"]].astype(
            {"query_id": "int64", "vec_id": "int64", "rank": "int64"}
        )
    )


# ---------------------------------------------------------------------------
# IVF index
# ---------------------------------------------------------------------------


def _centroids_from_sample(M: np.ndarray, n_cells: int, iters: int = 5) -> np.ndarray:
    """Deterministic k-means on the (already sampled) matrix — seeded init,
    fixed iteration count; stands in for faiss-style training."""
    rng = np.random.default_rng(42)
    init = rng.choice(len(M), size=min(n_cells, len(M)), replace=False)
    C = M[init].copy()
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)
        for c in range(len(C)):
            members = M[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    C[c] = v / n
    return C


class IVFIndex:
    """Driver-side handle: centroids + a cell-partitioned Dataset.

    ``build`` computes centroids from a driver-side sample (``sample_n``
    rows via ``ds.limit`` — deterministic), then assigns every vector to its
    cell in one map_batches pass. The assignment column is the partition key
    for probe-side pruning.
    """

    def __init__(self, centroids: np.ndarray, assigned: rd.Dataset, id_col: str, vec_col: str):
        self.centroids = centroids
        self.assigned = assigned
        self.id_col = id_col
        self.vec_col = vec_col

    @property
    def n_cells(self) -> int:
        return len(self.centroids)

    @classmethod
    def build(
        cls,
        embeds: rd.Dataset,
        *,
        n_cells: Optional[int] = None,
        sample_n: int = 2048,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IVFIndex":
        """``n_cells=None`` scales the cell count to the corpus:
        ``clamp(sqrt(N), 16, 4096)`` (the faiss nlist rule of thumb), so a
        cell holds ~sqrt(N) vectors instead of N/16 — a fixed 16 puts
        1/16th of a web-scale corpus in ONE map_groups group."""
        import ray

        # materialize once: the count probe, the sample pull and the
        # assignment pass must not re-execute a derived input pipeline
        # (the semi_join_dataset rule)
        embeds = embeds.materialize()
        if n_cells is None:
            n = embeds.count()
            n_cells = int(min(4096, max(16, round(np.sqrt(max(n, 1))))))
        sample_n = max(sample_n, 16 * n_cells)
        sample = embeds.limit(sample_n).to_pandas()
        M = _normalize(np.vstack(sample[vec_col].to_numpy()).astype(np.float64))
        C = _centroids_from_sample(M, n_cells)
        ref = ray.put(C)

        # task map: the centroid matrix is trivial broadcast state
        # (actor-vs-task rule, joins.py)
        def assign(batch: pa.Table) -> pa.Table:
            C_ = ray.get(ref)
            V = _normalize(
                np.vstack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(
                    np.float64
                )
            )
            cell = np.argmax(V @ C_.T, axis=1).astype(np.int32)
            return batch.append_column("cell", pa.array(cell, pa.int32()))

        assigned = embeds.map_batches(assign, batch_format="pyarrow")
        return cls(C, assigned.materialize(), id_col, vec_col)

    def topk(
        self, queries: np.ndarray, query_ids: np.ndarray, *, k: int = 10, nprobe: int = 4
    ) -> pa.Table:
        """Probe ``nprobe`` nearest cells per query; exact cosine within."""
        import ray
        import pyarrow.compute as pc

        Qn = _normalize(np.asarray(queries, dtype=np.float64))
        qcells = np.argsort(-(Qn @ self.centroids.T), axis=1)[:, :nprobe]
        probe_cells = pa.array(sorted(set(qcells.reshape(-1).tolist())), pa.int32())
        ref = ray.put((Qn, np.asarray(query_ids), qcells))
        id_col, vec_col = self.id_col, self.vec_col

        # task map: (queries, cells) are trivial broadcast state
        def local(batch: pa.Table) -> pa.Table:
            Q, qids, qcells = ray.get(ref)
            bids = batch.column(id_col).to_numpy(zero_copy_only=False)
            cells = batch.column("cell").to_numpy(zero_copy_only=False)
            V = _normalize(
                np.vstack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(
                    np.float64
                )
            )
            outs = []
            for qi in range(len(Q)):
                mask = np.isin(cells, qcells[qi])
                if not mask.any():
                    continue
                outs.append(
                    _topk_partial(
                        bids[mask],
                        V[mask],
                        Q[qi : qi + 1],
                        qids[qi : qi + 1],
                        k,
                    )
                )
            if not outs:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            return arrow_from_pandas(pd.concat(outs, ignore_index=True))

        pruned = self.assigned.map_batches(
            lambda t: t.filter(pc.is_in(t["cell"], value_set=probe_cells)),
            batch_format="pyarrow",
        )
        partials = pruned.map_batches(local, batch_format="pyarrow")
        df = partials.to_pandas()
        if len(df) == 0 or "query_id" not in df.columns:
            return _empty_topk_table()
        df = df.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
        df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        df["rank"] = df.groupby("query_id").cumcount() + 1
        df["cosine"] = df["cosine"].round(6)
        return arrow_from_pandas(
            df[["query_id", "vec_id", "cosine", "rank"]].astype(
                {"query_id": "int64", "vec_id": "int64", "rank": "int64"}
            )
        )


def ivf_near_dup_pairs(
    embeds: rd.Dataset,
    *,
    threshold: float = 0.9,
    n_cells: Optional[int] = None,
    cell_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Near-dup pairs via cell blocking: exact cosine only WITHIN each IVF
    cell (groupby(cell).map_groups) — recall trades against the all-pairs
    matmul; cross-cell near-dups are missed by design (bench reports it).

    ``cell_cap`` guards degenerate cells (e.g. a boilerplate cluster): a
    cell larger than the cap splits into contiguous id-ordered chunks and
    expands pairs only within each chunk — O(m·cap) instead of O(m²),
    with documented additional recall loss on the oversized cell."""
    from kgw_ray.functions.arrow_utils import arrow_from_pandas

    idx = IVFIndex.build(embeds, n_cells=n_cells, id_col=id_col, vec_col=vec_col)

    def pairs_of_cell(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(id_col)
        ids_all = g[id_col].to_numpy()
        V_all = _normalize(np.vstack(g[vec_col].to_numpy()).astype(np.float64))
        outs = []
        for s in range(0, len(ids_all), cell_cap):
            ids = ids_all[s : s + cell_cap]
            V = V_all[s : s + cell_cap]
            if len(ids) < 2:
                continue
            S = V @ V.T
            iu, ju = np.triu_indices(len(ids), k=1)
            keep = S[iu, ju] >= threshold
            outs.append(
                pd.DataFrame(
                    {
                        "a": ids[iu[keep]],
                        "b": ids[ju[keep]],
                        "cosine": np.round(S[iu, ju][keep], 6),
                    }
                )
            )
        if not outs:
            outs = [
                pd.DataFrame(
                    {
                        "a": pd.Series([], dtype="int64"),
                        "b": pd.Series([], dtype="int64"),
                        "cosine": pd.Series([], dtype="float64"),
                    }
                )
            ]
        return arrow_from_pandas(pd.concat(outs, ignore_index=True))

    return idx.assigned.groupby("cell").map_groups(pairs_of_cell, batch_format="pandas")
