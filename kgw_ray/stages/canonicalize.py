"""Canonicalization: connected components over candidate-match pairs.

The reference dedups entities with in-memory first-wins sets
(kgw/biomedicine/_primekg.py:182,210-211; _oregano.py:190-196) — O(nodes)
driver memory, its scale ceiling. Here canonicalization is a distributed
union-find expressed as iterated min-label propagation over ``groupby``
shuffles (SURVEY.md §7 hard part 6): converges in O(log n) rounds over the
pair set, never holds the full id universe on one machine.

``connected_components(pairs)`` takes a Dataset of undirected edges
(a:string, b:string) and returns (id:string, component:string) where
``component`` is the lexicographically smallest id reachable from ``id``.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def _nparts() -> int:
    from kgw_ray.stages.joins import default_join_partitions

    return default_join_partitions()
from ray.data.aggregate import Min


def _symmetrize(pairs: rd.Dataset) -> rd.Dataset:
    def both(df: pd.DataFrame) -> pd.DataFrame:
        fwd = df.rename(columns={"a": "id", "b": "nbr"})[["id", "nbr"]]
        rev = df.rename(columns={"b": "id", "a": "nbr"})[["id", "nbr"]]
        selfloop = pd.DataFrame({"id": df["a"], "nbr": df["a"]})
        selfloop2 = pd.DataFrame({"id": df["b"], "nbr": df["b"]})
        return pd.concat([fwd, rev, selfloop, selfloop2], ignore_index=True)

    return pairs.map_batches(both, batch_format="pandas")


_DRIVER_PAIR_LIMIT = 5_000_000


def connected_components(pairs: rd.Dataset, max_iter: int = 12) -> rd.Dataset:
    """Min-label propagation. pairs: columns (a, b). Returns (id, component).

    Small-graph fast path: a pair set ≤ 5M rows is merged with driver-side
    union-find (candidate-match pair sets are tiny relative to the corpus —
    seconds vs a dozen join rounds). Beyond that, distributed min-label
    propagation: each round label(id) = min over neighbors' labels, so after
    r rounds every id knows the min id within distance 2^r. Partition key
    throughout: ``id`` — one hash shuffle per round over a table that is ≤
    |pairs| rows, not the full corpus.
    """
    import pyarrow as pa

    pairs_df = None
    n_pairs = pairs.count()
    if n_pairs <= _DRIVER_PAIR_LIMIT:
        pairs_df = pairs.select_columns(["a", "b"]).to_pandas()
    if pairs_df is not None:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for x, y in zip(pairs_df["a"], pairs_df["b"]):
            rx, ry = find(x), find(y)
            if rx != ry:
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        members = sorted(set(pairs_df["a"]) | set(pairs_df["b"]))
        return rd.from_arrow(
            pa.table(
                {
                    "id": pa.array(members),
                    "component": pa.array([find(m) for m in members]),
                }
            )
        )

    adj = _symmetrize(pairs).materialize()
    # initial label = min neighbor (includes self)
    labels = adj.groupby("id").aggregate(Min("nbr", alias_name="component"))
    for _ in range(max_iter):
        labels_mat = labels.materialize()
        # propagate: join neighbor's current label onto each edge, take min per id
        nbr_labels = adj.join(
            labels_mat,
            join_type="inner",
            num_partitions=_nparts(),
            on=("nbr",),
            right_on=("id",),
            right_suffix="_r",
        )
        new_labels = nbr_labels.groupby("id").aggregate(
            Min("component", alias_name="component")
        )
        new_mat = new_labels.materialize()
        # convergence: has any label changed?
        joined = new_mat.join(
            labels_mat,
            join_type="inner",
            num_partitions=_nparts(),
            on=("id",),
            right_suffix="_old",
        )
        changed = joined.map_batches(
            lambda df: pd.DataFrame(
                {"n": [int((df["component"] != df["component_old"]).sum())]}
            ),
            batch_format="pandas",
        ).sum("n")
        labels = new_mat
        if not changed:
            break
    return labels
