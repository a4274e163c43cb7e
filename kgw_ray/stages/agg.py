"""Grouped-aggregation helper: coalesce before the shuffle.

Ray Data's sort-based groupby uses one reduce partition per input block; a
pipeline that pre-aggregates per batch produces MANY small partial blocks,
turning the final groupby into an N×N task storm (observed: 47s for a 76k-row
aggregate over 80 blocks). Partials are small by construction, so coalescing
them to ~#CPUs blocks first makes the shuffle constant-size regardless of
upstream fan-out — the two-phase (combiner → reduce) shape at any scale.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import ray
import ray.data as rd


def default_shuffle_partitions() -> int:
    try:
        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover
        n = 8
    return max(2, n)


def grouped_aggregate(
    partials: rd.Dataset,
    keys: Union[str, Sequence[str]],
    *aggs,
    num_partitions: Optional[int] = None,
    materialize_partials: bool = True,
) -> rd.Dataset:
    """groupby(keys).aggregate(aggs) over pre-aggregated partials.

    The partials are MATERIALIZED before the shuffle by default: a
    sort-based aggregate consuming a lazy map chain degrades catastrophically
    (measured at sf0.1/32cpus: 65s lazy vs 0.8s materialize + 11s aggregate
    on 766k rows; same family as the lazy-union pathology noted at
    tpch_graph). Partials are collapsed by construction, so pinning them in
    the object store is cheap relative to the exchange; Ray spills if not.

    Do NOT chain ``repartition`` in front instead — an all-to-all fed by a
    lazy pandas map shows the same degradation (measured 64s).
    """
    if materialize_partials:
        partials = partials.materialize()
    return partials.groupby(keys).aggregate(*aggs)


def grouped_map_groups(
    ds: rd.Dataset,
    keys: Union[str, Sequence[str]],
    fn,
    *,
    batch_format: str = "pandas",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    return ds.groupby(keys).map_groups(fn, batch_format=batch_format)


def salted_aggregate(
    ds: rd.Dataset,
    keys: Union[str, Sequence[str]],
    sum_cols: Sequence[str],
    *,
    salt: int = 16,
) -> rd.Dataset:
    """Two-phase aggregation with salted keys for head-key skew
    (BASELINE.json north_rule: 'salted-key handling for head-entity skew').

    A single groupby on a skewed key sends every row of the hot key to ONE
    reduce partition — that partition becomes the straggler. Salting splits
    each key into ``salt`` sub-keys:

        phase 1: groupby(keys + _salt) — the hot key's rows spread over
                 ``salt`` partitions, each producing one partial row
        phase 2: groupby(keys) over ≤ salt rows per key — trivially small

    Works for decomposable aggregates (sum/count/min/max; this helper does
    sums — extend per aggregate). The per-batch combiner pattern used by the
    flagship (``_edge_partials``) makes salting unnecessary when partials
    fit per batch; salting is for groupby paths that CANNOT pre-combine
    (e.g. ``map_groups`` bodies needing all rows of a key, or aggregate
    states too large to merge per batch).
    """
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Sum

    key_list = [keys] if isinstance(keys, str) else list(keys)

    def add_salt(batch: pa.Table) -> pa.Table:
        # deterministic per-row salt: spreads every key's rows uniformly
        n = batch.num_rows
        s = (np.arange(n, dtype=np.int64) * 2654435761 % salt).astype(np.int64)
        return batch.append_column("_salt", pa.array(s))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    phase1 = salted.groupby(key_list + ["_salt"]).aggregate(
        *[Sum(c, alias_name=c) for c in sum_cols]
    )
    phase2 = phase1.groupby(key_list).aggregate(
        *[Sum(c, alias_name=c) for c in sum_cols]
    )
    return phase2


def resilient_map_batches(
    ds: rd.Dataset,
    fn,
    *,
    max_retries: int = 3,
    batch_format: str = "pyarrow",
    **kwargs,
):
    """map_batches with task-level exception retries (the engine's
    fault-tolerance default for stages touching flaky externals — model
    servers, object stores; reference analog: 3 download retries,
    kgw/_shared/tasks.py:104).

    Ray retries worker CRASHES automatically; user exceptions need
    ``retry_exceptions`` opted in — this wrapper is that opt-in.
    """
    # map_batches forwards extra kwargs straight to the remote task options
    return ds.map_batches(
        fn,
        batch_format=batch_format,
        retry_exceptions=True,
        max_retries=max_retries,
        **kwargs,
    )
