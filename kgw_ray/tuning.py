"""Memory-aware execution tuning (block/batch sizing rules).

The rules the pipelines follow, centralized. A batch in flight costs
``batch_size × row_bytes × concurrency`` heap per stage; Ray's streaming
executor backpressures on block budgets, so block size is the lever that
keeps workers inside their heap while large inputs spill to the object
store instead of OOMing workers.

Profiles:

- ``text``   (default): Ray defaults — 128 MiB max block target; text rows
  are KBs, thousands of rows per batch are fine.
- ``binary`` (images/audio/video payloads): 32 MiB block target and small
  batches (stages/multimodal.py uses batch_size 32) so one multi-MB payload
  batch × pool width fits a worker heap.
- ``wide``   (very wide records, PharMeBINet-style properties —
  _pharmebinet.py:149 raises csv.field_size_limit): 64 MiB blocks,
  ``large_string``/``large_binary`` columns (sources/files.py already emits
  them for archive members / JSON records).
"""

from __future__ import annotations

from ray.data import DataContext

MiB = 1024 * 1024

_PROFILES: dict[str, dict] = {
    "text": {"target_max_block_size": 128 * MiB},
    "binary": {"target_max_block_size": 32 * MiB},
    "wide": {"target_max_block_size": 64 * MiB},
}


def configure(profile: str = "text") -> DataContext:
    """Apply a payload profile to the current DataContext; returns it.

    Call once per session before building pipelines (idempotent)."""
    if profile not in _PROFILES:
        raise ValueError(f"unknown profile {profile!r}; one of {sorted(_PROFILES)}")
    ctx = DataContext.get_current()
    for k, v in _PROFILES[profile].items():
        setattr(ctx, k, v)
    return ctx


def recommended_batch_size(row_bytes: int, *, worker_heap_bytes: int = 2 << 30,
                           concurrency: int = 8, safety: float = 8.0) -> int:
    """Batch size such that batch × concurrency × safety fits the heap.

    ``safety`` covers the UDF's working-set multiple (decode buffers,
    pandas copies). E.g. 5 MB payloads, 8 actors → 64 rows/batch."""
    per_batch_budget = worker_heap_bytes / (concurrency * safety)
    return max(1, int(per_batch_budget // max(row_bytes, 1)))
