"""Small-file compaction — the table-maintenance operator every long-lived
Parquet lake needs (a crawl that commits per-partition manifests leaves
thousands of small files; query engines want ~100 MB–1 GB objects).

The reference's analog is the batched SQLite insert path (its sink always
re-packs rows into 10k-row batches, kgw/_shared/tasks.py:351,389); at lake
scale the same re-packing is a streaming read → repartition → write.

Guarantees:
- deterministic output layout: ``ceil(n_rows / target_rows_per_file)``
  files (one per repartitioned block — pinned by tests and by the
  ``docs_compact_small_files`` oracle, which recomputes the file count
  from COUNT(*)),
- content preservation is CHECKED, not assumed: the registered query
  reads the compacted output back and fingerprints it with the same
  order-insensitive md5-sum checksum (stages/agg.py:table_checksum) the
  anti-entropy query uses — the oracle computes the identical checksum
  over the ORIGINAL table, so a dropped/duplicated/corrupted row fails
  the external hash gate.

Scale note: ``repartition(k)`` without ``shuffle=True`` is a split/merge
of block metadata — rows move at most once, no all-to-all exchange. For a
100 TB table run per partition directory (the resume manifests' layout)
so compaction is itself resumable.
"""

from __future__ import annotations

import math
import os

import ray.data as rd


def compact_parquet(
    ds: rd.Dataset, out_dir: str, *, target_rows_per_file: int
) -> dict:
    """Rewrite ``ds`` under ``out_dir`` as ``ceil(n / target)`` Parquet
    files of ~``target_rows_per_file`` rows each. Returns
    ``{"n_rows", "n_files", "out_dir"}``."""
    if target_rows_per_file <= 0:
        raise ValueError("target_rows_per_file must be positive")
    n = ds.count()
    k = max(1, math.ceil(n / target_rows_per_file))
    ds.repartition(k).write_parquet(out_dir)
    n_files = sum(
        1 for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    return {"n_rows": n, "n_files": n_files, "out_dir": out_dir}
