"""Per-stage / per-partition checkpoint manifests (resume without recompute).

The reference's resume mechanism is file-existence task targets plus
atomic write-temp-then-rename (kgw/_shared/tasks.py:13-28,75-83; a completed
task is skipped on re-run, base.py:304-305). The Ray-native equivalent:

- every materializing stage writes Parquet into its own directory via a
  temp-dir + ``os.replace`` rename, then drops a ``_MANIFEST.json`` with
  lineage (stage name, input fingerprint), row count and wall time;
- ``resumable_stage(out_dir, fingerprint, fn)`` skips the stage entirely and
  re-reads the committed output when a manifest with a matching fingerprint
  exists — a killed run resumes without recomputing completed partitions;
- partitioned runs call this per partition directory (``part=<i>/``), so
  completed partitions survive a mid-run kill.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import asdict, dataclass
from typing import Callable, Optional

import ray.data as rd

MANIFEST_NAME = "_MANIFEST.json"


@dataclass
class StageManifest:
    stage: str
    fingerprint: str
    num_rows: int
    wall_time_sec: float
    extra: Optional[dict] = None


def read_manifest(out_dir: str) -> Optional[StageManifest]:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return StageManifest(**json.load(f))
    except (json.JSONDecodeError, TypeError):
        return None


def resumable_stage(
    out_dir: str,
    stage: str,
    fingerprint: str,
    fn: Callable[[], rd.Dataset],
    *,
    extra: Optional[dict] = None,
) -> rd.Dataset:
    """Run ``fn`` → write Parquet atomically → manifest; or skip if committed.

    ``fingerprint`` encodes the input lineage (paths + params); a manifest
    whose fingerprint differs is treated as stale and the stage reruns.
    """
    m = read_manifest(out_dir)
    if m is not None and m.fingerprint == fingerprint and m.stage == stage:
        return rd.read_parquet(out_dir)

    tmp_dir = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    t0 = time.monotonic()
    ds = fn()
    ds.write_parquet(tmp_dir)
    wall = time.monotonic() - t0
    committed = rd.read_parquet(tmp_dir)
    n = committed.count()
    manifest = StageManifest(
        stage=stage, fingerprint=fingerprint, num_rows=n, wall_time_sec=wall, extra=extra
    )
    with open(os.path.join(tmp_dir, MANIFEST_NAME), "w") as f:
        json.dump(asdict(manifest), f)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp_dir, out_dir)
    return rd.read_parquet(out_dir)
