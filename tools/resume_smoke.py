#!/usr/bin/env python
"""Kill-and-resume smoke: SIGKILL the flagship job mid-run, re-submit it,
and prove completed partitions are NOT recomputed (north rule: "resumable
from checkpoint with per-partition lineage").

The in-repo tests pin resume at the function level; this script is the
process-level evidence — a real ``python -m kgw_ray.job`` driver killed
with SIGKILL between partition commits, then re-run to completion:

    python tools/resume_smoke.py [--repeat 32] [--partitions 8]

Prints ONE JSON line: partitions committed before the kill, how many the
resume run skipped (mtime-identical manifests), and the final node/edge
counts (which must match the unkilled pipeline's).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _build_shards(sf_dir: str, repeat: int, shards_dir: str, n_shards: int) -> None:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from kgw_ray.sources.pages import _REPEAT_STRIDE

    os.makedirs(shards_dir, exist_ok=True)
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    per_shard = max(1, repeat // n_shards)
    r = 0
    for s in range(n_shards):
        parts = []
        for _ in range(per_shard):
            parts.append(
                t.set_column(
                    0, "doc_id", pc.add(t.column("doc_id"), r * _REPEAT_STRIDE)
                )
            )
            r += 1
        import pyarrow as pa

        pq.write_table(pa.concat_tables(parts), os.path.join(shards_dir, f"shard-{s:03d}.parquet"))


def _manifests(out_dir: str) -> dict[str, float]:
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out_dir, "*", "part=*", "_MANIFEST.json"))
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--kill-after", type=int, default=2,
                    help="SIGKILL the driver once this many partition "
                    "manifests are committed")
    args = ap.parse_args()

    base = "/tmp/kgw_resume_smoke"
    shards_dir = os.path.join(base, "shards")
    out_dir = os.path.join(base, "out")
    shutil.rmtree(base, ignore_errors=True)
    _build_shards(args.sf_dir, args.repeat, shards_dir, args.shards)

    env = dict(os.environ)
    env["RAY_ADDRESS"] = "local"
    cmd = [
        sys.executable, "-m", "kgw_ray.job",
        "--input", os.path.join(shards_dir, "*.parquet"),
        "--out", out_dir,
        "--partitions", str(args.partitions),
    ]
    # run 1: kill with SIGKILL (no cleanup possible — the crash-consistency
    # path) once kill_after partitions have committed
    p = subprocess.Popen(
        cmd, env=env, cwd=_REPO, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    committed_at_kill: dict[str, float] = {}
    deadline = time.monotonic() + 600
    finished_early = False
    while time.monotonic() < deadline:
        if p.poll() is not None:
            finished_early = True
            break
        m = _manifests(out_dir)
        if len(m) >= args.kill_after:
            committed_at_kill = m
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            p.wait()
            break
        time.sleep(0.2)
    subprocess.run(["ray", "stop", "--force"], capture_output=True)
    if finished_early:
        print(json.dumps({"error": "job finished before the kill window; "
                          "raise --repeat"}))
        sys.exit(1)

    # run 2: identical submission — must skip every committed partition
    out = subprocess.run(
        cmd, env=env, cwd=_REPO, capture_output=True, text=True, check=True,
        timeout=900,
    )
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    subprocess.run(["ray", "stop", "--force"], capture_output=True)

    after = _manifests(out_dir)
    untouched = [
        p for p, mt in committed_at_kill.items()
        if p in after and after[p] == mt
    ]
    print(
        json.dumps(
            {
                "metric": "kill-and-resume smoke (SIGKILL mid-run, "
                "re-submit, completed partitions skipped)",
                "committed_before_kill": len(committed_at_kill),
                "skipped_on_resume": len(untouched),
                "all_prior_commits_reused": len(untouched)
                == len(committed_at_kill),
                "total_manifests": len(after),
                "nodes": metrics["nodes"],
                "edges": metrics["edges"],
                "n_docs": 5000 * args.repeat
                if args.sf_dir.rstrip("/").endswith("sf0.1")
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
