"""User-facing workflow API mirroring the reference's surface (EP1,
kgw/_shared/base.py:273-382): declare projects, append lazy export tasks,
then ``run(workflow)`` executes the DAG with file-existence resume.

Reference semantics re-expressed:

- ``Project(version, workdir)`` validates the version and derives a unique
  results dir ``{workdir}/{label}_v{version}`` (base.py:44-57).
- builder methods (``to_csv()`` …) only APPEND task records (base.py:146-164)
  — nothing executes until ``run``.
- ``run(workflow)`` flattens tasks from one project / a list / tuple / set
  (base.py:346-349), builds each project's graph hub ONCE (the
  CreateSqliteFile analog — here partitioned Parquet written through
  ``resumable_stage`` manifests), then runs each export; a task whose output
  file already exists is skipped (luigi file-target resume, tasks.py:75-83).
- returns True iff every task succeeded (scheduling_succeeded,
  base.py:364-381).

The execution engine underneath is pure Ray Data — the luigi worker pool is
replaced by Ray's streaming executor, which parallelizes WITHIN every stage
rather than only across tasks (SURVEY.md §4).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

import ray.data as rd

logger = logging.getLogger("kgw_ray")


@dataclass
class ExportTask:
    name: str
    filename: str
    fn: Callable[[rd.Dataset, rd.Dataset, str], None]
    project: "Project" = field(repr=False, default=None)

    @property
    def output_path(self) -> str:
        return os.path.join(self.project.results_dir, self.filename)

    def complete(self) -> bool:
        return os.path.exists(self.output_path)


class Project:
    """Base project: subclass with ``_label``, ``_versions`` and a
    ``build_graph() -> (nodes, edges)`` hook (the reference's
    ``_CreateSqliteFile`` slot, base.py:12, _hetionet.py:165-184)."""

    _label = "project"
    _versions: tuple[str, ...] = ("1",)

    def __init__(self, version: str | int = "latest", workdir: str = "."):
        version = str(version)
        if version == "latest":
            version = self._versions[-1]
        if version not in self._versions:
            raise ValueError(
                f"Invalid version {version!r} for {self._label}: "
                f"known versions {list(self._versions)}"
            )
        self.version = version
        self.workdir = workdir
        self.results_dir = os.path.join(
            workdir, f"{self._label}_v{version}", "results"
        )
        self._tasks: list[ExportTask] = []
        self._hub: Optional[tuple[rd.Dataset, rd.Dataset]] = None

    # -- transform hook -----------------------------------------------------

    def build_graph(self) -> tuple[rd.Dataset, rd.Dataset]:
        raise NotImplementedError

    def graph(self) -> tuple[rd.Dataset, rd.Dataset]:
        """The hub: built once per project instance, written resumably to
        ``results/hub/{nodes,edges}`` with lineage manifests."""
        if self._hub is None:
            from kgw_ray.state.manifest import resumable_stage

            nodes, edges = self.build_graph()
            fingerprint = f"{self._label}:{self.version}"
            hub = os.path.join(self.results_dir, "hub")
            n = resumable_stage(
                os.path.join(hub, "nodes"), "nodes", fingerprint, lambda: nodes
            )
            e = resumable_stage(
                os.path.join(hub, "edges"), "edges", fingerprint, lambda: edges
            )
            self._hub = (n, e)
        return self._hub

    # -- lazy task builders (reference base.py:146-164) ---------------------

    def _append(self, name: str, filename: str, fn) -> "Project":
        self._tasks.append(ExportTask(name, filename, fn, self))
        return self

    def to_statistics(self):
        from kgw_ray.sinks.exports import write_statistics

        return self._append(
            "statistics", "statistics.json",
            lambda n, e, p: write_statistics(n, e, p),
        )

    def to_csv(self):
        from kgw_ray.sinks.exports import write_csv_export

        def both(n, e, p):
            write_csv_export(n, os.path.join(os.path.dirname(p), "kg_nodes.csv"))
            write_csv_export(e, p)

        return self._append("csv", "kg_edges.csv", both)

    def to_jsonl(self):
        from kgw_ray.sinks.exports import write_jsonl_export

        def both(n, e, p):
            write_jsonl_export(n, os.path.join(os.path.dirname(p), "kg_nodes.jsonl"))
            write_jsonl_export(e, p)

        return self._append("jsonl", "kg_edges.jsonl", both)

    def to_graphml(self):
        from kgw_ray.sinks.exports import write_graphml

        return self._append("graphml", "kg.graphml", write_graphml)

    def to_metta(self, representation: int = 1):
        from kgw_ray.sinks import exports

        fn = {
            1: exports.write_metta_repr1,
            2: exports.write_metta_repr2,
            3: exports.write_metta_repr3,
        }[representation]
        return self._append(
            f"metta{representation}", f"kg_repr{representation}.metta", fn
        )

    def to_sql(self):
        from kgw_ray.sinks.exports import write_sql_dump

        return self._append("sql", "kg.sql", write_sql_dump)

    def to_schema(self, *, compact: bool = False):
        """Interactive type-level schema as a self-contained HTML document
        (reference ``sqlite_to_schema`` / ``sqlite_to_schema_compact``,
        load.py:84-283 — rendered dependency-free here, sinks/schema_html.py)
        plus a ``schema.json`` sidecar with the raw rows for machine
        consumers (non-compact only)."""
        import json

        from kgw_ray.sinks.schema_html import write_schema_html
        from kgw_ray.stages.graph import schema_graph

        def write(n, e, p):
            if compact:
                write_schema_html(n, e, p, compact=True)
                return
            # one distributed aggregate serves both files; the sidecar is
            # written FIRST — run() resumes on the task target (schema.html),
            # so a crash between the two writes must not leave a skipped
            # rerun permanently missing schema.json
            rows_df = schema_graph(n, e).to_pandas()
            jpath = os.path.join(os.path.dirname(p), "schema.json")
            tmp = f"{jpath}.partial"
            with open(tmp, "w") as f:
                json.dump(rows_df.to_dict(orient="records"), f, indent=2)
            os.replace(tmp, jpath)
            write_schema_html(n, e, p, schema_rows=rows_df)

        if compact:
            return self._append("schema_compact", "schema_compact.html", write)
        return self._append("schema", "schema.html", write)


def run(workflow, *, num_workers: Optional[int] = None) -> bool:
    """Execute all declared tasks of one or several projects.

    ``num_workers`` is accepted for reference API parity (base.py:333-334)
    but concurrency is governed by Ray's streaming executor.
    """
    if isinstance(workflow, Project):
        projects: Iterable[Project] = [workflow]
    elif isinstance(workflow, (list, tuple, set)):
        projects = list(workflow)
    else:
        raise ValueError(f"workflow must be a Project or collection, got {workflow!r}")
    for p in projects:
        if not isinstance(p, Project):
            raise ValueError(f"not a Project: {p!r}")

    ok = True
    for project in projects:
        tasks = [t for t in project._tasks]
        if not tasks:
            continue
        os.makedirs(project.results_dir, exist_ok=True)
        pending = [t for t in tasks if not t.complete()]
        for t in tasks:
            if t.complete():
                logger.info("skip %s:%s (output exists)", project._label, t.name)
        if not pending:
            continue
        try:
            nodes, edges = project.graph()
        except Exception:
            # the documented contract is a boolean (True iff every task
            # succeeded) — a broken hub build must not abort other projects
            logger.exception("hub build failed for %s", project._label)
            ok = False
            continue
        for t in pending:
            t0 = time.monotonic()
            try:
                t.fn(nodes, edges, t.output_path)
                logger.info(
                    "done %s:%s in %.2fs", project._label, t.name,
                    time.monotonic() - t0,
                )
            except Exception:
                logger.exception("failed %s:%s", project._label, t.name)
                ok = False
    return ok


# ---------------------------------------------------------------------------
# Built-in projects
# ---------------------------------------------------------------------------


class WebKG(Project):
    """Flagship adapter: Common-Crawl-style pages → knowledge graph."""

    _label = "webkg"
    _versions = ("sf0.001", "sf0.01", "sf0.1")

    def build_graph(self):
        from kgw_ray.pipelines.webkg import (
            edges_from_triples,
            nodes_from_triples,
            triples_dataset,
        )

        sf_dir = f"/root/testdata/{self.version}"
        # materialize ONCE: the hub writes nodes and edges as separate
        # resumable stages, and a shared LAZY triples dataset would run the
        # whole pages->extract->link pipeline once per stage
        triples = triples_dataset(sf_dir).materialize()
        return nodes_from_triples(triples), edges_from_triples(triples)


class TpchKG(Project):
    """Relational-star adapter (the per-dataset adapter analog)."""

    _label = "tpchkg"
    _versions = ("sf0.001", "sf0.01", "sf0.1")

    def build_graph(self):
        from kgw_ray.pipelines.tpch_kg import tpch_edges, tpch_nodes

        sf_dir = f"/root/testdata/{self.version}"
        return tpch_nodes(sf_dir), tpch_edges(sf_dir)
