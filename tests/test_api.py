"""Workflow API tests mirroring the reference's workflow-engine tests
(tests/test_workflows.py:11-67): version validation, lazy task collection,
run() arg handling, file-target resume, idempotent re-runs."""

import json
import os

import pytest

from kgw_ray.api import Project, TpchKG, WebKG, run


def test_version_validation(tmp_path):
    with pytest.raises(ValueError, match="Invalid version"):
        WebKG(version="nope", workdir=str(tmp_path))
    p = WebKG(version="latest", workdir=str(tmp_path))
    assert p.version == "sf0.1"
    p2 = WebKG(version="sf0.001", workdir=str(tmp_path))
    assert "webkg_vsf0.001" in p2.results_dir


def test_tasks_are_lazy(tmp_path):
    p = WebKG(version="sf0.001", workdir=str(tmp_path))
    p.to_statistics().to_csv().to_jsonl()
    assert [t.name for t in p._tasks] == ["statistics", "csv", "jsonl"]
    # nothing ran yet
    assert not os.path.exists(p.results_dir)


def test_run_arg_validation(tmp_path):
    with pytest.raises(ValueError, match="workflow must be"):
        run("not a project")
    with pytest.raises(ValueError, match="not a Project"):
        run([WebKG(version="sf0.001", workdir=str(tmp_path)), 42])
    assert run([]) is True  # empty collection: vacuous success


def test_run_and_resume(tmp_path):
    wd = str(tmp_path)
    p = WebKG(version="sf0.001", workdir=wd)
    p.to_statistics().to_csv().to_metta(1)
    assert run(p) is True

    stats_path = os.path.join(p.results_dir, "statistics.json")
    stats = json.load(open(stats_path))
    assert stats["num_nodes"] > 0 and stats["num_edges"] > 0
    assert os.path.exists(os.path.join(p.results_dir, "kg_nodes.csv"))
    assert os.path.exists(os.path.join(p.results_dir, "kg_edges.csv"))
    assert os.path.exists(os.path.join(p.results_dir, "kg_repr1.metta"))

    # resume: re-run skips complete targets (mtime unchanged)
    mtime = os.path.getmtime(stats_path)
    p2 = WebKG(version="sf0.001", workdir=wd)
    p2.to_statistics()
    assert run(p2) is True
    assert os.path.getmtime(stats_path) == mtime


def test_multi_project_workflow(tmp_path):
    wd = str(tmp_path)
    w = [
        WebKG(version="sf0.001", workdir=wd).to_statistics(),
        TpchKG(version="sf0.001", workdir=wd).to_statistics(),
    ]
    assert run(w) is True
    s1 = json.load(open(os.path.join(w[0].results_dir, "statistics.json")))
    s2 = json.load(open(os.path.join(w[1].results_dir, "statistics.json")))
    assert s1["num_nodes"] > 0 and s2["num_nodes"] > s1["num_nodes"]


def test_custom_project_subclass(tmp_path):
    """The extension surface (SURVEY.md §2.8): a new adapter = subclass with
    a build_graph hook."""
    import pyarrow as pa
    import ray.data as rd

    class Mini(Project):
        _label = "mini"
        _versions = ("1",)

        def build_graph(self):
            nodes = rd.from_arrow(
                pa.table({"id": ["x"], "type": ["t"], "properties": ["{}"]})
            )
            edges = rd.from_arrow(
                pa.table(
                    {
                        "source_id": ["x"],
                        "target_id": ["x"],
                        "type": ["self"],
                        "properties": ["{}"],
                    }
                )
            )
            return nodes, edges

    p = Mini(workdir=str(tmp_path))
    p.to_statistics().to_sql().to_schema()
    assert run(p) is True
    stats = json.load(open(os.path.join(p.results_dir, "statistics.json")))
    assert stats == {
        "num_nodes": 1,
        "num_edges": 1,
        "num_node_types": 1,
        "num_edge_types": 1,
        "node_types": {"t": 1},
        "edge_types": {"self": 1},
    }
    schema = json.load(open(os.path.join(p.results_dir, "schema.json")))
    assert schema == [
        {"source_type": "t", "edge_type": "self", "target_type": "t", "n": 1}
    ]
