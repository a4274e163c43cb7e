"""Sink format-validity tests, mirroring the reference's strategy
(tests/test_workflows.py:193-354): CSV/JSONL parse + row counts, GraphML
cross-parser check (xml.etree), MeTTa balanced-paren grammar, SQL dump
replays into sqlite3."""

import csv
import json
import sqlite3
import xml.etree.ElementTree as ET

import pyarrow as pa
import pytest
import ray.data as rd

from kgw_ray.sinks import exports


@pytest.fixture(scope="module")
def tiny_graph():
    nodes = rd.from_arrow(
        pa.table(
            {
                "id": ["a", "b", "c"],
                "type": ["gene", "gene", "disease"],
                "properties": [
                    '{"name":"A","score":1.5,"flags":[1,2]}',
                    '{"name":"B <x> & \'q\'"}',
                    "{}",
                ],
            }
        )
    )
    edges = rd.from_arrow(
        pa.table(
            {
                "source_id": ["a", "b", "a"],
                "target_id": ["c", "c", "b"],
                "type": ["causes", "causes", "interacts"],
                "properties": ['{"w":2}', "{}", '{"w":3,"tags":["x"]}'],
            }
        )
    )
    return nodes, edges


def test_statistics(tiny_graph, tmp_path):
    nodes, edges = tiny_graph
    p = str(tmp_path / "statistics.json")
    stats = exports.write_statistics(nodes, edges, p)
    on_disk = json.load(open(p))
    assert on_disk == stats
    assert stats["num_nodes"] == 3 and stats["num_edges"] == 3
    assert stats["num_node_types"] == 2 and stats["num_edge_types"] == 2
    assert stats["node_types"] == {"gene": 2, "disease": 1}


def test_csv_export(tiny_graph, tmp_path):
    nodes, _ = tiny_graph
    p = str(tmp_path / "kg_nodes.csv")
    exports.write_csv_export(nodes, p)
    rows = list(csv.reader(open(p)))
    assert rows[0] == ["id", "type", "properties"]
    assert len(rows) == 4
    # every properties cell must be JSON-parsable (reference :193-219)
    for r in rows[1:]:
        json.loads(r[2])


def test_jsonl_export(tiny_graph, tmp_path):
    _, edges = tiny_graph
    p = str(tmp_path / "kg_edges.jsonl")
    exports.write_jsonl_export(edges, p)
    lines = [json.loads(line) for line in open(p)]
    assert len(lines) == 3
    assert all(isinstance(d["properties"], dict) for d in lines)
    assert lines[0].keys() == {"source_id", "target_id", "type", "properties"}


def test_graphml(tiny_graph, tmp_path):
    nodes, edges = tiny_graph
    p = str(tmp_path / "kg.graphml")
    exports.write_graphml(nodes, edges, p)
    root = ET.parse(p).getroot()
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    g = root.find(f"{ns}graph")
    xml_nodes = g.findall(f"{ns}node")
    xml_edges = g.findall(f"{ns}edge")
    assert len(xml_nodes) == 3 and len(xml_edges) == 3
    # sequential edge ids e0..e2 (reference load.py:503)
    assert sorted(e.get("id") for e in xml_edges) == ["e0", "e1", "e2"]
    # key declarations cover all property keys
    keys = {k.get("attr.name") for k in root.findall(f"{ns}key")}
    assert {"type", "name", "score", "flags", "w", "tags"} <= keys
    # compound values JSON-stringified
    a = next(n for n in xml_nodes if n.get("id") == "a")
    data = {d.get("key"): d.text for d in a.findall(f"{ns}data")}
    assert json.loads(data["node_flags"]) == [1, 2]


def _assert_balanced_metta(path):
    """Reference grammar property: every line balanced-parenthesized with
    string-literal/escape awareness (test_workflows.py:310-354)."""
    for line in open(path):
        line = line.rstrip("\n")
        if not line:
            continue
        depth = 0
        in_str = False
        esc = False
        for ch in line:
            if esc:
                esc = False
                continue
            if ch == "\\":
                esc = True
            elif ch == '"':
                in_str = not in_str
            elif not in_str and ch == "(":
                depth += 1
            elif not in_str and ch == ")":
                depth -= 1
                assert depth >= 0, line
        assert depth == 0 and not in_str, line


def test_metta_repr1(tiny_graph, tmp_path):
    nodes, edges = tiny_graph
    p = str(tmp_path / "kg_spo.metta")
    exports.write_metta_repr1(nodes, edges, p)
    _assert_balanced_metta(p)
    lines = [line.rstrip("\n") for line in open(p) if line.strip()]
    # reference layout (load.py:548-607): 3 section comments + NodeType decl
    # + 2 type decls + 3 node atoms + 3 triples
    assert len(lines) == 12
    assert lines[0] == "; Types"
    assert lines[1] == "(: NodeType Type)"
    assert "; Nodes" in lines and "; Edges" in lines


def test_metta_repr2(tiny_graph, tmp_path):
    nodes, edges = tiny_graph
    p = str(tmp_path / "kg_repr2.metta")
    exports.write_metta_repr2(nodes, edges, p)
    _assert_balanced_metta(p)
    text = open(p).read()
    # Types section with both decl kinds (load.py:617-646)
    assert "(: NodeType Type)" in text and "(: EdgeType Type)" in text
    assert '(: "causes" EdgeType)' in text
    for eid in ('"e0"', '"e1"', '"e2"'):
        assert eid in text
        assert f"(: {eid} " in text  # typed edge-id decl
    # prefix notation: ("eN" (pred subj obj)) — load.py:700-702
    assert '("e2" ("interacts" "a" "b"))' in text
    assert '("has_property"' in text  # quoted property relation (load.py:611)


def test_metta_repr3_monotone_ids(tiny_graph, tmp_path):
    import re

    nodes, edges = tiny_graph
    p = str(tmp_path / "kg_repr3.metta")
    exports.write_metta_repr3(nodes, edges, p)
    _assert_balanced_metta(p)
    ids = []
    for line in open(p):
        m = re.match(r"\((\d+) ", line)
        if m and (not ids or int(m.group(1)) != ids[-1]):
            ids.append(int(m.group(1)))
    assert ids == sorted(ids) and len(set(ids)) == 6  # 3 nodes + 3 edges
    text = open(p).read()
    # reference record expansion (load.py:795-811): (cnt ("id" val)) etc. —
    # keys are clean()ed, i.e. JSON-quoted, exactly like the reference
    assert '(0 ("id" "a"))' in text and '(0 ("type" "gene"))' in text
    # nested list property fully expanded: flags [1,2] → the index tuple and
    # leaf share one paren group, as in the reference: ("flags" i v)
    assert '(0 ("properties" ("flags" 0 1)))' in text
    assert '(0 ("properties" ("flags" 1 2)))' in text


def test_metta_repr3_deep_nesting_walker():
    """The repr3 walker collapses nested list indices into one tuple path
    (reference dict_generator, load.py:720-773) and refuses >5 levels."""
    import pytest

    lines = [
        exports._path_to_line(p)
        for p in exports._dict_gen({7: {"properties": {"m": [[1, 2], [3]]}}}, [])
    ]
    assert lines == [
        '(7 ("properties" ("m" 0 0 1)))',
        '(7 ("properties" ("m" 0 1 2)))',
        '(7 ("properties" ("m" 1 0 3)))',
    ]
    too_deep = {0: {"p": {"k": [[[[[[1]]]]]]}}}
    with pytest.raises(NotImplementedError):
        list(exports._dict_gen(too_deep, []))


def test_graphml_quote_in_id(tmp_path):
    """Attribute-position values escape double quotes (quoteattr semantics) —
    an id like a"b must still yield well-formed XML."""
    nodes = rd.from_arrow(
        pa.table(
            {"id": ['a"b', "c"], "type": ["t", "t"], "properties": ["{}", "{}"]}
        )
    )
    edges = rd.from_arrow(
        pa.table(
            {
                "source_id": ['a"b'],
                "target_id": ["c"],
                "type": ["r"],
                "properties": ["{}"],
            }
        )
    )
    p = str(tmp_path / "q.graphml")
    exports.write_graphml(nodes, edges, p)
    root = ET.parse(p).getroot()  # parse fails on malformed attributes
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    g = root.find(f"{ns}graph")
    assert {n.get("id") for n in g.findall(f"{ns}node")} == {'a"b', "c"}
    e = g.find(f"{ns}edge")
    assert e.get("source") == 'a"b' and e.get("target") == "c"


def test_schema_html(tiny_graph, tmp_path):
    """schema.html is a well-formed, self-contained document whose SVG
    contains every type-level node and arrow from the (oracle-verified)
    schema_graph aggregate."""
    from kgw_ray.sinks.schema_html import write_schema_html
    from kgw_ray.stages.graph import schema_graph

    nodes, edges = tiny_graph
    p = str(tmp_path / "schema.html")
    write_schema_html(nodes, edges, p)
    text = open(p).read()
    assert "<script" not in text and "http-equiv" not in text  # self-contained
    root = ET.parse(p).getroot()  # XHTML → must parse as XML
    svg = root.find(".//{http://www.w3.org/2000/svg}svg")
    got_nodes = {
        g.get("data-type")
        for g in svg.findall(".//{http://www.w3.org/2000/svg}g[@class='node']")
    }
    got_edges = {
        g.get("data-edge")
        for g in svg.findall(".//{http://www.w3.org/2000/svg}g[@class='edge']")
    }
    expect = schema_graph(nodes, edges).to_pandas()
    assert got_nodes == {"gene", "disease"}
    assert got_edges == {
        f"{r.source_type}|{r.edge_type}|{r.target_type}" for r in expect.itertuples()
    }
    # hover strings carry the reference's text (load.py:141-148)
    assert "Node type: gene" in text and "Number of instances: 2" in text


def test_schema_html_compact(tiny_graph, tmp_path):
    from kgw_ray.sinks.schema_html import write_schema_html

    nodes, edges = tiny_graph
    p = str(tmp_path / "schema_compact.html")
    write_schema_html(nodes, edges, p, compact=True)
    root = ET.parse(p).getroot()
    svg = root.find(".//{http://www.w3.org/2000/svg}svg")
    got_edges = {
        g.get("data-edge")
        for g in svg.findall(".//{http://www.w3.org/2000/svg}g[@class='edge']")
    }
    # tiny graph: gene->disease (causes x2) and gene->gene (interacts)
    assert got_edges == {"gene|*|disease", "gene|*|gene"}
    assert "Number of edge types: 1" in open(p).read()


def test_sql_dump_replays(tiny_graph, tmp_path):
    nodes, edges = tiny_graph
    p = str(tmp_path / "kg.sql")
    exports.write_sql_dump(nodes, edges, p)
    con = sqlite3.connect(":memory:")
    con.executescript(open(p).read())
    assert con.execute("SELECT COUNT(*) FROM nodes").fetchone()[0] == 3
    assert con.execute("SELECT COUNT(*) FROM edges").fetchone()[0] == 3
    props = con.execute("SELECT properties FROM nodes WHERE id='b'").fetchone()[0]
    assert json.loads(props)["name"] == "B <x> & 'q'"


def test_hub_roundtrip(tiny_graph, tmp_path):
    nodes, edges = tiny_graph
    out = str(tmp_path / "hub")
    exports.write_hub(nodes, edges, out)
    n2 = rd.read_parquet(f"{out}/nodes")
    assert n2.count() == 3
    assert set(n2.schema().names) == {"id", "type", "properties"}


def test_bucketed_hub_and_adjacency(tiny_graph, tmp_path):
    """Bucketed hub layout: adjacency lookup reads only the node's hash
    bucket and returns exactly its out-edges."""
    nodes, edges = tiny_graph
    out = str(tmp_path / "hub_bucketed")
    exports.write_hub(nodes, edges, out, num_buckets=4)
    adj = exports.read_adjacency(out, "a", num_buckets=4).to_pandas()
    assert sorted(adj["target_id"]) == ["b", "c"]
    assert set(adj["source_id"]) == {"a"}
    # bucket dirs exist on disk (path-level pruning is real)
    import os

    assert any(d.startswith("bucket=") for d in os.listdir(f"{out}/edges"))


def test_counted_two_pass_ids_across_many_blocks(tmp_path):
    """Sequential ids must be continuous and in dataset order when the
    edge table spans MANY blocks (the counted two-pass offsets are per
    block — this is the case the single-block tiny_graph can't catch)."""
    n = 1000
    nodes = rd.from_arrow(
        pa.table(
            {
                "id": [f"n{i}" for i in range(10)],
                "type": ["t"] * 10,
                "properties": ["{}"] * 10,
            }
        )
    )
    edges = rd.from_arrow(
        pa.table(
            {
                "source_id": [f"n{i % 10}" for i in range(n)],
                "target_id": [f"n{(i + 1) % 10}" for i in range(n)],
                "type": [f"r{i}" for i in range(n)],  # per-row marker
                "properties": ["{}"] * n,
            }
        )
    ).repartition(16)
    p = str(tmp_path / "many.graphml")
    exports.write_graphml(nodes, edges, p)
    root = ET.parse(p).getroot()
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    xml_edges = root.find(f"{ns}graph").findall(f"{ns}edge")
    assert len(xml_edges) == n
    ids = [e.get("id") for e in xml_edges]
    assert ids == [f"e{i}" for i in range(n)]  # continuous, file order
    # and each id is attached to the row the dataset order dictates
    types = [e.find(f"{ns}data").text for e in xml_edges]
    assert types == [f"r{i}" for i in range(n)]

    p3 = str(tmp_path / "many_repr3.metta")
    exports.write_metta_repr3(nodes, edges, p3)
    import re

    recs = []
    for line in open(p3):
        m = re.match(r"\((\d+) ", line)
        if m and (not recs or int(m.group(1)) != recs[-1]):
            recs.append(int(m.group(1)))
    assert recs == list(range(10 + n))  # nodes 0..9 then edges continue


def test_ordered_sets_plan_context_flag():
    """The preserve-order knob must land on the DATASET'S plan context —
    Ray snapshots the DataContext at root creation, so the global flag is
    a no-op for already-built datasets (guards the private-API mechanism
    _ordered relies on against Ray upgrades) — and must be RESTORED on
    exit: the snapshot is shared by every dataset in the lineage, so a
    permanent flip would serialize later non-export executions."""
    ds = rd.from_arrow(pa.table({"x": [1, 2]})).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    assert ds._plan._context.execution_options.preserve_order is False
    with exports._ordered(ds):
        assert ds._plan._context.execution_options.preserve_order is True
    assert ds._plan._context.execution_options.preserve_order is False


def test_graphml_property_named_type(tmp_path):
    """A property literally named 'type' must not collide with the built-in
    node_type/edge_type key ids (duplicate XML ids — a reference bug we
    fix); the property value must stay distinguishable."""
    nodes = rd.from_arrow(
        pa.table(
            {
                "id": ["a"],
                "type": ["gene"],
                "properties": ['{"type":"custom","x":1}'],
            }
        )
    )
    edges = rd.from_arrow(
        pa.table(
            {
                "source_id": ["a"],
                "target_id": ["a"],
                "type": ["self"],
                "properties": ['{"type":"edgeprop"}'],
            }
        )
    )
    p = str(tmp_path / "typeprop.graphml")
    exports.write_graphml(nodes, edges, p)
    root = ET.parse(p).getroot()
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    key_ids = [k.get("id") for k in root.findall(f"{ns}key")]
    assert len(key_ids) == len(set(key_ids))  # no duplicate ids
    node = root.find(f"{ns}graph").find(f"{ns}node")
    data = {d.get("key"): d.text for d in node.findall(f"{ns}data")}
    assert data["node_type"] == "gene"
    assert data["node_type_prop"] == "custom"


def test_sinks_on_empty_graph(tmp_path):
    """Empty nodes/edges must export cleanly (unique() returns None and
    empty pulls drop schemas — both previously crashed)."""
    empty_nodes = rd.from_arrow(
        pa.table({"id": pa.array([], pa.string()), "type": pa.array([], pa.string()),
                  "properties": pa.array([], pa.string())})
    ).filter(expr="id == 'nope'")
    empty_edges = rd.from_arrow(
        pa.table({"source_id": pa.array([], pa.string()),
                  "target_id": pa.array([], pa.string()),
                  "type": pa.array([], pa.string()),
                  "properties": pa.array([], pa.string())})
    )
    exports.write_metta_repr1(empty_nodes, empty_edges, str(tmp_path / "e1.metta"))
    exports.write_metta_repr2(empty_nodes, empty_edges, str(tmp_path / "e2.metta"))
    exports.write_metta_repr3(empty_nodes, empty_edges, str(tmp_path / "e3.metta"))
    exports.write_graphml(empty_nodes, empty_edges, str(tmp_path / "e.graphml"))
    exports.write_csv_export(empty_nodes, str(tmp_path / "e.csv"))
    exports.write_jsonl_export(empty_edges, str(tmp_path / "e.jsonl"))
    exports.write_sql_dump(empty_nodes, empty_edges, str(tmp_path / "e.sql"))
    stats = exports.write_statistics(empty_nodes, empty_edges, str(tmp_path / "e.json"))
    assert stats["num_nodes"] == 0 and stats["node_types"] == {}
    from kgw_ray.sinks.schema_html import write_schema_html

    write_schema_html(empty_nodes, empty_edges, str(tmp_path / "e.html"))
    assert "; Types" in open(tmp_path / "e1.metta").read()
    ET.parse(tmp_path / "e.graphml")  # well-formed empty graph


def test_read_adjacency_empty_bucket(tiny_graph, tmp_path):
    """A node hashing to a bucket no edge landed in must yield an empty
    adjacency, not FileNotFoundError."""
    nodes, edges = tiny_graph
    out = str(tmp_path / "hub_sparse")
    exports.write_hub(nodes, edges, out, num_buckets=64)
    # find an id whose bucket dir does not exist (probe via the SAME
    # helper the sink uses, so a salt change can't silently detune this)
    import os

    import pyarrow as _pa

    existing = {d for d in os.listdir(f"{out}/edges") if d.startswith("bucket=")}
    probe = None
    for i in range(1000):
        cand = f"missing{i}"
        b = int(exports._bucket_of(_pa.array([cand]), 64)[0])
        if f"bucket={b}" not in existing:
            probe = cand
            break
    assert probe is not None
    adj = exports.read_adjacency(out, probe, num_buckets=64)
    assert adj.count() == 0
