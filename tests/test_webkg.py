"""Flagship pipeline tests: byte-identical extraction, triple extraction,
graph build, resume semantics."""

import os

import pyarrow.compute as pc
import pytest

from kgw_ray.sources.pages import render_html, url_for
from kgw_ray.stages.extract import HtmlExtract
from kgw_ray.stages.triples import ENTITIES, RELATIONS, extract_triples_batch
import pyarrow as pa


@pytest.mark.parametrize(
    "text",
    [
        "hello & < > world",
        "a" * 500,
        "x & y; &amp; <p>test</p>",
        "",
        "tab\tand\nnewline  double-space",
        "unicode: café ☃ \U0001f600",
    ],
)
def test_extract_byte_identity(text):
    hx = HtmlExtract()
    for doc_id in (0, 3, 6):
        assert hx.extract_one(render_html(doc_id, "srcX", text)) == text


def test_extract_byte_identity_dataset(sf_smoke):
    from kgw_ray.pipelines.webkg import extracted_pages

    ep = extracted_pages(sf_smoke)
    # null-safe inequality: pc.equal(x, null) is null, and Table.filter
    # DROPS null-mask rows — a regression nulling extracted_text would
    # otherwise pass vacuously. Also pin a nonzero row count.
    bad = ep.map_batches(
        lambda t: t.filter(
            pc.invert(
                pc.fill_null(pc.equal(t["text"], t["extracted_text"]), False)
            )
        ),
        batch_format="pyarrow",
    ).count()
    assert bad == 0
    assert ep.count() > 0


def test_triple_extraction_small():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["customer join part the fast table scan row", "slow merge key"],
        }
    )
    out = extract_triples_batch(batch)
    rows = out.to_pylist()
    # doc 1: (customer join part) at pos 0, (table scan row) at pos 5
    assert {(r["doc_id"], r["subj"], r["pred"], r["obj"], r["pos"]) for r in rows} == {
        (1, "customer", "join", "part", 0),
        (1, "table", "scan", "row", 5),
    }


def test_triples_do_not_cross_doc_boundary():
    # 'customer' at end of doc 1, 'join part' at start of doc 2 must not match
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["big slow customer", "join part value"],
        }
    )
    assert extract_triples_batch(batch).num_rows == 0


def test_lexicons_disjoint():
    assert not (ENTITIES & RELATIONS)


def test_build_webkg_and_resume(sf_smoke, tmp_path):
    from kgw_ray.pipelines.webkg import build_webkg
    from kgw_ray.state.manifest import read_manifest

    out = str(tmp_path / "hub")
    nodes, edges = build_webkg(sf_smoke, out)
    n_nodes, n_edges = nodes.count(), edges.count()
    assert n_nodes > 0 and n_edges > 0
    m = read_manifest(os.path.join(out, "edges"))
    assert m is not None and m.num_rows == n_edges and m.wall_time_sec > 0

    # resume: manifest mtime unchanged → stage skipped
    mtime = os.path.getmtime(os.path.join(out, "edges", "_MANIFEST.json"))
    nodes2, edges2 = build_webkg(sf_smoke, out)
    assert os.path.getmtime(os.path.join(out, "edges", "_MANIFEST.json")) == mtime
    assert edges2.count() == n_edges


def test_url_for_zero_pad():
    assert url_for(7, "src1") == "https://src1.example.org/doc/00000007"


def test_nodes_from_edges_equals_nodes_from_triples(sf_smoke):
    """build_webkg derives nodes from the merged edge table (one corpus
    pass); the derivation must equal the direct triple aggregation."""
    from kgw_ray.pipelines.webkg import (
        edges_from_triples,
        nodes_from_edges,
        nodes_from_triples,
        triples_dataset,
    )

    triples = triples_dataset(sf_smoke)
    direct = (
        nodes_from_triples(triples).to_pandas().sort_values("id").reset_index(drop=True)
    )
    derived = (
        nodes_from_edges(edges_from_triples(triples))
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(direct, derived)


def test_build_webkg_force_recomputes(tmp_path, sf_smoke):
    """resume=False must actually recompute: a prior commit in the same
    process must not be reused (the old pid-salted fingerprint collided)."""
    import json
    import os

    from kgw_ray.pipelines.webkg import build_webkg

    out = str(tmp_path / "hub")
    build_webkg(sf_smoke, out, resume=True)
    mpath = os.path.join(out, "edges", "_MANIFEST.json")
    first = json.load(open(mpath))
    # poison the manifest wall time so a rerun that skips is detectable
    first["wall_time_sec"] = -1.0
    json.dump(first, open(mpath, "w"))
    build_webkg(sf_smoke, out, resume=True)  # resume: must skip (stays -1)
    assert json.load(open(mpath))["wall_time_sec"] == -1.0
    build_webkg(sf_smoke, out, resume=False)  # force: must rewrite
    assert json.load(open(mpath))["wall_time_sec"] != -1.0


def test_pagerank_star_graph():
    """Hand-computed micro-unit ranks on A→C, B→C (iters=3, d=0.85):
    leaves stay at the 150000 base; C converges to
    150000 + 2·(150000·850000)//(10^6·1) = 405000."""
    import ray.data as rd

    from kgw_ray.stages.graph import pagerank

    nodes = rd.from_arrow(pa.table({"id": ["A", "B", "C"]}))
    edges = rd.from_arrow(
        pa.table({"source_id": ["A", "B"], "target_id": ["C", "C"]})
    )
    got = {
        r["id"]: r["pagerank_micro"]
        for r in pagerank(nodes, edges, num_partitions=2).take_all()
    }
    assert got == {"A": 150_000, "B": 150_000, "C": 405_000}


def test_incremental_edge_state_equals_full_recompute(sf_smoke):
    """Incremental view maintenance: ingesting the corpus in two batches
    (either order) through edge_state produces exactly the edges of one
    full recompute — the mergeable-state contract."""
    import pyarrow.compute as pc

    from kgw_ray.pipelines.webkg import (
        edge_state,
        edges_from_state,
        edges_from_triples,
        triples_dataset,
    )

    def half(parity):
        return triples_dataset(sf_smoke).map_batches(
            lambda t, _p=parity: t.filter(
                pc.equal(pc.bit_wise_and(t["doc_id"], 1), _p)
            ),
            batch_format="pyarrow",
        )

    full = (
        edges_from_triples(triples_dataset(sf_smoke))
        .to_pandas()
        .sort_values(["source_id", "type", "target_id"])
        .reset_index(drop=True)
    )
    for first, second in ((0, 1), (1, 0)):  # ingest order must not matter
        state = edge_state(half(second), prior=edge_state(half(first)))
        inc = (
            edges_from_state(state)
            .to_pandas()
            .sort_values(["source_id", "type", "target_id"])
            .reset_index(drop=True)
        )
        assert inc.equals(full)


def test_pagerank_exchange_path_parity(sf_smoke):
    """The at-scale exchange loop (forced) must reproduce the driver-merge
    fast path exactly — both are the same integer iteration."""
    from kgw_ray.pipelines.tpch_kg import tpch_graph
    from kgw_ray.stages.graph import pagerank

    nodes, edges = tpch_graph(sf_smoke)
    fast = (
        pagerank(nodes, edges).to_pandas().sort_values("id").reset_index(drop=True)
    )
    slow = (
        pagerank(nodes, edges, force_exchange=True)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert fast.equals(slow)


def test_triangle_counts_bruteforce():
    """triangle_counts == itertools brute force on a hand-built graph with
    multiplicity, reversed duplicates, self-loops and isolated edges."""
    from itertools import combinations

    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages.graph import triangle_counts

    raw = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),  # triangle abc
        ("c", "d"), ("d", "a"),                          # triangle acd
        ("d", "d"),                                      # self-loop
        ("e", "f"),                                      # no triangle
        ("a", "b"),                                      # duplicate
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([x for x, _ in raw]),
                "target_id": pa.array([y for _, y in raw]),
            }
        )
    )
    und = {tuple(sorted(p)) for p in raw if p[0] != p[1]}
    nodes = sorted({x for p in und for x in p})
    expected = {}
    for t in combinations(nodes, 3):
        if all(tuple(sorted(e)) in und for e in combinations(t, 2)):
            for n in t:
                expected[n] = expected.get(n, 0) + 1
    got = {
        r.id: int(r.n_triangles)
        for r in triangle_counts(ds, num_shards=4).to_pandas().itertuples()
    }
    assert got == expected == {"a": 2, "b": 1, "c": 2, "d": 1}


def test_triangle_counts_join_path_parity(sf_smoke):
    """broadcast_limit=0 pins the two-hash-join degree attach + shuffle
    closure path; it must equal the broadcast path node-for-node."""
    from kgw_ray.pipelines.webkg import edges_from_triples, triples_dataset
    from kgw_ray.stages.graph import triangle_counts

    edges = edges_from_triples(triples_dataset(sf_smoke)).materialize()

    def canon(ds):
        return sorted(
            (r.id, int(r.n_triangles)) for r in ds.to_pandas().itertuples()
        )

    assert canon(triangle_counts(edges)) == canon(
        triangle_counts(edges, broadcast_limit=0)
    )


def test_common_neighbor_counts_bruteforce():
    """common_neighbor_counts == itertools brute force on the same
    hand-built graph (multiplicity/reverse/self-loop noise)."""
    from itertools import combinations

    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages.graph import common_neighbor_counts

    raw = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
        ("c", "d"), ("d", "a"), ("d", "d"), ("e", "f"), ("a", "b"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([x for x, _ in raw]),
                "target_id": pa.array([y for _, y in raw]),
            }
        )
    )
    und = {tuple(sorted(p)) for p in raw if p[0] != p[1]}
    nbrs: dict = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    expected = {}
    for x, y in combinations(sorted(nbrs), 2):
        n = len(nbrs[x] & nbrs[y])
        if n:
            expected[(x, y)] = n
    got = {
        (r.x, r.y): int(r.n_common)
        for r in common_neighbor_counts(ds, num_shards=4).to_pandas().itertuples()
    }
    assert got == expected
    assert got[("a", "c")] == 2  # b and d


def test_clustering_coefficients_paths_and_values(sf_smoke):
    """Join path (broadcast_limit=0) == broadcast path, and the permille
    formula spot-checked against n_triangles/degree on every row."""
    from kgw_ray.pipelines.webkg import edges_from_triples, triples_dataset
    from kgw_ray.stages.graph import clustering_coefficients

    edges = edges_from_triples(triples_dataset(sf_smoke)).materialize()

    def canon(ds):
        return sorted(
            (r.id, int(r.degree), int(r.n_triangles), int(r.lcc_permille))
            for r in ds.to_pandas().itertuples()
        )

    fast = canon(clustering_coefficients(edges))
    assert fast == canon(clustering_coefficients(edges, broadcast_limit=0))
    for _id, d, t, lcc in fast:
        assert lcc == (2000 * t // (d * (d - 1)) if d >= 2 else 0)
    assert any(lcc > 0 for *_, lcc in fast)


def test_bfs_depths_bruteforce():
    """bfs_depths from the min node on the hand-built graph: exact hop
    depths, unreachable component absent, self-loops ignored."""
    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages.graph import bfs_depths

    raw = [
        ("b", "c"), ("c", "a"), ("c", "d2"), ("d2", "x"),
        ("d", "d"), ("e", "f"), ("a", "b"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([x for x, _ in raw]),
                "target_id": pa.array([y for _, y in raw]),
            }
        )
    )
    got = {
        r.id: int(r.depth) for r in bfs_depths(ds).to_pandas().itertuples()
    }
    # source = min id "a"; a adjoins b and c; d2 via c; x via d2; e/f and
    # the d self-loop component are unreachable
    assert got == {"a": 0, "b": 1, "c": 1, "d2": 2, "x": 3}


def test_recrawl_pages_shape(sf_smoke):
    """Two-crawl archive: crawl-2 rows revisit doc_id%3!=0 urls with a
    later warc_ts, an edited ('v2 '-prefixed) body and a stride-shifted
    provenance doc_id; crawl-1 rows are the flagship pages verbatim."""
    import pandas as pd

    from kgw_ray.sources.pages import (
        _RECRAWL_OFFSET_US,
        _REPEAT_STRIDE,
        recrawl_pages_dataset,
    )

    df = recrawl_pages_dataset(sf_smoke, crawls="both").to_pandas()
    c1 = df[df.doc_id < _REPEAT_STRIDE].set_index("doc_id")
    c2 = df[df.doc_id >= _REPEAT_STRIDE].copy()
    c2["orig"] = c2.doc_id - _REPEAT_STRIDE
    assert set(c2.orig) == {i for i in c1.index if i % 3 != 0}
    c2 = c2.set_index("orig")
    j = c1.join(c2, rsuffix="_2", how="inner")
    assert (j.url == j.url_2).all()  # same url across crawls
    assert (j.text_2 == "v2 " + j.text).all()
    dt = (j.warc_ts_2 - j.warc_ts) / pd.Timedelta(microseconds=1)
    assert (dt == _RECRAWL_OFFSET_US).all()


def test_latest_pages_newest_wins(sf_smoke):
    """latest_pages keeps exactly one row per url: the crawl-2 snapshot for
    re-crawled urls (md5 of the edited body), crawl-1 otherwise."""
    import hashlib

    from kgw_ray.pipelines.webkg import latest_pages
    from kgw_ray.sources.readers import read_table_pandas

    docs = read_table_pandas(sf_smoke, "documents", columns=["doc_id", "text"])
    got = latest_pages(sf_smoke).to_pandas()
    assert got.url.is_unique and len(got) == len(docs)
    by_id = {
        int(u.rsplit("/", 1)[1]): (ts, md5, n)
        for u, ts, md5, n in zip(
            got.url, got.warc_ts_us, got.text_md5, got.n_chars
        )
    }
    for row in docs.itertuples():
        text = row.text if row.doc_id % 3 == 0 else "v2 " + row.text
        _, md5, n = by_id[row.doc_id]
        assert md5 == hashlib.md5(text.encode()).hexdigest()
        assert n == len(text)


def test_edges_incremental_equals_full(sf_smoke):
    """Incremental two-crawl edge build == one-shot recompute over the
    unioned corpus, row-for-row (Sum/Min monoid merge)."""
    from kgw_ray.pipelines.webkg import (
        edge_state,
        edges_from_state,
        edges_incremental_two_crawls,
    )
    from kgw_ray.sources.pages import recrawl_pages_dataset
    from kgw_ray.stages.extract import extract_batch
    from kgw_ray.stages.triples import extract_triples_batch
    from kgw_ray.stages.linking import link_triples_batch

    inc = edges_incremental_two_crawls(sf_smoke).to_pandas()

    pages = recrawl_pages_dataset(sf_smoke, crawls="both", with_html=True)
    tr = (
        pages.map_batches(extract_batch, batch_format="pyarrow")
        .map_batches(extract_triples_batch, batch_format="pyarrow")
        .map_batches(link_triples_batch, batch_format="pyarrow")
    )
    full = edges_from_state(edge_state(tr)).to_pandas()
    k = ["source_id", "target_id", "type"]
    inc_s = inc.sort_values(k).reset_index(drop=True)
    full_s = full.sort_values(k).reset_index(drop=True)
    assert inc_s.equals(full_s)


def test_edge_deltas_classification(sf_smoke):
    """Every delta row either did not exist before (change='new',
    n_obs_before=0) or grew (change='updated', after > before); edges
    untouched by crawl 2 never appear."""
    from kgw_ray.pipelines.webkg import (
        _two_crawl_states,
        edge_deltas_two_crawls,
    )

    deltas = edge_deltas_two_crawls(sf_smoke).to_pandas()
    assert len(deltas) > 0
    new = deltas[deltas.change == "new"]
    upd = deltas[deltas.change == "updated"]
    assert len(new) + len(upd) == len(deltas)
    assert (new.n_obs_before == 0).all()
    assert (upd.n_obs_before > 0).all()
    assert (deltas.n_obs_after > deltas.n_obs_before).all()
    before = _two_crawl_states(sf_smoke)[0].to_pandas()
    key = ["source_id", "target_id", "type"]
    b = before.rename(
        columns={"subj_id": "source_id", "obj_id": "target_id", "pred": "type"}
    )
    merged = deltas.merge(b, on=key, how="left")
    # the before-state count embedded in each delta row is the true one
    assert (
        merged.n_obs_before == merged.n_obs.fillna(0).astype("int64")
    ).all()


def test_personalized_pagerank_hand_graph():
    """Hand-computed restart iteration on the 3-cycle A→B→C→A plus an
    isolated node D, seeds={A} (iters=3, d=0.85): mass leaves A, walks the
    cycle, and returns on the last step; D never gains mass; the seed base
    re-appends every iteration even when A receives no contributions."""
    import ray.data as rd

    from kgw_ray.stages.graph import personalized_pagerank

    nodes = rd.from_arrow(pa.table({"id": ["A", "B", "C", "D"]}))
    edges = rd.from_arrow(
        pa.table({"source_id": ["A", "B", "C"], "target_id": ["B", "C", "A"]})
    )
    got = {
        r["id"]: r["ppr_micro"]
        for r in personalized_pagerank(nodes, edges, ["A"]).take_all()
    }
    assert got == {"A": 764_125, "B": 127_500, "C": 108_375, "D": 0}


def test_personalized_pagerank_no_edges():
    """Edge-free graph: every seed holds exactly the base mass, everyone
    else zero (the empty-edge-weight guard path)."""
    import ray.data as rd

    from kgw_ray.stages.graph import personalized_pagerank

    nodes = rd.from_arrow(pa.table({"id": ["A", "B"]}))
    edges = rd.from_arrow(
        pa.table(
            {
                "source_id": pa.array([], pa.string()),
                "target_id": pa.array([], pa.string()),
            }
        )
    )
    got = {
        r["id"]: r["ppr_micro"]
        for r in personalized_pagerank(nodes, edges, ["B"]).take_all()
    }
    assert got == {"A": 0, "B": 150_000}


def test_personalized_pagerank_exchange_path_parity(sf_smoke):
    """The at-scale exchange loop (forced) must reproduce the driver-merge
    fast path exactly — same integer restart iteration."""
    import pyarrow.compute as pc

    from kgw_ray.pipelines.tpch_kg import tpch_graph
    from kgw_ray.stages.graph import personalized_pagerank

    nodes, edges = tpch_graph(sf_smoke)
    seeds = (
        nodes.map_batches(
            lambda b: b.filter(pc.equal(b.column("type"), "nation")).select(["id"]),
            batch_format="pyarrow",
        )
        .to_pandas()["id"]
        .tolist()
    )
    fast = (
        personalized_pagerank(nodes, edges, seeds)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    slow = (
        personalized_pagerank(nodes, edges, seeds, force_exchange=True)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert fast.equals(slow)


def test_anchor_extraction_matches_render_rule():
    """The anchor extractor recovers exactly the three deterministic
    outlinks (target id, host, anchor text) the renderer emits."""
    from kgw_ray.pipelines.webkg import _extract_anchors_batch

    doc_id, source = 137, "src17"
    batch = pa.table(
        {
            "doc_id": pa.array([doc_id], pa.int64()),
            "url": [url_for(doc_id, source)],
            "html": pa.array([render_html(doc_id, source, "body text")], pa.binary()),
        }
    )
    out = _extract_anchors_batch(batch).to_pylist()
    by_anchor = {r["anchor"]: r for r in out}
    assert set(by_anchor) == {"next", "half", "xref"}
    assert by_anchor["next"]["dst_doc_id"] == doc_id + 1
    assert by_anchor["next"]["dst_host"] == f"{source}.example.org"
    assert by_anchor["half"]["dst_doc_id"] == doc_id // 2
    assert by_anchor["xref"]["dst_doc_id"] == doc_id * 7 % 1000
    assert by_anchor["xref"]["dst_host"] == f"src{(doc_id + 3) % 20}.example.org"
    assert all(r["src_doc_id"] == doc_id for r in out)


def test_anchor_extraction_survives_replica_ids():
    """Replica/recrawl doc ids (offset by _REPEAT_STRIDE=1e8) render urls
    with 9+ digits ({doc_id:08d} pads to AT LEAST 8); the extractor must
    still see their outlinks — an exact \\d{8} silently dropped them."""
    from kgw_ray.pipelines.webkg import _extract_anchors_batch
    from kgw_ray.sources.pages import _REPEAT_STRIDE

    doc_id, source = _REPEAT_STRIDE + 137, "src17"
    batch = pa.table(
        {
            "doc_id": pa.array([doc_id], pa.int64()),
            "url": [url_for(doc_id, source)],
            "html": pa.array([render_html(doc_id, source, "body text")], pa.binary()),
        }
    )
    out = _extract_anchors_batch(batch).to_pylist()
    by_anchor = {r["anchor"]: r for r in out}
    assert set(by_anchor) == {"next", "half", "xref"}
    assert by_anchor["next"]["dst_doc_id"] == doc_id + 1  # 9-digit target
    assert by_anchor["half"]["dst_doc_id"] == doc_id // 2
    assert by_anchor["xref"]["dst_doc_id"] == doc_id * 7 % 1000


def test_chain_depth_path_parity(sf_smoke):
    """The driver-merge fast path and the distributed self-join path of
    chain_depth produce identical (doc_id, depth) tables, and both match
    the closed form depth(d) = bit_length(d)."""
    from kgw_ray.pipelines.webkg import chain_depth

    fast = {
        r["doc_id"]: r["depth"]
        for r in chain_depth(sf_smoke).take_all()
    }
    dist = {
        r["doc_id"]: r["depth"]
        for r in chain_depth(sf_smoke, driver_limit=0).take_all()
    }
    assert fast == dist
    assert all(
        d == (doc.bit_length() if doc > 0 else 0) for doc, d in fast.items()
    )


def test_forged_href_in_document_text_extracts_no_edge():
    """A document whose TEXT embeds an absolute outlink markup string must
    not contribute edges: render_html escapes < and > in body text, so the
    anchor pattern `>text</a>` can never be forged from content (the
    href=\"...\" substring itself survives escaping verbatim — pinning that
    the extractor requires the full anchor markup, not just the href)."""
    from kgw_ray.pipelines.webkg import _extract_anchors_batch

    doc_id, source = 42, "src2"
    forged = (
        'see href="https://evil.example.org/doc/99999999">click</a> '
        "and plain prose around it"
    )
    batch = pa.table(
        {
            "doc_id": pa.array([doc_id], pa.int64()),
            "url": [url_for(doc_id, source)],
            "html": pa.array([render_html(doc_id, source, forged)], pa.binary()),
        }
    )
    out = _extract_anchors_batch(batch).to_pylist()
    # only the three rendered outlinks; nothing pointing at evil
    assert len(out) == 3
    assert all("evil" not in r["dst_host"] for r in out)


def test_extract_batch_fastpath_equals_rowpath():
    """__call__'s vectorized Arrow path must be byte-identical to the
    per-row extract_one on a batch mixing every regime: clean pages,
    entity-bearing pages (&<>), foreign markup inside the div, pages
    with no main div, and empty text."""
    import pyarrow as pa

    from kgw_ray.sources.pages import render_html

    hx = HtmlExtract()
    pages = [
        render_html(1, "s", "plain words only here " * 20),
        render_html(2, "s", "ampersand & less < greater > mix " * 9),
        render_html(3, "s", ""),
        b'<html><div id="main"><p>a</p><span>x</span><p>b</p></div></html>',
        b"<html><body>no main div <p>para</p></body></html>",
        render_html(4, "s", "trailing & entity at cut boundary" * 7),
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(pages)), pa.int64()),
            "html": pa.array(pages, pa.binary()),
        }
    )
    out = hx(batch).column("extracted_text").to_pylist()
    expected = [hx.extract_one(h) for h in pages]
    assert out == expected
