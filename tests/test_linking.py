"""Entity-linking + canonicalization correctness: the LSH/cosine linker must
recover entities from corrupted surfaces; components must merge variants
with their canonical form."""

import numpy as np
import pyarrow as pa
import ray

from kgw_ray.stages.linking import EntityLinker, hash_embed


def test_hash_embed_deterministic_unit():
    v1, v2 = hash_embed("customer"), hash_embed("customer")
    assert np.allclose(v1, v2)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-9


def test_linker_exact_and_noisy():
    kb = [
        {"entity_id": "E:customer", "aliases": ["customer"]},
        {"entity_id": "E:window", "aliases": ["window"]},
        {"entity_id": "E:stream", "aliases": ["stream"]},
    ]
    ref = ray.put(kb)
    linker = EntityLinker(ref, column="surface")
    batch = pa.table(
        {"surface": ["customer", "custmer", "windw", "stream", "zzzzzz"]}
    )
    out = linker(batch).to_pylist()
    assert out[0]["entity_id"] == "E:customer"
    assert out[1]["entity_id"] == "E:customer"  # deletion recovered
    assert out[2]["entity_id"] == "E:window"
    assert out[3]["entity_id"] == "E:stream"
    # junk either unlinked or low-scored
    assert out[4]["entity_id"] is None or out[4]["link_score"] < out[0]["link_score"]


def test_linked_mentions_accuracy(sf_smoke):
    from kgw_ray.pipelines.webkg import linked_mentions

    df = linked_mentions(sf_smoke).to_pandas()
    assert len(df) > 0
    linked = df[df["entity_id"].notna()]
    acc = (linked["entity_id"] == "E:" + linked["surface"]).mean()
    recall = len(linked) / len(df)
    assert acc >= 0.9, f"linker accuracy {acc}"
    assert recall >= 0.8, f"linker recall {recall}"


def test_lsh_agrees_with_exhaustive(sf_smoke):
    """The approximate (LSH-blocked, cosine-scored) linker must agree with
    the gated exhaustive exact-Jaccard scorer on nearly every distinct
    mention — the blocking recall claim that justifies keeping the LSH
    variant rows-only (same pattern as the IVF probe-recall test)."""
    from kgw_ray.pipelines.webkg import linked_mentions, linked_mentions_exact

    lsh = linked_mentions(sf_smoke).to_pandas()
    ex = linked_mentions_exact(sf_smoke).to_pandas()
    lsh_map = dict(zip(lsh["variant"], lsh["entity_id"]))
    ex_map = dict(zip(ex["variant"], ex["entity_id"]))
    keys = set(ex_map)
    assert keys == set(lsh_map)
    agree = sum(lsh_map.get(k) == ex_map[k] for k in keys) / len(keys)
    assert agree >= 0.9, f"LSH vs exhaustive agreement {agree:.3f}"


def test_exact_linker_all_zero_overlap_tie_break():
    """A mention sharing no shingle with any KB alias still links (to the
    alphabetically-first entity, with its own union count) — pinned because
    the SQL oracle's ORDER BY ties behave exactly this way."""
    import pyarrow as pa

    from kgw_ray.stages.linking import _exact_kb, exact_link_batch

    batch = pa.table({"variant": ["0123456789"]})
    out = exact_link_batch(batch).to_pylist()[0]
    first_id, first_sh = _exact_kb()[0]
    assert out["entity_id"] == first_id
    assert out["inter_ct"] == 0
    assert out["union_ct"] == 10 + len(first_sh)  # 10 shingles + alias's


def test_canonicalize_components(sf_smoke):
    from kgw_ray.pipelines.webkg import canonical_entities, linked_mentions

    comps = canonical_entities(sf_smoke).to_pandas()
    linked = linked_mentions(sf_smoke).to_pandas()
    linked = linked[linked["entity_id"].notna()]
    # every correctly-linked variant must land in its entity's component
    ok = linked[linked["entity_id"] == "E:" + linked["surface"]]
    comp_of = dict(zip(comps["id"], comps["component"]))
    for _, row in ok.head(200).iterrows():
        cv = comp_of.get(row["variant"])
        cs = comp_of.get(row["surface"])
        assert cv is not None and cv == cs, (row["variant"], row["surface"], cv, cs)


def test_connected_components_reference():
    """Distributed min-label propagation == scalar union-find on a random
    graph (the canonicalization kernel)."""
    import pandas as pd
    import ray.data as rd

    from kgw_ray.stages.canonicalize import connected_components

    rng = np.random.default_rng(7)
    n = 60
    edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in rng.integers(0, n, size=(40, 2))]
    pairs = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in edges]),
                "b": pa.array([e[1] for e in edges]),
            }
        )
    )
    got = connected_components(pairs).to_pandas()

    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for e in edges for x in e}
    got_map = dict(zip(got["id"], got["component"]))
    assert got_map == expect


def test_connected_components_distributed_long_chain(monkeypatch):
    """The distributed label-propagation path (forced) must merge a chain
    component whose diameter far exceeds the round count that plain
    neighbor-min propagation could cover — pointer jumping doubles the
    radius per round."""
    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages import canonicalize as canon

    monkeypatch.setattr(canon, "_DRIVER_PAIR_LIMIT", 0)
    n = 60  # diameter 60 ≫ a 16-round neighbor-min reach, ≪ 2^16
    ids = [f"s{i:03d}" for i in range(n)]
    pairs = rd.from_arrow(
        pa.table({"a": ids[:-1], "b": ids[1:]})
    )
    out = canon.connected_components(pairs).to_pandas()
    assert set(out["component"]) == {"s000"}
    assert len(out) == n
