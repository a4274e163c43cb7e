"""Containment-metric dedup pairs (stages/dedup.py:exact_jaccard_pairs with
metric="containment"): brute-force parity and path agreement."""

import numpy as np

from kgw_ray.sources.readers import read_table


def _brute_pairs(sf_smoke, threshold):
    from kgw_ray.stages.dedup import shingle_hashes

    docs = read_table(sf_smoke, "documents", columns=["doc_id", "text"])
    df = docs.to_pandas().sort_values("doc_id")
    ids = df["doc_id"].to_numpy()
    sh = [np.unique(shingle_hashes(t)) for t in df["text"]]
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            sa, sb = sh[i], sh[j]
            if len(sa) == 0 or len(sb) == 0:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            c = inter / min(len(sa), len(sb))
            if c >= threshold:
                out[(int(ids[i]), int(ids[j]))] = round(c, 6)
    return out


def test_containment_pairs_match_bruteforce(sf_smoke):
    """The distributed shingle-index containment pairs must equal the
    O(n²) brute-force set, values included (max_df=None = EXACT mode)."""
    from kgw_ray.stages.dedup import exact_jaccard_pairs

    docs = read_table(sf_smoke, "documents", columns=["doc_id", "text"])
    got = exact_jaccard_pairs(
        docs, threshold=0.8, max_df=None, metric="containment"
    ).to_pandas()
    got_map = {
        (int(a), int(b)): round(float(c), 6)
        for a, b, c in zip(got["a"], got["b"], got["containment"])
    }
    assert got_map == _brute_pairs(sf_smoke, 0.8)


def test_containment_superset_of_jaccard(sf_smoke):
    """At equal threshold, C >= J always, so the containment pair set must
    contain the Jaccard pair set."""
    from kgw_ray.stages.dedup import exact_jaccard_pairs

    docs = read_table(sf_smoke, "documents", columns=["doc_id", "text"])
    jac = exact_jaccard_pairs(docs, threshold=0.5, max_df=None).to_pandas()
    con = exact_jaccard_pairs(
        docs, threshold=0.5, max_df=None, metric="containment"
    ).to_pandas()
    jp = {(int(a), int(b)) for a, b in zip(jac["a"], jac["b"])}
    cp = {(int(a), int(b)) for a, b in zip(con["a"], con["b"])}
    assert jp <= cp


def test_containment_shuffle_sizes_path(sf_smoke):
    """Forced hash-join size attachment (size_broadcast_limit=0) must agree
    with the broadcast path for the containment metric too."""
    from kgw_ray.stages.dedup import exact_jaccard_pairs

    docs = read_table(sf_smoke, "documents", columns=["doc_id", "text"])
    a = exact_jaccard_pairs(
        docs, threshold=0.8, max_df=None, metric="containment"
    ).to_pandas()
    b = exact_jaccard_pairs(
        docs,
        threshold=0.8,
        max_df=None,
        metric="containment",
        size_broadcast_limit=0,
    ).to_pandas()
    key = lambda df: sorted(zip(df["a"], df["b"], df["containment"]))  # noqa: E731
    assert key(a) == key(b)
