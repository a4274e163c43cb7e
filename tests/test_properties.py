"""Property-based tests (hypothesis) for the engine's core invariants:
byte-identical HTML round-trip for ARBITRARY text, MeTTa escaping grammar,
rolling-hash/window consistency, informative-value filter."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kgw_ray.functions.scalars import clean, is_informative_value
from kgw_ray.sources.pages import render_html
from kgw_ray.stages.extract import HtmlExtract

_hx = HtmlExtract()

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    max_size=800,
)


@settings(max_examples=200, deadline=None)
@given(text=text_strategy, doc_id=st.integers(min_value=0, max_value=10**9))
def test_extract_roundtrip_any_text(text, doc_id):
    """The per-row invariant (BASELINE.json input_hint): extraction recovers
    the embedded text byte-identically for ANY unicode string."""
    assert _hx.extract_one(render_html(doc_id, "src", text)) == text


@settings(max_examples=200, deadline=None)
@given(
    value=st.recursive(
        st.one_of(
            st.integers(min_value=-(10**9), max_value=10**9),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.booleans(),
            st.text(max_size=40),
        ),
        lambda children: st.lists(children, max_size=4),
        max_leaves=8,
    )
)
def test_clean_is_single_metta_atom(value):
    """clean() output is one atom: numbers verbatim, else one balanced
    double-quoted string literal with valid escapes (reference
    tests/test_shared.py:80-84 generalized)."""
    s = clean(value)
    if isinstance(value, (int, float)):
        # bool included: it is an int subclass and the reference renders it
        # verbatim too (load.py:538-545)
        assert s == str(value)
        return
    assert s.startswith('"') and s.endswith('"') and len(s) >= 2
    # interior quotes must all be escaped
    i, n = 1, len(s) - 1
    while i < n:
        if s[i] == "\\":
            i += 2
            continue
        assert s[i] != '"', s
        i += 1


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(st.characters(whitelist_categories=("Ll",)), min_size=1, max_size=6), max_size=60))
def test_batch_shingles_equal_per_doc(toks):
    """Vectorized batch shingling == per-doc shingling for any token list."""
    import numpy as np

    from kgw_ray.stages.dedup import batch_shingle_hashes, shingle_hashes

    text = " ".join(toks)
    flat, offs = batch_shingle_hashes([text, "", text])
    for i in (0, 2):
        assert np.array_equal(
            np.unique(flat[offs[i] : offs[i + 1]]), shingle_hashes(text)
        )
    assert offs[1] == offs[2]  # empty doc contributes nothing


@settings(max_examples=200, deadline=None)
@given(
    st.one_of(
        st.none(),
        st.floats(allow_nan=True),
        st.text(max_size=5),
        st.integers(),
        st.lists(st.integers(), max_size=3),
    )
)
def test_informative_value_semantics(v):
    """None / "" / NaN are uninformative; everything else informative
    (reference extract.py:356-366)."""
    import math

    expect = not (
        v is None
        or (isinstance(v, str) and v == "")
        or (isinstance(v, float) and math.isnan(v))
    )
    assert is_informative_value(v) is expect


_json_leaf = st.one_of(
    st.integers(min_value=-(10**6), max_value=10**6),
    st.booleans(),
    st.text(max_size=12),
)
_json_value = st.recursive(
    _json_leaf,
    lambda ch: st.one_of(
        st.lists(ch, max_size=3),
        st.dictionaries(st.text(min_size=1, max_size=6), ch, max_size=3),
    ),
    max_leaves=12,
)


def _list_depth(v, d=0):
    if isinstance(v, (list, tuple)):
        return max([_list_depth(x, d + 1) for x in v] or [d + 1])
    if isinstance(v, dict):
        return max([_list_depth(x, d) for x in v.values()] or [d])
    return d


@settings(max_examples=150, deadline=None)
@given(
    props=st.dictionaries(
        st.text(min_size=1, max_size=6), _json_value, max_size=4
    ).filter(lambda d: _list_depth(d) <= 3)  # the naive walk below covers 3
)
def test_repr3_walker_matches_naive_reference_walk(props):
    """The iterative repr3 walker (sinks/exports.py:_dict_gen) must emit the
    same lines as a direct transliteration of the reference's
    dict_generator/dict_to_metta (load.py:720-789) for arbitrary nested
    JSON-ish property dicts (≤5 list levels by construction here)."""
    from kgw_ray.sinks import exports

    def ref_gen(d, pre=None):
        pre = pre[:] if pre else []
        if isinstance(d, dict):
            for key, value in d.items():
                if isinstance(value, dict):
                    yield from ref_gen(value, pre + [key])
                elif isinstance(value, (list, tuple)):
                    for k0, v0 in enumerate(value):
                        if isinstance(v0, (list, tuple)):
                            for k1, v1 in enumerate(v0):
                                if isinstance(v1, (list, tuple)):
                                    for k2, v2 in enumerate(v1):
                                        assert not isinstance(v2, (list, tuple))
                                        yield from ref_gen(v2, pre + [(key, k0, k1, k2)])
                                else:
                                    yield from ref_gen(v1, pre + [(key, k0, k1)])
                        else:
                            yield from ref_gen(v0, pre + [(key, k0)])
                else:
                    yield pre + [key, value]
        else:
            yield pre + [d]

    item = {0: {"id": "x", "properties": props}}
    got = [exports._path_to_line(p) for p in exports._dict_gen(item, [])]
    want = [exports._path_to_line(p) for p in ref_gen(item)]
    assert got == want


@settings(max_examples=150, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120
        ),
        min_size=1,
        max_size=8,
    )
)
def test_quality_stats_vectorized_matches_python_loop(texts):
    """The RE2/flatten quality kernel must agree with a straight Python
    reimplementation on arbitrary ASCII text (unicode letters differ by
    design: RE2 \\w is ASCII, matching the DuckDB oracle)."""
    import re

    import numpy as np
    import pyarrow as pa

    from kgw_ray.stages.textstats import STOPWORD_SET, quality_stats_batch

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = quality_stats_batch(batch).to_pandas()
    punct_re = re.compile(r"[^\w\s]", re.ASCII)
    for i, t in enumerate(texts):
        toks = t.split()
        assert out.n_chars[i] == len(t)
        assert out.n_tokens[i] == len(toks)
        n_stop = sum(1 for w in toks if w in STOPWORD_SET)
        exp_stop = round(n_stop / len(toks), 6) if toks else 0.0
        assert abs(out.stopword_ratio[i] - exp_stop) < 1e-9
        exp_mean = round(sum(len(w) for w in toks) / len(toks), 6) if toks else 0.0
        assert abs(out.mean_token_len[i] - exp_mean) < 1e-9
        n_punct = len(punct_re.findall(t))
        exp_punct = round(n_punct / len(t), 6) if t else 0.0
        assert abs(out.punct_ratio[i] - exp_punct) < 1e-9


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=400,
    ),
    dup_factor=st.integers(min_value=1, max_value=20),
    q=st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.99]),
    bins=st.sampled_from([4, 16, 128]),
    pull_cap=st.sampled_from([1, 10, 10**6]),
)
@settings(max_examples=30, deadline=None)
def test_exact_quantiles_property(ray_session, vals, dup_factor, q, bins, pull_cap):
    """Histogram-refinement selection == sorted-array selection for ANY
    value multiset (duplicates amplified to force skewed bins), any bin
    count, and any pull cap (cap=1 exercises the recursion everywhere)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgw_ray.stages.agg import exact_quantiles

    v = np.repeat(np.asarray(vals, dtype=np.float64), dup_factor)
    ds = rd.from_arrow(pa.table({"x": pa.array(v)}))
    got = exact_quantiles(ds, "x", [q], bins=bins, pull_cap=pull_cap)
    sv = np.sort(v)
    want = float(sv[int(np.ceil(q * len(v))) - 1])
    assert got == {q: want}


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), max_size=30),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(min_value=2, max_value=4),
)
@settings(deadline=None, max_examples=60)
def test_dup_span_kernels_match_bruteforce(docs, k):
    """Window hashing + membership + island merge == a pure-Python
    token-tuple brute force on random small-alphabet corpora (dense
    duplication stresses every merge/boundary case)."""
    from collections import Counter

    import numpy as np
    import pyarrow as pa

    from kgw_ray.stages.corpus import (
        batch_window_positions,
        dup_span_mark_batch,
    )

    texts = [" ".join(d) for d in docs]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    _, _, wh = batch_window_positions(batch, k)
    uq, cnt = np.unique(wh, return_counts=True)
    dup_sorted = np.sort(uq[cnt >= 2])
    out = dup_span_mark_batch(batch, dup_sorted, k)
    got = {
        (int(r["doc_id"]), int(r["span_start"]), int(r["span_end"]), int(r["n_windows"]))
        for r in out.to_pylist()
    }

    counts: Counter = Counter()
    for d in docs:
        for i in range(len(d) - k + 1):
            counts[tuple(d[i : i + k])] += 1
    expected = set()
    for did, d in enumerate(docs):
        starts = [
            i + 1
            for i in range(len(d) - k + 1)
            if counts[tuple(d[i : i + k])] >= 2
        ]
        cur = None
        for s in starts:
            if cur is not None and s <= cur[1] + k:
                cur[1] = s
                cur[2] += 1
            else:
                if cur is not None:
                    expected.add((did, cur[0], cur[1] + k - 1, cur[2]))
                cur = [s, s, 1]
        if cur is not None:
            expected.add((did, cur[0], cur[1] + k - 1, cur[2]))
    assert got == expected


class TestGlobalRowNumber:
    def _check(self, cents, n_buckets=8):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from kgw_ray.stages.agg import global_row_number

        ids = np.arange(len(cents), dtype=np.int64)
        ds = rd.from_arrow(
            pa.table(
                {
                    "cents": pa.array(np.asarray(cents, dtype=np.int64)),
                    "event_id": pa.array(ids),
                }
            )
        ).repartition(4)
        out = (
            global_row_number(ds, ["cents", "event_id"], n_buckets=n_buckets)
            .to_pandas()
            .sort_values("rn")
        )
        order = np.lexsort((ids, np.asarray(cents)))
        assert out["event_id"].tolist() == ids[order].tolist()
        assert out["rn"].tolist() == list(range(1, len(cents) + 1))

    def test_duplicates_and_negatives(self):
        self._check([5, -3, 5, 5, 0, -3, 99, 0])

    def test_skewed_single_value(self):
        # every row lands in ONE range bucket — correctness unaffected
        self._check([7] * 50 + [1000])

    def test_spread(self):
        import numpy as np

        rng = np.random.default_rng(7)
        self._check(rng.integers(-(10**6), 10**6, size=500), n_buckets=16)


def test_trailing_hour_sum_includes_equal_ts_peers(tmp_path):
    """RANGE frames include ALL peers of the current row (equal ts), even
    those later in partition order — the semantics DuckDB implements and
    the composite-key searchsorted must reproduce."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgw_ray.pipelines.relational import events_trailing_hour_sum

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4],
            "user_id": [7, 7, 7, 7, 8],
            "ts": [
                base,
                base + pd.Timedelta(minutes=30),
                base + pd.Timedelta(minutes=30),  # peer of event 1
                base + pd.Timedelta(minutes=85),  # window [25m,85m]: keeps 1,2, drops 0
                base,
            ],
            "event_type": ["click"] * 5,
            "value": [1.00, 2.00, 4.00, 8.00, 16.00],
            "props": ["{}"] * 5,
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet")
    out = (
        events_trailing_hour_sum(str(tmp_path))
        .to_pandas()
        .set_index("event_id")["trailing_hour_cents"]
    )
    # event 1 and 2 are peers: both frames = {0,1,2} -> 700
    assert out[1] == 700 and out[2] == 700
    assert out[0] == 100
    assert out[3] == 8 * 100 + 600  # events 1,2 within [25m,85m]; 0 aged out
    assert out[4] == 1600


class TestGlobalOrderedPrefixSum:
    def _check(self, keys, vals, n_buckets=8):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from kgw_ray.stages.agg import global_ordered_prefix_sum

        k = np.asarray(keys, dtype=np.int64)
        v = np.asarray(vals, dtype=np.int64)
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(k), "n_tok": pa.array(v)})
        ).repartition(4)
        out = (
            global_ordered_prefix_sum(
                ds, ["doc_id"], "n_tok", n_buckets=n_buckets
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        order = np.argsort(k)
        assert out["doc_id"].tolist() == k[order].tolist()
        assert out["prefix"].tolist() == np.cumsum(v[order]).tolist()

    def test_basic(self):
        self._check([3, 1, 4, 0, 2], [10, 20, 30, 40, 50])

    def test_skewed_one_bucket(self):
        # all leading keys in one range bucket + one outlier
        self._check([7] * 40 + [100000], [1] * 41)

    def test_zero_and_negative_values(self):
        self._check([5, 2, 9, 1], [0, -7, 3, 0])

    def test_spread(self):
        import numpy as np

        rng = np.random.RandomState(7)
        k = rng.permutation(200).astype(np.int64) * 1000
        v = rng.randint(0, 500, size=200)
        self._check(k, v, n_buckets=16)
