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
