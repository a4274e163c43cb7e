"""Unit tests for the closing-wave text machinery: winnowing selection,
vectorized window hashes, and the exact-integer bigram-lift arithmetic.
(The end-to-end value parity of the registry queries is covered for every
oracle-bearing entry by tests/test_oracle_parity.py.)"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kgw_ray.stages.textstats import (
    _WINNOW_W,
    _token_hashes,
    rolling_fingerprint,
    window_hashes,
    winnow_select,
)


def _naive_window_hashes(h: np.ndarray, w: int = 8) -> np.ndarray:
    """Reference mod-2^64 polynomial window hash, per-window Python ints."""
    n = len(h)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    wp = min(n, w)
    B, M = 1000003, 1 << 64
    out = []
    for s in range(n - wp + 1):
        acc = 0
        for j in range(wp):
            acc = (acc * B + int(h[s + j])) % M
        out.append(acc)
    return np.array(out, dtype=np.uint64)


def _naive_winnow(win: np.ndarray, w: int = _WINNOW_W) -> np.ndarray:
    """Reference leftmost-min winnowing selection."""
    n = len(win)
    if n == 0:
        return win
    picks = set()
    n_wins = max(n - w + 1, 1)
    for s in range(n_wins):
        window = win[s : s + w]
        j = int(np.argmin(window))  # argmin is leftmost-first already
        picks.add(s + j)
    return win[sorted(picks)]


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=40),
)
@settings(max_examples=60, deadline=None)
def test_window_hashes_matches_naive(vals):
    h = np.array(vals, dtype=np.uint64)
    got = window_hashes(h)
    exp = _naive_window_hashes(h)
    assert np.array_equal(got, exp)


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=60),
)
@settings(max_examples=60, deadline=None)
def test_winnow_select_matches_naive(vals):
    win = np.array(vals, dtype=np.uint64)
    got = winnow_select(win)
    exp = _naive_winnow(win)
    assert np.array_equal(got, exp)


def test_winnow_select_tie_pins_leftmost():
    # identical hashes: every window's min is its leftmost element, so the
    # selected positions are exactly the window starts
    win = np.full(6, 7, dtype=np.uint64)
    sel = winnow_select(win, 4)
    # windows start at 0,1,2 -> leftmost-min positions {0,1,2}
    assert len(sel) == 3 and set(sel.tolist()) == {7}


def test_winnow_short_input_single_window():
    win = np.array([9, 3, 5], dtype=np.uint64)  # fewer than W hashes
    sel = winnow_select(win, 4)
    assert sel.tolist() == [3]


def test_rolling_fingerprint_refactor_identity():
    # the refactored rolling_fingerprint (min over window_hashes) must equal
    # the published definition on the documented short/long cases
    toks = ["alpha", "beta", "gamma"]
    h = _token_hashes(toks)
    acc = 0
    for x in h:  # n < w: one window over all tokens
        acc = (acc * 1000003 + int(x)) % (1 << 64)
    assert rolling_fingerprint(toks) == acc

    toks10 = [f"t{i}" for i in range(10)]
    exp = int(_naive_window_hashes(_token_hashes(toks10)).min())
    assert rolling_fingerprint(toks10) == exp


def test_bigram_lift_exact_arithmetic(tmp_path):
    """Tiny deterministic corpus: hand-checked lift values (exact ints)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b a b", "a b c c"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["s0", "s0"], pa.string()),
            "n_chars": pa.array([7, 7], pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")

    from kgw_ray.pipelines.training_data import text_bigram_lift

    out = text_bigram_lift(str(tmp_path)).to_pydict()
    # N=8 tokens (a:3 b:3 c:2), M=6 bigrams; c("a b")=3
    # lift(a b) = 3*64*1e6 // (6*3*3) = 192e6 // 54 = 3555555
    by = dict(zip(out["gram"], out["lift_ppm"]))
    assert by["a b"] == 3 * 8 * 8 * 1_000_000 // (6 * 3 * 3)
    # c("c c")=1 -> 1*64e6 // (6*2*2) = 2666666
    assert by["c c"] == 1 * 8 * 8 * 1_000_000 // (6 * 2 * 2)
    n_by = dict(zip(out["gram"], out["n"]))
    assert n_by["a b"] == 3 and n_by["b a"] == 1


def test_inverted_index_partials_exact_across_blocks(tmp_path):
    """df/tf/first_doc must be exact regardless of block boundaries: write
    many one-row fragments so every batch holds a single doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "documents.parquet"
    d.mkdir()
    for i in range(6):
        t = pa.table(
            {
                "doc_id": pa.array([i], pa.int64()),
                "text": pa.array(["x y x" if i % 2 == 0 else "y z"], pa.string()),
                "lang": pa.array(["en"], pa.string()),
                "source": pa.array(["s0"], pa.string()),
                "n_chars": pa.array([5], pa.int64()),
            }
        )
        pq.write_table(t, d / f"part-{i}.parquet")

    from kgw_ray.pipelines.training_data import docs_inverted_index

    out = docs_inverted_index(str(tmp_path)).to_pandas().set_index("tok")
    assert out.loc["x", "df"] == 3 and out.loc["x", "tf"] == 6
    assert out.loc["y", "df"] == 6 and out.loc["y", "tf"] == 6
    assert out.loc["z", "df"] == 3 and out.loc["z", "tf"] == 3
    assert out.loc["x", "first_doc"] == 0 and out.loc["z", "first_doc"] == 1
