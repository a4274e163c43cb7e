"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All stages are stateless vectorized ``map_batches`` functions over Arrow
batches (numpy / pyarrow.compute kernels — no Python loop over tokens in the
hot path), matching the engine's transform idiom (SURVEY.md §2.2). At 100 TB
these run embarrassingly parallel with zero shuffle; the only wide op in this
module's pipelines is the optional groupby in exact-dedup (stages/dedup.py).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kgw_ray.functions.tokenize import py_tokens, split_tokens

# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols —
# the GPT-2 pre-tokenizer shape (public regex family), simplified to ASCII
# classes so the DuckDB oracle can reproduce it with regexp_extract_all.
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


_BPE_RE_STR = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, n_ws_tokens, n_bpe_tokens, n_chars).

    Fully vectorized: both token counts are single RE2 scans over the whole
    column (``pc.count_substring_regex``); no Python in the hot path.
    """
    text = batch.column("text")
    n_ws = pc.count_substring_regex(text, pattern=r"\S+")
    n_bpe = pc.count_substring_regex(text, pattern=_BPE_RE_STR)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_ws_tokens": pc.cast(n_ws, pa.int64()),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        }
    )


TOKEN_STATS_SQL = """
SELECT doc_id,
       len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
       length(text) AS n_chars
FROM documents
"""


def sentence_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, n_sentences, n_chars, chars_per_sentence).

    Sentences are runs of terminator punctuation ``[.!?]+`` — the cheap
    language-agnostic segmentation a quality filter uses before deeper
    parsing. Fully vectorized: one RE2 scan (``pc.count_substring_regex``
    — the SAME regex engine DuckDB links, so counts agree by construction)
    plus integer division; chars_per_sentence = n_chars // max(n, 1).
    """
    text = pc.fill_null(batch.column("text"), "")
    ns = pc.cast(pc.count_substring_regex(text, pattern=r"[.!?]+"), pa.int64())
    nc = pc.cast(pc.utf8_length(text), pa.int64())
    denom = pc.max_element_wise(ns, pa.scalar(1, pa.int64()))
    cps = pc.cast(pc.divide(nc, denom), pa.int64())
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_sentences": ns,
            "n_chars": nc,
            "chars_per_sentence": cps,
        }
    )


SENTENCE_STATS_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '[.!?]+')) AS BIGINT)
         AS n_sentences,
       CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars,
       CAST(length(COALESCE(text, ''))
            // greatest(len(regexp_extract_all(COALESCE(text, ''), '[.!?]+')), 1)
            AS BIGINT) AS chars_per_sentence
FROM documents
"""


def readability_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, n_words, n_sentences, n_syllables,
    flesch_milli): an integer Flesch reading-ease score — the readability
    gate curation recipes use to route simple vs complex prose.

    Word = alphabetic run ``[A-Za-z]+``; sentence = terminator run
    ``[.!?]+``; syllable proxy = vowel run ``[aeiouyAEIOUY]+`` (the
    classic cheap estimator — exact syllabification needs a dictionary).
    All three counts are single RE2 scans (``pc.count_substring_regex`` —
    the same regex engine DuckDB links), and the score is pure integer
    arithmetic in milli-units so the SQL oracle is bit-exact:

        flesch_milli = 206835 - 1015*words//max(sent,1)
                              - 84600*syll//max(words,1)

    (Flesch 1948: 206.835 - 1.015·w/s - 84.6·syll/w, scaled ×1000 with
    floor division on both engines.) Zero shuffle; embarrassingly
    parallel at 100 TB.
    """
    text = pc.fill_null(batch.column("text"), "")
    one = pa.scalar(1, pa.int64())
    nw = pc.cast(pc.count_substring_regex(text, pattern=r"[A-Za-z]+"), pa.int64())
    ns = pc.cast(pc.count_substring_regex(text, pattern=r"[.!?]+"), pa.int64())
    ny = pc.cast(
        pc.count_substring_regex(text, pattern=r"[aeiouyAEIOUY]+"), pa.int64()
    )
    wps = pc.divide(pc.multiply(pa.scalar(1015, pa.int64()), nw),
                    pc.max_element_wise(ns, one))
    spw = pc.divide(pc.multiply(pa.scalar(84600, pa.int64()), ny),
                    pc.max_element_wise(nw, one))
    score = pc.subtract(
        pc.subtract(pa.scalar(206_835, pa.int64()), wps), spw
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": nw,
            "n_sentences": ns,
            "n_syllables": ny,
            "flesch_milli": score,
        }
    )


READABILITY_SQL = """
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(COALESCE(text, ''), '[A-Za-z]+')) AS BIGINT)
           AS n_words,
         CAST(len(regexp_extract_all(COALESCE(text, ''), '[.!?]+')) AS BIGINT)
           AS n_sentences,
         CAST(len(regexp_extract_all(COALESCE(text, ''), '[aeiouyAEIOUY]+')) AS BIGINT)
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CAST(206835 - (1015 * n_words) // greatest(n_sentences, 1)
                   - (84600 * n_syllables) // greatest(n_words, 1)
            AS BIGINT) AS flesch_milli
FROM c
"""


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS = (
    "the a an and or of to in is was for on as with at by it this that",
    # deterministic, public English stopword list (subset)
)
STOPWORD_SET = frozenset(_STOPWORDS[0].split())
_STOP_SQL = ", ".join(f"'{w}'" for w in sorted(STOPWORD_SET))

_PUNCT_RE_STR = r"[^\w\s]"  # RE2 \w = [0-9A-Za-z_], same class as the oracle
_STOP_ARR = pa.array(sorted(STOPWORD_SET), pa.string())


def _segment_sums(values: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Per-document sums over a flattened token-level array, via prefix-sum
    differences (robust for zero-token documents, unlike ``reduceat``)."""
    cums = np.concatenate(([0], np.cumsum(values, dtype=np.int64)))
    offs = np.concatenate(([0], np.cumsum(sizes, dtype=np.int64)))
    return cums[offs[1:]] - cums[offs[:-1]]


def quality_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → per-doc quality signals:

    n_chars, n_tokens, mean_token_len, punct_ratio (punct chars / chars),
    stopword_ratio (stopword tokens / tokens), quality_score (a simple
    deterministic composite in [0,1]).

    Fully vectorized (the ``token_stats_batch`` idiom): char/punct counts
    are single RE2 column scans; token-level stats flatten ONE pinned-
    tokenizer split column and segment-sum it back per doc —
    no Python loop over tokens. All ratios rounded to 6 dp so the DuckDB
    oracle hashes identically.
    """
    text = pc.fill_null(batch.column("text"), "")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(zero_copy_only=False)
    n_punct = pc.cast(
        pc.count_substring_regex(text, pattern=_PUNCT_RE_STR), pa.int64()
    ).to_numpy(zero_copy_only=False)
    splits = split_tokens(text)
    sizes = pc.cast(pc.list_value_length(splits), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    flat = pc.list_flatten(splits)
    tok_len = pc.cast(pc.utf8_length(flat), pa.int64()).to_numpy(zero_copy_only=False)
    # leading/trailing whitespace yields empty split tokens; the pinned
    # SQL tokenizer filters them — mask by length>0 so both sides agree
    nonempty = (tok_len > 0).astype(np.int64)
    is_stop = (
        pc.is_in(flat, value_set=_STOP_ARR).to_numpy(zero_copy_only=False).astype(np.int64)
        * nonempty
    )
    n_tokens = _segment_sums(nonempty, sizes)
    n_stop = _segment_sums(is_stop, sizes)
    sum_tok_len = _segment_sums(tok_len, sizes)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_tok = np.where(n_tokens > 0, sum_tok_len / np.maximum(n_tokens, 1), 0.0)
        punct_ratio = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
        stop_ratio = np.where(n_tokens > 0, n_stop / np.maximum(n_tokens, 1), 0.0)
    # composite: long-enough docs with moderate punctuation score high
    score = (
        np.clip(n_tokens / 100.0, 0, 1) * 0.5
        + (1.0 - np.clip(punct_ratio * 10.0, 0, 1)) * 0.3
        + np.clip(stop_ratio * 5.0, 0, 1) * 0.2
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(n_tokens),
            "mean_token_len": pa.array(np.round(mean_tok, 6)),
            "punct_ratio": pa.array(np.round(punct_ratio, 6)),
            "stopword_ratio": pa.array(np.round(stop_ratio, 6)),
            "quality_score": pa.array(np.round(score, 6)),
        }
    )


QUALITY_SQL = f"""
WITH t AS (
    SELECT doc_id, text,
           length(text) AS n_chars,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks,
           length(regexp_replace(text, '[a-zA-Z0-9\\s_]', '', 'g')) AS n_punct
    FROM documents
), s AS (
    SELECT doc_id, n_chars, len(toks) AS n_tokens, n_punct,
           COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS sum_tok_len,
           len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS n_stop
    FROM t
)
SELECT doc_id, n_chars, n_tokens,
    ROUND(CASE WHEN n_tokens > 0 THEN sum_tok_len / CAST(n_tokens AS DOUBLE) ELSE 0 END, 6) AS mean_token_len,
    ROUND(CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0 END, 6) AS punct_ratio,
    ROUND(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END, 6) AS stopword_ratio,
    ROUND(
        LEAST(n_tokens / 100.0, 1.0) * 0.5
        + (1.0 - LEAST(CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0 END * 10.0, 1.0)) * 0.3
        + LEAST(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END * 5.0, 1.0) * 0.2,
    6) AS quality_score
FROM s
"""


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------


def _ngram_dup_stats(
    flat: pa.Array, doc_sizes: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc word-n-gram duplication stats over ONE flattened token column.

    ``flat`` is the batch's tokens back-to-back (empties already dropped),
    ``doc_sizes`` the per-doc token counts. Returns int64 arrays
    ``(n_ngrams, dup_ngrams, top_count)`` per doc. Fully vectorized: the
    n-gram strings are built with one ``binary_join_element_wise`` over
    shifted slices, doc boundaries masked with a numpy compare, and the
    per-(doc, gram) occurrence counts come from one ``pd.factorize`` +
    ``np.unique`` over composite keys — no Python loop over tokens.
    """
    import pandas as pd

    n_docs = len(doc_sizes)
    n_ngrams = np.maximum(doc_sizes - (n - 1), 0).astype(np.int64)
    dup = np.zeros(n_docs, dtype=np.int64)
    top = np.zeros(n_docs, dtype=np.int64)
    total = len(flat)
    if total < n:
        return n_ngrams, dup, top
    shifted = [flat.slice(i, total - n + 1) for i in range(n)]
    joined = pc.binary_join_element_wise(*shifted, " ")
    # position p starts a valid n-gram iff token p+n-1 is in the same doc
    doc_of_token = np.repeat(np.arange(n_docs, dtype=np.int64), doc_sizes)
    valid = doc_of_token[: total - n + 1] == doc_of_token[n - 1 :]
    grams = pc.filter(joined, pa.array(valid))
    doc_of_gram = doc_of_token[: total - n + 1][valid]
    if len(grams) == 0:
        return n_ngrams, dup, top
    codes, uniques = pd.factorize(grams.to_pandas())
    key = doc_of_gram * np.int64(len(uniques)) + codes.astype(np.int64)
    uq, cnt = np.unique(key, return_counts=True)
    doc_of_pair = uq // np.int64(len(uniques))
    distinct = np.bincount(doc_of_pair, minlength=n_docs).astype(np.int64)
    np.maximum.at(top, doc_of_pair, cnt.astype(np.int64))
    dup = n_ngrams - distinct
    return n_ngrams, dup, top


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → Gopher-style repetition signals, all exact int64:

    n_tokens, n_2grams, dup_2grams (bigram occurrences beyond the first of
    each distinct bigram), top_2gram_count (occurrences of the most common
    bigram), n_3grams, dup_3grams. The duplicate-n-gram fraction quality
    rule from the Gopher/MassiveText filters (public), emitted as exact
    numerator/denominator pairs so the DuckDB oracle hashes identically
    (no float ratios).
    """
    text = pc.fill_null(batch.column("text"), "")
    splits = split_tokens(text)
    sizes = pc.cast(pc.list_value_length(splits), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    flat = pc.list_flatten(splits)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keep = pc.greater(pc.utf8_length(flat), 0)
    nonempty = keep.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.filter(flat, keep)
    n_tokens = _segment_sums(nonempty, sizes)
    n2, d2, t2 = _ngram_dup_stats(flat, n_tokens, 2)
    n3, d3, _ = _ngram_dup_stats(flat, n_tokens, 3)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens),
            "n_2grams": pa.array(n2),
            "dup_2grams": pa.array(d2),
            "top_2gram_count": pa.array(t2),
            "n_3grams": pa.array(n3),
            "dup_3grams": pa.array(d3),
        }
    )


REPETITION_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, len(toks) AS n_tokens,
         list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1]) AS bi,
         list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tri
  FROM t
),
bc AS (
  SELECT doc_id, gram, count(*) AS c
  FROM (SELECT doc_id, unnest(bi) AS gram FROM g)
  GROUP BY doc_id, gram
),
bs AS (SELECT doc_id, count(*) AS n_bi_distinct, max(c) AS top_bi
       FROM bc GROUP BY doc_id),
tc AS (
  SELECT doc_id, gram, count(*) AS c
  FROM (SELECT doc_id, unnest(tri) AS gram FROM g)
  GROUP BY doc_id, gram
),
ts AS (SELECT doc_id, count(*) AS n_tri_distinct FROM tc GROUP BY doc_id)
SELECT g.doc_id, g.n_tokens,
       greatest(g.n_tokens - 1, 0) AS n_2grams,
       greatest(g.n_tokens - 1, 0) - COALESCE(bs.n_bi_distinct, 0) AS dup_2grams,
       COALESCE(bs.top_bi, 0) AS top_2gram_count,
       greatest(g.n_tokens - 2, 0) AS n_3grams,
       greatest(g.n_tokens - 2, 0) - COALESCE(ts.n_tri_distinct, 0) AS dup_3grams
FROM g
LEFT JOIN bs ON g.doc_id = bs.doc_id
LEFT JOIN ts ON g.doc_id = ts.doc_id
"""


# ---------------------------------------------------------------------------
# Language ID (n-gram / marker-word heuristic)
# ---------------------------------------------------------------------------

# Public marker-word profiles per language; CJK detection via codepoint range.
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is was for with that this".split()),
    "fr": frozenset("le la les et de des un une est dans pour que".split()),
    "es": frozenset("el la los las y de un una es en para que".split()),
    "de": frozenset("der die das und von zu ein eine ist im für mit".split()),
}
_CJK_RE = re.compile(r"[一-鿿]")


class LangId:
    """Actor-pool language identifier (profiles built once per actor).

    Scores each doc by marker-word hit rate per language plus a CJK
    character-ratio fast path; emits (doc_id, lang_pred, lang_conf).
    Deterministic — rows-only correctness check + accuracy unit test vs the
    ``lang`` column.
    """

    def __init__(self) -> None:
        self.profiles = {k: v for k, v in _LANG_MARKERS.items()}

    def ident_one(self, text: str) -> tuple[str, float]:
        if not text:
            return "und", 0.0
        cjk = len(_CJK_RE.findall(text))
        if cjk / max(len(text), 1) > 0.2:
            return "zh", round(cjk / len(text), 6)
        toks = py_tokens(text.lower())
        if not toks:
            return "und", 0.0
        best_lang, best_hits = "und", 0
        for lang, words in self.profiles.items():
            hits = sum(1 for w in toks if w in words)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang, round(best_hits / len(toks), 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        res = [self.ident_one(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array([r[0] for r in res], pa.string()),
                "lang_conf": pa.array([r[1] for r in res], pa.float64()),
            }
        )


def _lang_id_sql() -> str:
    """Oracle for the marker-word language heuristic: per-language hit
    counts over lowercased whitespace tokens, CJK char-ratio fast path,
    first-language-wins tie-break (the CASE order mirrors the Python
    iteration order of _LANG_MARKERS with its strict ``>`` update)."""
    hits = {
        lang: (
            "len(list_filter(toks, x -> x IN ("
            + ", ".join(f"'{w}'" for w in sorted(words))
            + ")))"
        )
        for lang, words in _LANG_MARKERS.items()
    }
    return f"""
WITH t AS (
  SELECT doc_id, length(text) AS n_chars,
         len(regexp_extract_all(text, '[一-鿿]')) AS cjk,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, n_chars, cjk, len(toks) AS n_toks,
         {hits['en']} AS he, {hits['fr']} AS hf,
         {hits['es']} AS hs, {hits['de']} AS hd
  FROM t
)
SELECT doc_id,
  CASE WHEN n_chars = 0 THEN 'und'
       WHEN CAST(cjk AS DOUBLE) / greatest(n_chars, 1) > 0.2 THEN 'zh'
       WHEN n_toks = 0 THEN 'und'
       WHEN greatest(he, hf, hs, hd) = 0 THEN 'und'
       WHEN he = greatest(he, hf, hs, hd) THEN 'en'
       WHEN hf = greatest(he, hf, hs, hd) THEN 'fr'
       WHEN hs = greatest(he, hf, hs, hd) THEN 'es'
       ELSE 'de' END AS lang_pred,
  CASE WHEN n_chars = 0 THEN 0.0
       WHEN CAST(cjk AS DOUBLE) / greatest(n_chars, 1) > 0.2
            THEN ROUND(CAST(cjk AS DOUBLE) / n_chars, 6)
       WHEN n_toks = 0 THEN 0.0
       ELSE ROUND(CAST(greatest(he, hf, hs, hd) AS DOUBLE) / n_toks, 6)
       END AS lang_conf
FROM s
"""


LANG_ID_SQL = _lang_id_sql()


_LANGID_SINGLETON: LangId | None = None


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Task-map variant of ``LangId``: per-process singleton profiles.

    The profiles are a few frozensets — trivial state, so a task map with a
    lazily built process-wide singleton beats an actor pool (pool
    startup/rampup cost, same measured rule as stages/extract.py). A REAL
    fasttext-style model would flip back to the actor-pool class above.
    """
    global _LANGID_SINGLETON
    if _LANGID_SINGLETON is None:
        _LANGID_SINGLETON = LangId()
    return _LANGID_SINGLETON(batch)


# ---------------------------------------------------------------------------
# Document fingerprinting (rolling hash + content hash)
# ---------------------------------------------------------------------------

_B = np.uint64(1000003)  # polynomial base (same family as CPython strhash)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _token_hashes(toks: list[str]) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            for t in toks
        ),
        dtype=np.uint64,
        count=len(toks),
    )


def rolling_fingerprint(toks: list[str], w: int = 8) -> int:
    """Winnowing-style fingerprint: min of rolling polynomial window hashes.

    Public scheme (Schleimer et al., winnowing). Deterministic; the min over
    windows is order-robust enough for shift-tolerant near-dup blocking.
    """
    if not toks:
        return 0
    return int(window_hashes(_token_hashes(toks), w).min())


def window_hashes(h: np.ndarray, w: int = 8) -> np.ndarray:
    """All rolling polynomial window hashes of ``h`` (w' = min(n, w) token
    hashes per window, base B, mod-2^64 ring) — the full array whose min is
    rolling_fingerprint. Vectorized as w' shifted multiply-adds (no per-
    position recurrence): win[s] = Σ_j h[s+j]·B^(w'-1-j) mod 2^64."""
    n = len(h)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    wp = min(n, w)
    m = n - wp + 1
    win = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(wp):
            coef = np.uint64(pow(1000003, wp - 1 - j, 1 << 64))
            win += h[j : j + m] * coef
    return win


_WINNOW_W = 4  # selection-window size (windows of W consecutive k-gram hashes)


def winnow_select(win: np.ndarray, sel_w: int = _WINNOW_W) -> np.ndarray:
    """Winnowing selection (Schleimer et al. 2003): from every window of
    ``sel_w`` consecutive k-gram hashes pick the minimum — ties pinned to
    the LEFTMOST position (the SQL oracle's (hash, pos) lexicographic min;
    the paper's rightmost rule differs only in which duplicate survives).
    Returns the selected hashes, one per distinct selected position.
    Vectorized: one sliding-window min + one equality argmax."""
    n_h = len(win)
    if n_h == 0:
        return win
    if n_h < sel_w:
        sw = win[None, :]
    else:
        sw = np.lib.stride_tricks.sliding_window_view(win, sel_w)
    m = sw.min(axis=1)
    first = (sw == m[:, None]).argmax(axis=1)
    pos = np.unique(np.arange(len(sw), dtype=np.int64) + first)
    return win[pos]


def winnow_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → winnowing fingerprint profile per document:
    n_grams (window-hash count), n_wins (selection windows), n_selected
    (distinct selected positions), min_fp (min selected hash) and digest
    (mod-2^64 sum of selected hashes) — the MOSS-style shift-tolerant
    signature a plagiarism/near-dup stage stores per document. uint64
    readouts ride as decimal strings (pandas/duckdb canon)."""
    texts = batch.column("text").to_pylist()
    n_grams = np.zeros(len(texts), dtype=np.int64)
    n_wins = np.zeros(len(texts), dtype=np.int64)
    n_sel = np.zeros(len(texts), dtype=np.int64)
    min_fp: list[str] = []
    digest: list[str] = []
    for i, t in enumerate(texts):
        h = _token_hashes(py_tokens(t))
        win = window_hashes(h)
        n_grams[i] = len(win)
        if len(win) == 0:
            min_fp.append("0")
            digest.append("0")
            continue
        n_wins[i] = max(len(win) - _WINNOW_W + 1, 1)
        sel = winnow_select(win)
        n_sel[i] = len(sel)
        min_fp.append(str(int(sel.min())))
        with np.errstate(over="ignore"):
            digest.append(str(int(np.add.reduce(sel))))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_grams": pa.array(n_grams),
            "n_wins": pa.array(n_wins),
            "n_selected": pa.array(n_sel),
            "min_fp": pa.array(min_fp, pa.string()),
            "digest": pa.array(digest, pa.string()),
        }
    )


def content_md5_list(texts) -> list[str]:
    """Exact-dedup content hash of each text (None → ""), byte-identical to
    DuckDB ``md5(text)`` — THE one implementation; exact_dedup_keep,
    fingerprint_batch and curate_documents all call this so the first-wins
    semantics can never diverge between stages."""
    return [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, content_md5, fingerprint).

    ``content_md5`` is the exact-dedup key (matches DuckDB ``md5(text)``);
    ``fingerprint`` is the winnowing rolling hash (rows-only check).
    """
    texts = batch.column("text").to_pylist()
    md5s = content_md5_list(texts)
    fps = [rolling_fingerprint(py_tokens(t)) for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "content_md5": pa.array(md5s, pa.string()),
            "fingerprint": pa.array(np.array(fps, dtype=np.uint64)),
        }
    )


# ---------------------------------------------------------------------------
# PII redaction (training-data compliance pass)
# ---------------------------------------------------------------------------

# RE2 patterns, byte-compatible between Arrow (pc.*_substring_regex) and
# DuckDB's regexp_* (both RE2): applied IN ORDER, each over the previous
# stage's output, so counts compose deterministically.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
)
PII_TOKEN = "<PII>"


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_redactions, redacted_md5): counts + md5 of the text after
    sequential regex redaction — the compliance pass every training-data
    corpus runs before release. Vectorized column scans (compiled RE2 via
    Arrow kernels); the redacted text itself never leaves the worker, only
    the digest does."""
    import pyarrow.compute as pc

    txt = pc.fill_null(batch.column(text_col), "")
    total = np.zeros(len(batch), dtype=np.int64)
    for _, pat in PII_PATTERNS:
        total += pc.cast(
            pc.count_substring_regex(txt, pattern=pat), pa.int64()
        ).to_numpy(zero_copy_only=False)
        txt = pc.replace_substring_regex(txt, pattern=pat, replacement=PII_TOKEN)
    md5s = content_md5_list(txt.to_pylist())
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_redactions": pa.array(total),
            "redacted_md5": pa.array(md5s, pa.string()),
        }
    )


def pii_redact_sql(source: str = "documents") -> str:
    """DuckDB oracle: the same ordered regexp_replace chain (RE2 on both
    engines), counting via regexp_extract_all lengths at each stage."""
    expr = "COALESCE(text, '')"
    counts = []
    for i, (_, pat) in enumerate(PII_PATTERNS):
        sql_pat = pat.replace("'", "''")
        counts.append(f"len(regexp_extract_all(s{i}, '{sql_pat}'))")
        expr = f"regexp_replace(s{i}, '{sql_pat}', '{PII_TOKEN}', 'g')"
        expr_alias = f"s{i + 1}"
        if i == 0:
            base = f"SELECT doc_id, COALESCE(text, '') AS s0 FROM {source}"
            stages = [base]
        stages.append(
            f"SELECT doc_id, {', '.join(f's{k}' for k in range(i + 1))}, "
            f"{expr} AS {expr_alias} FROM st{i}"
        )
    n = len(PII_PATTERNS)
    ctes = ", ".join(
        f"st{i} AS ({stages[i]})" for i in range(len(stages))
    )
    count_sum = " + ".join(counts)
    return f"""
WITH {ctes}
SELECT doc_id, CAST({count_sum} AS BIGINT) AS n_redactions,
       md5(s{n}) AS redacted_md5
FROM st{n}
"""


def ttr_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, n_tokens, n_distinct, ttr_permille) —
    type-token ratio, the standard lexical-diversity QC signal (low TTR =
    templated/repetitive text). Integer permille = 1000·distinct//total
    (0 for empty docs); the pinned whitespace tokenizer, one Arrow split +
    one lexsort-distinct per batch. (The flat-tokens helpers live in
    stages/corpus.py, which imports THIS module — inlined here to keep the
    import DAG acyclic and the kernel worker-shippable.)"""
    text = pc.fill_null(batch.column("text"), "")
    splits = split_tokens(text)
    sizes = pc.cast(pc.list_value_length(splits), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    flat = pc.list_flatten(splits)
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    d = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)[keep]
    toks = flat.to_numpy(zero_copy_only=False)[keep]
    n = batch.num_rows
    total = np.bincount(d, minlength=n).astype(np.int64)
    if len(toks):
        order = np.lexsort((toks, d))
        ds_, ts_ = d[order], toks[order]
        new = np.ones(len(ts_), dtype=bool)
        new[1:] = (ds_[1:] != ds_[:-1]) | (ts_[1:] != ts_[:-1])
        distinct = np.bincount(ds_[new], minlength=n).astype(np.int64)
    else:
        distinct = np.zeros(n, dtype=np.int64)
    ttr = np.where(total > 0, 1000 * distinct // np.maximum(total, 1), 0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(total),
            "n_distinct": pa.array(distinct),
            "ttr_permille": pa.array(ttr.astype(np.int64)),
        }
    )


TTR_SQL = """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
                x -> x <> '')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(list_filter(
                string_split_regex(COALESCE(text, ''), '\\s+'),
                x -> x <> ''))) AS BIGINT) AS n_distinct,
       CAST(CASE WHEN len(list_filter(string_split_regex(
                      COALESCE(text, ''), '\\s+'), x -> x <> '')) > 0
            THEN 1000 * len(list_distinct(list_filter(
                     string_split_regex(COALESCE(text, ''), '\\s+'),
                     x -> x <> '')))
                 // len(list_filter(string_split_regex(
                     COALESCE(text, ''), '\\s+'), x -> x <> ''))
            ELSE 0 END AS BIGINT) AS ttr_permille
FROM documents
"""
