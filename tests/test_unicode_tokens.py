"""Unicode-hardened tokenizer parity (VERDICT r3 task 2).

The pinned tokenizer (kgw_ray/functions/tokenize.py: RE2 ``\\s`` runs,
both engines) must make every token-based oracle byte-exact on ARBITRARY
UTF-8 text — not just the ASCII synthetic corpus. This module builds a
mixed-UTF-8 documents fixture (NBSP / em-space / narrow-NBSP Unicode
whitespace, vertical tab, CJK, accents, combining marks, emoji, empty and
whitespace-only docs) and runs the gated token/shingle queries against
their registered DuckDB oracles on it, under the driver-identical compare.

Reference analog: arbitrary UTF-8 property text flows through kgw
(kgw/_shared/load.py:376-378), so the engine must not be ASCII-conditional.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kgw_ray.pipelines.registry import ORACLES, QUERIES
from tests.oracle_utils import assert_matches, run_oracle, to_pandas

# Deliberately hostile corpus: tokens containing Unicode whitespace
# (NOT split points under the pinned RE2 rule), CJK with and without
# ASCII spaces, accents/combining marks, repeated n-grams (so the
# repetition stats are non-trivial), near-duplicate pairs (so simhash
# emits pairs), and degenerate docs.
_TEXTS = [
    "the naïve café owner and the naïve café owner met again",
    "the naïve café owner and the naïve café owner met again!",
    "日本語　テスト 東京 大阪 東京 大阪 東京 大阪",
    "a b a b a b a b narrow space narrow space",
    "vertical\x0btab stays\x0bone token vertical\x0btab stays\x0bone token",
    "ascii control case:\ttabs\nnewlines\rcarriage\ffeed all split",
    "héllo wörld héllo wörld héllo wörld straße über straße über",
    "é combining acute é combining acute préfix suffix",
    "emoji 🎉 test emoji 🎉 test emoji 🎉 test mixed 中文 and english",
    "   ",
    "",
    "single",
    "the quick brown fox jumps over the lazy dog near the river bank",
    "the quick brown fox jumps over the lazy dog near the river bend",
]

# every gated query over `documents` whose oracle tokenizes text or
# hashes token/shingle values — the full blast radius of the tokenizer pin
_TOKEN_QUERIES = [
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "text_repetition",
    "text_rare_token_stats",
    "dedup_simhash_pairs",
    "dedup_jaccard_pairs",
    "dedup_exact",
    "text_content_md5",
    "ngram_topk",
    "text_normalize",
    "tfidf_top_terms",
    "decontaminate_documents",
    # r4 substring-level dedup: window hashes = md5-LE token hashes
    # through the polynomial ring — the whole chain must stay byte-exact
    # on hostile UTF-8 (docs 0/1 and 12/13 share cross-doc 8-gram runs,
    # so the span output is non-trivial here)
    "text_dup_spans",
    "text_dup_span_doc_stats",
]


@pytest.fixture(scope="module")
def unicode_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("unicode_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(_TEXTS)), pa.int64()),
            "text": pa.array(_TEXTS, pa.string()),
            "lang": pa.array(["xx"] * len(_TEXTS), pa.string()),
            "source": pa.array(
                [f"s{i % 3}" for i in range(len(_TEXTS))], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in _TEXTS], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _TOKEN_QUERIES)
def test_unicode_oracle_parity(name, unicode_sf):
    ray_df = to_pandas(QUERIES[name](unicode_sf))
    oracle_df = run_oracle(ORACLES[name], unicode_sf)
    assert_matches(ray_df, oracle_df, f"unicode:{name}")


def test_pinned_tokenizer_three_way_agreement():
    """py_tokens == Arrow split_tokens == DuckDB string_split_regex on the
    hostile corpus — the three implementations of THE tokenizer rule."""
    import duckdb
    import pyarrow.compute as pc

    from kgw_ray.functions.tokenize import py_tokens, split_tokens

    arrow_lists = split_tokens(pa.array(_TEXTS, pa.string())).to_pylist()
    arrow_toks = [[t for t in row if t != ""] for row in arrow_lists]
    con = duckdb.connect()
    for text, a in zip(_TEXTS, arrow_toks):
        p = py_tokens(text)
        d = con.execute(
            "SELECT list_filter(string_split_regex(?, '\\s+'), x -> x <> '')",
            [text],
        ).fetchone()[0]
        assert p == a == d, (text, p, a, d)
