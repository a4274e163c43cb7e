"""THE pinned tokenizer — one definition shared by every token-based
operator and its DuckDB oracle.

Definition (engine-portable, byte-exact for ANY UTF-8 text):

    tokens(text) = maximal runs of characters NOT in the RE2 ``\\s``
    class ``[\\t\\n\\f\\r ]``, in order, empties dropped.

Why this rule: Arrow's regex kernels and DuckDB's regex functions are BOTH
RE2, so ``split_pattern_regex(text, '\\s+')`` on the Ray side and
``list_filter(string_split_regex(text, '\\s+'), x -> x <> '')`` in SQL
produce byte-identical token lists for arbitrary UTF-8 input — including
U+00A0/U+2003-style Unicode whitespace (token-internal under this rule)
and ``\\x0b`` (RE2 ``\\s`` excludes vertical tab). The previous mix of
``pc.utf8_split_whitespace`` / Python ``str.split()`` (Unicode whitespace)
against RE2 ``\\s`` oracles was exact only on ASCII corpora; this module
closes that data-conditional gate (parity proven in
tests/test_unicode_tokens.py on a mixed-UTF-8 fixture).

The reference ingests arbitrary UTF-8 property text (kgw/_shared/
load.py:376-378); pinning one portable rule keeps every token statistic
reproducible across engines at any corpus composition.

Cost: ``split_pattern_regex`` measures ~2.7× slower than the Unicode
splitter (358 ms vs 130 ms per 2.4M tokens, one core) — still ~6.7M
tokens/s/core, vectorized C++, and tokenization is not the dominant stage
cost anywhere it is used.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# RE2's \s class — the pinned whitespace set. NOT Python's re.ASCII \s
# (which adds \x0b) and NOT Unicode whitespace.
RE2_WS_CLASS = "[\t\n\f\r ]"

# Python-side tokenizer for per-row code paths (fingerprints, lang-id,
# minhash shingle sources): identical to the Arrow/SQL rule.
_PY_TOKEN_RE = re.compile(r"[^\t\n\f\r ]+")

# SQL fragment template, for documentation/reuse in oracle strings.
TOKENS_SQL_TPL = "list_filter(string_split_regex({col}, '\\s+'), x -> x <> '')"


def py_tokens(text: str | None) -> list[str]:
    """Tokenize one Python string under the pinned rule (empties dropped,
    None → []). Byte-identical to ``split_tokens`` and the SQL fragment."""
    return _PY_TOKEN_RE.findall(text or "")


def split_tokens(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Column tokenizer: string array → list<string> array under the
    pinned rule. Nulls become empty lists; EMPTY-STRING TOKENS ARE KEPT
    (leading/trailing whitespace yields them) — callers mask with
    ``utf8_length > 0`` exactly as they did for utf8_split_whitespace,
    keeping the established sizes/flat/nonempty idiom unchanged."""
    return pc.split_pattern_regex(pc.fill_null(text, ""), pattern=r"\s+")
