"""Cross-cutting scalar functions (SURVEY.md §2.7).

Semantics match the reference's shared helpers:

- ``is_informative_value`` — kgw/_shared/extract.py:356-366: drop ``None``,
  ``""`` and NaN property values at ingest.
- ``clean`` — kgw/_shared/load.py:538-545: MeTTa atom escaping: numbers are
  rendered verbatim, everything else is a JSON-escaped quoted string
  (``clean(3.14) == "3.14"``, ``clean("a c") == '"a c"'``, compound values
  become an escaped JSON string).

JSON serialization uses ``json`` with compact separators and insertion-order
keys — the same byte layout orjson produces in the reference
(kgw/_shared/load.py:376 etc.). ``orjson`` is used when available.
"""

from __future__ import annotations

import math
from typing import Any

try:  # pragma: no cover - orjson is optional
    import orjson

    def json_dumps(obj: Any) -> str:
        return orjson.dumps(obj).decode("utf-8")

    def json_loads(s: str | bytes) -> Any:
        return orjson.loads(s)

except ImportError:  # pragma: no cover
    import json as _json

    def json_dumps(obj: Any) -> str:
        # compact separators == orjson byte layout for str/int/float/bool/None
        return _json.dumps(obj, separators=(",", ":"), ensure_ascii=False)

    def json_loads(s: str | bytes) -> Any:
        return _json.loads(s)


def is_informative_value(value: Any) -> bool:
    """True iff ``value`` carries information (reference extract.py:356-366)."""
    if value is None:
        return False
    if isinstance(value, str) and value == "":
        return False
    if isinstance(value, float) and math.isnan(value):
        return False
    return True


def filter_informative(d: dict) -> dict:
    """Keep only informative values, preserving insertion order."""
    return {k: v for k, v in d.items() if is_informative_value(v)}


def clean(value: Any) -> str:
    """MeTTa atom escaping (reference load.py:538-545).

    Numbers (including bool, which is an ``int`` subclass) render verbatim;
    anything else is JSON-serialized, and re-quoted when the result is not
    already a quoted string — golden cases in reference tests/test_shared.py:80-84.
    """
    if isinstance(value, (int, float)):
        return str(value)
    s = json_dumps(value)
    if not s.startswith('"'):
        s = json_dumps(s)
    return s
