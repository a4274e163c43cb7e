"""Warm-model actor-pool scoring — a REAL weights-file model in the
actor-pool slot (the north-star "warm NLP model / scorer" contract,
BASELINE.json; reference analog: the per-record annotation maps of
kgw/_shared/transform.py applied through a stateful stage).

``QualityModelScorer`` is the canonical shape for model inference on a
Ray Data pipeline:

- weights load ONCE per actor in ``__init__`` (file read + parse + numpy
  layout), never per batch — the class ships to an actor pool via
  ``map_batches(Cls, concurrency=(m, n))``;
- ``__call__`` is pure vectorized inference: Arrow compute kernels
  extract integer features, one int64 matvec applies the model;
- scores are INTEGER micro-units (the model is a linear logit head with
  integer micro-weights), so an independent SQL oracle reproduces every
  score exactly — swap in float weights + a real sigmoid and the same
  plumbing carries any learned model (then oracle on quantized bands).

At 100 TB the pool autoscales between ``concurrency=(m, n)`` actors;
per-actor state is ~KB here but the contract is identical for GB-sized
weights (load in ``__init__``, add ``num_gpus`` to the map_batches call).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models",
    "quality_lr.json",
)

# feature -> (kind, pattern): every feature is an exact integer count an
# Arrow kernel AND a DuckDB regexp can both compute
_FEATURES: dict[str, tuple[str, str]] = {
    "n_chars": ("len", ""),
    "n_spaces": ("lit", " "),
    "n_vowels": ("re", "[aeiou]"),
    "n_digits": ("re", "[0-9]"),
    "n_punct": ("re", "[.,!?;:]"),
    "n_upper": ("re", "[A-Z]"),
}


def _feature_counts(texts: pa.ChunkedArray | pa.Array) -> dict[str, np.ndarray]:
    """Vectorized integer feature extraction (Arrow kernels, no Python
    per row). Vowel counting runs on lowercased text so 'A' counts as
    both upper and vowel — mirrored exactly in the oracle SQL. NULL text
    scores as empty (all-zero features) on BOTH engines — the oracle
    COALESCEs; without it Arrow's null counts would ride to_numpy as NaN
    and astype(int64) would produce garbage integers."""
    texts = pc.fill_null(texts, "")
    lowered = pc.utf8_lower(texts)
    out: dict[str, np.ndarray] = {}
    for name, (kind, pat) in _FEATURES.items():
        if kind == "len":
            arr = pc.utf8_length(texts)
        elif kind == "lit":
            arr = pc.count_substring(texts, pat)
        else:
            src = lowered if name == "n_vowels" else texts
            arr = pc.count_substring_regex(src, pat)
        out[name] = arr.to_numpy(zero_copy_only=False).astype(np.int64)
    return out


class QualityModelScorer:
    """Actor-pool scoring stage: ``map_batches(QualityModelScorer,
    concurrency=(m, n), batch_format="pyarrow")``.

    ``LOADS`` counts weight-file loads process-wide — the test hook
    pinning "setup happens in __init__, never in __call__"."""

    LOADS = 0

    def __init__(self, weights_path: str = _WEIGHTS_PATH):
        with open(weights_path) as fh:
            spec = json.load(fh)
        self.feature_order: list[str] = list(spec["feature_order"])
        self.w = np.array(
            [int(spec["weights_micro"][f]) for f in self.feature_order],
            dtype=np.int64,
        )
        self.bias = int(spec["bias_micro"])
        type(self).LOADS += 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = _feature_counts(batch.column("text"))
        x = np.stack([feats[f] for f in self.feature_order], axis=1)
        logit = x @ self.w + self.bias
        label = np.where(logit >= 0, "keep", "drop")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "logit_micro": pa.array(logit),
                "label": pa.array(label, pa.string()),
            }
        )


def quality_model_sql(weights_path: str = _WEIGHTS_PATH) -> str:
    """Independent oracle: re-derives every feature count with DuckDB
    regexps and applies the SAME integer weights read from the SAME
    bundled file — engine-exact by integer arithmetic."""
    with open(weights_path) as fh:
        spec = json.load(fh)
    w = {f: int(spec["weights_micro"][f]) for f in spec["feature_order"]}
    terms = " + ".join(f"{w[f]} * {f}" for f in spec["feature_order"])
    return f"""
WITH d AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
f AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
    CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS BIGINT)
      AS n_vowels,
    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,
    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper
  FROM d
)
SELECT doc_id,
       CAST({spec["bias_micro"]} + {terms} AS BIGINT) AS logit_micro,
       CASE WHEN {spec["bias_micro"]} + {terms} >= 0
            THEN 'keep' ELSE 'drop' END AS label
FROM f
"""
