"""kgw_ray — a Ray-Data-native knowledge-graph construction & data-processing engine.

Re-expresses the capabilities of the reference engine (robert-haas/kgw: an
ETL workflow engine that unifies raw knowledge-graph dumps into a single
property-graph IR and exports it to many formats — see ``SURVEY.md``) as an
idiomatic Ray Data library:

- every per-record transform is a vectorized ``map_batches`` stage over
  zero-copy Arrow batches,
- stateful stages (warm models, broadcast lookup tables, MinHash indexes)
  are actor pools,
- wide steps (dedup, canonicalization, histograms, schema graphs) are
  ``groupby``/``aggregate`` shuffles with explicit partial pre-aggregation,
- the hub IR is partitioned Parquet (``nodes/``, ``edges/``) instead of the
  reference's single SQLite file (kgw/_shared/transform.py:10-30),
- sinks stream from the hub via Ray Data writers.

The flagship pipeline (``kgw_ray.pipelines.webkg``) builds a knowledge graph
from Common-Crawl-style web pages: HTML→text extraction (byte-identical per
url), (subj, pred, obj) triple extraction, entity linking, canonicalization,
and partitioned graph materialization.
"""

__version__ = "0.1.0"

from kgw_ray.functions.scalars import clean, is_informative_value  # noqa: F401
