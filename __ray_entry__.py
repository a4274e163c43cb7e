"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; neither
this module nor the library calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``   — flagship web-KG pipeline on /root/testdata/sf0.001.
- ``queries()`` — one callable per implemented operator (SURVEY.md §2),
  each taking ``sf_dir`` and returning Dataset / DataFrame / pyarrow Table.
- ``oracle_sql()`` — matching DuckDB SQL per query (column names identical);
  omitted for genuinely non-SQL-expressible ops (rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kgw_ray._shipping import ensure_importable_in_workers  # noqa: E402

ensure_importable_in_workers()


def entry() -> Any:
    """Flagship: pages → extract → triples → link → canonical edges table."""
    from kgw_ray.pipelines.webkg import edges_from_triples, triples_dataset

    return edges_from_triples(triples_dataset("/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[str], Any]]:
    from kgw_ray.pipelines.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kgw_ray.pipelines.registry import ORACLES

    return dict(ORACLES)
