"""Source readers over the driver-generated Parquet tables (TESTDATA.md).

The reference's Extract stage pulls raw files over HTTP and decompresses them
(kgw/_shared/extract.py:176-200, tasks.py:96-128). In this sealed environment
all inputs are local Parquet; the reader's job is column pruning and
row-filter pushdown so only the needed bytes leave storage.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import ray.data as rd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(
    sf_dir: str,
    name: str,
    *,
    columns: Optional[Sequence[str]] = None,
    filter: Any = None,
    override_num_blocks: Optional[int] = None,
) -> rd.Dataset:
    """Read one table with column pruning + row-group pushdown.

    ``filter`` is a ``pyarrow.dataset`` expression (e.g. ``pc.field("lang") == "en"``)
    pushed down to the Parquet scan.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    kwargs: dict[str, Any] = {}
    if columns is not None:
        kwargs["columns"] = list(columns)
    if filter is not None:
        kwargs["filter"] = filter
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    # The driver-generated files carry pandas schema metadata, which breaks
    # Ray's shuffle schema dedup (unhashable dict) and costs ~20× on
    # aggregates. Passing a metadata-stripped (pruned) schema to the read
    # makes every block clean AT THE SOURCE — no extra map stage, and the
    # read operator itself stops warning about unhashable schemas. With a
    # pushed row filter the scan may reference unprojected columns that a
    # pruned schema would hide from the fragment reader, so filtered reads
    # keep the post-read strip instead.
    if filter is None:
        # a table may be a DIRECTORY of shard files (the Common-Crawl shape;
        # bench's scaled corpus) — take the schema from any one member
        schema_src = path
        if os.path.isdir(path):
            members = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            if members:
                schema_src = members[0]
            else:
                # nested/hive layouts or extensionless shards: let Ray
                # resolve the files and strip metadata post-read instead
                from kgw_ray.functions.arrow_utils import strip_meta

                return rd.read_parquet(path, **kwargs).map_batches(
                    strip_meta, batch_format="pyarrow", zero_copy_batch=True
                )
        fsch = pq.read_schema(schema_src)
        sel = list(columns) if columns is not None else fsch.names
        kwargs["schema"] = pa.schema([fsch.field(c).remove_metadata() for c in sel])
        return rd.read_parquet(path, **kwargs)
    from kgw_ray.functions.arrow_utils import strip_meta

    ds = rd.read_parquet(path, **kwargs)
    return ds.map_batches(strip_meta, batch_format="pyarrow", zero_copy_batch=True)


def read_table_pandas(
    sf_dir: str,
    name: str,
    *,
    columns: Optional[Sequence[str]] = None,
    filter: Any = None,
):
    """Driver-side direct Parquet scan (pyarrow.dataset) for SMALL /
    broadcast join sides. The result is about to be driver-materialized and
    ``ray.put`` anyway, so spinning a Ray Dataset execution for it is pure
    overhead (measured 1.4s vs 0.1s for a one-column filtered dimension
    read at sf0.1). Same column pruning + row-group filter pushdown; on a
    cluster the driver reads once from shared storage. NOT for fact-scale
    sides — those stay ``read_table`` Datasets."""
    import pyarrow.dataset as pads

    path = os.path.join(sf_dir, f"{name}.parquet")
    t = pads.dataset(path).to_table(
        columns=list(columns) if columns is not None else None, filter=filter
    )
    return t.to_pandas()
