"""Local replica of the driver's correctness gate: run a registry query via
Ray and its oracle via DuckDB on the same sf dir, compare row count, schema
(column names) and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from kgw_ray.sources.readers import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con.execute(sql).df()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_matches(ray_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str = "") -> None:
    assert sorted(ray_df.columns) == sorted(oracle_df.columns), (
        f"{name}: columns differ: {sorted(ray_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(ray_df) == len(oracle_df), (
        f"{name}: row count {len(ray_df)} vs oracle {len(oracle_df)}"
    )
    a, b = _canon(ray_df), _canon(oracle_df)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av, bv = a[c].astype(float).to_numpy(), b[c].astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(av, bv)):
                ok = (math.isnan(x) and math.isnan(y)) or math.isclose(
                    x, y, rel_tol=1e-9, abs_tol=1e-9
                )
                assert ok, f"{name}: col {c} row {i}: {x} vs {y}"
        else:
            same = a[c].astype(str).equals(b[c].astype(str))
            if not same:
                diff = a[c].astype(str) != b[c].astype(str)
                i = diff.idxmax()
                raise AssertionError(
                    f"{name}: col {c} first diff at canon-row {i}: "
                    f"{a[c][i]!r} vs {b[c][i]!r}"
                )
