"""NTILE bucket arithmetic in docs_quality_buckets must replicate SQL
NTILE(3) exactly, including the uneven-remainder split."""

import numpy as np


def _ntile(rn: np.ndarray, n: int, k: int = 3) -> np.ndarray:
    """The same vectorized arithmetic the query uses."""
    base, rem = n // k, n % k
    cut = rem * (base + 1)
    base_safe = max(base, 1)
    return np.where(
        rn <= cut,
        (rn - 1) // (base + 1) + 1,
        rem + (rn - cut - 1) // base_safe + 1,
    ).astype(np.int64)


def test_ntile_matches_duckdb_for_many_n():
    import duckdb

    for n in [1, 2, 3, 4, 5, 6, 7, 10, 499, 500, 501]:
        rn = np.arange(1, n + 1, dtype=np.int64)
        got = _ntile(rn, n)
        want = (
            duckdb.sql(
                f"SELECT NTILE(3) OVER (ORDER BY i) AS b FROM range({n}) t(i)"
                " ORDER BY i"
            )
            .df()["b"]
            .to_numpy()
            .astype(np.int64)
        )
        assert (got == want).all(), f"n={n}: {got} vs {want}"


def test_buckets_cover_all_docs(sf_smoke):
    from kgw_ray.pipelines.registry import QUERIES
    from kgw_ray.sources.readers import read_table

    df = QUERIES["docs_quality_buckets"](sf_smoke).to_pandas()
    n = read_table(sf_smoke, "documents", columns=["doc_id"]).count()
    assert int(df["n_docs"].sum()) == n
    assert sorted(df["bucket"]) == [1, 2, 3]
    d = df.sort_values("bucket")
    # bucket logit ranges are ordered (ties may share a boundary value)
    assert (d["min_logit"].to_numpy()[1:] >= d["max_logit"].to_numpy()[:-1]).all()
    assert (d["min_logit"] <= d["max_logit"]).all()
