

def test_benford_digits_bruteforce(sf_smoke):
    """Digit histogram == per-row Python int(str(abs(floor(v))))[0] counts."""
    from collections import Counter

    from kgw_ray.pipelines.relational import lineitem_benford_digits
    from kgw_ray.sources.readers import read_table_pandas

    out = lineitem_benford_digits(sf_smoke).to_pandas()
    got = dict(zip(out["digit"], out["n"]))
    v = read_table_pandas(sf_smoke, "lineitem", columns=["l_extendedprice"])[
        "l_extendedprice"
    ].dropna()
    import math

    want = Counter(int(str(abs(math.floor(x)))[0]) for x in v)
    assert got == dict(want)
