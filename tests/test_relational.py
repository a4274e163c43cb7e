

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


def test_dow_hour_heatmap_matches_pandas_calendar(sf_smoke):
    """Integer-epoch dow/hour == pandas' calendar accessors (independent
    convention check: pandas dayofweek is Mon=0, ours is Sun=0)."""
    from kgw_ray.pipelines.relational import events_dow_hour_heatmap
    from kgw_ray.sources.readers import read_table_pandas

    out = events_dow_hour_heatmap(sf_smoke).to_pandas()
    ts = read_table_pandas(sf_smoke, "events", columns=["ts"])["ts"]
    dow = ((ts.dt.dayofweek + 1) % 7).rename("dow")
    hour = ts.dt.hour.rename("hour")
    want = ts.groupby([dow, hour]).size().rename("n").reset_index()
    got = out.sort_values(["dow", "hour"]).reset_index(drop=True)
    want = want.sort_values(["dow", "hour"]).reset_index(drop=True)
    assert got.astype("int64").equals(want.astype("int64"))
