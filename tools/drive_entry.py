"""Drive the driver contract exactly as the harness does: ray.init first,
then import __ray_entry__ and exercise entry()/queries()/oracle_sql()."""
import sys, time
sys.path.insert(0, "/root/repo")
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as e

# 1. smoke: entry()
t0 = time.time()
res = e.entry()
import ray.data as rd
n = res.count() if isinstance(res, rd.Dataset) else len(res)
# schema only exists (as a method) on Dataset; DataFrame/Table returns are
# contract-legal too
sch = res.schema() if isinstance(res, rd.Dataset) else getattr(res, "schema", None)
print(f"entry(): {type(res).__name__}, rows={n}, schema={sch}, {time.time()-t0:.1f}s")
assert n > 0, "entry() returned no rows"

# 2. queries vs oracles at sf0.01 (the driver's correctness gate)
import duckdb, os
import pandas as pd
qs, os_ = e.queries(), e.oracle_sql()
print(f"queries: {sorted(qs)}; oracles: {sorted(os_)}")
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
from kgw_ray.sources.readers import TABLES  # single source of truth

for t in TABLES:
    p = os.path.join(sf, f"{t}.parquet")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
for name in sorted(qs):
    r = qs[name](sf)
    rdf = r.to_pandas() if isinstance(r, rd.Dataset) else (r.to_pandas() if hasattr(r, "to_pandas") else r)
    if name in os_:
        odf = con.execute(os_[name]).df()
        rs = rdf[sorted(rdf.columns)].astype(str).sort_values(by=sorted(rdf.columns)).reset_index(drop=True)
        osr = odf[sorted(odf.columns)].astype(str).sort_values(by=sorted(odf.columns)).reset_index(drop=True)
        match = rs.equals(osr)
        print(f"  {name}: rows {len(rdf)} vs {len(odf)} cols_match={sorted(rdf.columns)==sorted(odf.columns)} values_match={match}")
        assert match, name
    else:
        print(f"  {name}: rows-only, {len(rdf)} rows")

ray.shutdown()
print("DRIVE OK")
