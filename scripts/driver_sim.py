"""Simulate the driver's t1 smoke + t2 correctness gate end-to-end."""
import json, os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb, pandas as pd
import __spark_entry__ as e
from lakehouse_variance_spark.session import build_session
from scripts.canon import canon_hash, register_views

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

spark = build_session(app_name="driver-sim", shuffle_partitions=8)

# t1 smoke
df = e.entry(spark)
rows = df.collect()
print(f"t1 smoke: entry() -> {len(rows)} rows, schema={[f.name for f in df.schema]}")
assert len(rows) > 0

con = duckdb.connect()
register_views(con, SF01)

qs, oracles = e.queries(), e.oracle_sql()
# SIM_ONLY=a,b,c — spot-check a subset after a targeted change (full runs
# stay the default and the round gate).
only = os.environ.get("SIM_ONLY")
if only:
    wanted = set(only.split(","))
    missing = wanted - set(qs)
    assert not missing, f"SIM_ONLY names not registered: {sorted(missing)}"
    qs = {n: qs[n] for n in qs if n in wanted}
ok = fail = rows_only = 0
for name in sorted(qs):
    sdf = qs[name](spark, SF01)
    spdf = sdf.toPandas()
    if name not in oracles:
        canon_hash(spdf)  # driver canonicalizes rows-only results too
        print(f"  rows-only {name}: {len(spdf)} rows OK")
        rows_only += 1
        continue
    opdf = con.sql(oracles[name]).df()
    h1, h2 = canon_hash(spdf), canon_hash(opdf)
    status = "MATCH" if (h1 == h2 and len(spdf) == len(opdf)) else "MISMATCH"
    if status == "MATCH": ok += 1
    else:
        fail += 1
        print(f"  !! {name}: rows {len(spdf)} vs {len(opdf)}, cols {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
    print(f"  {status} {name}: {len(spdf)} rows")
print(f"t2: {ok} match, {fail} mismatch, {rows_only} rows-only")
sys.exit(1 if fail else 0)
