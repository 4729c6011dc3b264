"""Simulate the driver's t1 smoke + t2 correctness gate end-to-end."""
import hashlib, json, os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb, pandas as pd
import __spark_entry__ as e
from lakehouse_variance_spark.session import build_session

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = build_session(app_name="driver-sim", shuffle_partitions=8)

# t1 smoke
df = e.entry(spark)
rows = df.collect()
print(f"t1 smoke: entry() -> {len(rows)} rows, schema={[f.name for f in df.schema]}")
assert len(rows) > 0

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')")

def canon_hash(pdf):
    # Mirror the real driver: sort columns by name, sort rows via
    # sort_values (raises TypeError on unhashable cells, e.g. list columns —
    # exactly as the driver's canonicalizer does), and stringify values
    # preserving the int-vs-float distinction at full precision (bigint 5
    # must NOT hash equal to DuckDB HUGEINT->float64 5.0).
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    recs = ["|".join(str(v) for v in r) for _, r in pdf.iterrows()]
    return hashlib.md5("\n".join(recs).encode()).hexdigest()

qs, oracles = e.queries(), e.oracle_sql()
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
