"""Resilience sweep: run EVERY registered query against the oracle under a
deliberately hostile session — non-UTC timezone, Spark's default 200 shuffle
partitions, fewer cores — approximating whatever session the external
correctness driver may supply. Complements driver_sim.py (which uses our own
build_session): a query that only passes under our session config is a
latent driver failure.

Usage: python scripts/hostile_sweep.py   # ~5 min; exits non-zero on any failure
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from lakehouse_variance_spark import registry

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

registry.load_all()
spark = (
    SparkSession.builder.master("local[8]")
    .appName("hostile-sweep")
    .config("spark.sql.session.timeZone", "America/New_York")
    .getOrCreate()  # default 200 shuffle partitions — NOT our build_session
)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    recs = ["|".join(str(v) for v in r) for _, r in pdf.iterrows()]
    return hashlib.md5("\n".join(recs).encode()).hexdigest()


ok = bad = rows_only = 0
for name in sorted(registry.QUERIES):
    try:
        spdf = registry.QUERIES[name](spark, SF).toPandas()
    except Exception as exc:  # noqa: BLE001 — report, keep sweeping
        print(f"  THROW {name}: {str(exc).splitlines()[0][:120]}")
        bad += 1
        continue
    if name not in registry.ORACLES:
        rows_only += 1
        continue
    opdf = con.sql(registry.ORACLES[name]).df()
    if canon(spdf) == canon(opdf) and len(spdf) == len(opdf):
        ok += 1
    else:
        print(f"  MISMATCH {name}: {len(spdf)} vs {len(opdf)} rows")
        bad += 1
print(f"hostile sweep: {ok} match, {bad} bad, {rows_only} rows-only")
sys.exit(1 if bad else 0)
