"""Resilience sweep: run EVERY registered query against the oracle under a
deliberately hostile session — non-UTC timezone, Spark's default 200 shuffle
partitions, fewer cores — approximating whatever session the external
correctness driver may supply. Complements driver_sim.py (which uses our own
build_session): a query that only passes under our session config is a
latent driver failure.

Usage: python scripts/hostile_sweep.py   # ~5 min; exits non-zero on any failure
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from lakehouse_variance_spark import registry
from scripts.canon import canon_hash as canon, register_views

SF = "/root/testdata/sf0.01"

registry.load_all()
spark = (
    SparkSession.builder.master("local[8]")
    .appName("hostile-sweep")
    .config("spark.sql.session.timeZone", "America/New_York")
    .getOrCreate()  # default 200 shuffle partitions — NOT our build_session
)
con = duckdb.connect()
register_views(con, SF)

ok = bad = rows_only = 0
for name in sorted(registry.QUERIES):
    try:
        spdf = registry.QUERIES[name](spark, SF).toPandas()
    except Exception as exc:  # noqa: BLE001 — report, keep sweeping
        print(f"  THROW {name}: {str(exc).splitlines()[0][:120]}")
        bad += 1
        continue
    if name not in registry.ORACLES:
        try:
            canon(spdf)  # the driver canonicalizes rows-only results too
        except TypeError as exc:
            print(f"  UNHASHABLE {name}: {exc}")
            bad += 1
            continue
        rows_only += 1
        continue
    try:
        opdf = con.sql(registry.ORACLES[name]).df()
        match = canon(spdf) == canon(opdf) and len(spdf) == len(opdf)
    except Exception as exc:  # noqa: BLE001 — report, keep sweeping
        print(f"  ORACLE-THROW {name}: {str(exc).splitlines()[0][:120]}")
        bad += 1
        continue
    if match:
        ok += 1
    else:
        print(f"  MISMATCH {name}: {len(spdf)} vs {len(opdf)} rows")
        bad += 1
print(f"hostile sweep: {ok} match, {bad} bad, {rows_only} rows-only")
sys.exit(1 if bad else 0)
