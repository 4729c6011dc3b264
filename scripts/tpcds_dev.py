"""Dev loop for the TPC-DS battery: run named tpcds_q* queries (or all)
against the DuckDB oracle at a chosen sf and print MATCH/MISMATCH."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from lakehouse_variance_spark import registry
from lakehouse_variance_spark.session import build_session
from scripts.canon import canon_hash, register_views

SF = os.environ.get("TPCDS_SF", "/root/testdata/sf0.01")


def main() -> int:
    registry.load_all()
    names = sys.argv[1:] or sorted(
        n for n in registry.QUERIES if n.startswith("tpcds_q")
    )
    spark = build_session(app_name="tpcds-dev", shuffle_partitions=8)
    con = duckdb.connect()
    register_views(con, SF)
    fails = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = registry.QUERIES[name](spark, SF).toPandas()
        except Exception as ex:
            print(f"!! {name}: SPARK ERROR {str(ex)[:300]}")
            fails += 1
            continue
        t1 = time.perf_counter()
        try:
            odf = con.sql(registry.ORACLES[name]).df()
        except Exception as ex:
            print(f"!! {name}: ORACLE ERROR {str(ex)[:300]}")
            fails += 1
            continue
        t2 = time.perf_counter()
        ok = len(sdf) == len(odf) and canon_hash(sdf) == canon_hash(odf)
        mark = "MATCH   " if ok else "MISMATCH"
        if not ok:
            fails += 1
            print(f"   cols spark={sorted(sdf.columns)}")
            print(f"   cols duck ={sorted(odf.columns)}")
        print(
            f"{mark} {name}: rows {len(sdf)}/{len(odf)} "
            f"(spark {t1-t0:.2f}s, duck {t2-t1:.2f}s)"
        )
    print(f"done: {len(names)-fails}/{len(names)} ok")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
