"""Oracle sweep at an arbitrary scale factor (default sf0.1).

The driver's correctness gate runs at sf0.01 (`driver_sim.py`); this script
repeats the same comparison at a larger SF to catch scale-dependent
instabilities — float re-association across more partitions, engine
round() divergence on denser value distributions (both bit us at sf0.1;
see the integer-cents fixes in streaming/logs.py and scheduling/queries.py).

Usage: python scripts/oracle_sweep.py [/root/testdata/sf0.1]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from lakehouse_variance_spark import registry
from lakehouse_variance_spark.session import build_session
from scripts.canon import canon_hash, register_views


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all()
    spark = build_session(app_name="oracle-sweep")
    con = duckdb.connect()
    register_views(con, sf_dir)
    # fanout_count_pushdown's oracle IS the naive 1.0e11-row join text
    # (that's the point of the operator); DuckDB brute-forces it for
    # 15+ minutes at sf0.1 and far beyond at larger scales. The driver
    # gate covers it at sf0.01 (~1e8 rows, seconds); run it only at the
    # small gate scales.
    skip_at_scale = {"fanout_count_pushdown"}
    small = sf_dir.rstrip("/").endswith(("sf0.01", "sf0.001"))
    fails = []
    for name in sorted(registry.ORACLES):
        if name in skip_at_scale and not small:
            print(f"  SKIP {name} (naive oracle impractical beyond sf0.01)")
            continue
        t0 = time.time()
        try:
            spdf = registry.QUERIES[name](spark, sf_dir).toPandas()
            opdf = con.sql(registry.ORACLES[name]).df()
            ok = canon_hash(spdf) == canon_hash(opdf) and len(spdf) == len(opdf)
        except Exception as exc:  # noqa: BLE001 - report and continue
            ok = False
            print(f"  ERROR {name}: {str(exc)[:150]}")
        if not ok:
            fails.append(name)
        print(
            f"  {'MATCH' if ok else 'MISMATCH'} {name} ({time.time() - t0:.1f}s)",
            flush=True,
        )
    print(f"sweep@{sf_dir}: {len(registry.ORACLES) - len(fails)} match, "
          f"{len(fails)} mismatch {fails if fails else ''}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
