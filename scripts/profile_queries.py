"""Per-query phase profiler for the headline bench set (guide §1).

For each query: time the Python build (fn call), Catalyst planning
(forcing executedPlan), and execution (count-drain, bench methodology),
plus job count and Exchange/BatchEvalPython occurrences in the executed
plan. Warm-up pass first (codegen/JIT), then the measured pass — the
same two-pass protocol bench.py uses, so numbers line up.

Usage: python scripts/profile_queries.py [query,query,...] [> json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_variance_spark import registry
from lakehouse_variance_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    registry.load_all()
    if len(sys.argv) > 1 and sys.argv[1] != "all":
        names = sys.argv[1].split(",")
    else:
        from bench import HEADLINE_QUERIES

        names = list(HEADLINE_QUERIES)
    spark = build_session(app_name="lvs-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for name in names:  # warm-up
        registry.QUERIES[name](spark, SF_DIR).count()
        print(f"# warm {name}", file=sys.stderr)

    out = {}
    for name in names:
        tracker = sc.statusTracker()
        jobs_before = len(tracker.getJobIdsForGroup() or [])
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, SF_DIR)
        t1 = time.perf_counter()
        qe = df._jdf.queryExecution()
        qe.executedPlan()
        t2 = time.perf_counter()
        n = df.count()
        t3 = time.perf_counter()
        plan = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
        jobs_after = len(sc.statusTracker().getJobIdsForGroup() or [])
        rec = {
            "build_s": round(t1 - t0, 4),
            "plan_s": round(t2 - t1, 4),
            "exec_s": round(t3 - t2, 4),
            "total_s": round(t3 - t0, 4),
            "rows": n,
            "n_exchange": plan.count("Exchange"),
            "n_pyeval": plan.count("EvalPython") + plan.count("MapInPandas")
            + plan.count("MapInArrow") + plan.count("FlatMapGroupsInPandas"),
            "jobs": jobs_after - jobs_before,
        }
        out[name] = rec
        print(f"# {name}: {json.dumps(rec)}", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
