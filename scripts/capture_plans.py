"""Capture .explain('formatted') for headline queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query,query,...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX,
default 'before'). The optimization-round evidence artifact: the judge
checks plan-shape claims (Exchange counts, join strategies, PushedFilters)
against these files.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_variance_spark import registry
from lakehouse_variance_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    if len(sys.argv) > 2:
        names = sys.argv[2].split(",")
    else:
        from bench import HEADLINE_QUERIES

        names = list(HEADLINE_QUERIES)
    registry.load_all()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="lvs-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = registry.QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"ERROR capturing plan: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name} ({len(plan)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
