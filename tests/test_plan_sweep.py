"""Global plan-invariant sweep: EVERY registered query's physical plan is
checked for the two anti-patterns that silently destroy cluster-scale
performance — cartesian products and row-at-a-time Python evaluation.

The per-query gates in test_plan_quality.py / test_plans_ds*.py pin
specific plan SHAPES; this sweep is the backstop that a newly registered
query can't regress below the floor without failing CI.
"""

from __future__ import annotations

from lakehouse_variance_spark import registry
from tests.conftest import SF_DIR as SF_DIR_SMALL

registry.load_all()

# Known, documented exceptions:
# - udtf_chunk_documents exists to demonstrate the SQL-callable Python
#   UDTF surface (LATERAL table functions); Spark evaluates UDTFs via
#   BatchEvalPython by design. The Arrow-vectorized equivalent of the same
#   computation is text_chunk_dedup / mapInArrow operators.
ROW_PYTHON_ALLOWED = {"udtf_chunk_documents"}


def test_no_cartesian_or_row_python_anywhere(spark):
    offenders: dict[str, list[str]] = {}
    for name, fn in sorted(registry.QUERIES.items()):
        plan = fn(spark, SF_DIR_SMALL)._jdf.queryExecution().executedPlan().toString()
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BatchEvalPython" in plan and name not in ROW_PYTHON_ALLOWED:
            flags.append("BatchEvalPython")
        if flags:
            offenders[name] = flags
    assert not offenders, f"plan anti-patterns: {offenders}"
