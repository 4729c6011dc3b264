"""Plan-graph feature extraction for runtime prediction.

The reference's GNN predictor consumes per-plan-node features
(``models/GNN/Results/Baseline_TPCDS/feature_stats.json``: ``log1p_est_rows``,
``tuple_width_bytes``, ``rowcount_proxy``, ``n_distinct``, ``null_frac``).
This module produces the same feature rows from a Spark DataFrame by walking
``df.queryExecution.optimizedPlan`` — pure Python over the logical-plan tree
(SURVEY.md §4: a plan walker, not a Catalyst rule).

Row-count estimates come from Catalyst statistics (size-in-bytes always;
row counts and per-column distinct/null stats when CBO statistics exist,
i.e. after ``ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS``).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table


def _scala_seq(seq) -> list:
    out = []
    it = seq.iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def _opt(option) -> Any | None:
    return option.get() if option.isDefined() else None


def _as_int(value) -> int:
    """Scala BigInt (py4j JavaObject) or already-converted Python int → int."""
    return value if isinstance(value, int) else int(value.toString())


def _walk(node, depth: int = 0):
    yield node, depth
    for child in _scala_seq(node.children()):
        yield from _walk(child, depth + 1)


def plan_feature_rows(df: DataFrame) -> list[dict[str, Any]]:
    """One feature dict per optimized-plan node.

    Fields: ``node_id`` (preorder), ``depth``, ``operator`` (Catalyst node
    name), ``n_output_cols``, ``size_bytes`` (Catalyst estimate),
    ``est_rows`` / ``log1p_est_rows`` (CBO row count when available, else
    size/width proxy — the reference's ``rowcount_proxy``),
    ``tuple_width_bytes`` (sum of output attribute default sizes).
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    rows: list[dict[str, Any]] = []
    for node_id, (node, depth) in enumerate(_walk(plan)):
        output = _scala_seq(node.output())
        width = sum(int(a.dataType().defaultSize()) for a in output) or 1
        stats = node.stats()
        size_bytes = _as_int(stats.sizeInBytes())
        row_count = _opt(stats.rowCount())
        est_rows = (
            _as_int(row_count) if row_count is not None
            else max(size_bytes // width, 1)
        )
        rows.append(
            {
                "node_id": node_id,
                "depth": depth,
                "operator": str(node.nodeName()),
                "n_output_cols": len(output),
                "size_bytes": size_bytes,
                "tuple_width_bytes": width,
                "est_rows": est_rows,
                "log1p_est_rows": math.log1p(est_rows),
                "rowcount_from_cbo": row_count is not None,
            }
        )
    return rows


def plan_features(df: DataFrame) -> DataFrame:
    """Feature rows as a DataFrame (small — one row per plan node)."""
    spark = df.sparkSession
    return spark.createDataFrame(
        plan_feature_rows(df),
        "node_id long, depth long, operator string, n_output_cols long, "
        "size_bytes long, tuple_width_bytes long, est_rows long, "
        "log1p_est_rows double, rowcount_from_cbo boolean",
    )


@register("plan_feature_extract")  # plan introspection: rows-only check
def plan_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Features of a representative join+agg plan (the predictor's input
    featurization, reference ``models/GNN`` feature schema). Rounds the float
    feature for a stable value-hash."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    q = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_totalprice") > 1000)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    feats = plan_features(q)
    return feats.select(
        "node_id",
        "depth",
        "operator",
        "n_output_cols",
        "tuple_width_bytes",
        F.round("log1p_est_rows", 4).alias("log1p_est_rows"),
    )
