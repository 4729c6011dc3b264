"""Third batch of TPC-DS-shaped relational queries (q17/q78/q67 skeletons).

The reference executes the 99 TPC-DS queries verbatim through its engine
(`docker/trino-client/src/run_workload.py:38`); these re-create the three
remaining distinctive plan shapes on the driver's TPC-H-ish tables:

* q17 — three-way fact join with per-group dispersion statistics and a
  coefficient-of-variation filter (`docker/trino-client/queries/q17.sql`);
* q78 — exclude returned items via LEFT JOIN ... IS NULL, then compare a
  supplier's adjacent years (`queries/q78.sql`);
* q67 — ROLLUP over a join, then rank within each year partition and keep
  the top N rows across grouping levels (`queries/q67.sql`).

Determinism: all money/quantity aggregates accumulate exact integer cents
(BIGINT), and every derived double is a fixed chain of single IEEE ops on
exact-int64→double conversions — identical in Spark and DuckDB regardless
of partitioning.  Two gotchas drive this design: round(avg()) is not
engine-stable (Spark HALF_UPs the shortest decimal rendering of the
double, DuckDB rounds the binary value — round(0.285, 2) differs), and
bigint*bigint is not overflow-safe under Spark's ANSI mode (throws
where DuckDB silently widens to HUGEINT), so products are kept inside
exact-int ranges or cast to double before multiplying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table

# q17-shape: flag brands whose demand is erratic (CV above this).
CV_THRESHOLD = 0.55

# q67-shape: keep this many top rows per year partition.
TOP_N = 5


@register(
    "join_stats_spread",
    oracle=f"""
    WITH m AS (
        SELECT p.p_brand,
               count(*) AS n_items,
               CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_cents,
               CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT)
                        * CAST(round(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sumsq_qty_cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_size < 25 AND o.o_orderpriority LIKE '1%'
        GROUP BY p.p_brand),
    s AS (
        SELECT p_brand, n_items, sum_qty_cents,
               CAST(sum_qty_cents AS DOUBLE) / CAST(n_items AS DOUBLE)
                   AS mean_qty_cents,
               sqrt((CAST(sumsq_qty_cents AS DOUBLE)
                     - CAST(sum_qty_cents AS DOUBLE)
                       * CAST(sum_qty_cents AS DOUBLE)
                       / CAST(n_items AS DOUBLE))
                    / CAST(n_items - 1 AS DOUBLE)) AS std_qty_cents
        FROM m WHERE n_items > 1)
    SELECT p_brand, n_items, sum_qty_cents, mean_qty_cents, std_qty_cents
    FROM s
    WHERE std_qty_cents > {CV_THRESHOLD} * mean_qty_cents
    """,
)
def join_stats_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS-q17-shaped dispersion probe: join the fact table to two
    dimensions, aggregate per brand, and keep brands whose quantity
    coefficient of variation exceeds {CV_THRESHOLD} — erratic-demand
    detection. Dispersion is derived from exact integer moments (n, sum,
    sum-of-squares in cents), not a streaming stddev, so the value is
    partition-order-independent on both engines.

    Scale: partial aggregation reduces the fact scan before its single
    shuffle on p_brand; `part` joins broadcast (dimension-sized). The
    per-row cents square stays far below int64 even at SF 1000.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    qc = F.round(F.col("l_quantity") * 100).cast("bigint")
    m = (
        li.join(F.broadcast(part.filter(F.col("p_size") < 25)),
                part.p_partkey == li.l_partkey)
        .join(orders.filter(F.col("o_orderpriority").like("1%")),
              orders.o_orderkey == li.l_orderkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(qc).alias("sum_qty_cents"),
            F.sum(qc * qc).alias("sumsq_qty_cents"),
        )
        .filter(F.col("n_items") > 1)
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = (d("sum_qty_cents") / d("n_items")).alias("mean_qty_cents")
    std = F.sqrt(
        (
            d("sumsq_qty_cents")
            - d("sum_qty_cents") * d("sum_qty_cents") / d("n_items")
        )
        / (F.col("n_items") - 1).cast("double")
    ).alias("std_qty_cents")
    s = m.select("p_brand", "n_items", "sum_qty_cents", mean, std)
    return s.filter(
        F.col("std_qty_cents") > F.lit(CV_THRESHOLD) * F.col("mean_qty_cents")
    )


@register(
    "join_unreturned_yoy",
    oracle="""
    WITH returns AS (
        SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R'),
    kept AS (
        SELECT l.l_suppkey, year(o.o_orderdate) AS order_year,
               CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_cents
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        LEFT JOIN returns r
          ON r.l_orderkey = l.l_orderkey AND r.l_linenumber = l.l_linenumber
        WHERE r.l_orderkey IS NULL),
    yearly AS (
        SELECT l_suppkey, order_year,
               count(*) AS n_items,
               CAST(sum(price_cents) AS BIGINT) AS sales_cents
        FROM kept GROUP BY l_suppkey, order_year)
    SELECT c.l_suppkey,
           c.order_year,
           c.sales_cents  AS sales_cents,
           p.sales_cents  AS prev_sales_cents,
           CAST(c.sales_cents AS DOUBLE) / CAST(p.sales_cents AS DOUBLE)
               AS growth_ratio
    FROM yearly c
    JOIN yearly p
      ON p.l_suppkey = c.l_suppkey AND p.order_year = c.order_year - 1
    WHERE p.sales_cents > 0
    """,
)
def join_unreturned_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS-q78-shaped channel analysis: drop every returned line item
    via LEFT JOIN ... IS NULL (the anti-join spelled as an outer join, as
    the original writes it), roll the surviving sales up per (supplier,
    year), and self-join adjacent years to get each supplier's growth
    ratio. The ratio is one IEEE division of exact cent totals.

    Scale: the returns side is a filtered projection of the same fact scan
    (Spark reuses the exchange); the yearly rollup shuffles once on
    (suppkey, year) and the adjacent-year self-join reuses that
    partitioning on suppkey.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    returns = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_linenumber").alias("r_linenumber"),
    )
    kept = (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(
            returns,
            (F.col("r_orderkey") == F.col("l_orderkey"))
            & (F.col("r_linenumber") == F.col("l_linenumber")),
            "left",
        )
        .filter(F.col("r_orderkey").isNull())
        .select(
            "l_suppkey",
            F.year("o_orderdate").alias("order_year"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias(
                "price_cents"
            ),
        )
    )
    yearly = kept.groupBy("l_suppkey", "order_year").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("price_cents").alias("sales_cents"),
    )
    cur = yearly.alias("c")
    prev = yearly.alias("p")
    return (
        cur.join(
            prev,
            (F.col("p.l_suppkey") == F.col("c.l_suppkey"))
            & (F.col("p.order_year") == F.col("c.order_year") - 1),
        )
        .filter(F.col("p.sales_cents") > 0)
        .select(
            F.col("c.l_suppkey").alias("l_suppkey"),
            F.col("c.order_year").alias("order_year"),
            F.col("c.sales_cents").alias("sales_cents"),
            F.col("p.sales_cents").alias("prev_sales_cents"),
            (
                F.col("c.sales_cents").cast("double")
                / F.col("p.sales_cents").cast("double")
            ).alias("growth_ratio"),
        )
    )


@register(
    "rollup_rank_topn_brands",
    oracle=f"""
    WITH agg AS (
        SELECT year(o.o_orderdate) AS order_year, p.p_brand,
               grouping(p.p_brand) AS g_brand,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS sales_cents
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY ROLLUP (year(o.o_orderdate), p.p_brand)),
    ranked AS (
        SELECT order_year, p_brand, g_brand, sales_cents,
               rank() OVER (PARTITION BY order_year, g_brand
                            ORDER BY sales_cents DESC,
                                     COALESCE(p_brand, '')) AS sales_rank
        FROM agg
        WHERE order_year IS NOT NULL)
    SELECT order_year, p_brand, g_brand, sales_cents, sales_rank
    FROM ranked WHERE sales_rank <= {TOP_N}
    """,
)
def rollup_rank_topn_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS-q67-shaped top-N over a hierarchy: ROLLUP the joined fact
    over (year, brand), rank rows inside each (year, grouping-level)
    partition by sales, keep the top {TOP_N}. COALESCE(p_brand, '') breaks
    sales ties deterministically so both engines rank identically.

    Scale: the rollup is one shuffle; the subsequent window repartitions on
    the (already small) aggregate, not the fact table — the rank never
    sees raw rows. At 100 TB the year filter prunes the grand-total row
    before ranking.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(orders, orders.o_orderkey == li.l_orderkey).join(
        F.broadcast(part), part.p_partkey == li.l_partkey
    )
    agg = (
        joined.withColumn("order_year", F.year("o_orderdate"))
        .rollup("order_year", "p_brand")
        .agg(
            F.grouping("p_brand").cast("int").alias("g_brand"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "sales_cents"
            ),
        )
        .filter(F.col("order_year").isNotNull())
    )
    w = Window.partitionBy("order_year", "g_brand").orderBy(
        F.col("sales_cents").desc(), F.coalesce(F.col("p_brand"), F.lit(""))
    )
    return (
        agg.select(
            "order_year",
            "p_brand",
            "g_brand",
            "sales_cents",
            F.rank().over(w).alias("sales_rank"),
        )
        .filter(F.col("sales_rank") <= TOP_N)
    )


__all__ = ["join_stats_spread", "join_unreturned_yoy", "rollup_rank_topn_brands"]
