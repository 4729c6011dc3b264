"""Additional relational query shapes from the reference's TPC-DS surface.

Round-3 widening of SURVEY.md §2A coverage: each query here reproduces a
distinct TPC-DS query *shape* (cited per query against
/root/reference/docker/trino-client/queries/) that the round-2 inventory did
not yet exercise as a combined plan — disjunctive multi-table filters (q13),
union-of-channels rollup (q5/q33/q66), multi-EXISTS customer profiling
(q10/q35), combined semi+anti fact self-join (q94), day-gap bucket counts
(q62/q99), scalar-subquery ratios (q90), full-outer overlap counts (q97) —
plus the lag/lead/ntile/first_value window family as Spark-native extras.

Scale notes are per-query; the common themes: aggregates stay map-side
partial, dimension sides broadcast, fact-fact correlations key on the
equi-join column so each shuffles exactly once on the same key, and every
window partitions by a high-cardinality key (no global single-task windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table


@register(
    "filter_or_of_ands",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE (c_mktsegment = 'BUILDING'   AND o_totalprice BETWEEN 1000 AND 50000)
       OR (c_mktsegment = 'MACHINERY'  AND o_totalprice BETWEEN 50000 AND 150000)
       OR (c_mktsegment = 'AUTOMOBILE' AND o_orderstatus = 'F')
    GROUP BY o_orderpriority
    """,
)
def filter_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large OR-of-ANDs disjunctive predicate spanning two tables (reference
    q13.sql: three OR'd demographic/marital branches over a join).

    The per-table conjuncts of each branch cannot individually push below the
    join, but Catalyst extracts the common single-table implications
    (o_totalprice range union, segment IN-list) and pushes those into the
    scans; the residual disjunction evaluates post-join inside codegen."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    seg = F.col("c_mktsegment")
    price = F.col("o_totalprice")
    cond = (
        ((seg == "BUILDING") & price.between(1000, 50000))
        | ((seg == "MACHINERY") & price.between(50000, 150000))
        | ((seg == "AUTOMOBILE") & (F.col("o_orderstatus") == "F"))
    )
    return (
        joined.filter(cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "union_channels_rollup",
    oracle="""
    WITH ch AS (
        SELECT n.n_name AS nation, 'orders' AS channel,
               o.o_totalprice AS amount
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        UNION ALL
        SELECT n.n_name AS nation, 'lineitem' AS channel,
               l.l_extendedprice * (1 - l.l_discount) AS amount
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
    )
    SELECT nation, channel,
           GROUPING(nation)  AS g_nation,
           GROUPING(channel) AS g_channel,
           count(*) AS n_rows,
           round(sum(amount), 2) AS total_amount
    FROM ch
    GROUP BY ROLLUP(nation, channel)
    """,
)
def union_channels_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of per-channel revenue streams then ROLLUP totals — the
    q5/q33/q56/q66 shape (channel CTEs unioned, then grouped with rollup;
    reference q5.sql, q66.sql:7-30).

    Each channel's dimension hops (customer→nation, supplier→nation)
    broadcast; the union is a zero-shuffle bag concat, and the rollup is one
    shuffle on the grouping key with map-side partials. grouping() columns
    disambiguate rollup NULLs exactly as q36.sql:5-9 does."""
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = load_table(spark, sf_dir, "customer")
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    orders_ch = (
        load_table(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.lit("orders").alias("channel"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    lineitem_ch = (
        load_table(spark, sf_dir, "lineitem")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.lit("lineitem").alias("channel"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
    )
    return (
        orders_ch.unionByName(lineitem_ch)
        .rollup("nation", "channel")
        .agg(
            F.grouping("nation").alias("g_nation"),
            F.grouping("channel").alias("g_channel"),
            F.count("*").alias("n_rows"),
            F.round(F.sum("amount"), 2).alias("total_amount"),
        )
        .select(
            "nation", "channel", "g_nation", "g_channel", "n_rows", "total_amount"
        )
    )


@register(
    "multi_exists_profile",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_active,
           CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_custkey = c.c_custkey)
                         THEN 1 ELSE 0 END) AS BIGINT) AS with_orders,
           CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM events e
                                      WHERE e.user_id = c.c_custkey)
                         THEN 1 ELSE 0 END) AS BIGINT) AS with_events
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       OR EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def multi_exists_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers existing in ANY of several activity tables, profiled per
    segment — the q10/q35 shape (`EXISTS(store_sales) AND (EXISTS(web_sales)
    OR EXISTS(catalog_sales))`, reference q10.sql:12-17, q35.sql:10-15).

    Decorrelated form: each activity table reduces to its DISTINCT key set
    (one map-side-combined shuffle each, output |keys| rows), left-joined to
    customer as a boolean flag. An OR of EXISTS cannot plan as two stacked
    semi-joins (that would be AND); flags + filter keep one pass and let the
    CASE aggregates reuse the same join results the filter used."""
    cust = load_table(spark, sf_dir, "customer")
    order_keys = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .withColumn("has_orders", F.lit(1))
    )
    event_keys = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("k"))
        .distinct()
        .withColumn("has_events", F.lit(1))
    )
    flagged = (
        cust.join(order_keys, cust.c_custkey == order_keys.k, "left")
        .drop("k")
        .join(event_keys, cust.c_custkey == event_keys.k, "left")
        .drop("k")
    )
    return (
        flagged.filter(
            F.col("has_orders").isNotNull() | F.col("has_events").isNotNull()
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_active"),
            F.sum(F.coalesce(F.col("has_orders"), F.lit(0))).alias("with_orders"),
            F.sum(F.coalesce(F.col("has_events"), F.lit(0))).alias("with_events"),
        )
    )


@register(
    "semi_anti_combined",
    oracle="""
    SELECT count(DISTINCT l1.l_orderkey) AS n_orders,
           round(sum(l1.l_extendedprice * (1 - l1.l_discount)), 2) AS revenue
    FROM lineitem l1
    WHERE l1.l_returnflag <> 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_returnflag = 'R')
    """,
)
def semi_anti_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS on the same fact table in one query —
    the q94/q16 shape (orders with another shipment from a different
    warehouse and no cancellation; reference q94.sql:10-18, q16.sql:14-21).

    Both correlations key on l_orderkey: the semi join (different-supplier
    sibling, inequality as residual) and the anti join (returned-line
    existence) each shuffle on the SAME key as the final distinct-count, so
    the whole plan is one key's worth of co-partitioning; no pair explosion
    ever materializes."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_returnflag") != "R")
    sibling = li.select(
        F.col("l_orderkey").alias("s_orderkey"), F.col("l_suppkey").alias("s_suppkey")
    )
    returned = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_orderkey")
    )
    kept = (
        base.join(
            sibling,
            (F.col("l_orderkey") == F.col("s_orderkey"))
            & (F.col("l_suppkey") != F.col("s_suppkey")),
            "left_semi",
        )
        .join(returned, F.col("l_orderkey") == F.col("r_orderkey"), "left_anti")
    )
    return kept.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@register(
    "daygap_bucket_counts",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN gap_days < 0                THEN 1 ELSE 0 END) AS BIGINT) AS early,
           CAST(sum(CASE WHEN gap_days BETWEEN 0 AND 30   THEN 1 ELSE 0 END) AS BIGINT) AS d0_30,
           CAST(sum(CASE WHEN gap_days BETWEEN 31 AND 90  THEN 1 ELSE 0 END) AS BIGINT) AS d31_90,
           CAST(sum(CASE WHEN gap_days BETWEEN 91 AND 365 THEN 1 ELSE 0 END) AS BIGINT) AS d91_365,
           CAST(sum(CASE WHEN gap_days > 365              THEN 1 ELSE 0 END) AS BIGINT) AS d_over_365,
           count(*) AS n_lines
    FROM (
        SELECT o.o_orderpriority,
               datediff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS gap_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    GROUP BY o_orderpriority
    """,
)
def daygap_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-gap bucketing with one CASE-count column per latency band — the
    q62/q99 shape (`sum(case when ship_date - sold_date <= 30 days …)` per
    group; reference q99.sql:8-18, q62.sql:8-18).

    The fact-fact join keys on orderkey (single co-partitioned shuffle); the
    bucket CASEs are branch-free codegen over the datediff, and the wide
    count vector aggregates map-side, so the shuffle carries |groups| rows
    regardless of fact size."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    gap = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_orderpriority", gap.alias("gap_days")
    )
    g = F.col("gap_days")

    def bucket(cond, name: str):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    return joined.groupBy("o_orderpriority").agg(
        bucket(g < 0, "early"),
        bucket(g.between(0, 30), "d0_30"),
        bucket(g.between(31, 90), "d31_90"),
        bucket(g.between(91, 365), "d91_365"),
        bucket(g > 365, "d_over_365"),
        F.count("*").alias("n_lines"),
    )


@register(
    "scalar_ratio_am_pm",
    oracle="""
    WITH am AS (SELECT count(*) AS n_am,
                       sum(CAST(round(value * 100) AS BIGINT)) AS am_cents
                FROM events
                WHERE EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) < 12),
         pm AS (SELECT count(*) AS n_pm,
                       sum(CAST(round(value * 100) AS BIGINT)) AS pm_cents
                FROM events
                WHERE EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) >= 12)
    SELECT n_am, n_pm,
           round(CAST(n_am AS DOUBLE) / n_pm, 6) AS count_ratio,
           round(CAST(am_cents AS DOUBLE) / pm_cents, 6) AS value_ratio
    FROM am CROSS JOIN pm
    """,
)
def scalar_ratio_am_pm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio of two scalar subqueries (morning vs evening activity) — the
    q90 shape (`CAST(amc AS DECIMAL)/CAST(pmc AS DECIMAL)` of two windowed
    counts; reference q90.sql:2-15).

    Each scalar side is a full-scan conditional aggregate reduced to one row
    (map-side partials, single-row shuffle); the cross join of two 1-row
    plans is free. Value sums aggregate as integer cents so both engines
    divide identical integers."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.hour("ts")
    cents = F.round(F.col("value") * 100).cast("long")
    am = ev.filter(hour < 12).agg(
        F.count("*").alias("n_am"), F.sum(cents).alias("am_cents")
    )
    pm = ev.filter(hour >= 12).agg(
        F.count("*").alias("n_pm"), F.sum(cents).alias("pm_cents")
    )
    return am.crossJoin(pm).select(
        "n_am",
        "n_pm",
        F.round(F.col("n_am").cast("double") / F.col("n_pm"), 6).alias(
            "count_ratio"
        ),
        F.round(F.col("am_cents").cast("double") / F.col("pm_cents"), 6).alias(
            "value_ratio"
        ),
    )


@register(
    "fullouter_overlap_counts",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
         actives AS (SELECT DISTINCT user_id AS k FROM events)
    SELECT CAST(sum(CASE WHEN b.k IS NOT NULL AND a.k IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS orders_only,
           CAST(sum(CASE WHEN b.k IS NULL AND a.k IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS events_only,
           CAST(sum(CASE WHEN b.k IS NOT NULL AND a.k IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS both_channels
    FROM buyers b FULL OUTER JOIN actives a ON b.k = a.k
    """,
)
def fullouter_overlap_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channel-overlap counting via FULL OUTER JOIN of two distinct key sets
    — the q97 shape (store-only / catalog-only / both customer-item counts;
    reference q97.sql:1-25).

    Both sides reduce to distinct keys before the join (map-side combine,
    |keys| rows shuffled on the same key the join uses), and the overlap
    CASEs aggregate to a single row — the join never re-shuffles."""
    buyers = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("bk"))
        .distinct()
    )
    actives = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("ak"))
        .distinct()
    )
    joined = buyers.join(actives, buyers.bk == actives.ak, "full_outer")
    return joined.agg(
        F.sum(
            F.when(F.col("bk").isNotNull() & F.col("ak").isNull(), 1).otherwise(0)
        ).alias("orders_only"),
        F.sum(
            F.when(F.col("bk").isNull() & F.col("ak").isNotNull(), 1).otherwise(0)
        ).alias("events_only"),
        F.sum(
            F.when(F.col("bk").isNotNull() & F.col("ak").isNotNull(), 1).otherwise(0)
        ).alias("both_channels"),
    )


@register(
    "window_lag_delta",
    oracle="""
    SELECT event_id,
           coalesce(CAST(round(value * 100) AS BIGINT)
                    - lag(CAST(round(value * 100) AS BIGINT))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    0) AS delta_cents
    FROM events
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-over-event value delta via lag() — the Spark-native
    form of the reference's run-over-run runtime comparison
    (traces/tools/helpers.py:198-228 computes config deltas batch-to-batch;
    lag expresses the same adjacency relationally).

    Partitioned by user_id (high-cardinality — no global window), ordered by
    (ts, event_id) so ties are total-ordered identically on both engines;
    deltas are integer cents, exact under any partitioning."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.coalesce(cents - F.lag(cents).over(w), F.lit(0)).alias("delta_cents"),
    )


@register(
    "window_ntile_first_last",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice, o_orderkey) AS price_quartile,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER w AS last_order,
           coalesce(lead(o_orderkey) OVER w, -1) AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / first_value / last_value / lead over per-customer order
    history — the window families the reference's query set omits
    (SURVEY §2A: "No lag/lead/ntile/first_value in the query set"), provided
    as first-class extras since trace analytics want them (previous-run
    lookup, quartile banding).

    One shuffle on o_custkey serves all four functions (same window spec
    modulo ordering column); last_value uses an explicit unbounded-following
    frame on BOTH engines — the default frame would return the current row.
    Tie-broken by o_orderkey for cross-engine determinism."""
    orders = load_table(spark, sf_dir, "orders")
    w_price = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w_lead = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w_price).alias("price_quartile"),
        F.first("o_orderkey").over(w_full).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.coalesce(F.lead("o_orderkey").over(w_lead), F.lit(-1)).alias(
            "next_order"
        ),
    )


@register(
    "window_moving_avg",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority,
               CAST(CAST(o_orderdate AS DATE) AS STRING) AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders
        GROUP BY o_orderpriority, d
    )
    SELECT o_orderpriority, d,
           CAST(sum(cents) OVER w AS BIGINT) AS win_cents,
           CAST(count(*) OVER w AS BIGINT) AS win_days
    FROM daily
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (3 preceding .. 3 following) — the centered
    moving-average shape of reference q47/q57 (`avg(sum_sales) OVER
    (... ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)`), the one frame type
    the q51 running sum does not exercise.

    Aggregates daily integer cents first (|days × priorities| rows), then
    windows over the aggregate — the moving average derives exactly from
    (win_cents, win_days) so both engines emit identical integers."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = (
        orders.groupBy(
            "o_orderpriority",
            F.col("o_orderdate").cast("date").cast("string").alias("d"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    return daily.select(
        "o_orderpriority",
        "d",
        F.sum("cents").over(w).alias("win_cents"),
        F.count("*").over(w).alias("win_days"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS BIGINT)
               AS n_near_price
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering column: for each order, how many
    of the same customer's orders fall within ±1000 of its total price.
    RANGE frames bound by VALUE distance (not row offsets) — the remaining
    window frame type after running sums (ROWS unbounded) and moving
    averages (ROWS sliding). Value-determined membership makes the count
    independent of tie order, so it is cross-engine deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return orders.select(
        "o_orderkey", F.count("*").over(w).alias("n_near_price")
    )


@register(
    "window_trailing_7d_sum",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
               AS BIGINT) AS trailing_7d_cents
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL
    """,
)
def window_trailing_7d_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: each event's trailing-7-day value sum
    per user — the rolling-window feature a fraud/usage pipeline computes.
    Spark expresses the interval frame as rangeBetween over unix_micros
    (exact integer microseconds — no truncation drift vs the oracle's
    INTERVAL frame); membership is value-determined, so tie order cannot
    change the integer-cents sum. One user_id exchange, per-user sort —
    the same cost any per-key window op pays."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    # ts reads as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the session
    # is pinned UTC (tables.load_table), so the cast is a zero-offset
    # relabel (same rule as the as-of join's gap arithmetic).
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(cents).over(w).alias("trailing_7d_cents"),
    )


@register(
    "frequent_items_revenue",
    oracle="""
    WITH frequent_parts AS (
        SELECT l_partkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
        GROUP BY l_partkey
        HAVING count(*) > 20
    ),
    spend AS (
        SELECT o_custkey, sum(o_totalprice) AS total_spend
        FROM orders GROUP BY o_custkey
    ),
    big_spenders AS (
        SELECT o_custkey FROM spend
        WHERE total_spend > (SELECT 0.5 * max(total_spend) FROM spend)
    )
    SELECT count(*) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_partkey IN (SELECT l_partkey FROM frequent_parts)
      AND o.o_custkey IN (SELECT o_custkey FROM big_spenders)
    """,
)
def frequent_items_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q23-shaped composite: revenue from FREQUENT items bought by BIG
    spenders (reference q23.sql — frequent_ss_items + max_store_sales +
    best_ss_customer CTEs feeding IN-filters on the final fact scan).

    Three aggregation pyramids feed two semi-joins: frequent parts (HAVING
    over a fact-fact join), the spend table reused by BOTH the scalar
    threshold subquery (max of an aggregate) and the big-spender filter —
    Catalyst materializes the CTE once — and the final fact join reduced by
    both IN-filters before its aggregation. Every filter key
    (partkey, custkey) matches the shuffle key of its semi-join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    frequent_parts = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(year.isin(1996, 1997))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 20)
        .select("l_partkey")
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("total_spend")
    )
    threshold = spend.agg(
        (0.5 * F.max("total_spend")).alias("thr")
    )
    big_spenders = (
        spend.crossJoin(F.broadcast(threshold))
        .filter(F.col("total_spend") > F.col("thr"))
        .select("o_custkey")
    )
    joined = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(frequent_parts, "l_partkey", "left_semi")
        .join(big_spenders, "o_custkey", "left_semi")
    )
    return joined.agg(
        F.count("*").alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'N'
    INTERSECT ALL
    SELECT l_partkey, l_suppkey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag-semantics intersection (each (part, supp) pair
    kept min(count_left, count_right) times), completing the set-op family
    alongside distinct INTERSECT/EXCEPT and EXCEPT ALL (SURVEY §7 flags the
    distinct-vs-bag distinction as a correctness hard part). Spark plans
    this as a count-compare aggregate + generate, one shuffle per side."""
    li = load_table(spark, sf_dir, "lineitem")
    left = li.filter(F.col("l_returnflag") == "N").select(
        "l_partkey", "l_suppkey"
    )
    right = li.filter(F.col("l_linestatus") == "F").select(
        "l_partkey", "l_suppkey"
    )
    return left.intersectAll(right)


@register(
    "union_return_ratio_ranked",
    oracle="""
    WITH by_channel AS (
        SELECT l_linestatus AS channel, l_partkey,
               round(CAST(sum(CASE WHEN l_returnflag = 'R'
                                   THEN l_quantity ELSE 0 END) AS BIGINT)
                     * 1.0 / CAST(sum(l_quantity) AS BIGINT), 6) AS qty_ratio,
               round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6)                        AS item_ratio
        FROM lineitem
        WHERE l_linestatus IN ('O', 'F')
        GROUP BY 1, 2),
    ranked AS (
        SELECT channel, l_partkey, qty_ratio, item_ratio,
               rank() OVER (PARTITION BY channel
                            ORDER BY qty_ratio DESC, l_partkey)  AS qty_rank,
               rank() OVER (PARTITION BY channel
                            ORDER BY item_ratio DESC, l_partkey) AS item_rank
        FROM by_channel)
    SELECT channel, l_partkey, qty_ratio, item_ratio, qty_rank, item_rank
    FROM ranked WHERE qty_rank <= 10 OR item_rank <= 10
    """,
)
def union_return_ratio_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 shape (queries/q49.sql): per sales channel, rank items by
    two return ratios at once (returned-quantity share and returned-line
    share), keep the worst-10 under either ranking, and union the channels.

    The reference runs three per-channel subqueries UNIONed; here the
    channels live in one fact table, so one scan + one aggregation computes
    every channel and the "union" is the channel grouping key — the
    Spark-first rewrite of q49's triple scan. Ratios are quotients of exact
    int64 sums (quantities are integer-valued; no float re-association), so
    ranks are engine-deterministic; partkey breaks remaining ties.

    Scale: aggregate keys on (channel, partkey) — partial aggregation +
    one shuffle; both windows share the channel partitioning (2 partitions
    of |parts| rows each, re-sorted in place, no second shuffle).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_linestatus").isin("O", "F")
    )
    ret_qty = F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(
        F.lit(0.0)
    )
    by_channel = (
        li.select(
            F.col("l_linestatus").alias("channel"),
            "l_partkey",
            "l_quantity",
            "l_returnflag",
        )
        .groupBy("channel", "l_partkey")
        .agg(
            F.round(
                F.sum(ret_qty).cast("bigint")
                / F.sum("l_quantity").cast("bigint"),
                6,
            ).alias("qty_ratio"),
            F.round(
                F.sum(
                    F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
                )
                / F.count("*"),
                6,
            ).alias("item_ratio"),
        )
    )
    w_qty = W.partitionBy("channel").orderBy(
        F.col("qty_ratio").desc(), F.col("l_partkey")
    )
    w_item = W.partitionBy("channel").orderBy(
        F.col("item_ratio").desc(), F.col("l_partkey")
    )
    ranked = by_channel.select(
        "channel",
        "l_partkey",
        "qty_ratio",
        "item_ratio",
        F.rank().over(w_qty).alias("qty_rank"),
        F.rank().over(w_item).alias("item_rank"),
    )
    return ranked.filter((F.col("qty_rank") <= 10) | (F.col("item_rank") <= 10))


@register(
    "scalar_counts_crossjoin",
    oracle="""
    SELECT * FROM
        (SELECT count(*) AS h0 FROM events
         WHERE event_type = 'click' AND hour(ts) BETWEEN 0 AND 2),
        (SELECT count(*) AS h1 FROM events
         WHERE event_type = 'click' AND hour(ts) BETWEEN 3 AND 5),
        (SELECT count(*) AS h2 FROM events
         WHERE event_type = 'click' AND hour(ts) BETWEEN 6 AND 8),
        (SELECT count(*) AS h3 FROM events
         WHERE event_type = 'click' AND hour(ts) BETWEEN 9 AND 11),
        (SELECT count(*) AS h4 FROM events
         WHERE event_type = 'click' AND hour(ts) BETWEEN 12 AND 14),
        (SELECT count(*) AS h5 FROM events
         WHERE event_type = 'click' AND hour(ts) BETWEEN 15 AND 17),
        (SELECT count(*) AS h6 FROM events
         WHERE event_type = 'click' AND hour(ts) BETWEEN 18 AND 20),
        (SELECT count(*) AS h7 FROM events
         WHERE event_type = 'click' AND hour(ts) BETWEEN 21 AND 23)
    """,
)
def scalar_counts_crossjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 shape (queries/q88.sql): eight independently-filtered
    scalar counts (time-of-day bands) cross-joined into a single row.

    The reference (and the oracle here) expresses this as eight separate
    scans cross-joined; the engine rewrites it as ONE conditional-
    aggregation scan — sum(CASE WHEN band THEN 1) x 8 — which is the plan
    you want at 100 TB: one pass over the fact table, partial aggregation
    to a single row, no join at all. The oracle proves the rewrite exact.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    hour = F.hour("ts")
    aggs = [
        F.sum(
            F.when((hour >= lo) & (hour <= lo + 2), 1).otherwise(0)
        )
        .cast("bigint")
        .alias(f"h{i}")
        for i, lo in enumerate(range(0, 24, 3))
    ]
    return ev.agg(*aggs)


@register(
    "join_growth_comparison",
    oracle="""
    WITH agg AS (
        SELECT c.c_nationkey AS nationkey,
               CAST(sum(CASE WHEN year(CAST(o.o_orderdate AS DATE)) = 1996
                              AND o.o_orderpriority < '3'
                             THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS urgent_1996_cents,
               CAST(sum(CASE WHEN year(CAST(o.o_orderdate AS DATE)) = 1997
                              AND o.o_orderpriority < '3'
                             THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS urgent_1997_cents,
               CAST(sum(CASE WHEN year(CAST(o.o_orderdate AS DATE)) = 1996
                              AND o.o_orderpriority > '3'
                             THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS low_1996_cents,
               CAST(sum(CASE WHEN year(CAST(o.o_orderdate AS DATE)) = 1997
                              AND o.o_orderpriority > '3'
                             THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS low_1997_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE year(CAST(o.o_orderdate AS DATE)) IN (1996, 1997)
        GROUP BY c.c_nationkey)
    SELECT nationkey, urgent_1996_cents, urgent_1997_cents,
           low_1996_cents, low_1997_cents
    FROM agg
    WHERE urgent_1996_cents > 0 AND low_1996_cents > 0
      AND CAST(urgent_1997_cents AS DOUBLE) / urgent_1996_cents
          > CAST(low_1997_cents AS DOUBLE) / low_1996_cents
    """,
)
def join_growth_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q31 shape (queries/q31.sql): nations where one channel's
    year-over-year revenue growth outpaces the other's (urgent vs low
    priorities standing in for web vs store). The reference builds six
    aggregated CTEs and joins them; the Spark-first rewrite is ONE
    conditional-aggregation pass over the joined fact.

    Determinism: the cent sums are exact int64 (< 2^53, so the
    int64->double conversion is exact) and the growth comparison divides
    those exact values — one correctly-rounded IEEE division per side in
    BOTH engines, so the inequality is engine-stable. (Cross-multiplying
    the sums instead overflows int64 at sf>=0.1 — Spark's ANSI mode throws
    where DuckDB silently widens to HUGEINT.)

    Scale: one fact scan, one broadcast customer join, one |nations|-group
    aggregate — versus six scans + five joins in the literal CTE plan.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    year = F.year(F.col("o_orderdate").cast("date"))
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")

    def bucket(y: int, urgent: bool):
        pri = (
            F.col("o_orderpriority") < "3"
            if urgent
            else F.col("o_orderpriority") > "3"
        )
        return F.sum(F.when((year == y) & pri, cents).otherwise(0)).cast(
            "bigint"
        )

    joined = orders.filter(year.isin(1996, 1997)).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    agg = joined.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        bucket(1996, True).alias("urgent_1996_cents"),
        bucket(1997, True).alias("urgent_1997_cents"),
        bucket(1996, False).alias("low_1996_cents"),
        bucket(1997, False).alias("low_1997_cents"),
    )
    u96, u97 = F.col("urgent_1996_cents"), F.col("urgent_1997_cents")
    l96, l97 = F.col("low_1996_cents"), F.col("low_1997_cents")
    return agg.filter(
        (u96 > 0)
        & (l96 > 0)
        & (u97.cast("double") / u96 > l97.cast("double") / l96)
    )


@register(
    "join_equal_revenue_bands",
    oracle="""
    WITH per AS (
        SELECT l_partkey,
               CAST(sum(CASE WHEN l_returnflag = 'A'
                             THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS q_a,
               CAST(sum(CASE WHEN l_returnflag = 'N'
                             THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS q_n,
               CAST(sum(CASE WHEN l_returnflag = 'R'
                             THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS q_r
        FROM lineitem
        GROUP BY l_partkey)
    SELECT l_partkey, q_a, q_n, q_r
    FROM per
    WHERE q_a + q_n + q_r > 0
      AND 30 * q_a BETWEEN 9 * (q_a + q_n + q_r) AND 11 * (q_a + q_n + q_r)
      AND 30 * q_n BETWEEN 9 * (q_a + q_n + q_r) AND 11 * (q_a + q_n + q_r)
      AND 30 * q_r BETWEEN 9 * (q_a + q_n + q_r) AND 11 * (q_a + q_n + q_r)
    """,
)
def join_equal_revenue_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q58 shape (queries/q58.sql): items whose per-channel volume is
    within ±10% of the all-channel average (return-flag classes standing in
    for store/catalog/web). The reference joins three per-channel CTEs; the
    rewrite is one conditional-aggregation scan, with the ±10%-of-average
    bands expressed as cross-multiplied integer inequalities
    (30·q_c ∈ [9·Σq, 11·Σq] ⇔ q_c ∈ [0.9, 1.1]·Σq/3) — exact, no floats.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")

    def chan(flag: str):
        return F.sum(
            F.when(F.col("l_returnflag") == flag, qty).otherwise(0)
        ).cast("bigint")

    per = li.groupBy("l_partkey").agg(
        chan("A").alias("q_a"), chan("N").alias("q_n"), chan("R").alias("q_r")
    )
    total = F.col("q_a") + F.col("q_n") + F.col("q_r")

    def band(c):
        return (30 * c >= 9 * total) & (30 * c <= 11 * total)

    return per.filter(
        (total > 0) & band(F.col("q_a")) & band(F.col("q_n")) & band(F.col("q_r"))
    )


@register(
    "window_percent_rank_cume",
    oracle="""
    SELECT event_id,
           event_type,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6)    AS cume,
           dense_rank() OVER w             AS drank
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / dense_rank — the distribution-position
    window family (complements ntile/first_value/lead in
    window_ntile_first_last). Values are small exact rationals
    ((rank−1)/(n−1), rank/n), so rounding is engine-stable. Partitioned by
    event_type; ties broken on event_id for full determinism."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


@register(
    "agg_winsorized_mean",
    oracle="""
    WITH cents AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders),
    bounds AS (
        SELECT o_orderpriority,
               quantile_cont(c, 0.10) AS p10,
               quantile_cont(c, 0.90) AS p90
        FROM cents GROUP BY o_orderpriority)
    SELECT c.o_orderpriority,
           count(*) AS n_orders,
           round(avg(greatest(least(CAST(c.c AS DOUBLE), b.p90), b.p10))
                 / 100.0, 4) AS winsorized_mean
    FROM cents c JOIN bounds b USING (o_orderpriority)
    GROUP BY c.o_orderpriority
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10/90 winsorized mean of order value per priority — the
    outlier-robust location statistic a quality pipeline reports instead of
    the raw mean. Two-pass: per-group exact quantile bounds (broadcast back)
    then clamp-and-average, all in integer cents until the final divide.

    Scale: the bounds table is |groups| rows (broadcast); at 100 TB swap
    `percentile` for `percentile_approx` — identical call shape."""
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    bounds = cents.groupBy("o_orderpriority").agg(
        F.percentile("c", F.lit(0.10)).alias("p10"),
        F.percentile("c", F.lit(0.90)).alias("p90"),
    )
    clamped = F.greatest(
        F.least(F.col("c").cast("double"), F.col("p90")), F.col("p10")
    )
    return (
        cents.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg(clamped) / 100.0, 4).alias("winsorized_mean"),
        )
    )
