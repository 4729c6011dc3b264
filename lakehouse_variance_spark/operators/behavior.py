"""User-behavior analytics over the events stream: cohort retention and
conversion funnels.

The reference's workload analytics aggregate per-run query logs
(`traces/tools/helpers.py:40-70`); these operators apply the same
groupBy/agg discipline to the north-star event-stream table — the two
staple queries of any product-analytics engine, absent from the TPC-DS
surface, expressed as pure DataFrame aggregations (no UDFs, no windows
over raw facts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table


@register(
    "cohort_retention_matrix",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
                   AS day_offset
        FROM events e JOIN firsts f ON f.user_id = e.user_id)
    SELECT cohort_day, day_offset,
           count(*) AS n_active_users
    FROM activity
    GROUP BY cohort_day, day_offset
    """,
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: bucket every user by first-seen date, then count
    distinct users from each cohort active again N days later — the
    (cohort, day-offset) retention matrix behind every DAU/retention
    dashboard.

    Scale: two shuffles, both key-shrinking — events → |users| for the
    first-seen aggregate, then the (user, offset)-distinct activity →
    |cohorts|×|offsets|. The firsts table is |users|-sized and joins back
    keyed on user_id (AQE broadcasts it while it fits; at 100 TB both
    sides are already hash-partitioned on user_id from their aggregates).
    Integer counts end-to-end — nothing to round.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    # Group at day granularity but emit TIMESTAMP: DuckDB DATE arrives in
    # pandas as midnight Timestamps, Spark DATE as datetime.date — the cast
    # makes both render identically (same convention as
    # window_fullouter_cumulative).
    return (
        activity.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .select(
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            "day_offset",
            "n_active_users",
        )
    )


@register(
    "funnel_3step_users",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS t_purchase
        FROM events GROUP BY user_id)
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_purchase > t_click
                THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM per_user
    """,
)
def funnel_3step_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users whose FIRST view precedes their
    first click precedes their first purchase (strict event-time order).
    One conditional-aggregation pass computes the three first-touch
    timestamps per user; the funnel predicates are null-safe comparisons
    (a missing step, NULL, fails ``>`` in both engines, so drop-off
    falls out of three-valued logic with no explicit IS NULL ladder).

    Scale: ONE shuffle of |users| conditional-min rows — the fact table
    partial-aggregates map-side. The classic window/self-join funnel
    formulations shuffle raw events; first-touch funnels never need to.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    ).alias(f"t_{t}")
    per_user = ev.groupBy("user_id").agg(
        first_of("view"), first_of("click"), first_of("purchase")
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    as_n = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast(  # noqa: E731
        "bigint"
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        as_n(viewed).alias("n_view"),
        as_n(clicked).alias("n_view_click"),
        as_n(purchased).alias("n_full_funnel"),
    )


@register(
    "window_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, value,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS ts_next
        FROM events),
    seg AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               date_diff('microsecond', ts, ts_next) AS gap_us
        FROM seq WHERE ts_next IS NOT NULL),
    agg AS (
        SELECT user_id,
               count(*) AS n_segments,
               CAST(sum(gap_us) AS BIGINT) AS span_us,
               sum(CAST(cents AS HUGEINT) * CAST(gap_us AS HUGEINT))
                   AS wsum
        FROM seg GROUP BY user_id)
    SELECT user_id, n_segments, span_us,
           (CAST(wsum AS DOUBLE) / CAST(span_us AS DOUBLE)) / 100
               AS twa_value
    FROM agg WHERE span_us > 0
    """,
)
def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per user: each reading
    holds until the next one, so the mean weights every value by its
    duration — the correct average for irregularly sampled gauges
    (sensor values, queue depths, account balances), where the plain
    ``avg()`` over-counts rapid-fire samples.

    Numeric discipline for 100 TB determinism: value-cents (int64) ×
    gap-microseconds (int64) overflows int64 on month-long gaps, so the
    weighted sum accumulates in DECIMAL(38,0) — Spark's exact decimal
    aggregate, DuckDB's HUGEINT — which is associative and
    partition-order-free, unlike a double sum. One decimal→double
    conversion and two IEEE divisions produce the final value.

    Scale: the lead() window partitions by user_id — the same single
    exchange any per-user op pays — and everything after runs on the
    |users|-sized aggregate.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("ts_next", F.lead("ts").over(w)).filter(
        F.col("ts_next").isNotNull()
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    gap_us = (
        F.unix_micros(F.col("ts_next").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    )
    seg = seq.select(
        "user_id",
        cents.alias("cents"),
        gap_us.alias("gap_us"),
    )
    agg = seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("gap_us").alias("span_us"),
        F.sum(
            F.col("cents").cast("decimal(38,0)")
            * F.col("gap_us").cast("decimal(38,0)")
        ).alias("wsum"),
    )
    return agg.filter(F.col("span_us") > 0).select(
        "user_id",
        "n_segments",
        "span_us",
        (
            (F.col("wsum").cast("double") / F.col("span_us").cast("double"))
            / 100
        ).alias("twa_value"),
    )


__all__ = [
    "cohort_retention_matrix",
    "funnel_3step_users",
    "window_time_weighted_avg",
]
