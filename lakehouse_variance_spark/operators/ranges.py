"""Range joins and batch sessionization.

The reference's query surface has no interval/range joins (SURVEY.md §2A);
these are north-star temporal extensions alongside the as-of join in
temporal.py:

* bucketed point-in-interval range join — Spark plans a pure inequality
  join (no equi key) as BroadcastNestedLoopJoin: every point row against
  every interval, O(|points|·|intervals|). Discretizing time into
  fixed-width buckets turns it into an equi-join: intervals explode to
  the buckets they cover, points map to exactly ONE bucket, so the pair
  set is produced by a hash join and the residual BETWEEN filters it.
  Each (point, interval) pair arises from exactly one bucket — no
  dedup pass needed.
* batch sessionization — the gap-rule session assignment (new session
  when the gap to the previous event exceeds the threshold) as two
  windows over one shuffle: a lag() to mark session starts, a running
  sum to number them. The batch twin of the streaming
  ``session_window`` aggregation in streaming/logs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table

# Interval width for the synthetic maintenance windows (30 min), and the
# bucket width used to discretize them. Bucket == interval width means each
# interval covers at most 2 buckets, so the fan-out factor is ≤ 2.
WINDOW_US = 30 * 60 * 1_000_000
BUCKET_US = WINDOW_US

# Which error events define global maintenance windows (subsample so the
# interval side stays dimension-sized, as real outage tables are).
WINDOW_USER_MOD = 50

# Session gap threshold (microseconds): 30 minutes, matching the streaming
# session_window gap in streaming/logs.py.
SESSION_GAP_US = 30 * 60 * 1_000_000


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_us: str,
    start_us: str,
    end_us: str,
    bucket_us: int = BUCKET_US,
) -> DataFrame:
    """Point-in-interval join via time bucketing (no equi key required).

    ``points`` carries an epoch-microsecond column ``point_us``; every
    interval [start_us, end_us] explodes to the buckets it covers, points
    hash to their single bucket, and a hash equi-join on the bucket id plus
    the residual BETWEEN yields exactly the qualifying pairs.

    Scale: the shuffle is |points| + |intervals|·fanout rows on a uniform
    key (time bucket); there is no nested-loop anywhere. Long intervals
    raise the fanout linearly — pick bucket_us near the typical interval
    length, the standard tuning rule for bucketed interval joins.
    """
    b_point = (F.col(point_us) / F.lit(bucket_us)).cast("bigint")
    p = points.withColumn("_bucket", b_point)
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_us) / F.lit(bucket_us)).cast("bigint"),
                (F.col(end_us) / F.lit(bucket_us)).cast("bigint"),
            )
        ),
    )
    return p.join(iv, "_bucket").filter(
        F.col(point_us).between(F.col(start_us), F.col(end_us))
    ).drop("_bucket")


@register(
    "range_join_maintenance",
    oracle=f"""
    WITH windows AS (
        SELECT event_id AS window_id,
               epoch_us(ts) AS start_us,
               epoch_us(ts) + {WINDOW_US} AS end_us
        FROM events
        WHERE event_type = 'error' AND user_id % {WINDOW_USER_MOD} = 0),
    clicks AS (
        SELECT event_id AS click_id, epoch_us(ts) AS click_us
        FROM events WHERE event_type = 'click')
    SELECT w.window_id,
           count(*) AS n_clicks,
           min(c.click_id) AS first_click_id,
           max(c.click_id) AS last_click_id
    FROM clicks c JOIN windows w
      ON c.click_us BETWEEN w.start_us AND w.end_us
    GROUP BY w.window_id
    """,
)
def range_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (key-less) range join: count the clicks falling inside each
    30-minute "maintenance window" opened by a sampled error event. With no
    user key to hash on, the naive plan is a nested loop over
    clicks×windows; the bucketed plan stays a hash join (see
    :func:`range_join_buckets`).
    """
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    windows = (
        ev.filter(
            (F.col("event_type") == "error")
            & (F.col("user_id") % WINDOW_USER_MOD == 0)
        )
        .select(
            F.col("event_id").alias("window_id"),
            ts_us.alias("start_us"),
            (ts_us + F.lit(WINDOW_US)).alias("end_us"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), ts_us.alias("click_us")
    )
    pairs = range_join_buckets(clicks, windows, "click_us", "start_us", "end_us")
    return pairs.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.min("click_id").alias("first_click_id"),
        F.max("click_id").alias("last_click_id"),
    )


@register(
    "batch_sessionize",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_us
        FROM events),
    marked AS (
        SELECT user_id, event_id, ts_us,
               CASE WHEN prev_us IS NULL
                         OR ts_us - prev_us > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_start
        FROM ordered),
    numbered AS (
        SELECT user_id, event_id, ts_us,
               CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_us,
                                        event_id ROWS BETWEEN UNBOUNDED
                                        PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_num
        FROM marked)
    SELECT user_id, session_num,
           count(*) AS n_events,
           min(ts_us) AS session_start_us,
           max(ts_us) AS session_end_us,
           max(ts_us) - min(ts_us) AS duration_us
    FROM numbered
    GROUP BY user_id, session_num
    """,
)
def batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-rule sessionization in batch: a session breaks when a user is
    idle longer than {SESSION_GAP_US}µs. lag() marks session starts, a
    running sum numbers them, and the rollup summarizes each session —
    the batch twin of the streaming ``session_window`` aggregate.

    Scale: both windows and the final groupBy share the user_id hash
    partitioning — Spark plans ONE exchange; the two sorted passes and the
    partial aggregation run within partitions.
    """
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_id", ts_us.alias("ts_us"), F.lag(ts_us).over(w).alias("prev_us")
    )
    marked = ordered.withColumn(
        "is_start",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    w_num = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.withColumn(
        "session_num", F.sum("is_start").over(w_num).cast("bigint")
    )
    return numbered.groupBy("user_id", "session_num").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


__all__ = ["range_join_buckets", "range_join_maintenance", "batch_sessionize"]
