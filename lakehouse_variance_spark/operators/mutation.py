"""Lakehouse table-mutation operators: MERGE upsert, CDC apply, SCD2.

The reference's table management covers the write side of a lakehouse —
create / replace / append of Iceberg tables (`datasets/iceberg conversion/
csv_to_iceberg.py:180-194`). A complete engine also needs the mutation
side every warehouse workload expects:

* MERGE INTO-style upsert — apply a changelog of updates / deletes /
  inserts to a keyed target table;
* CDC apply — collapse an ordered change stream to the latest surviving
  row per key (the "read side" of a changelog);
* SCD2 history build — turn a change stream into validity intervals
  (valid_from / valid_to / is_current version rows).

Without Iceberg/Delta runtime jars in this container the *logical* merge
is expressed as pure DataFrame transforms (one shuffle by key, then
join/window — exactly the plan Iceberg's copy-on-write MERGE lowers to),
and the *physical* rewrite path is dynamic-partition-overwrite parquet
(`merge_write_dynamic`), which only rewrites partitions the changelog
touches — the property that makes MERGE affordable at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table

# Deterministic changelog carved out of `orders` so the op is self-contained
# on the driver's tables: delete every 17th key, update every 13th (delete
# wins on overlap), insert a shifted copy of every 19th under fresh keys.
DELETE_MOD = 17
UPDATE_MOD = 13
INSERT_MOD = 19
INSERT_KEY_OFFSET = 1_000_000
UPDATE_PRICE_BUMP = 1000.0


def merge_upsert(
    target: DataFrame,
    changelog: DataFrame,
    key: str,
    payload_cols: list[str],
) -> DataFrame:
    """MERGE semantics over DataFrames.

    ``changelog`` carries ``key``, ``payload_cols`` and an ``op`` column:
    ``'U'`` upserts (update when matched, insert when not), ``'D'`` deletes
    when matched. One changelog row per key (caller collapses first —
    see :func:`cdc_apply_latest` for the collapse).

    Plan shape: a single full-outer shuffle join on the key; each payload
    column resolves via coalesce(change, target). No window, no second
    shuffle — at scale this is the canonical copy-on-write MERGE plan, and
    AQE handles skewed keys. The changelog is usually a small fraction of
    the target; Spark broadcast-joins it when below the threshold.
    """
    chg = changelog.select(
        F.col(key), F.col("op"), *[F.col(c).alias(f"_chg_{c}") for c in payload_cols]
    )
    joined = target.join(chg, on=key, how="full_outer")
    # Matched 'D' rows drop; everything else keeps the freshest payload.
    merged = joined.filter((F.col("op").isNull()) | (F.col("op") == "U"))
    out_cols = [F.col(key)]
    for c in payload_cols:
        out_cols.append(F.coalesce(F.col(f"_chg_{c}"), F.col(c)).alias(c))
    return merged.select(*out_cols)


def _orders_changelog(orders: DataFrame) -> DataFrame:
    """The deterministic synthetic changelog (see module constants)."""
    k = F.col("o_orderkey")
    deletes = orders.filter(k % DELETE_MOD == 0).select(
        k.alias("o_orderkey"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(None).cast("string").alias("o_orderpriority"),
    )
    updates = (
        orders.filter((k % UPDATE_MOD == 0) & (k % DELETE_MOD != 0))
        .select(
            k.alias("o_orderkey"),
            F.lit("U").alias("op"),
            (F.col("o_totalprice") + F.lit(UPDATE_PRICE_BUMP)).alias("o_totalprice"),
            F.lit("MERGED").alias("o_orderpriority"),
        )
    )
    inserts = orders.filter(k % INSERT_MOD == 0).select(
        (k + F.lit(INSERT_KEY_OFFSET)).alias("o_orderkey"),
        F.lit("U").alias("op"),
        F.col("o_totalprice").alias("o_totalprice"),
        F.lit("INSERTED").alias("o_orderpriority"),
    )
    return deletes.unionByName(updates).unionByName(inserts)


@register(
    "merge_upsert_orders",
    oracle=f"""
    WITH chg AS (
        SELECT o_orderkey, 'D' AS op,
               CAST(NULL AS DOUBLE) AS o_totalprice,
               CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderkey % {DELETE_MOD} = 0
        UNION ALL
        SELECT o_orderkey, 'U', o_totalprice + {UPDATE_PRICE_BUMP}, 'MERGED'
        FROM orders
        WHERE o_orderkey % {UPDATE_MOD} = 0 AND o_orderkey % {DELETE_MOD} <> 0
        UNION ALL
        SELECT o_orderkey + {INSERT_KEY_OFFSET}, 'U', o_totalprice, 'INSERTED'
        FROM orders WHERE o_orderkey % {INSERT_MOD} = 0),
    merged AS (
        SELECT COALESCE(c.o_orderkey, t.o_orderkey) AS o_orderkey,
               COALESCE(c.o_totalprice, t.o_totalprice) AS o_totalprice,
               COALESCE(c.o_orderpriority, t.o_orderpriority) AS o_orderpriority
        FROM orders t FULL OUTER JOIN chg c USING (o_orderkey)
        WHERE c.op IS NULL OR c.op = 'U')
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM merged
    GROUP BY o_orderpriority
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders: apply the synthetic changelog (deletes every
    {DELETE_MOD}th key, price-bump updates every {UPDATE_MOD}th, shifted-key
    inserts every {INSERT_MOD}th), then summarize the merged table per
    priority class. Mirrors the write path the reference delegates to
    Iceberg (`csv_to_iceberg.py:180-194` handles only create/append).

    Sums use integer cents so the hash is immune to float re-association
    across partitionings.
    """
    orders = load_table(spark, sf_dir, "orders")
    merged = merge_upsert(
        orders,
        _orders_changelog(orders),
        key="o_orderkey",
        payload_cols=["o_totalprice", "o_orderpriority"],
    )
    return merged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_price_cents"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@register(
    "cdc_apply_latest",
    oracle="""
    WITH ranked AS (
        SELECT user_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               value, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_ops
        FROM events)
    SELECT user_id,
           event_id AS last_event_id,
           value    AS last_value,
           n_ops
    FROM ranked
    WHERE rn = 1 AND op = 'U'
    """,
)
def cdc_apply_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog collapse: treat `events` as an ordered change stream
    keyed by user (``error`` = delete, anything else = upsert) and emit the
    latest surviving row per key — the standard materialize-a-changelog
    read. One shuffle by key; the window and the per-key count share that
    single partitioning, so at 100 TB this is a single exchange + sort.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "user_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "value",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_ops"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("op") == "U")).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
        "n_ops",
    )


# Bound the SCD2 output so the gate compares a stable subset of users.
SCD2_USER_MOD = 10


@register(
    "scd2_user_versions",
    oracle=f"""
    WITH chg AS (
        SELECT user_id, ts, event_id, value,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_value
        FROM events WHERE user_id % {SCD2_USER_MOD} = 0),
    versions AS (
        SELECT user_id, ts, event_id, value
        FROM chg WHERE prev_value IS NULL OR value <> prev_value)
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS version_num,
           value,
           epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS valid_to_us,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM versions
    """,
)
def scd2_user_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: collapse consecutive equal
    values per user, then assign each surviving version a
    [valid_from, valid_to) interval and an is_current flag. Validity bounds
    are emitted as epoch microseconds so both engines hash identically.

    Scale: both windows partition by the dimension key — one shuffle, two
    sorted passes over each partition; the change-detection filter shrinks
    the data before the interval window runs.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % SCD2_USER_MOD == 0
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
    )
    versions = chg.filter(
        F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value"))
    )
    ts_tz = F.col("ts").cast("timestamp")
    lead_ts = F.lead(ts_tz).over(w)
    return versions.select(
        "user_id",
        F.row_number().over(w).alias("version_num"),
        "value",
        F.unix_micros(ts_tz).alias("valid_from_us"),
        F.unix_micros(lead_ts).alias("valid_to_us"),
        F.when(lead_ts.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


def merge_write_dynamic(
    spark: SparkSession,
    table_path: str,
    merged: DataFrame,
    partition_col: str,
    touched_partitions: list | None = None,
) -> None:
    """Physical MERGE rewrite: overwrite ONLY the partitions the changelog
    touched, via dynamic partition overwrite — the copy-on-write pattern
    Iceberg/Delta use so a MERGE at 100 TB rewrites gigabytes, not the
    table. ``touched_partitions`` (when known) prunes the write set
    explicitly; otherwise every partition present in ``merged`` is
    rewritten.
    """
    out = merged
    if touched_partitions is not None:
        out = merged.filter(F.col(partition_col).isin(touched_partitions))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy(partition_col).parquet(table_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_partitioned(spark: SparkSession, table_path: str) -> DataFrame:
    return spark.read.parquet(table_path)


# Incremental-refresh cutoff: events before this day form the "stored"
# materialized aggregate; the rest arrive as the delta batch.
MV_CUTOFF = "2024-01-21"


@register(
    "mv_incremental_refresh",
    oracle=f"""
    SELECT event_type,
           CAST(ts AS DATE) + INTERVAL 0 DAY AS event_day,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS max_cents
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a stored per-(type, day)
    aggregate is refreshed by merging a NEW batch's partial aggregate into
    it — re-aggregating partials, never rescanning history — and the
    result must equal the full recompute (which is exactly what the
    oracle runs). The lakehouse MV-refresh loop: land batch → partial agg
    → union with stored partials → combine.

    Works because every measure is decomposable: count/sum merge by sum,
    max by max (avg derives from sum/count; non-decomposable measures —
    exact distinct, exact median — need their mergeable-sketch versions:
    HLL via ``agg_hll_sketch_union``, GK percentiles). At 100 TB this is
    the difference between scanning one day and scanning years on every
    refresh; the stored side here is localCheckpointed to model "read
    back from storage" and keep the refresh plan independent of the base
    plan.

    The day column departs as ``date + INTERVAL 0 DAY`` on both engines
    so each renders the same midnight-timestamp form (the DATE-rendering
    parity convention of cohort_retention_matrix, applied through
    DuckDB's DATE+INTERVAL→TIMESTAMP promotion).
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    day = F.col("ts").cast("date")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", day.alias("event_day")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sum_cents"),
            F.max(cents).alias("max_cents"),
        )

    base = partial(ev.filter(day < F.lit(MV_CUTOFF))).localCheckpoint()
    # NULL-timestamp rows fail BOTH day<cutoff and day>=cutoff (three-valued
    # logic) and would silently vanish from the refresh while the full
    # recompute keeps a NULL-day group — route them to the delta side.
    delta = partial(ev.filter((day >= F.lit(MV_CUTOFF)) | day.isNull()))
    refreshed = (
        base.unionByName(delta)
        .groupBy("event_type", "event_day")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )
    return refreshed.select(
        "event_type",
        F.col("event_day").cast("timestamp").alias("event_day"),
        "n",
        "sum_cents",
        "max_cents",
    )


__all__ = [
    "merge_upsert",
    "merge_upsert_orders",
    "cdc_apply_latest",
    "scd2_user_versions",
    "merge_write_dynamic",
    "read_partitioned",
    "mv_incremental_refresh",
]
