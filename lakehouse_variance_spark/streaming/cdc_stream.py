"""Streaming CDC upsert — a changelog stream MERGEd into a maintained
snapshot table, exactly-once, with the final state equal to the batch
changelog collapse.

`operators/mutation.py` proves the batch pieces (MERGE full-outer plan,
CDC latest-collapse); `sources/snapshots.py` provides the transactional
table; this module composes them into the deployment shape the reference
delegates to Iceberg writers (`datasets/iceberg conversion/
csv_to_iceberg.py:180-194` handles only create/append — continuous
upsert maintenance is the gap a lakehouse user fills with
foreachBatch + MERGE INTO, here on the native snapshot layer):

* the `events` table arrives as K mtime-ordered file drops (micro-batch
  per file), each row a change record — key ``user_id``, op ``'D'`` when
  ``event_type = 'error'`` else ``'U'``, ordered by ``(ts, event_id)``;
* each micro-batch collapses to its per-key latest record, then merges
  into the state table under a LATEST-WINS condition — an incoming
  record replaces the stored one only when its ``(ts, event_id)`` is
  greater — with deletes kept as tombstones and per-key change counts
  accumulated additively;
* every batch commits as one atomic OVERWRITE snapshot version with the
  high-water-mark replay guard (`snapshots.snapshot_merge_writer`).

Because the merge condition is a total order on ``(ts, event_id)`` and
the counters are additive, the final state is independent of how the
stream is sliced into batches — it equals the GLOBAL latest-per-key
collapse, so the operator is oracle-checked end-to-end against the same
window SQL as the batch `cdc_apply_latest`, not rows-only.

Scale: per batch, one keyed aggregate over the batch slice plus one
full-outer join against state on the key — the canonical copy-on-write
MERGE plan (AQE broadcasts the batch side when small, splits skewed
keys). State holds one row per live key regardless of stream length;
tombstones bound re-insert races and are reclaimable once the watermark
passes. The commit is one manifest write per batch at any data volume.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.sources import snapshots
from lakehouse_variance_spark.tables import load_table

K_BATCHES = 3

_STAGED_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("is_del", T.BooleanType()),
    ]
)

_PAYLOAD = ("ts_us", "event_id", "value", "is_del")


def _stage_cdc_batches(spark: SparkSession, sf_dir: str) -> str:
    """Stage `events` as K single-file change-record drops (batch b =
    rows with event_id % K == b) with strictly increasing mtimes so the
    file source delivers them oldest-first, one per micro-batch. The
    batch split deliberately scatters each user's changes across batches
    (event_id round-robin), so cross-batch ordering is genuinely
    exercised — a batch can carry an OLDER change than one already
    merged, and the latest-wins condition must refuse it."""
    from lakehouse_variance_spark.scratch import scratch_dir, stage_mod_batches

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        "value",
        (F.col("event_type") == "error").alias("is_del"),
    )
    return stage_mod_batches(
        ev, F.col("event_id"), K_BATCHES, scratch_dir("lvs_cdc_staging_")
    )


def _cdc_merge(batch_df: DataFrame, state: DataFrame | None) -> DataFrame:
    """Collapse a change batch to its per-key latest record and merge it
    into ``state`` latest-wins; ``n_ops`` accumulates additively."""
    latest = (
        batch_df.groupBy("user_id")
        .agg(
            # Per-key argmax by (ts_us, event_id): lexicographic struct
            # max; event_id is unique, so the trailing payload fields
            # never decide the comparison.
            F.max(F.struct(*_PAYLOAD)).alias("s"),
            F.count(F.lit(1)).alias("batch_ops"),
        )
        .select(
            "user_id",
            *[F.col(f"s.{c}").alias(c) for c in _PAYLOAD],
            "batch_ops",
        )
    )
    if state is None:
        return latest.select(
            "user_id", *_PAYLOAD, F.col("batch_ops").alias("n_ops")
        )
    t, s = state.alias("t"), latest.alias("s")
    joined = t.join(s, "user_id", "full_outer")
    incoming_wins = F.col("t.ts_us").isNull() | (
        F.col("s.ts_us").isNotNull()
        & (
            F.struct(F.col("s.ts_us"), F.col("s.event_id"))
            > F.struct(F.col("t.ts_us"), F.col("t.event_id"))
        )
    )
    return joined.select(
        "user_id",
        *[
            F.when(incoming_wins, F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in _PAYLOAD
        ],
        (
            F.coalesce(F.col("t.n_ops"), F.lit(0))
            + F.coalesce(F.col("s.batch_ops"), F.lit(0))
        ).alias("n_ops"),
    )


@register(
    "stream_cdc_upsert",
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
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the event changelog through the streaming MERGE sink as K
    arriving file batches and read back the live rows of the final
    snapshot. The latest-wins merge makes the result equal the batch
    collapse (`cdc_apply_latest`'s window SQL) for ANY batch slicing, so
    the oracle is the exact global-window query — every driver hash
    match is an end-to-end proof that K sequential transactional merges
    reproduce the one-shot batch semantics."""
    from lakehouse_variance_spark.scratch import scratch_dir

    staging = _stage_cdc_batches(spark, sf_dir)
    # Scratch-rooted (fast ephemeral storage, removed at exit; table_dir
    # previously leaked a /tmp copy per invocation).
    table_dir = scratch_dir("lvs_cdc_table_")
    checkpoint = scratch_dir("lvs_cdc_ckpt_")
    stream = (
        spark.readStream.schema(_STAGED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    query = (
        stream.writeStream.foreachBatch(
            snapshots.snapshot_merge_writer(table_dir, _cdc_merge)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(checkpoint, ignore_errors=True)
    final = snapshots.read_snapshot(spark, table_dir)
    return final.filter(~F.col("is_del")).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
        "n_ops",
    )
