"""Streaming incremental corpus ingest — the end-to-end composition the
batch gate (`operators/ingest.py:dedup_incremental`) promises for steady
state: document files ARRIVE as a stream, each micro-batch is deduped
against the maintained fingerprint snapshot, and the survivors land as
one atomic snapshot commit per batch (exactly-once, time-travelable).

Three subsystems compose, each already individually gated:

* Structured Streaming file source (micro-batch arrival order),
* the fingerprint anti-join gate (within-batch first-occurrence, then
  anti-join the seen set),
* the native snapshot layer (`sources/snapshots.py`): the ingested table
  IS the seen-fingerprint store, read back per batch, with the
  stream-batch-id replay guard of `snapshot_batch_writer`.

The composed semantics stay EXACTLY SQL-expressible — the keeper per
fingerprint is the row with the smallest (arrival batch, doc_id) — so
this streaming pipeline is oracle-checked end-to-end, not rows-only.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_variance_spark.operators.ingest import _FP_SQL, _fingerprint_col
from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.sources import snapshots
from lakehouse_variance_spark.tables import load_table

K_BATCHES = 3

_STAGED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("fingerprint", T.StringType()),
    ]
)


def incremental_ingest_writer(table_dir: str):
    """``foreachBatch`` function: dedup the batch against the ingested
    snapshot, commit only the survivors, exactly-once.

    The dedup transform is built LAZILY and the commit is delegated to
    `snapshots.snapshot_batch_writer`, which contributes its O(1)
    high-water-mark replay guard: a replayed batch_id returns before the
    transform ever evaluates — essential here, because re-running the
    anti-join against the post-commit snapshot would drop everything."""
    commit = snapshots.snapshot_batch_writer(table_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        first = (
            batch_df.groupBy("fingerprint")
            .agg(F.min(F.struct("doc_id", "source")).alias("first"))
            .select(
                F.col("first.doc_id").alias("doc_id"),
                F.col("first.source").alias("source"),
                "fingerprint",
            )
        )
        if snapshots.current_version(table_dir) > 0:
            seen = (
                snapshots.read_snapshot(spark, table_dir)
                .select("fingerprint")
                .distinct()
            )
            first = first.join(seen, "fingerprint", "left_anti")
        commit(first, batch_id)

    return write_batch


def _stage_batches(spark: SparkSession, sf_dir: str) -> str:
    """Write the corpus as K_BATCHES single-file parquet drops (batch b =
    docs with doc_id % K == b), modification times strictly increasing so
    the file source delivers them oldest-first, one per micro-batch."""
    from lakehouse_variance_spark.scratch import scratch_dir, stage_mod_batches

    # Null text => null fingerprint, and a NULL equality key silently
    # bypasses the left_anti gate every batch (NULL = NULL never matches)
    # where the oracle's row_number keeps exactly one — so null-text rows
    # are excluded from the gate on BOTH sides by contract.
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", _fingerprint_col().alias("fingerprint"))
    )
    return stage_mod_batches(
        docs, F.col("doc_id"), K_BATCHES, scratch_dir("lvs_ingest_staging_")
    )


@register(
    "stream_incremental_ingest",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, source, {_FP_SQL} AS fingerprint,
               doc_id % {K_BATCHES} AS b
        FROM documents WHERE text IS NOT NULL)
    SELECT doc_id, source, fingerprint
    FROM (SELECT *, row_number() OVER (PARTITION BY fingerprint
                                       ORDER BY b, doc_id) AS rn
          FROM fp)
    WHERE rn = 1
    """,
)
def stream_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the corpus through the streaming ingest gate as K arriving file
    batches and return the ingested table (the final snapshot): first
    arrival wins per fingerprint, within and across batches.

    Scale: the per-batch work is the batch gate's plan (16-byte
    fingerprint shuffles only; text never crosses an exchange — the
    fingerprint is computed at the source projection). Reading the seen
    set back per batch is a manifest-listed parquet scan of fingerprints
    only; at 100 TB the anti-join's probe side is additionally pre-pruned
    by AQE's runtime bloom filter, and the per-batch commit is one atomic
    manifest write regardless of data volume. State lives in the table,
    not the stream — a restart resumes from the snapshot + checkpoint,
    and the batch-id guard makes replays no-ops.
    """
    from lakehouse_variance_spark.scratch import scratch_dir

    staging = _stage_batches(spark, sf_dir)
    # Scratch-rooted (fast ephemeral storage, removed at exit): table_dir
    # previously leaked a /tmp copy per invocation — the ADVICE-r10 class.
    table_dir = scratch_dir("lvs_ingest_table_")
    checkpoint = scratch_dir("lvs_ingest_ckpt_")
    stream = (
        spark.readStream.schema(_STAGED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    query = (
        stream.writeStream.foreachBatch(incremental_ingest_writer(table_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    # Staging (a corpus-sized copy) and the checkpoint are dead once the
    # stream drains; only table_dir backs the returned DataFrame.
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(checkpoint, ignore_errors=True)
    return snapshots.read_snapshot(spark, table_dir).select(
        "doc_id", "source", "fingerprint"
    )
