"""Structured-Streaming analytics over the event/log stream.

The reference is batch-only (SURVEY.md §2A "Streaming-only operators": traces
are post-hoc files), but its workload-log pipeline is naturally a stream —
run logs land in a directory and the variance stats should update
incrementally. This module provides that Spark-native extension:

* ``stream_event_window`` — file-source ``readStream`` over the events
  parquet, event-time watermark, tumbling-window aggregation, ``availableNow``
  trigger into a memory sink. On a cluster the same code tails an object-store
  directory forever; ``availableNow`` makes it a terminating batch whose
  result equals the batch SQL oracle.
* ``session_window_agg`` — per-user sessionization with Spark's
  ``session_window`` (30-minute inactivity gap). Registered as a batch query
  (identical operator semantics; streaming would need append-mode watermark
  that withholds the trailing sessions), with a lag/cumsum SQL oracle.

State scale notes: tumbling windows keep |windows × keys| state rows and
watermarking bounds that by the lateness horizon; session windows merge in
the state store — both are the standard Spark mechanisms for unbounded logs.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table

_MEMORY_SINK_IDS = itertools.count()

# File-stream sources need a user-supplied schema; reading the footer once
# per (session, path) instead of per source saves a full batch-scan setup
# every time a query builds a second source over the same table.
_SCHEMA_CACHE: dict[tuple[int, str], object] = {}


def _events_schema(spark: SparkSession, path: str):
    key = (id(spark), path)
    if key not in _SCHEMA_CACHE:
        _SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    return _SCHEMA_CACHE[key]


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source streaming read of the events table with the same
    nanos→timestamp normalization as the batch loader."""
    # Zero-offset NTZ<->TZ casts + nanosAsLong; pinned once per session
    # (see tables._pin_load_confs for the rationale).
    from lakehouse_variance_spark.tables import _pin_load_confs

    _pin_load_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    schema = _events_schema(spark, path)
    _note_stream_source(spark, path)  # feeds the state-store sizing below
    # The file stream source needs a DIRECTORY (its basePath). Two layouts
    # exist: events.parquet as a directory of part-files (Spark-written
    # replicas) streams directly; as a single file (the driver's testdata)
    # the source tails sf_dir glob-filtered to that file. Branching matters:
    # the glob filter over sf_dir silently matches NOTHING for the
    # directory layout — an empty stream, not an error.
    if os.path.isdir(path):
        stream = spark.readStream.schema(schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # withWatermark requires TIMESTAMP (with local-tz semantics); the
        # session runs in UTC so the NTZ cast is a zero-offset relabel.
        # Event-time OUTPUT columns must cast back to timestamp_ntz so the
        # rendered values stay naive like the oracle's (see
        # stream_event_window).
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


# State partition count for streaming queries. This is a STATE-STORE sizing
# knob, not a CPU knob: every shuffle partition of a stateful operator
# instantiates its own state store (a stream-stream join keeps FOUR per
# partition), and store setup/commit dominates small micro-batches — measured
# 7.8s -> 2.3s on the sf0.1 interval join going 32 -> 4 partitions, and in
# r11 an interleaved same-session A/B across all five stateful headline
# streams showed 2 beats 8 on every one (stream_stream_join 3.1-5.0 s vs
# 7.4-30 s; event/sliding windows ~2x) — at bench-scale state volumes (KBs)
# each extra partition is pure store-setup/commit constant. Unlike batch
# shuffles, streaming state partitioning is also a deployment contract (it
# is frozen into the checkpoint at first start), so it is sized to expected
# STATE VOLUME, never to core count. The default DERIVES from the stream's
# source volume (VERDICT r11 "what's wrong" #4: the old constant 2 was
# bench-scale tuning): state held by any of these operators is bounded by
# the watermark horizon of the input, so source bytes are a safe upper
# bound, sliced into ~256 MB state stores. At bench scale (events.parquet
# ~2 MB at sf0.1) that derivation yields the floor of 2 — identical
# behavior to the r11 constant, so BENCH numbers stay comparable — while a
# 1 TB source derives ~4096 stores instead of 2. A production deployment
# with a known (usually far smaller) state horizon sets
# $SPARK_GRAFT_STREAM_PARTITIONS explicitly; the env knob always wins.
_STREAM_STATE_TARGET_BYTES = 256 << 20  # ~256 MB of state per store
_STREAM_STATE_MIN, _STREAM_STATE_MAX = 2, 4096
_SOURCE_BYTES: dict[int, int] = {}


def _note_stream_source(spark: SparkSession, path: str) -> None:
    """Record the on-disk size of the file-stream source feeding this
    session's next stateful query (consumed by _stream_state_partitions)."""
    try:
        if os.path.isdir(path):
            total = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _dirs, files in os.walk(path)
                for f in files
            )
        else:
            total = os.path.getsize(path)
        _SOURCE_BYTES[id(spark)] = total
    except OSError:
        _SOURCE_BYTES.pop(id(spark), None)


def _stream_state_partitions(spark: SparkSession) -> int:
    """State-store count for the next streaming query: env override, else
    ceil(source_bytes / 256 MB) clamped to [2, 4096] (see the sizing note
    above — source bytes upper-bound the watermark-horizon state volume)."""
    env = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS")
    if env:
        return int(env)
    src = _SOURCE_BYTES.get(id(spark), 0)
    derived = -(-src // _STREAM_STATE_TARGET_BYTES)  # ceil div
    return max(_STREAM_STATE_MIN, min(_STREAM_STATE_MAX, derived))


def run_to_memory(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Execute a streaming aggregation to completion (availableNow) into a
    memory sink and return the result table."""
    name = f"lvs_stream_{next(_MEMORY_SINK_IDS)}"
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # The partition count is captured when the query STARTS; restore the
    # session value right after so batch plans keep the core-count sizing.
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_stream_state_partitions(spark))
    )
    try:
        query = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return stream_df.sparkSession.table(name)


def run_to_parquet(stream_df: DataFrame, output_mode: str = "append") -> DataFrame:
    """Execute a stream to completion (availableNow) into a PARQUET file
    sink and return a batch DataFrame over the sink directory.

    The distributed counterpart of :func:`run_to_memory` for streams whose
    output is ROW-scale rather than aggregate-scale: a memory sink
    collects every row into the driver (fine for the |windows×keys|
    outputs the windowed aggregations produce, a scale-killer for a
    deduplicated event stream — the round-10 100× probe measured the
    memory-sink version of ``stream_dedup_exactly_once`` at 83× cost for
    100× data). The file sink commits each micro-batch atomically through
    the sink manifest, which is also the exactly-once story the operator
    demonstrates."""
    # All sink dirs live under the process-scoped scratch root removed at
    # interpreter exit (ADVICE r10: per-invocation mkdtemp dirs were never
    # cleaned, so warm-up + timed passes and driver replays accumulated
    # full data copies under /tmp). Eager deletion is NOT safe — the
    # returned DataFrame lazily re-scans the sink directory. The root
    # lives on fast ephemeral storage (scratch.py): sink-manifest +
    # checkpoint metadata churn is a per-micro-batch disk constant, not
    # data volume (guide §6).
    from lakehouse_variance_spark.scratch import scratch_dir

    out = scratch_dir("sink_")
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # Same state-store sizing as run_to_memory: the partition count is
    # captured at query start, and every stateful operator instantiates one
    # state store per shuffle partition (a stream-stream join keeps FOUR),
    # so the session's core-count sizing (32) pays 4x the store
    # setup/commit constant for zero parallelism benefit at micro-batch
    # state volumes (VERDICT r10 #3 clawback).
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_stream_state_partitions(spark))
    )
    try:
        query = (
            stream_df.writeStream.format("parquet")
            .option("path", os.path.join(out, "data"))
            .option("checkpointLocation", os.path.join(out, "ckpt"))
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return stream_df.sparkSession.read.schema(stream_df.schema).parquet(
        os.path.join(out, "data")
    )


@register(
    "stream_event_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           CAST(round(sum(CAST(round(value * 100) AS BIGINT)) * 100.0
                      / count(*)) AS BIGINT) / 10000.0 AS avg_value,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation over the event stream with an
    event-time watermark (the SURVEY §2A streaming extension:
    ``readStream → withWatermark → window → writeStream``). availableNow
    processes the whole table as one terminating stream, so the result must
    equal the batch GROUP BY date_trunc oracle."""
    events = streaming_events(spark, sf_dir)
    # Aggregate in integer CENTS, not doubles: the fixture values carry
    # exactly 2 decimals, so the cent sum is an exact integer — immune to
    # partition-order float re-association AND to the engines' differing
    # round() implementations (Spark rounds the double's decimal string
    # HALF_UP; DuckDB multiplies and floors, with its own ulp noise — the
    # two disagree on the same double at .00005 boundaries, observed at
    # sf0.1). Every derived value below is a deterministic function of
    # (integer cents, integer count), bit-identical across engines: the
    # avg quotient is a rational with denominator n, so it is either an
    # exact representable tie (both engines round away from zero) or at
    # least 1/(2n) away from the boundary — never within an ulp of it.
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("sum_cents"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            (
                F.round(F.col("sum_cents") * 100.0 / F.col("n")).cast("long")
                / 10000.0
            ).alias("avg_value"),
            (F.col("sum_cents") / 100.0).alias("sum_value"),
        )
    )
    return run_to_memory(agg)


@register(
    "session_window_agg",
    oracle="""
    WITH ev AS (
        -- Truncate TIMESTAMP_NS to microseconds: Spark timestamps are µs.
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ),
    gaps AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_no
        FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization with a 30-minute inactivity gap via Spark's
    ``session_window`` (the merging-window operator behind streaming
    sessionization; here in batch so every trailing session is emitted).
    The oracle reconstructs sessions relationally: lag-gap flags → running
    sum → group. Session end is last-event + gap, Spark's half-open
    convention."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Custom stateful streaming operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

_USER_STATS_OUT = (
    "user_id bigint, n_events bigint, total_value double, max_gap_us bigint"
)
_USER_STATS_STATE = "n bigint, total_cents bigint, last_us bigint, max_gap_us bigint"


def _user_stats_fn(key, pdfs, state):
    """Per-user running stats with explicit state: event count, value total,
    and the maximum inter-event gap. The gap REQUIRES state — it spans
    micro-batch boundaries, so the previous batch's last timestamp must be
    carried in the state store (the exact case groupBy can't express).

    All state is INTEGER (cents / microseconds): float accumulation order
    varies across partitions and Python round() is half-even where SQL
    engines round half-up, so a .5 tie (hit at sf0.01, user 111's gap of
    exactly xxx.2265 s) hash-diverges. Integers carry no such ties; the
    2-decimal total is reconstructed exactly as cents/100."""
    import pandas as pd

    if state.exists:
        n, total_cents, last_us, max_gap_us = state.get
    else:
        n, total_cents, last_us, max_gap_us = 0, 0, None, 0
    # A group arrives as MULTIPLE Arrow chunks with no cross-chunk order
    # guarantee (arrow.maxRecordsPerBatch splits big groups): concatenate
    # first, sort ONCE, then run the order-sensitive gap scan — per-chunk
    # sorting would interleave time ranges and mis-measure gaps.
    parts = [p for p in pdfs if not p.empty]
    if parts:
        pdf = pd.concat(parts).sort_values("ts")
        us = (
            pd.to_datetime(pdf["ts"]).astype("datetime64[us]").astype("int64")
        ).to_numpy()
        if last_us is not None:
            max_gap_us = max(max_gap_us, int(us[0]) - last_us)
        if len(us) > 1:
            max_gap_us = max(max_gap_us, int((us[1:] - us[:-1]).max()))
        last_us = int(us[-1])
        n += len(pdf)
        # values carry exactly 2 decimals; *100 lands within 1 ulp of the
        # exact integer, so round() recovers it regardless of order.
        total_cents += int(pdf["value"].mul(100).round().sum())
    state.update((n, total_cents, last_us, max_gap_us))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "n_events": n,
                "total_value": total_cents / 100.0,
                "max_gap_us": max_gap_us,
            }
        ]
    )


@register(
    "stream_stateful_user_stats",
    oracle="""
    WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    g AS (
        SELECT user_id, value,
               date_diff('microsecond',
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts),
                         ts) AS gap_us
        FROM ev)
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           CAST(coalesce(max(gap_us), 0) AS BIGINT) AS max_gap_us
    FROM g GROUP BY user_id
    """,
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (SURVEY §2A streaming extension): per-user event count, value total, and
    max inter-event gap, with the last-seen timestamp carried in the state
    store across micro-batches.

    State is one fixed-width row per user — the store stays |users|-sized
    no matter how long the stream runs. The groupBy shuffles each user's
    events to one task; Arrow batches feed the pandas function. Because the
    stream terminates (availableNow) after draining every event, the final
    update per user equals the batch lag-window oracle."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = streaming_events(spark, sf_dir)
    updates = (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_stats_fn,
            outputStructType=_USER_STATS_OUT,
            stateStructType=_USER_STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_memory(updates, output_mode="update")


@register(
    "stream_static_join_dim",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_events,
           sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def stream_static_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the (batch)
    customer dimension, then aggregated per market segment — the standard
    Spark pattern for dimension lookups on unbounded data. The static side
    is broadcast, so each micro-batch joins map-side with NO stream-side
    shuffle before the aggregation; at 100 TB the dimension refreshes by
    re-resolving the batch table per micro-batch (Spark re-plans the static
    side each trigger). Value totals aggregate as integer cents (see
    stream_event_window's determinism note)."""
    events = streaming_events(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("segment")
        .agg(F.count("*").alias("n_events"), F.sum(cents).alias("sum_cents"))
        .select(
            "segment",
            "n_events",
            (F.col("sum_cents") / 100.0).alias("sum_value"),
        )
    )
    return run_to_memory(agg)


@register(
    "stream_dedup_exactly_once",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: the source unioned with itself simulates
    at-least-once (duplicate) delivery; ``dropDuplicatesWithinWatermark`` on
    the event id restores exactly-once, so the per-type totals equal the
    clean batch aggregation — which IS the oracle.

    The within-watermark variant is the 100 TB form: plain streaming
    dropDuplicates keeps every key forever, while this keeps only keys newer
    than the event-time watermark, so state is bounded by the lateness
    horizon x arrival rate regardless of stream lifetime. The deduped rows
    land append-mode in the sink; the final rollup aggregates the sink
    (chaining a second stateful aggregate after dedup would need
    append-mode watermark semantics that withhold trailing windows)."""
    doubled = streaming_events(spark, sf_dir).unionByName(
        streaming_events(spark, sf_dir)
    )
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", "value")
    )
    sink = run_to_parquet(deduped, output_mode="append")
    cents = F.round(F.col("value") * 100).cast("long")
    return sink.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        (F.sum(cents) / 100.0).alias("sum_value"),
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT c.user_id,
           count(*) AS n_pairs,
           min(c.event_id) AS first_click_id
    FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
          FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id
     AND e.ts >= c.ts
     AND e.ts <= c.ts + INTERVAL 10 MINUTE
    GROUP BY c.user_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time range condition: each
    click joined to the errors that follow it within 10 minutes, per user.

    This is THE stateful two-input streaming operator (SURVEY §2A streaming
    extension; Spark requires watermarks on both inputs plus a time-range
    join condition so it can bound the buffered state). Each side keeps only
    rows newer than its watermark minus the 10-minute range — state is
    |arrival rate × horizon| regardless of stream lifetime, and the join
    shuffles both streams once on user_id. The joined pairs land append-mode
    in the sink; the per-user rollup aggregates the sink (a second stateful
    aggregate after a stream-stream join would need its own watermark pass).
    availableNow drains the bounded source, so the result equals the batch
    interval-join oracle."""
    # One file source, self-joined: Spark supports stream-stream self-joins,
    # and sharing the source halves the per-query source machinery (schema,
    # file index, admission control) versus two independent readers.
    events = streaming_events(spark, sf_dir)
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"), F.col("ts").alias("err_ts")
        )
        .withWatermark("err_ts", "1 hour")
    )
    pairs = clicks.join(
        errors,
        F.expr(
            """
            c_user = e_user
            AND err_ts >= click_ts
            AND err_ts <= click_ts + INTERVAL 10 MINUTES
            """
        ),
    )
    # Row-scale output (one row per click x error pair) must sink
    # DISTRIBUTED: a memory sink collects every pair into the driver —
    # the same 100x-probe-caught defect class as stream_dedup_exactly_once.
    sink = run_to_parquet(pairs, output_mode="append")
    return sink.groupBy(F.col("c_user").alias("user_id")).agg(
        F.count("*").alias("n_pairs"),
        F.min("click_id").alias("first_click_id"),
    )


def idempotent_parquet_sink(dst_dir: str):
    """``foreachBatch`` writer with exactly-once sink semantics.

    Structured Streaming guarantees at-least-once delivery to foreachBatch:
    after a failure between the sink write and the checkpoint commit, the
    SAME batch_id is replayed. Writing each micro-batch to its own
    ``batch_id=<n>`` directory with ``mode("overwrite")`` makes the replay
    rewrite that directory in place instead of appending duplicates — the
    standard idempotent-sink pattern for parquet/object-store targets
    (the transactional alternative is a Delta/Iceberg MERGE on batch_id).

    The directory name doubles as a partition column, so readers prune by
    batch range for free; ``compact_files`` (sources/layout.py) folds the
    accumulated per-batch files back down on a maintenance schedule.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"batch_id={batch_id}")
        )

    return write_batch


def run_to_idempotent_sink(
    stream_df: DataFrame, dst_dir: str, checkpoint_dir: str
) -> None:
    """Drain a bounded stream through the idempotent foreachBatch sink with
    a checkpoint (the restart-safe deployment shape)."""
    query = (
        stream_df.writeStream.foreachBatch(idempotent_parquet_sink(dst_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


@register(
    "stream_sliding_window",
    oracle="""
    WITH slid AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts)
                 - to_minutes(30 * k.k) AS window_start,
               event_type, value, ts
        FROM events
        CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k)
    SELECT window_start, event_type,
           count(*) AS n,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM slid
    WHERE ts < window_start + INTERVAL '2 hours'
    GROUP BY 1, 2
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation over the event stream: 2-hour windows
    every 30 minutes, so each event contributes to 4 overlapping windows
    (the hopping-window companion to ``stream_event_window``'s tumbling
    form and ``session_window_agg``'s gap form — together the three window
    shapes Structured Streaming offers).

    Spark's ``window(ts, '2 hours', '30 minutes')`` expands each row into
    its 4 member windows BEFORE the shuffle, so partial aggregation still
    compresses map-side and state is |windows|×|types|, not |events|. The
    oracle replays the same expansion relationally: every event joins the
    k∈0..3 slide offsets of its 30-minute bucket. Sums accumulate integer
    cents (see stream_event_window's determinism note).
    """
    events = streaming_events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "2 hours", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum(cents).alias("sum_cents"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            (F.col("sum_cents") / 100.0).alias("sum_value"),
        )
    )
    return run_to_memory(agg)


# EWMA smoothing factor and the anomaly threshold in EW-stddev units.
EWMA_ALPHA = 0.25
ANOMALY_K = 2.0

_EWMA_OUT = (
    "user_id bigint, n_events bigint, ewma double, ewvar double, "
    "n_anomalies bigint"
)
_EWMA_STATE = "n bigint, ewma double, ewvar double, n_anom bigint"


def ewma_update(n, ewma, ewvar, n_anom, values):
    """Shared EWMA/anomaly recurrence (West 1979 exponentially-weighted
    moments): one deterministic left-to-right pass, used verbatim by BOTH
    the streaming state function and the batch reference in tests — the
    recurrence is order-sensitive by definition, so equality is defined
    against this exact op sequence."""
    for v in values:
        v = float(v)
        if n == 0:
            ewma, ewvar = v, 0.0
        else:
            if ewvar > 0.0 and abs(v - ewma) > ANOMALY_K * (ewvar ** 0.5):
                n_anom += 1
            delta = v - ewma
            incr = EWMA_ALPHA * delta
            ewma = ewma + incr
            ewvar = (1.0 - EWMA_ALPHA) * (ewvar + delta * incr)
        n += 1
    return n, ewma, ewvar, n_anom


def _ewma_fn(key, pdfs, state):
    """Per-user streaming EWMA + EW-variance + anomaly counter. The
    recurrence REQUIRES state: each update depends on the previous
    smoothed value, which lives in the state store across micro-batches
    (no window/aggregate expresses it)."""
    import pandas as pd

    n, ewma, ewvar, n_anom = (
        state.get if state.exists else (0, 0.0, 0.0, 0)
    )
    # Concatenate ALL Arrow chunks before the single sort: the recurrence
    # is order-defined, and chunks of one group carry no mutual order
    # (same rule as _user_stats_fn).
    parts = [p for p in pdfs if not p.empty]
    if parts:
        pdf = pd.concat(parts).sort_values(["ts", "event_id"])
        n, ewma, ewvar, n_anom = ewma_update(
            n, ewma, ewvar, n_anom, pdf["value"].to_numpy()
        )
    state.update((n, ewma, ewvar, n_anom))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "n_events": n,
                "ewma": ewma,
                "ewvar": ewvar,
                "n_anomalies": n_anom,
            }
        ]
    )


def _ewma_stream_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly detection: per-user exponentially-weighted mean
    and variance with a 2-sigma deviation counter, via
    ``applyInPandasWithState`` — the online-monitoring operator class
    where every update depends on the previous smoothed state. The
    production operator.

    State is one fixed-width row per user (n, ewma, ewvar, anomalies) —
    |users|-sized forever, restart-safe through checkpoints."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = streaming_events(spark, sf_dir)
    updates = (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_fn,
            outputStructType=_EWMA_OUT,
            stateStructType=_EWMA_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_memory(updates, output_mode="update")


def _ewma_batch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed batch replay of the IDENTICAL ``ewma_update``
    recurrence: repartition by user, one mapInPandas call folds every
    series of the partition in global (ts, event_id) order — the same
    plan shape as LTTB (per-series sequential work, series are the unit
    of parallelism)."""
    import pandas as pd

    from lakehouse_variance_spark.tables import load_table

    schema = (
        "user_id bigint, n_events bigint, ewma double, ewvar double, "
        "n_anomalies bigint"
    )

    def replay(batches):
        parts = [p for p in batches if not p.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True).sort_values(
            ["user_id", "ts", "event_id"]
        )
        out = []
        for uid, g in pdf.groupby("user_id", sort=False):
            n, ewma, ewvar, n_anom = ewma_update(
                0, 0.0, 0.0, 0, g["value"].to_numpy()
            )
            out.append((uid, n, ewma, ewvar, n_anom))
        yield pd.DataFrame(
            out, columns=["user_id", "n_events", "ewma", "ewvar",
                          "n_anomalies"],
        )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    return ev.repartition("user_id").mapInPandas(replay, schema)


@register(
    "stream_ewma_anomaly",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS stream_equals_batch_ok
    FROM events
    GROUP BY user_id
    """,
)
def stream_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EWMA anomaly detection, value-certified via a REPLAY
    ENVELOPE (the r9 envelope pattern for order-defined recurrences):
    one row per user carrying the EXACT event count both engines compute
    independently, plus a per-row boolean the oracle emits as TRUE —
    the streaming operator's final (n, ewma, ewvar, n_anomalies) state
    for this user EXACTLY equals a batch replay of the IDENTICAL
    ``ewma_update`` recurrence over the user's (ts, event_id)-ordered
    values (same float ops in the same order, so equality is exact,
    not approximate; a DuckDB-side fold was rejected — DuckDB 1.0's
    ``list_reduce`` mis-evaluates CASE over accumulator fields).

    The production operator is ``_ewma_stream_updates``
    (applyInPandasWithState); the same law plus chunk-spanning
    regressions stay in tests/test_streaming_state.py."""
    stream = _ewma_stream_updates(spark, sf_dir)
    batch = _ewma_batch_replay(spark, sf_dir)
    s = stream.select(
        "user_id",
        F.col("n_events").alias("s_n"),
        F.col("ewma").alias("s_ewma"),
        F.col("ewvar").alias("s_ewvar"),
        F.col("n_anomalies").alias("s_anom"),
    )
    return batch.join(s, "user_id", "left").select(
        "user_id",
        "n_events",
        (
            F.col("s_n").isNotNull()
            & (F.col("s_n") == F.col("n_events"))
            & (F.col("s_ewma") == F.col("ewma"))
            & (F.col("s_ewvar") == F.col("ewvar"))
            & (F.col("s_anom") == F.col("n_anomalies"))
        ).alias("stream_equals_batch_ok"),
    )
