"""Spark 4 arbitrary-state streaming (``transformWithStateInPandas``).

The operator: per-user event-type TRANSITION counts (the Markov
transition matrix of each user's event stream) — state that
``applyInPandasWithState`` models as one opaque tuple, but that Spark 4's
StatefulProcessor API expresses with TYPED state variables: a ValueState
for the last-seen event type and a MapState keyed by (prev, curr) pair.
The map grows with observed transition pairs (≤ |event_types|² per user),
never with events.

ENVIRONMENT GATE: the Python side of transformWithState talks to the
JVM's state server over a protobuf channel, so it needs the
``google.protobuf`` package at runtime — not installed in this container
(and installs are off-limits). The module therefore exposes the operator
behind ``TWS_AVAILABLE``; the equality test against the batch twin skips
when the dependency is absent, and the registered, oracle-checked query
is the BATCH twin below (``event_transition_counts``), which computes the
identical result with lag() + groupBy.

Scale notes (both faces): the streaming face shuffles events once on
user_id into the state operator and keeps |users|·(1 + observed pairs)
fixed-width state rows in RocksDB; the batch face pays the same single
user_id exchange for its window + partial-aggregated groupBy. NULL
timestamps are excluded on both engines (Spark and DuckDB disagree on
default NULL ordering inside window ORDER BY, so order-sensitive ops must
pin that down).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table

try:  # pragma: no cover - exercised only where protobuf exists
    import google.protobuf  # noqa: F401

    TWS_AVAILABLE = True
except ImportError:
    TWS_AVAILABLE = False

TRANSITIONS_OUT = "user_id bigint, prev_type string, curr_type string, n bigint"


def _make_processor():
    """Build the StatefulProcessor class lazily (the import is cheap, but
    keeping it inside the factory makes the module importable everywhere)."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class TransitionProcessor(StatefulProcessor):
        """Typed-state transition counter.

        ValueState ``last`` — the previous event type (one row).
        MapState ``counts`` — (prev_type, curr_type) → n.
        Emits the user's full current matrix every micro-batch (update
        semantics), so the final batch's emission is the cumulative
        answer.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last", "last_type string")
            self._counts = handle.getMapState(
                "counts", "prev_type string, curr_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            pdf = pd.concat(list(rows))
            pdf = pdf[pdf["ts"].notna()].sort_values(["ts", "event_id"])
            last = self._last.get()[0] if self._last.exists() else None
            for et in pdf["event_type"].tolist():
                if last is not None:
                    k = (last, et)
                    cur = (
                        self._counts.getValue(k)[0]
                        if self._counts.containsKey(k)
                        else 0
                    )
                    self._counts.updateValue(k, (cur + 1,))
                last = et
            if last is not None:
                self._last.update((last,))
            out = [
                {
                    "user_id": key[0],
                    "prev_type": k[0],
                    "curr_type": k[1],
                    "n": v[0],
                }
                for k, v in self._counts.iterator()
            ]
            yield pd.DataFrame(
                out,
                columns=["user_id", "prev_type", "curr_type", "n"],
            )

        def close(self) -> None:
            pass

    return TransitionProcessor()


def stream_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming face: transformWithStateInPandas over the event stream.

    Requires google.protobuf (see module docstring); callers must check
    ``TWS_AVAILABLE`` first. Uses the RocksDB state store provider —
    the provider transformWithState is built for (changelog-checkpointed,
    bounded-memory maps)."""
    from lakehouse_variance_spark.streaming.logs import (
        run_to_memory,
        streaming_events,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    events = streaming_events(spark, sf_dir)
    updates = (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_processor(),
            outputStructType=TRANSITIONS_OUT,
            outputMode="Update",
            timeMode="None",
        )
    )
    return run_to_memory(updates, output_mode="update")


@register(
    "event_transition_counts",
    oracle="""
    WITH ordered AS (
        SELECT user_id,
               event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
        WHERE ts IS NOT NULL)
    SELECT user_id,
           prev_type,
           event_type AS curr_type,
           CAST(count(*) AS BIGINT) AS n
    FROM ordered
    WHERE prev_type IS NOT NULL
    GROUP BY user_id, prev_type, curr_type
    """,
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the transformWithState operator: per-user Markov
    transition counts via lag() over (ts, event_id) + one partial-
    aggregated groupBy. One user_id exchange total — the window and the
    aggregation share it."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id",
        F.col("event_type").alias("curr_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        ordered.filter(F.col("prev_type").isNotNull())
        .groupBy("user_id", "prev_type", "curr_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
