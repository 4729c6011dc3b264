"""Snapshot/time-travel laws: append/overwrite visibility, rollback,
schema evolution, commit-log integrity, and expire semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakehouse_variance_spark.sources.snapshots import (
    current_version,
    expire_snapshots,
    history,
    read_snapshot,
    rollback,
    write_snapshot,
)
from lakehouse_variance_spark.tables import load_table
from tests.conftest import SF_DIR


def _orders(spark):
    return load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


def test_time_travel_append_overwrite_rollback(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    orders = _orders(spark)
    first = orders.filter(F.col("o_orderkey") % 3 == 0)
    second = orders.filter(F.col("o_orderkey") % 3 == 1)
    third = orders.filter(F.col("o_orderkey") % 3 == 2)

    v1 = write_snapshot(first, tbl, mode="append")
    v2 = write_snapshot(second, tbl, mode="append")
    v3 = write_snapshot(third, tbl, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)

    n1, n2, n3 = first.count(), second.count(), third.count()
    assert read_snapshot(spark, tbl, 1).count() == n1
    assert read_snapshot(spark, tbl, 2).count() == n1 + n2  # append unions
    assert read_snapshot(spark, tbl, 3).count() == n3  # overwrite replaces
    assert read_snapshot(spark, tbl).count() == n3  # latest by default

    v4 = rollback(tbl, 2)
    assert v4 == 4
    assert read_snapshot(spark, tbl).count() == n1 + n2
    # rolled-PAST version still readable — history is never rewritten
    assert read_snapshot(spark, tbl, 3).count() == n3

    ops = [h["operation"] for h in history(tbl)]
    assert ops == ["append", "append", "overwrite", "rollback->2"]


def test_snapshot_schema_evolution_merges(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    base = _orders(spark).limit(100)
    write_snapshot(base, tbl, mode="append")
    evolved = base.withColumn("channel", F.lit("web"))
    write_snapshot(evolved, tbl, mode="append")

    latest = read_snapshot(spark, tbl)
    assert "channel" in latest.columns
    # old files surface NULL for the new column; new files carry it
    counts = dict(
        latest.groupBy(F.col("channel").isNull().alias("is_old"))
        .count()
        .collect()
    )
    assert counts == {True: 100, False: 100}
    # a v1 reader still sees the ORIGINAL shape
    assert "channel" not in read_snapshot(spark, tbl, 1).columns


def test_snapshot_concurrent_commit_detected(spark, tmp_path):
    # Two writers that both read parent=1 race for v2: the second publish
    # must fail loudly instead of silently clobbering the first.
    tbl = str(tmp_path / "tbl")
    write_snapshot(_orders(spark).limit(10), tbl)
    from lakehouse_variance_spark.sources import snapshots as S

    def manifest(cid):
        return {
            "version": 2,
            "parent": 1,
            "operation": "append",
            "commit_id": cid,
            "schema_ddl": "x",
            "files": [],
        }

    S._commit(tbl, manifest("winner"))
    with pytest.raises(RuntimeError, match="concurrent commit"):
        S._commit(tbl, manifest("loser"))
    # the winner's manifest is untouched
    import json

    assert (
        json.loads(S._manifest_path(tbl, 2).read_text())["commit_id"]
        == "winner"
    )


def test_expire_snapshots_keeps_live_files(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    orders = _orders(spark)
    write_snapshot(orders.limit(50), tbl, mode="append")
    write_snapshot(orders.limit(60), tbl, mode="overwrite")
    write_snapshot(orders.limit(70), tbl, mode="overwrite")

    deleted = expire_snapshots(tbl, keep_last=2)
    assert deleted, "v1's files were only referenced by v1"
    # live versions unaffected
    assert read_snapshot(spark, tbl, 2).count() == 60
    assert read_snapshot(spark, tbl, 3).count() == 70
    # expired version now raises (tombstoned, not silently empty)
    with pytest.raises(Exception):
        read_snapshot(spark, tbl, 1).count()


def test_streaming_snapshot_sink_exactly_once(spark, tmp_path):
    # Each micro-batch commits one snapshot version; a replayed batch_id
    # (Structured Streaming's at-least-once foreachBatch contract) is
    # recognized and skipped, so totals never double-count.
    from lakehouse_variance_spark.sources.snapshots import (
        committed_stream_batches,
        snapshot_batch_writer,
    )
    from lakehouse_variance_spark.streaming.logs import streaming_events

    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    stream = streaming_events(spark, SF_DIR).select(
        "event_id", "event_type", "value"
    )
    writer = snapshot_batch_writer(tbl)
    q = (
        stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert read_snapshot(spark, tbl).count() == total
    batches = committed_stream_batches(tbl)
    assert batches, "no stream batches committed"

    # replay the LAST batch verbatim — must be a no-op
    v_before = current_version(tbl)
    replay_id = max(batches)
    batch_df = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    writer(batch_df, replay_id)
    assert current_version(tbl) == v_before
    assert read_snapshot(spark, tbl).count() == total

    # a genuinely NEW batch still lands
    writer(batch_df.limit(5), replay_id + 1)
    assert read_snapshot(spark, tbl).count() == total + 5
