"""Streaming CDC upsert: the latest-wins merge law, the replay guard of
the transactional merge sink, and end-to-end stream==batch equality.

The end-to-end oracle equality runs in the driver gate (stream_cdc_upsert
has an exact window-SQL oracle); these tests pin the pieces whose failure
the end-to-end hash can mask at small scale: refusing OLDER cross-batch
records (the staged batches at tiny SFs may happen to arrive in ts order)
and not double-applying a replayed micro-batch (availableNow never
replays in a healthy run)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from lakehouse_variance_spark.sources import snapshots
from lakehouse_variance_spark.streaming.cdc_stream import _cdc_merge

_COLS = ["user_id", "ts_us", "event_id", "value", "is_del"]


def _chg(spark, rows):
    return spark.createDataFrame(rows, _COLS)


def test_merge_refuses_older_incoming_records(spark):
    """A batch carrying an OLDER (ts_us, event_id) than the stored state
    must leave the payload unchanged while still counting its ops."""
    b1 = _chg(spark, [(1, 100, 10, 1.0, False), (1, 200, 11, 2.0, False)])
    state = _cdc_merge(b1, None)
    got = {r["user_id"]: r for r in state.collect()}
    assert got[1]["event_id"] == 11 and got[1]["n_ops"] == 2

    # Older record for user 1 (ts 150 < 200); new user 2.
    b2 = _chg(spark, [(1, 150, 12, 9.0, False), (2, 50, 13, 3.0, False)])
    merged = {r["user_id"]: r for r in _cdc_merge(b2, state).collect()}
    assert merged[1]["event_id"] == 11, "older incoming record must lose"
    assert merged[1]["value"] == 2.0
    assert merged[1]["n_ops"] == 3, "ops count is additive regardless"
    assert merged[2]["event_id"] == 13 and merged[2]["n_ops"] == 1


def test_merge_tombstone_then_reinsert(spark):
    """A newer delete tombstones the key; an even newer upsert revives it.
    Equal-ts ties break on event_id, matching the oracle's ORDER BY."""
    state = _cdc_merge(_chg(spark, [(7, 100, 1, 1.0, False)]), None)
    state = _cdc_merge(_chg(spark, [(7, 200, 2, 0.0, True)]), state)
    row = state.collect()[0]
    assert row["is_del"] is True and row["n_ops"] == 2
    state = _cdc_merge(_chg(spark, [(7, 200, 3, 5.0, False)]), state)
    row = state.collect()[0]
    assert row["is_del"] is False and row["event_id"] == 3
    assert row["n_ops"] == 3


def test_merge_writer_skips_replayed_batch(spark):
    """Replaying a committed batch_id must be a no-op: the additive n_ops
    counter would otherwise double-count (at-least-once foreachBatch
    delivery is the contract; exactly-once is the sink's job)."""
    table_dir = tempfile.mkdtemp(prefix="lvs_cdc_guard_")
    write = snapshots.snapshot_merge_writer(table_dir, _cdc_merge)
    b = _chg(spark, [(1, 100, 10, 1.0, False)])
    write(b, 0)
    write(_chg(spark, [(1, 200, 11, 2.0, False)]), 1)
    v_after = snapshots.current_version(table_dir)
    write(b, 0)  # replay of batch 0 — must not commit or re-merge
    assert snapshots.current_version(table_dir) == v_after
    row = snapshots.read_snapshot(spark, table_dir).collect()[0]
    assert row["n_ops"] == 2 and row["event_id"] == 11
