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


def test_branch_commits_do_not_move_main(spark, tmp_path):
    """Iceberg ref semantics: a branch fork takes commits without
    mainline readers seeing them; main keeps advancing independently."""
    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    orders = _orders(spark)
    v1 = write_snapshot(orders.limit(10), t, mode="overwrite")
    snap.create_branch(t, "dev")
    vb = snap.commit_to_branch(orders.limit(5), t, "dev", mode="append")
    assert vb == v1 + 1
    # mainline read (no version) still sees only v1's 10 rows
    assert read_snapshot(spark, t).count() == 10
    # branch read sees 15
    assert snap.read_ref(spark, t, "dev").count() == 15
    # a mainline commit after the branch commit: parent must be v1, not vb
    v3 = write_snapshot(orders.limit(3), t, mode="append")
    assert read_snapshot(spark, t).count() == 13
    assert snap.list_refs(t)["branches"]["main"] == v3
    assert snap.read_ref(spark, t, "dev").count() == 15  # branch untouched


def test_tags_pin_versions_and_never_move(spark, tmp_path):
    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    orders = _orders(spark)
    v1 = write_snapshot(orders.limit(4), t, mode="overwrite")
    snap.create_tag(t, "audit-2026q1")
    write_snapshot(orders.limit(6), t, mode="append")
    assert snap.read_ref(spark, t, "audit-2026q1").count() == 4
    with pytest.raises(ValueError):
        snap.create_tag(t, "audit-2026q1")  # tags are immutable
    with pytest.raises(ValueError):
        snap.commit_to_branch(orders.limit(1), t, "audit-2026q1")
    assert snap.resolve_ref(t, "audit-2026q1") == v1


def test_expire_keeps_ref_targets_alive(spark, tmp_path):
    """Tagged/branched snapshots survive expiry even when old enough to
    be expired by the keep_last window."""
    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    orders = _orders(spark)
    write_snapshot(orders.limit(2), t, mode="overwrite")
    snap.create_tag(t, "keepme")  # pins v1
    for k in (3, 4, 5, 6):
        write_snapshot(orders.limit(k), t, mode="overwrite")
    expire_snapshots(t, keep_last=1)
    # v1 is far outside keep_last=1, but the tag keeps its files alive
    assert snap.read_ref(spark, t, "keepme").count() == 2
    # an untagged expired version's files are gone
    with pytest.raises(Exception):
        read_snapshot(spark, t, 2).count()


def test_expire_retention_is_per_ref_not_global(spark, tmp_path):
    """Branch commits occupy global version numbers; the keep window must
    walk each ref's parent chain, or branch spam would evict MAIN's
    recent history from a global last-N window."""
    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    orders = _orders(spark)
    write_snapshot(orders.limit(2), t, mode="overwrite")  # v1 (main)
    write_snapshot(orders.limit(3), t, mode="overwrite")  # v2 (main head)
    snap.create_branch(t, "dev")
    for k in (4, 5, 6, 7):  # v3..v6 — all on dev, filling a global window
        snap.commit_to_branch(orders.limit(k), t, "dev", mode="overwrite")
    expire_snapshots(t, keep_last=2)
    # main's lineage (v2 head + v1 parent) survives: under the old GLOBAL
    # last-2 window (v5, v6) both would have been physically expired.
    assert read_snapshot(spark, t, 2).count() == 3
    assert read_snapshot(spark, t, 1).count() == 2
    # dev keeps its last two ancestors (v6, v5); v3 is expired
    assert snap.read_ref(spark, t, "dev").count() == 7
    with pytest.raises(Exception):
        read_snapshot(spark, t, 3).count()


def test_delete_from_snapshot_copy_on_write(spark, tmp_path):
    """DELETE rewrites only the files containing matches; untouched files
    carry over by reference, and time travel still sees the old rows."""
    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    orders = _orders(spark)
    # two commits -> two file groups; the predicate only touches commit 2
    write_snapshot(orders.filter("o_orderkey % 2 = 0").repartition(2), t,
                   mode="overwrite")
    write_snapshot(orders.filter("o_orderkey % 2 = 1").repartition(2), t,
                   mode="append")
    before = snap._read_manifest(t, current_version(t))["files"]
    n_before = read_snapshot(spark, t).count()
    n_odd = read_snapshot(spark, t).filter("o_orderkey % 2 = 1").count()
    v = snap.delete_from_snapshot(spark, t, "o_orderkey % 2 = 1")
    after = snap._read_manifest(t, v)["files"]
    # even files (commit 1) carried over by reference
    assert set(f for f in before if "/c1-" in f) <= set(after)
    # odd files rewritten away
    assert not any("/c2-" in f for f in after)
    assert read_snapshot(spark, t).count() == n_before - n_odd
    assert read_snapshot(spark, t).filter("o_orderkey % 2 = 1").count() == 0
    # time travel: pre-delete version still has the odd rows
    assert read_snapshot(spark, t, v - 1).filter(
        "o_orderkey % 2 = 1"
    ).count() == n_odd
    # no-op delete returns the same version
    assert snap.delete_from_snapshot(spark, t, "o_orderkey < 0") == v


def test_optimize_snapshot_compacts_files(spark, tmp_path):
    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    orders = _orders(spark)
    for i in range(4):
        write_snapshot(orders.filter(f"o_orderkey % 4 = {i}").repartition(3),
                       t, mode="append")
    v0 = current_version(t)
    files0 = snap._read_manifest(t, v0)["files"]
    n0 = read_snapshot(spark, t).count()
    v = snap.optimize_snapshot(spark, t)
    files1 = snap._read_manifest(t, v)["files"]
    assert len(files1) < len(files0)
    after = read_snapshot(spark, t)
    assert after.count() == n0
    # content parity via an order-insensitive EXACT aggregate (double sums
    # re-associate across partitionings; integer cents do not)
    cents = F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
    a = read_snapshot(spark, t, v0).agg(cents).collect()[0][0]
    b = after.agg(cents).collect()[0][0]
    assert a == b


def test_remove_orphan_files_only_touches_unreferenced(spark, tmp_path):
    """A crashed commit leaves data files with no manifest: orphan cleanup
    removes exactly those and every committed version still reads."""
    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    orders = _orders(spark)
    write_snapshot(orders.limit(5), t, mode="overwrite")
    write_snapshot(orders.limit(7), t, mode="append")
    # simulate a crashed commit: files written, manifest never published
    orphan_dir = f"{t}/data/c99-deadbeef"
    orders.limit(3).write.parquet(orphan_dir)
    # the grace window protects in-flight commits: fresh orphans survive
    assert snap.remove_orphan_files(t) == []
    deleted = snap.remove_orphan_files(t, older_than_seconds=0)
    assert deleted and all("c99-deadbeef" in f for f in deleted)
    assert read_snapshot(spark, t).count() == 12
    assert read_snapshot(spark, t, 1).count() == 5
    # second run is a no-op
    assert snap.remove_orphan_files(t, older_than_seconds=0) == []


def test_metadata_tables_and_incremental_read(spark, tmp_path):
    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    orders = _orders(spark)
    write_snapshot(orders.limit(10), t, mode="append")
    write_snapshot(orders.limit(20), t, mode="append")
    write_snapshot(orders.limit(5), t, mode="append")

    files = snap.files_table(spark, t)
    total_rows = files.agg({"record_count": "sum"}).collect()[0][0]
    assert total_rows == 35
    assert files.filter("file_size_bytes <= 0").count() == 0

    hist = snap.history_table(spark, t)
    assert [r.version for r in hist.orderBy("version").collect()] == [1, 2, 3]

    # incremental: exactly v2+v3's appends
    delta = snap.read_version_changes(spark, t, 1, 3)
    assert delta.count() == 25
    # crossing an overwrite refuses
    write_snapshot(orders.limit(3), t, mode="overwrite")
    with pytest.raises(ValueError, match="non-append"):
        snap.read_version_changes(spark, t, 2, 4)


def test_write_audit_publish_flow(spark, tmp_path):
    """WAP: stage commits on an audit branch, validate, fast-forward main.
    Publishing atomically exposes every staged commit; a diverged main
    refuses the fast-forward."""
    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    orders = _orders(spark)
    write_snapshot(orders.limit(10), t, mode="overwrite")
    snap.create_branch(t, "audit")
    snap.commit_to_branch(orders.limit(5), t, "audit", mode="append")
    snap.commit_to_branch(orders.limit(2), t, "audit", mode="append")
    # audit step: validate the staged data before anyone sees it
    staged = snap.read_ref(spark, t, "audit")
    assert staged.count() == 17
    assert read_snapshot(spark, t).count() == 10  # main still clean
    v = snap.publish_branch(t, "audit")
    assert read_snapshot(spark, t).count() == 17
    assert snap.list_refs(t)["branches"]["main"] == v
    # diverged main -> publish refuses
    snap.create_branch(t, "audit2")
    snap.commit_to_branch(orders.limit(1), t, "audit2", mode="append")
    write_snapshot(orders.limit(3), t, mode="append")  # main moves on
    with pytest.raises(ValueError, match="fast-forward"):
        snap.publish_branch(t, "audit2")
    with pytest.raises(ValueError, match="tag"):
        snap.create_tag(t, "pin")
        snap.publish_branch(t, "pin")


def test_delete_keeps_null_predicate_rows(spark):
    """SQL DELETE three-valued logic: rows where the predicate evaluates
    NULL must survive (NOT NULL is NULL, not TRUE)."""
    import tempfile

    from lakehouse_variance_spark.sources import snapshots as snap

    with tempfile.TemporaryDirectory() as d:
        t = f"{d}/t"
        df = spark.createDataFrame(
            [(1, 5), (2, None), (3, 7)], "id long, c long"
        )
        write_snapshot(df, t, mode="overwrite")
        snap.delete_from_snapshot(spark, t, "c = 5")
        left = {r.id for r in read_snapshot(spark, t).collect()}
        assert left == {2, 3}  # the NULL row survives


def test_incremental_read_walks_main_lineage_not_global_sequence(spark, tmp_path):
    """Branch commits interleave in the global version sequence; the
    incremental read must validate along the parent chain so (a) a branch
    overwrite between two main appends doesn't block the read and (b) a
    cross-lineage range is refused outright."""
    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    orders = _orders(spark)
    write_snapshot(orders.limit(4), t, mode="append")  # v1 main
    snap.create_branch(t, "dev")
    snap.commit_to_branch(orders.limit(2), t, "dev", mode="overwrite")  # v2 branch
    write_snapshot(orders.limit(6), t, mode="append")  # v3 main (parent v1)
    # main lineage v1 -> v3 is pure append despite the interleaved branch
    # overwrite at v2
    assert snap.read_version_changes(spark, t, 1, 3).count() == 6
    # branch -> main crosses lineages: refused, not silently mis-diffed
    with pytest.raises(ValueError, match="not an ancestor"):
        snap.read_version_changes(spark, t, 2, 3)


def test_branch_isolation_on_pre_refs_table(spark, tmp_path):
    """A table whose commits predate the refs file must still isolate
    branch commits: creating the first ref seeds main at the current
    head."""
    import json as _json

    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    orders = _orders(spark)
    write_snapshot(orders.limit(8), t, mode="overwrite")
    # simulate a pre-refs table: drop the refs file entirely
    snap._refs_path(t).unlink()
    snap.create_branch(t, "dev")
    snap.commit_to_branch(orders.limit(3), t, "dev", mode="append")
    # mainline readers still see only v1
    assert read_snapshot(spark, t).count() == 8
    assert snap.read_ref(spark, t, "dev").count() == 11
    assert _json.loads(snap._refs_path(t).read_text())["branches"]["main"] == 1


def test_delete_with_predicate_on_evolved_column(spark, tmp_path):
    """DELETE over a column added by schema evolution: old files lack the
    column, which must read as NULL (surviving) rather than failing to
    resolve in the survivors rewrite."""
    from lakehouse_variance_spark.sources import snapshots as snap

    t = str(tmp_path / "t")
    base = spark.createDataFrame([(1, 10), (2, 20)], "id long, a long")
    write_snapshot(base, t, mode="overwrite")
    evolved = spark.createDataFrame(
        [(3, 30, "x"), (4, 40, "y")], "id long, a long, c string"
    )
    write_snapshot(evolved, t, mode="append")
    snap.delete_from_snapshot(spark, t, "c = 'x'")
    left = {r.id for r in read_snapshot(spark, t).collect()}
    assert left == {1, 2, 4}  # old rows (c NULL) survive; only id=3 deleted
