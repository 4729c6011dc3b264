"""MERGE / CDC / SCD2 operator semantics (operators/mutation.py)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_variance_spark.operators.mutation import (
    merge_upsert,
    merge_write_dynamic,
)


def _target(spark):
    return spark.createDataFrame(
        [
            Row(k=1, val="a", grp="p0"),
            Row(k=2, val="b", grp="p0"),
            Row(k=3, val="c", grp="p1"),
        ]
    )


def test_merge_upsert_update_insert_delete(spark):
    chg = spark.createDataFrame(
        [
            Row(k=2, op="U", val="b2", grp="p0"),   # update matched
            Row(k=3, op="D", val=None, grp=None),   # delete matched
            Row(k=9, op="U", val="new", grp="p1"),  # insert unmatched
        ]
    )
    merged = merge_upsert(_target(spark), chg, key="k", payload_cols=["val", "grp"])
    rows = {r.k: (r.val, r.grp) for r in merged.collect()}
    assert rows == {1: ("a", "p0"), 2: ("b2", "p0"), 9: ("new", "p1")}


def test_merge_upsert_unmatched_delete_is_noop(spark):
    chg = spark.createDataFrame(
        [Row(k=42, op="D", val=None, grp=None)], schema="k long, op string, val string, grp string"
    )
    merged = merge_upsert(_target(spark), chg, key="k", payload_cols=["val", "grp"])
    assert merged.count() == 3


def test_merge_write_dynamic_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _target(spark).write.partitionBy("grp").parquet(path)
    p1_files_before = set(glob.glob(os.path.join(path, "grp=p1", "*.parquet")))

    # Changelog touches only partition p0.
    chg = spark.createDataFrame([Row(k=2, op="U", val="b2", grp="p0")])
    merged = merge_upsert(
        spark.read.parquet(path), chg, key="k", payload_cols=["val", "grp"]
    )
    merge_write_dynamic(spark, path, merged, "grp", touched_partitions=["p0"])

    # Untouched partition's files survive byte-identical paths; touched
    # partition reflects the update; the full table is the merged view.
    p1_files_after = set(glob.glob(os.path.join(path, "grp=p1", "*.parquet")))
    assert p1_files_before == p1_files_after
    out = spark.read.parquet(path)
    assert {r.k: r.val for r in out.collect()} == {1: "a", 2: "b2", 3: "c"}


def test_merge_write_dynamic_restores_overwrite_mode(spark, tmp_path):
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    path = str(tmp_path / "tbl2")
    df = _target(spark)
    df.write.partitionBy("grp").parquet(path)
    merge_write_dynamic(spark, path, spark.read.parquet(path), "grp")
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == prev


def test_scd2_intervals_chain(spark):
    """Consecutive versions tile the timeline: valid_to == next valid_from,
    exactly one current version per key."""
    from lakehouse_variance_spark import registry

    registry.load_all()
    df = registry.QUERIES["scd2_user_versions"](spark, "/root/testdata/sf0.001")
    pdf = df.toPandas().sort_values(["user_id", "version_num"])
    for _, g in pdf.groupby("user_id"):
        assert (g["is_current"] == 1).sum() == 1
        assert g.iloc[-1]["is_current"] == 1
        nxt = g["valid_from_us"].shift(-1)
        chained = g["valid_to_us"].iloc[:-1] == nxt.iloc[:-1]
        assert chained.all()


def test_mv_refresh_equals_full_recompute(spark):
    """The merged (base + delta) partials must be row-identical to a full
    recompute over all events — the decomposability invariant incremental
    refresh rests on."""
    from pyspark.sql import functions as F

    from lakehouse_variance_spark import registry
    from tests.conftest import SF_DIR

    refreshed = registry.QUERIES["mv_incremental_refresh"](spark, SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cents = F.round(F.col("value") * 100).cast("bigint")
    full = (
        ev.groupBy(
            "event_type",
            F.col("ts").cast("date").cast("timestamp").alias("event_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sum_cents"),
            F.max(cents).alias("max_cents"),
        )
    )
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, full.collect())
    )
