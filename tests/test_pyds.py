"""Tests for the Spark 4 Python DataSource wrapper (sources/pyds.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_variance_spark.sources.pyds import (
    _intensity,
    register_carbon_grid,
)


def test_carbon_grid_reads_partitioned_and_deterministic(spark):
    register_carbon_grid(spark)
    df = spark.read.format("carbon_grid").option("slots", "1000").option(
        "parts", "4"
    ).load()
    assert df.columns == ["slot", "intensity"]
    assert df.count() == 1000
    # Four independent input partitions, read executor-side.
    assert df.rdd.getNumPartitions() == 4
    # Values are a pure function of the slot — re-read with a different
    # partitioning yields identical rows.
    again = (
        spark.read.format("carbon_grid")
        .option("slots", "1000")
        .option("parts", "7")
        .load()
    )
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, again.collect())
    )
    row = df.filter(F.col("slot") == 123).collect()[0]
    assert row["intensity"] == _intensity(123, 100)


def test_carbon_grid_composes_with_dataframe_ops(spark):
    register_carbon_grid(spark)
    df = spark.read.format("carbon_grid").option("slots", "7200").load()
    hourly = (
        df.groupBy(F.floor(F.col("slot") / 3600).alias("hour"))
        .agg(F.sum("intensity").alias("total"), F.count("*").alias("n"))
        .orderBy("hour")
        .collect()
    )
    assert [r["n"] for r in hourly] == [3600, 3600]
    expect0 = sum(_intensity(s, 100) for s in range(3600))
    assert hourly[0]["total"] == expect0


def test_carbon_grid_streams_in_batches_and_matches_batch_read(spark, tmp_path):
    # The streaming face must drain the bounded grid across multiple
    # micro-batches and produce EXACTLY the batch read's rows (the reader
    # is a pure function of the offset range). Python micro-batch streams
    # don't support Trigger.AvailableNow (Spark falls back to ONE batch),
    # so the test drains via processAllAvailable: once the offset stops
    # advancing at the slot cap, the stream is idle and the call returns.
    from lakehouse_variance_spark.sources.pyds import register_carbon_grid

    register_carbon_grid(spark)
    opts = {"slots": "2000", "base": "100", "batch_slots": "600"}
    stream = spark.readStream.format("carbon_grid").options(**opts).load()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    progress = [p for p in q.recentProgress if p is not None]
    assert len(progress) >= 4  # 2000 slots / 600-slot batches
    got = sorted(map(tuple, spark.read.parquet(sink).collect()))
    want = sorted(
        map(
            tuple,
            spark.read.format("carbon_grid").options(**opts).load().collect(),
        )
    )
    assert got == want and len(got) == 2000
