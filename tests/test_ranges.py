"""Bucketed range join semantics (operators/ranges.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_variance_spark.operators.ranges import range_join_buckets


def _pairs(df):
    return sorted((r.pid, r.iid) for r in df.collect())


def test_bucketed_equals_naive_inequality_join(spark):
    """The bucketed plan must produce exactly the naive BETWEEN join's
    pairs — including intervals spanning multiple buckets, zero-length
    intervals, and boundary-inclusive endpoints."""
    points = spark.createDataFrame(
        [Row(pid=i, t=v) for i, v in enumerate([0, 5, 10, 99, 100, 101, 250, 399])]
    )
    intervals = spark.createDataFrame(
        [
            Row(iid=0, s=0, e=10),      # aligned, boundary-inclusive
            Row(iid=1, s=95, e=305),    # spans 4 buckets (width 100)
            Row(iid=2, s=101, e=101),   # zero-length
            Row(iid=3, s=400, e=500),   # matches nothing
        ]
    )
    got = range_join_buckets(points, intervals, "t", "s", "e", bucket_us=100)
    naive = points.join(
        intervals, F.col("t").between(F.col("s"), F.col("e"))
    )
    assert _pairs(got) == _pairs(naive)
    # No duplicate pairs from multi-bucket intervals.
    assert got.count() == got.distinct().count()


def test_bucketed_join_empty_sides(spark):
    points = spark.createDataFrame([Row(pid=1, t=50)])
    empty = spark.createDataFrame([], schema="iid long, s long, e long")
    assert range_join_buckets(points, empty, "t", "s", "e", bucket_us=10).count() == 0
