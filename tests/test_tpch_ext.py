"""Referential contracts of the derived TPC-H extension schema.

The partsupp joins (q2/q9/q11/q16/q20) only mean something if the derived
table honors the spec's referential shape — pinned here so a future defs
edit can't silently empty them (the round-5 review caught exactly that:
a dense-residue ps_suppkey that referenced no real supplier on key-shifted
replicas)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_variance_spark.plans.tpch_ext import register_tpch_ext_views
from tests.conftest import SF_DIR


def test_partsupp_referential_integrity(spark):
    register_tpch_ext_views(spark, SF_DIR)
    ps = spark.table("partsupp")
    li = spark.table("lineitem")
    sup = spark.table("supplier")
    part = spark.table("part")

    # every lineitem (partkey, suppkey) pair exists in partsupp (spec:
    # lineitem references partsupp's primary key)
    orphan_lines = (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .join(ps, ["ps_partkey", "ps_suppkey"], "left_anti")
        .count()
    )
    assert orphan_lines == 0

    # every ps_suppkey is a real supplier, every ps_partkey a real part
    assert (
        ps.join(sup, ps.ps_suppkey == sup.s_suppkey, "left_anti").count() == 0
    )
    assert (
        ps.join(part, ps.ps_partkey == part.p_partkey, "left_anti").count()
        == 0
    )

    # (ps_partkey, ps_suppkey) is a true key and every part has >= 4
    # suppliers (the canonical quadruple survives the union)
    assert ps.count() == ps.select("ps_partkey", "ps_suppkey").distinct().count()
    min_suppliers = (
        ps.groupBy("ps_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n"))
        .collect()[0][0]
    )
    assert min_suppliers >= 4


def test_lineitem_extension_dates_are_consistent(spark):
    register_tpch_ext_views(spark, SF_DIR)
    li = spark.table("lineitem")
    # receipt strictly after ship; commit within +/-30 days of ship;
    # shipmode in the fixed domain
    assert li.filter(F.col("l_receiptdate") <= F.col("l_shipdate")).count() == 0
    bad_commit = li.filter(
        F.abs(F.datediff("l_commitdate", "l_shipdate")) > 30
    ).count()
    assert bad_commit == 0
    n_modes = li.select("l_shipmode").distinct().count()
    assert 1 <= n_modes <= 7
