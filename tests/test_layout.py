"""Physical-layout tests: partition pruning actually prunes, bucketed joins
actually skip the shuffle, and salting is semantically invisible."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from lakehouse_variance_spark.sources.layout import (
    plan_exchange_count,
    salted_join,
    scan_has_partition_filter,
    write_bucketed,
    write_partitioned,
)
from lakehouse_variance_spark.tables import load_table
from tests.conftest import SF_DIR


def test_partitioned_write_prunes(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    path = str(tmp_path / "li_part")
    write_partitioned(li, path, ["ship_month"])

    back = spark.read.parquet(path)
    pruned = back.filter(F.col("ship_month") == "1996-03")
    assert scan_has_partition_filter(pruned)
    # Pruning must not change results.
    expected = li.filter(F.col("ship_month") == "1996-03").count()
    assert pruned.count() == expected


def test_unpartitioned_scan_has_no_partition_filter(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    assert not scan_has_partition_filter(li.filter(F.col("l_quantity") > 10))


def test_bucketed_join_skips_shuffle(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    write_bucketed(li, "li_bkt", ["l_orderkey"], 4)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_bkt",
        ["l_orderkey"], 4,
    )
    try:
        a, b = spark.table("li_bkt"), spark.table("ord_bkt")
        # Disable broadcast so the join would otherwise shuffle both sides.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "l_orderkey")
            assert plan_exchange_count(joined) == 0
            plain = li.join(
                orders, li.l_orderkey == orders.o_orderkey
            )
            assert plan_exchange_count(plain) > 0
            assert joined.count() == plain.count()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    salted = salted_join(li, orders, "o_orderkey", n_salts=4)
    plain = li.join(orders, "o_orderkey")
    assert salted.count() == plain.count()
    key = [f.name for f in salted.schema] == [f.name for f in plain.schema]
    assert key
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_salt_distributes_hot_key(spark):
    # One hot key joined through the salted path lands in several sub-keys.
    hot = spark.range(1000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(1, "x")], "k int, attr string")
    n_salts = 8
    salted_fact = hot.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(n_salts))
    )
    used = salted_fact.select("_salt").distinct().count()
    assert used == n_salts
    assert salted_join(hot, dim, "k", n_salts=n_salts).count() == 1000


def test_compact_files_unpartitioned(spark, tmp_path):
    from lakehouse_variance_spark.sources.layout import compact_files

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "many_small")
    # Simulate a micro-batch-fragmented directory: many tiny files.
    docs.repartition(16).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 16

    dst = str(tmp_path / "compacted")
    # Huge target => everything folds into a single file.
    n_files = compact_files(spark, src, dst, target_bytes=1 << 30)
    assert n_files == 1
    assert spark.read.parquet(dst).count() == docs.count()


def test_compact_files_partitioned_one_file_per_value(spark, tmp_path):
    from lakehouse_variance_spark.sources.layout import compact_files

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "part_small")
    # 4 fragments per source directory.
    docs.repartition(4).write.partitionBy("source").parquet(src)
    n_sources = docs.select("source").distinct().count()
    assert len(spark.read.parquet(src).inputFiles()) > n_sources

    dst = str(tmp_path / "part_compacted")
    n_files = compact_files(spark, src, dst, partition_cols=["source"])
    assert n_files == n_sources
    back = spark.read.parquet(dst)
    assert back.count() == docs.count()
    # Compaction must preserve partition pruning.
    assert scan_has_partition_filter(back.filter(F.col("source") == "src1"))


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Joining a partitioned fact to a FILTERED dimension must inject a
    runtime partition-pruning subquery (Spark DPP): the fact scan reads
    only the partitions the dimension filter selects — at 100 TB this is
    the difference between scanning one month and scanning a decade. The
    fact itself carries no literal partition predicate — and the dim
    filter is on a NON-join column, so constraint propagation cannot copy
    it onto the fact statically; ``dynamicpruning`` in the scan proves the
    runtime filter did the pruning. (Caveat: Spark's PartitionPruning rule
    only fires for filters it deems ``isLikelySelective`` — literal
    comparisons, LIKE, IN — a bare boolean attribute does not qualify.)"""
    li = load_table(spark, SF_DIR, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    path = str(tmp_path / "li_dpp")
    write_partitioned(li, path, ["ship_month"])
    fact = spark.read.parquet(path)

    months = (
        li.select("ship_month")
        .distinct()
        .withColumn(
            "month_num", F.substring("ship_month", 6, 2).cast("int")
        )
    )
    dim_path = str(tmp_path / "months")
    months.write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("month_num") <= 3)

    # The DPP benefit heuristic consults scan-size stats; test fixtures are
    # kilobytes, so force the cost model's hand (real deployments keep
    # useStats=true — a 100 TB partitioned fact passes the benefit check on
    # its own).
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false"
    )
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio",
        "10000",
    )
    try:
        joined = fact.join(dim, "ship_month").groupBy("ship_month").count()
        optimized = joined._jdf.queryExecution().optimizedPlan().toString()
        physical = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.useStats", prev
        )
        spark.conf.unset(
            "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
        )
    assert "dynamicpruning" in (optimized + physical).lower()
    # And the result equals the statically-filtered equivalent.
    expected = (
        li.filter(F.substring("ship_month", 6, 2).cast("int") <= 3)
        .groupBy("ship_month")
        .count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    # Z-order by (l_partkey, l_suppkey): every output file should cover a
    # narrow slice of BOTH key ranges, so min-max skipping works on either
    # predicate. An unordered write leaves each file spanning ~the full
    # range of both.
    import pyarrow.parquet as pq

    from lakehouse_variance_spark.sources.layout import zorder_write

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    dst = str(tmp_path / "zordered")
    zorder_write(li, dst, "l_partkey", "l_suppkey", n_files=8)

    out = spark.read.parquet(dst)
    assert out.count() == li.count()  # lossless round-trip

    def coverage(path_dir, col):
        spans = []
        lo_all, hi_all = None, None
        for f in Path(path_dir).glob("*.parquet"):
            md = pq.read_metadata(f)
            mn = min(
                md.row_group(i).column(
                    next(
                        j
                        for j in range(md.num_columns)
                        if md.row_group(i).column(j).path_in_schema == col
                    )
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(i).column(
                    next(
                        j
                        for j in range(md.num_columns)
                        if md.row_group(i).column(j).path_in_schema == col
                    )
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append((mn, mx))
            lo_all = mn if lo_all is None else min(lo_all, mn)
            hi_all = mx if hi_all is None else max(hi_all, mx)
        full = hi_all - lo_all
        return sum((mx - mn) / full for mn, mx in spans) / len(spans)

    # average per-file share of the full key range, both dimensions:
    # clustered files cover well under the ~100% an unordered layout gives
    cov_part = coverage(dst, "l_partkey")
    cov_supp = coverage(dst, "l_suppkey")
    assert cov_part < 0.60, f"l_partkey per-file coverage {cov_part:.2f}"
    assert cov_supp < 0.60, f"l_suppkey per-file coverage {cov_supp:.2f}"


def test_runtime_bloom_filter_injected_on_selective_dim_join(spark):
    # With broadcast disabled (the 100 TB big-big case), a selective filter
    # on the dim side should inject a runtime bloom filter on the fact side
    # (spark.sql.optimizer.runtime.bloomFilter.* — Catalyst's
    # InjectRuntimeFilter), pre-filtering the shuffle.
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    part = load_table(spark, SF_DIR, "part").filter(
        F.col("p_brand") == "BRAND#13"
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB",
    )
    try:
        joined = li.join(part, part.p_partkey == li.l_partkey).groupBy(
            "p_brand"
        ).count()
        optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        )
    assert "might_contain" in optimized.lower(), optimized[:2000]
