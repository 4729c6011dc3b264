"""Physical data layout for 100 TB scale: partitioned writes, bucketed
co-located joins, and skew salting.

The reference delegates layout to Iceberg (512 MB target files,
csv_to_iceberg.py:213; manifest-based pruning, import_tables.py:14-19). On
Spark the same levers are:

* **Partitioned parquet** — directory partitioning on a low-cardinality
  derived key (e.g. ship month). Predicates on the partition key prune whole
  directories at planning time (``PartitionFilters`` in the scan node), so a
  one-month query over a 100 TB table touches ~1/84th of the files.
* **Bucketed tables** — ``bucketBy(k)`` pre-shuffles rows by join key at
  write time; two tables bucketed the same way join with NO exchange on
  either side (the scan itself satisfies the required hash distribution).
  This converts every repeated big-big join on the same key from a 2×100 TB
  shuffle into a map-side zip of co-located buckets.
* **Salting** — for skewed join keys, spread each hot key over N synthetic
  sub-keys: the fact side gets a deterministic salt, the (smaller) build side
  is replicated N×. The join then distributes a hot key's rows across N
  tasks instead of one straggler. AQE's skew-join split handles moderate
  skew automatically; salting is the explicit fallback for pathological keys.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet write. Partition columns should be
    low-cardinality derived keys (date buckets, tenant ids) — one directory
    (and at least one file) per value, so a high-cardinality key would
    produce a small-files explosion."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and bucket-sorted) managed table. Reading two tables
    bucketed by the same key with the same count joins shuffle-free; the
    sort makes the merge join spill-free within each bucket."""
    if mode == "overwrite":
        # An orphaned warehouse directory (table location left behind by a
        # crashed writer, no catalog entry) makes saveAsTable fail with
        # LOCATION_ALREADY_EXISTS; drop both the entry and the location.
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            # Managed-table locations: warehouse/<tbl> for default-schema
            # names, warehouse/<db>.db/<tbl> for qualified ones — the
            # cleanup must target the real location or the
            # LOCATION_ALREADY_EXISTS failure it exists to prevent recurs.
            parts = table.lower().split(".")
            if len(parts) == 2:
                loc = Path(warehouse[5:]) / f"{parts[0]}.db" / parts[1]
            else:
                loc = Path(warehouse[5:]) / parts[-1]
            if loc.exists():
                shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 << 20,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-file compaction (the OPTIMIZE/rewrite_data_files step of a
    lakehouse maintenance loop; the reference's Iceberg tables target 512 MB
    files, csv_to_iceberg.py:213).

    Unpartitioned: sizes the output at ceil(input_bytes / target_bytes)
    files via a round-robin repartition and returns that file count.
    Partitioned: clusters each partition value into a single task
    (hash repartition on the partition keys) so every value compacts to one
    file, preserving directory pruning.

    Streaming-ingest directories accumulate one file per micro-batch per
    key — compaction is what keeps scan task counts (and Iceberg manifest
    sizes) bounded at 100 TB.
    """
    df = spark.read.parquet(src_path)
    if partition_cols:
        out = df.repartition(*[F.col(c) for c in partition_cols])
        out.write.mode("overwrite").partitionBy(*partition_cols).parquet(dst_path)
    else:
        total = 0
        for uri in df.inputFiles():
            p = Path(uri[5:] if uri.startswith("file:") else uri)
            if p.exists():
                total += p.stat().st_size
        n = max(1, -(-total // target_bytes))
        df.repartition(n).write.mode("overwrite").parquet(dst_path)
    written = spark.read.parquet(dst_path)
    return len(written.inputFiles())


def scan_has_partition_filter(df: DataFrame) -> bool:
    """True when the physical scan carries a non-empty PartitionFilters list
    — i.e. the predicate prunes directories at planning time instead of
    filtering rows after a full scan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            inner = line.split("PartitionFilters: [", 1)[-1].split("]", 1)[0]
            if inner.strip():
                return True
    return False


def plan_exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (bucketed joins
    should show zero on the bucketed sides)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )


def _spread_bits16(x: Column) -> Column:
    """Spread the low 16 bits of ``x`` so bit i lands at position 2i —
    the classic mask-shift interleave ladder, as pure JVM-side bitwise
    column ops (no UDF)."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_value(
    a: Column, a_min: int, a_max: int, b: Column, b_min: int, b_max: int
) -> Column:
    """Z-order (Morton) key over two integer columns: each value is
    min/max-quantized to 16 bits, bit-spread, and interleaved. Rows close
    in EITHER dimension get close z-values, so sorting by z clusters both
    columns at once."""
    qa = _quantize16(a, a_min, a_max)
    qb = _quantize16(b, b_min, b_max)
    return _spread_bits16(qa).bitwiseOR(F.shiftleft(_spread_bits16(qb), 1))


def _quantize16(c: Column, mn: int, mx: int) -> Column:
    span = max(mx - mn, 1)
    q = ((c.cast("long") - F.lit(mn)) * F.lit(65535)) / F.lit(span)
    return F.least(F.greatest(q.cast("long"), F.lit(0)), F.lit(65535))


def zorder_write(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 8
) -> None:
    """Z-order-clustered parquet write (the OPTIMIZE ZORDER BY of
    Delta/Iceberg): range-partition + sort the data by the Morton key of
    (col_a, col_b), one file per range, then drop the key.

    Why it matters at 100 TB: directory partitioning prunes on ONE key;
    z-ordering makes parquet row-group/file min-max stats selective on TWO
    (or more) keys simultaneously, so point/range predicates on either
    column skip most files without a second physical copy. The min/max
    bounds come from one tiny aggregate; the write is one range exchange.
    """
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    z = zorder_value(
        F.col(col_a), int(lo_a), int(hi_a), F.col(col_b), int(lo_b), int(hi_b)
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Inner equi-join with the fact side salted over ``n_salts`` sub-keys.

    The salt is deterministic — a hash of ``salt_source`` (default: every
    fact column), never ``rand()`` — so retried tasks re-derive identical
    salts and results stay reproducible. The build side is replicated
    ``n_salts``× via an explode (a narrow map; for a broadcast-sized build
    side the replication is free because broadcast already copies it
    everywhere — salting only pays off for shuffle joins of skewed big
    tables)."""
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in fact.columns])
    elif isinstance(salt_source, str):
        salt_source = F.xxhash64(salt_source)
    salted_fact = fact.withColumn("_salt", F.pmod(salt_source, F.lit(n_salts)))
    replicated = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(replicated, [key, "_salt"]).drop("_salt")


@register(
    "skew_salted_join_agg",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension join executed through the salting path, then
    aggregated — the explicit skew-mitigation plan for a pathological hot
    key. Salting must be semantically invisible: the oracle is the plain
    join, and the salted plan has to produce byte-identical aggregates."""
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(li, orders, "o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )
