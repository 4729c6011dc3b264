"""Skew-mitigation probe: MEASURE the salted join and AQE skew-join
against the naive shuffle join on a deliberately hot-keyed fact.

SCALE.md's skew story ("salting for hot keys, AQE skew-join for the
residual") was design-only until round 10 — every other scaling claim
has a measured row, so this probe closes that gap.

Dataset (.scratch_skew/, gitignored): the sf0.1 lineitem replicated
``REPLICAS``x with key-shifted o_orderkey (the scale_probe recipe), then
``HOT_FRACTION`` of all rows rewritten to ONE hot key — a single join
key owning ~30% of a ~6M-row fact, the pathological shape a 1000-executor
shuffle join dies on (one reducer gets 30% of the table). The build side
is the distinct key set with a derived priority label, so referential
integrity holds and all three plans must produce IDENTICAL aggregates.

Variants (same query: join fact->dim on the skewed key, then a
low-cardinality groupBy whose partial aggregation is skew-immune):

* naive  — shuffle hash/sort-merge join, AQE off, broadcast off: the
           hot key lands on one reducer.
* salted — ``sources/layout.py:salted_join`` (deterministic xxhash64
           salt over ``N_SALTS`` sub-keys, build side exploded): the hot
           key spreads over ``N_SALTS`` reducers. Same AQE/broadcast-off
           session, so the comparison isolates the salting itself.
* aqe    — AQE skew-join enabled with thresholds scaled to this data
           size (defaults only trigger at 256MB partitions): Spark's
           runtime split of the oversized partition.

Usage: python scripts/skew_probe.py [--replicas 10] [--hot 0.3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F

from lakehouse_variance_spark.session import build_session
from lakehouse_variance_spark.sources.layout import salted_join

SRC = "/root/testdata/sf0.1"
DST = os.path.join(HERE, ".scratch_skew")
HOT_KEY = 424_242_424
N_KEYS = 100_000  # dimension cardinality: realistically small vs the fact
N_SALTS = 8


def build_dataset(spark, n_replicas: int, hot_fraction: float) -> None:
    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    reps = []
    for i in range(n_replicas):
        reps.append(li.withColumn("_rep", F.lit(i)))
    fact = reps[0]
    for r in reps[1:]:
        fact = fact.unionByName(r)
    # Deterministic key assignment and hot-key rewrite (never rand():
    # retried tasks must re-derive identical rows). Keys hash into a
    # N_KEYS-sized dimension space — the fact:dim ratio that makes
    # salting's build-side replication affordable (salting a join whose
    # build side rivals the fact is the anti-pattern; the first version
    # of this probe measured it at 12x SLOWER than naive).
    h = F.xxhash64("l_orderkey", "l_extendedprice", "l_discount", "_rep")
    fact = (
        fact.withColumn(
            "o_orderkey",
            F.when(
                F.pmod(h, F.lit(1000)) < int(hot_fraction * 1000),
                F.lit(HOT_KEY),
            ).otherwise(F.pmod(F.xxhash64(h), F.lit(N_KEYS))),
        )
        .drop("l_orderkey", "_rep")
    )
    fact.write.mode("overwrite").parquet(f"{DST}/fact.parquet")
    dim = (
        spark.read.parquet(f"{DST}/fact.parquet")
        .select("o_orderkey")
        .distinct()
        .withColumn(
            "o_orderpriority",
            F.concat(F.lit("P"), F.pmod(F.col("o_orderkey"), F.lit(5))),
        )
    )
    dim.write.mode("overwrite").parquet(f"{DST}/dim.parquet")


def agg(joined):
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        # exact integer cents: the three plans must match to the byte
        F.sum(
            (F.round(F.col("l_extendedprice") * 100).cast("long"))
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("revenue_e4"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--hot", type=float, default=0.3)
    args = ap.parse_args()

    spark = build_session(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sentinel = os.path.join(DST, "_BUILD_COMPLETE")
    if not os.path.exists(sentinel):
        t0 = time.perf_counter()
        build_dataset(spark, args.replicas, args.hot)
        with open(sentinel, "w", encoding="utf-8") as f:
            f.write("ok\n")
        print(f"# built skew dataset in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    fact = spark.read.parquet(f"{DST}/fact.parquet")
    dim = spark.read.parquet(f"{DST}/dim.parquet")
    n = fact.count()
    hot = fact.filter(F.col("o_orderkey") == HOT_KEY).count()
    print(f"# fact rows: {n}, hot-key rows: {hot} ({hot/n:.1%})",
          file=sys.stderr)

    def naive():
        return agg(fact.join(dim, "o_orderkey"))

    def salted():
        return agg(salted_join(fact, dim, "o_orderkey", n_salts=N_SALTS))

    base_conf = {
        # isolate the shuffle-join shape: no broadcast escape hatch, and
        # AQE off for naive/salted so coalescing can't blur the contrast
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }
    aqe_conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # defaults (factor 5, 256MB) never fire at probe size; scale the
        # byte threshold down so the hot partition is recognized
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        # the aggregation above the join imposes a distribution requirement
        # that makes AQE skip the skew split unless forced (it inserts the
        # extra shuffle instead of silently under-splitting)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }

    def run(tag, thunk, conf):
        old = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            rows = sorted(map(tuple, thunk().collect()))  # warm + verify
            # Time with collect(), NOT count(): count() over the grouped
            # agg lets Catalyst prune the revenue columns out of the join,
            # which shrinks the hot partition's shuffle bytes (12M
            # identical keys compress to under the skew threshold) and
            # silently de-skews the very workload being measured — the
            # same pruning trap SCALE.md documents for map-only probes.
            # The agg output is |priorities| rows, so collect is free.
            t0 = time.perf_counter()
            thunk().collect()
            dt = time.perf_counter() - t0
        finally:
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)
                else:
                    # No retrievable prior value: unset, don't skip —
                    # skipping left probe-set AQE/broadcast settings
                    # applied to the session after the variant (ADVICE
                    # r10).
                    spark.conf.unset(k)
        print(f"{tag:8s} {dt:8.3f}s")
        return rows, dt

    r1, t1 = run("naive", naive, base_conf)
    r2, t2 = run("salted", salted, base_conf)
    r3, t3 = run("aqe", naive, aqe_conf)
    assert r1 == r2 == r3, "skew mitigation changed the results!"
    print(f"# identical aggregates across all three plans "
          f"({len(r1)} groups); salted speedup {t1/t2:.2f}x, "
          f"AQE speedup {t1/t3:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
