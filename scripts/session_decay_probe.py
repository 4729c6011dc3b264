"""Diagnose in-session slowdown of allocation-heavy queries (r11 s3).

Isolated bench runs put ts_lttb_downsample at ~1.4 s; the same query after
~90 headline queries in one session reads 4-9 s. This probe times target
queries in a fresh session, loads the session with the first N headline
queries, then re-times the targets — printing JVM GC totals around each
block so GC pressure vs other session state can be told apart.

Usage: python scripts/session_decay_probe.py [n_load] [target,target,...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_variance_spark import registry
from lakehouse_variance_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGETS = ["ts_lttb_downsample", "vocab_cms_topk", "media_frame_sample"]


def gc_totals(spark):
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    out = {}
    for i in range(beans.size()):
        b = beans.get(i)
        out[b.getName()] = (b.getCollectionCount(), b.getCollectionTime())
    return out


def heap_used(spark):
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    return (rt.totalMemory() - rt.freeMemory()) / 1e9


def time_block(spark, names, reps, label):
    print(f"--- {label} (heap {heap_used(spark):.1f} GB) gc={gc_totals(spark)}",
          file=sys.stderr)
    for name in names:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, SF_DIR).count()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"# {label} {name}: {ts}", file=sys.stderr)
    print(f"--- {label} end (heap {heap_used(spark):.1f} GB) gc={gc_totals(spark)}",
          file=sys.stderr)


def main():
    n_load = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    targets = sys.argv[2].split(",") if len(sys.argv) > 2 else TARGETS
    registry.load_all()
    from bench import HEADLINE_QUERIES

    spark = build_session(app_name="lvs-decay-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up of the targets only (codegen/JIT), then the fresh-session block
    for name in targets:
        registry.QUERIES[name](spark, SF_DIR).count()
    time_block(spark, targets, 5, "fresh")

    load = [q for q in HEADLINE_QUERIES if q not in targets][:n_load]
    t0 = time.perf_counter()
    for name in load:
        registry.QUERIES[name](spark, SF_DIR).count()
    print(f"# loaded {len(load)} queries in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    time_block(spark, targets, 5, "loaded")


if __name__ == "__main__":
    main()
