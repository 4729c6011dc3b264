"""Host-speed calibration micro-probe for bench artifacts.

Round 8's BENCH numbers drifted ~25-40% round-over-round with ZERO code
change (hypervisor throttling, SCALE.md drift log) — a committed bench
artifact without a speed reference cannot be compared across rounds.
Every BENCH/battery artifact therefore embeds two fixed-workload probe
timings:

* ``calib_1t_s``  — a constant xxhash64+sum pipeline over a FIXED row
  count in ONE partition (single-core JVM throughput: codegen'd
  whole-stage loop, no shuffle, no Python);
* ``calib_32t_s`` — the same per-core workload fanned across 32
  partitions (aggregate throughput; exposes throttling that only shows
  under full parallel load, which is what the suites generate).

Cross-round normalization: ``value / calib_*_s`` ratios are
host-speed-free, so a future round can separate a real plan regression
from a slow host using committed JSON alone.

The workload is deterministic (``spark.range`` + ``xxhash64``) and a
warm-up run precedes each timed probe so Janino/JIT compilation of the
probe's own generated class is excluded — the probe measures the host,
not first-execution costs.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Fixed per-core work: large enough that scheduler overhead (~ms) is
# noise (each timed probe targets ~0.5-1.5 s unthrottled), small enough
# that the whole calibration stays a few seconds. NEVER change these
# without renaming the emitted keys — the constants ARE the unit of
# measure. (Per-core throughput differs between the two probes — the
# C2-compiled parallel loop runs hotter — which is fine: each key is
# only ever compared against ITSELF across rounds.)
_ROWS = {1: 400_000_000, 32: 24_000_000_000}
_CORES = 32


def _probe(spark: SparkSession, partitions: int) -> float:
    def build(offset: int):
        return (
            spark.range(offset, offset + _ROWS[partitions], 1, partitions)
            .select(F.xxhash64("id").alias("h"))
            # bit_xor: consumes every hash like sum would, but cannot
            # overflow under ANSI mode (sum(xxhash64) throws).
            .agg(F.expr("bit_xor(h)"))
        )

    # Warm-up compiles the plan shape (Janino + JIT); the timed run MUST
    # be a fresh lineage — re-collecting the same DataFrame reuses the
    # map stage's shuffle files and times only the 1-task reduce.
    build(0).collect()
    timed = build(1)
    start = time.perf_counter()
    timed.collect()
    return round(time.perf_counter() - start, 4)


def calibration_probe(spark: SparkSession) -> dict[str, float]:
    """Return ``{"calib_1t_s": ..., "calib_32t_s": ...}`` for embedding
    in bench artifacts (keys per VERDICT r8 item 1)."""
    return {
        "calib_1t_s": _probe(spark, 1),
        "calib_32t_s": _probe(spark, _CORES),
    }
