"""Carbon-intensity time-series processing, Spark-first.

Re-implements the data side of the reference's low-carbon scheduling study
(``low-carbon-scheduling/src/carbon.py``):

* CSV load with timestamp parse + column normalization (``carbon.py:4-46``)
* upsample-by-repeat to a finer slot grid (``carbon.py:49-68``) — here an
  ``explode(sequence(...))`` instead of ``np.repeat``
* prefix sums so a window's carbon is two lookups (``carbon.py:70-75``) —
  here a running-sum window function instead of ``np.cumsum``
* ``window_carbon(start, duration)`` (``carbon.py:78-99``) — evaluated for a
  whole DataFrame of candidate windows at once via two equi-joins against the
  prefix table, instead of one Python call per window.

The DataFrame formulation is what survives scale: a year of 1-second slots is
31M rows (a single narrow shuffle), and scoring millions of candidate windows
is two broadcast joins, not a Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

DEFAULT_POWER_KW = 0.150  # reference carbon.py:86 default


def load_carbon_csv(
    spark: SparkSession, path: str, use_lifecycle: bool = False
) -> DataFrame:
    """Read an Electricity-Maps-style carbon CSV → (ts, ci) rows.

    Column semantics of reference ``carbon.py:4-46``: ``Datetime (UTC)``
    timestamp plus direct / lifecycle gCO₂eq/kWh intensity columns; the
    chosen intensity column becomes ``ci``.
    """
    raw = spark.read.option("header", True).csv(path)
    col = (
        "Carbon intensity gCO₂eq/kWh (Life cycle)"
        if use_lifecycle
        else "Carbon intensity gCO₂eq/kWh (direct)"
    )
    return raw.select(
        F.to_timestamp(F.col("Datetime (UTC)")).alias("ts"),
        F.col(col).cast("double").alias("ci"),
    )


def to_slots(series: DataFrame, origin: str, slot_sec: int, n_slots: int) -> DataFrame:
    """Assign each (ts, ci) reading to a slot index on a dense grid.

    Missing slots are filled with ci=0 so prefix arithmetic stays exact —
    the reference's series are dense by construction; ours must be made so.
    ``spark.range`` generates the grid distributed (no driver materialization).
    """
    spark = series.sparkSession
    grid = spark.range(n_slots).withColumnRenamed("id", "slot")
    origin_ts = F.unix_timestamp(F.lit(origin).cast("date").cast("timestamp"))
    bucketed = series.groupBy(
        F.floor((F.unix_timestamp("ts") - origin_ts) / slot_sec).alias("slot")
    ).agg(F.avg("ci").alias("ci"))
    return grid.join(bucketed, "slot", "left").select(
        "slot", F.coalesce("ci", F.lit(0.0)).alias("ci")
    )


def upsample(slots: DataFrame, factor: int) -> DataFrame:
    """Repeat each slot's ci ``factor`` times onto a finer grid
    (reference ``carbon.py:49-68`` ``np.repeat``). A narrow map — the explode
    multiplies rows without any shuffle.
    """
    return slots.select(
        "slot",
        "ci",
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_offset"),
    ).select((F.col("slot") * factor + F.col("_offset")).alias("slot"), "ci")


# Small enough that even the 43k-slot test series spans several buckets
# (real parallelism at every scale); a year of 1-second slots still keeps
# the offsets window tiny (31M/16384 ≈ 1.9k bucket rows).
PREFIX_BUCKET_WIDTH = 16384


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    bucket_width: int = PREFIX_BUCKET_WIDTH,
    tie_col: str | None = None,
) -> DataFrame:
    """Running sum over a dense integer ``order_col`` WITHOUT a global
    single-partition window — the two-pass scan algorithm:

    1. Bucket rows by ``order_col div bucket_width``; compute the running
       sum WITHIN each bucket (window partitioned by bucket → parallel).
    2. Per-bucket totals (= max of the within-sum, reusing the same
       partitioning) get an exclusive running sum — the only ordered global
       window, over |rows|/bucket_width rows (a year of 1-second slots →
       31M/65536 ≈ 480 rows), then broadcast back as each bucket's offset.

    A naive ``Window.orderBy(order_col)`` moves ALL rows to one task
    (Spark's WindowExec warns exactly this); here the big data only ever
    sees a partitioned window plus a broadcast join. Exact for integer
    values; for doubles the bucket-order re-association can differ from a
    sequential scan by float noise.

    When ``order_col`` is not unique, pass ``tie_col`` (a unique column)
    so the within-bucket scan order — and hence every row's running sum —
    is total and engine/partitioning-independent; the caller's oracle
    must ORDER BY the same (order_col, tie_col) pair.
    """
    bucket = F.floor(F.col(order_col) / bucket_width)
    order_exprs = [order_col] + ([tie_col] if tie_col else [])
    w_in = (
        W.partitionBy("_b")
        .orderBy(*order_exprs)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    stage1 = df.withColumn("_b", bucket).withColumn(
        "_within", F.sum(value_col).over(w_in)
    )
    totals = stage1.groupBy("_b").agg(F.max("_within").alias("_tot"))
    w_off = W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        stage1.join(F.broadcast(offsets), "_b")
        .withColumn(out_col, F.col("_within") + F.col("_off"))
        .drop("_b", "_within", "_off")
    )


def with_prefix(slots: DataFrame) -> DataFrame:
    """Running sum so sum(ci[s:e]) = prefix_incl[e-1] - prefix_incl[s-1]
    (reference ``carbon.py:70-75`` ``make_ci_prefix``), via the scalable
    two-pass ``distributed_prefix_sum`` — no global single-partition window.
    """
    return distributed_prefix_sum(slots, "slot", "ci", "prefix_incl")


def window_carbon_batch(
    prefix: DataFrame,
    candidates: DataFrame,
    *,
    slot_sec: float,
    power_kw: float = DEFAULT_POWER_KW,
    out_col: str = "carbon_g",
) -> DataFrame:
    """Carbon for every candidate window (start_slot, duration_slots) at once.

    Semantics of reference ``carbon.py:78-99``: windows clamp to the series
    end, gCO₂ = Σci · power_kw · dt_hours. Two equi-joins against the
    (broadcastable) prefix table replace the per-window Python calls — the
    scale path for a greedy scheduler evaluating millions of candidates.
    """
    n = prefix.count()
    dt_hours = slot_sec / 3600.0
    p_end = F.broadcast(prefix.select(F.col("slot").alias("_e"), F.col("prefix_incl").alias("_pe")))
    p_start = F.broadcast(prefix.select(F.col("slot").alias("_s"), F.col("prefix_incl").alias("_ps")))
    end_idx = F.least(F.col("start_slot") + F.col("duration_slots"), F.lit(n)) - 1
    start_idx = F.least(F.col("start_slot"), F.lit(n)) - 1
    return (
        candidates.withColumn("_e", end_idx)
        .withColumn("_s", start_idx)
        .join(p_end, "_e", "left")
        .join(p_start, "_s", "left")
        .withColumn(
            out_col,
            F.greatest(
                (F.coalesce("_pe", F.lit(0.0)) - F.coalesce("_ps", F.lit(0.0)))
                * power_kw
                * dt_hours,
                F.lit(0.0),
            ),
        )
        .drop("_e", "_s", "_pe", "_ps")
    )
