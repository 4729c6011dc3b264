"""Oracle-checked scheduling queries over the synthetic tables.

The `events` table stands in for the reference's inputs: 5-minute averages of
`value` form the carbon-intensity series (the reference's Electricity-Maps
CSVs, ``low-carbon-scheduling/src/config.py:6-9``), and per-user mean values
form the (pred, actual) runtime workload (the reference's ``values.csv``,
``workload.py:29-52``). 30 days of 5-minute slots = 8,640 readings, upsampled
×5 to 43,200 one-minute slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.scheduling import carbon, schedulers
from lakehouse_variance_spark.tables import load_table

ORIGIN = "2024-01-01"
RAW_SLOT_SEC = 300
UPSAMPLE = 5
SLOT_SEC = RAW_SLOT_SEC // UPSAMPLE  # 60 s slots after upsampling
N_RAW_SLOTS = 30 * 24 * 12  # 30 days of 5-minute readings
N_SLOTS = N_RAW_SLOTS * UPSAMPLE

# Shared oracle CTE bodies (DuckDB dialect). The CI average is computed in
# exact integer ten-thousandths (value has exactly 2 decimals → cent sums are
# exact integers; the e4 quotient is a rational with denominator n, so it is
# either an exact representable tie — both engines round away from zero — or
# ≥ 1/(2n) from the boundary, never within a double ulp of it). The prefix is
# then an exact BIGINT running sum. A plain round(avg(value), 4) diverged
# between Spark and DuckDB at sf0.1: the engines disagree on the same double
# at .00005 boundaries (decimal-string HALF_UP vs multiply-and-floor).
_PREFIX_CTES = f"""
    series AS (
        SELECT CAST(floor((epoch(ts) - epoch(TIMESTAMP '{ORIGIN}')) / {RAW_SLOT_SEC})
                    AS BIGINT) AS slot5,
               CAST(round(sum(CAST(round(value * 100) AS BIGINT)) * 100.0
                          / count(*)) AS BIGINT) AS ci_e4
        FROM events GROUP BY 1
    ),
    grid AS (SELECT g.i AS slot5 FROM generate_series(0, {N_RAW_SLOTS - 1}) g(i)),
    dense AS (
        SELECT grid.slot5, coalesce(series.ci_e4, 0) AS ci_e4
        FROM grid LEFT JOIN series USING (slot5)
    ),
    fine AS (
        SELECT slot5 * {UPSAMPLE} + u.i AS slot, ci_e4
        FROM dense, generate_series(0, {UPSAMPLE - 1}) u(i)
    ),
    prefix AS (
        SELECT slot, ci_e4,
               sum(ci_e4) OVER (ORDER BY slot
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prefix_e4
        FROM fine
    )
"""

_WORKLOAD_CTES = """
    runtimes AS (
        SELECT user_id AS query_id,
               coalesce(10 * avg(CASE WHEN event_id % 2 = 0 THEN value END), 0.0)
                   AS pred_s,
               coalesce(10 * avg(CASE WHEN event_id % 2 = 1 THEN value END), 0.0)
                   AS actual_s
        FROM events GROUP BY user_id
    ),
    workload AS (
        SELECT query_id,
               greatest(1, CAST(ceil(pred_s / 60.0) AS BIGINT))   AS pred_slots,
               greatest(1, CAST(ceil(actual_s / 60.0) AS BIGINT)) AS actual_slots
        FROM runtimes
    )
"""


def carbon_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(slot, ci, prefix_incl) — dense 1-minute CI series derived from events."""
    ev = load_table(spark, sf_dir, "events")
    series = ev.select("ts", F.col("value").alias("ci"))
    dense = carbon.to_slots(series, ORIGIN, RAW_SLOT_SEC, N_RAW_SLOTS)
    return carbon.with_prefix(carbon.upsample(dense, UPSAMPLE))


def event_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, pred_slots, actual_slots) — per-user workload from events,
    quantized with the reference's max(1, ceil(runtime/slot)) rule."""
    ev = load_table(spark, sf_dir, "events")
    runtimes = ev.groupBy(F.col("user_id").alias("query_id")).agg(
        F.coalesce(
            10 * F.avg(F.when(F.col("event_id") % 2 == 0, F.col("value"))), F.lit(0.0)
        ).alias("pred_s"),
        F.coalesce(
            10 * F.avg(F.when(F.col("event_id") % 2 == 1, F.col("value"))), F.lit(0.0)
        ).alias("actual_s"),
    )
    return runtimes.select(
        "query_id",
        schedulers.runtime_to_slots(F.col("pred_s"), 60.0).alias("pred_slots"),
        schedulers.runtime_to_slots(F.col("actual_s"), 60.0).alias("actual_slots"),
    )


@register(
    "carbon_upsample_prefix",
    oracle=f"""
    WITH {_PREFIX_CTES}
    SELECT slot, ci_e4 / 10000.0 AS ci, prefix_e4 / 10000.0 AS prefix_ci
    FROM prefix
    """,
)
def carbon_upsample_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CI series pipeline (reference ``carbon.py:4-75``): bucket readings to a
    dense 5-minute grid, upsample-by-repeat to 1-minute slots, prefix-sum via
    the two-pass ``carbon.distributed_prefix_sum`` (bucketed windows + a
    broadcast offset join — never a global single-partition window).
    Arithmetic is exact-integer e4 throughout (see _PREFIX_CTES comment) so
    the result is engine-, partition-count-, and summation-order-stable —
    which is also what licenses the two-pass reordering."""
    ev = load_table(spark, sf_dir, "events")
    spark_session = ev.sparkSession
    origin_ts = F.unix_timestamp(F.lit(ORIGIN).cast("date").cast("timestamp"))
    cents = F.round(F.col("value") * 100).cast("long")
    bucketed = ev.groupBy(
        F.floor((F.unix_timestamp("ts") - origin_ts) / RAW_SLOT_SEC).alias("slot5")
    ).agg(
        F.round(F.sum(cents) * 100.0 / F.count("*")).cast("long").alias("ci_e4")
    )
    grid = spark_session.range(N_RAW_SLOTS).withColumnRenamed("id", "slot5")
    dense = grid.join(bucketed, "slot5", "left").select(
        "slot5", F.coalesce("ci_e4", F.lit(0)).alias("ci_e4")
    )
    fine = dense.select(
        "slot5",
        "ci_e4",
        F.explode(F.sequence(F.lit(0), F.lit(UPSAMPLE - 1))).alias("_o"),
    ).select((F.col("slot5") * UPSAMPLE + F.col("_o")).alias("slot"), "ci_e4")
    prefixed = carbon.distributed_prefix_sum(fine, "slot", "ci_e4", "prefix_e4")
    return prefixed.select(
        "slot",
        (F.col("ci_e4") / 10000.0).alias("ci"),
        (F.col("prefix_e4") / 10000.0).alias("prefix_ci"),
    )


@register(
    "workload_quantize_orderings",
    oracle=f"""
    WITH {_WORKLOAD_CTES}
    SELECT query_id, pred_slots, actual_slots,
           row_number() OVER (ORDER BY query_id)        AS ord_arrival,
           row_number() OVER (ORDER BY pred_slots DESC, query_id)
               AS ord_pred_longest,
           row_number() OVER (ORDER BY pred_slots ASC, query_id)
               AS ord_pred_shortest,
           row_number() OVER (ORDER BY abs(actual_slots - pred_slots) DESC,
                              query_id) AS ord_high_error
    FROM workload
    """,
)
def workload_quantize_orderings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime→slot quantization (reference ``workload.py:13-18``) plus the
    ordering policies (``workload.py:65-117``) materialized as rank columns
    (query_id tie-break for determinism)."""
    from pyspark.sql import Window as W

    w = event_workload(spark, sf_dir)
    return w.select(
        "query_id",
        "pred_slots",
        "actual_slots",
        F.row_number().over(W.orderBy("query_id")).alias("ord_arrival"),
        F.row_number()
        .over(W.orderBy(*schedulers.order_keys("pred_longest_first")))
        .alias("ord_pred_longest"),
        F.row_number()
        .over(W.orderBy(*schedulers.order_keys("pred_shortest_first")))
        .alias("ord_pred_shortest"),
        F.row_number()
        .over(W.orderBy(*schedulers.order_keys("high_error_first")))
        .alias("ord_high_error"),
    )


# Decimal variant of the CI series for the carbon-cost query: the event
# values are 2-decimal quantities, so sums of them frequently land exactly on
# decimal rounding half-boundaries where double rounding is engine-dependent.
# DECIMAL arithmetic keeps every intermediate exact; the only double appears
# at the very end via an exact decimal→double cast (deterministic nearest).
_PREFIX_CTES_DECIMAL = f"""
    series AS (
        SELECT CAST(floor((epoch(ts) - epoch(TIMESTAMP '{ORIGIN}')) / {RAW_SLOT_SEC})
                    AS BIGINT) AS slot5,
               CAST(sum(CAST(value AS DECIMAL(12, 2))) AS DECIMAL(14, 2)) AS ci
        FROM events GROUP BY 1
    ),
    grid AS (SELECT g.i AS slot5 FROM generate_series(0, {N_RAW_SLOTS - 1}) g(i)),
    dense AS (
        SELECT grid.slot5, coalesce(series.ci, CAST(0 AS DECIMAL(14, 2))) AS ci
        FROM grid LEFT JOIN series USING (slot5)
    ),
    fine AS (
        SELECT slot5 * {UPSAMPLE} + u.i AS slot, ci
        FROM dense, generate_series(0, {UPSAMPLE - 1}) u(i)
    )
"""


@register(
    "fifo_schedule_carbon",
    oracle=f"""
    WITH {_PREFIX_CTES_DECIMAL},
    {_WORKLOAD_CTES},
    fifo AS (
        SELECT query_id, actual_slots,
               CAST(coalesce(sum(actual_slots) OVER (ORDER BY query_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS start_slot
        FROM workload
    ),
    occupied AS (
        SELECT query_id, start_slot, actual_slots,
               unnest(generate_series(start_slot,
                      least(start_slot + actual_slots, {N_SLOTS}) - 1)) AS slot
        FROM fifo
    )
    SELECT o.query_id, o.start_slot, o.actual_slots,
           CAST(CAST(sum(p.ci) AS DECIMAL(18, 2)) * CAST(0.0025 AS DECIMAL(5, 4))
                AS DOUBLE) AS carbon_g
    FROM occupied o JOIN fine p USING (slot)
    GROUP BY o.query_id, o.start_slot, o.actual_slots
    """,
)
def fifo_schedule_carbon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO schedule (reference ``scheduler.py:67-94``) scored with
    ``window_carbon`` semantics (``carbon.py:78-99``): planned starts are a
    running-sum window; each query's occupied slot interval is exploded to
    rows and equi-joined with the CI series — linear in Σ durations, no
    per-window driver calls. (The O(1)-per-window prefix-difference variant is
    ``carbon.window_carbon_batch``.) CI here is the per-bucket *total* event
    value in DECIMAL, and power·dt (0.150 kW · 1/60 h) is the exact decimal
    0.0025, so the whole computation is exact — doubles appear only in the
    final cast."""
    import decimal

    ev = load_table(spark, sf_dir, "events")
    origin_ts = F.unix_timestamp(F.lit(ORIGIN).cast("date").cast("timestamp"))
    bucketed = ev.groupBy(
        F.floor((F.unix_timestamp("ts") - origin_ts) / RAW_SLOT_SEC).alias("slot5")
    ).agg(
        F.sum(F.col("value").cast("decimal(12,2)"))
        .cast("decimal(14,2)")
        .alias("ci")
    )
    grid = spark.range(N_RAW_SLOTS).withColumnRenamed("id", "slot5")
    dense = grid.join(bucketed, "slot5", "left").select(
        "slot5",
        F.coalesce("ci", F.lit(decimal.Decimal("0.00")).cast("decimal(14,2)")).alias(
            "ci"
        ),
    )
    fine = carbon.upsample(dense.withColumnRenamed("slot5", "slot"), UPSAMPLE)

    fifo = schedulers.fifo_schedule(event_workload(spark, sf_dir))
    end = F.least(F.col("start_slot") + F.col("actual_slots"), F.lit(N_SLOTS))
    # Guard queries whose FIFO start lands past the horizon: sequence()
    # counts DOWN when start > stop (emitting phantom slots) where the
    # oracle's generate_series is empty — the sequence(1,0) trap from the
    # verify notes, on the slot axis.
    slot_range = F.when(
        F.col("start_slot") < end,
        F.sequence(F.col("start_slot"), end - 1),
    ).otherwise(F.array().cast("array<bigint>"))
    occupied = fifo.select(
        "query_id",
        "start_slot",
        "actual_slots",
        F.explode(slot_range).alias("slot"),
    )
    power_dt = F.lit(decimal.Decimal("0.0025"))  # 0.150 kW * (60s / 3600s/h)
    return (
        occupied.join(fine, "slot")
        .groupBy("query_id", "start_slot", "actual_slots")
        .agg(
            (F.sum("ci").cast("decimal(18,2)") * power_dt)
            .cast("double")
            .alias("carbon_g")
        )
    )


def _greedy_schedule_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy low-carbon defer scheduler (reference ``scheduler.py:96-194``)
    over the first 100 queries, plus realised sequential carbon
    (``scheduler.py:14-49``) attached as a constant column. The search loop is
    inherently sequential (each placement constrains the next), so it runs on
    the driver over the collected 43k-slot CI array; all data prep is
    DataFrames. The production operator."""
    import numpy as np

    profile = carbon_profile(spark, sf_dir)
    ci = np.array(
        [r["ci"] for r in profile.select("slot", "ci").orderBy("slot").collect()]
    )
    workload = event_workload(spark, sf_dir).filter(F.col("query_id") < 100)
    schedule = schedulers.greedy_low_carbon_schedule(
        workload, ci, slot_sec=SLOT_SEC, search_hours=4.0, candidate_step_slots=10
    )
    schedulers.assert_schedule_fits_sequential(workload, schedule, len(ci))
    realised = schedulers.realised_carbon_sequential(
        workload, schedule, ci, slot_sec=SLOT_SEC
    )
    rows = [
        (int(qid), int(start), round(realised, 4))
        for qid, start in sorted(schedule.items())
    ]
    return spark.createDataFrame(
        rows, "query_id long, start_slot long, realised_carbon_g double"
    )


@register(
    "greedy_lowcarbon_schedule",
    oracle=f"""
    WITH {_WORKLOAD_CTES}
    SELECT query_id, actual_slots,
           TRUE AS fits_ok, TRUE AS greedy_le_fifo_ok
    FROM workload WHERE query_id < 100
    """,
)
def greedy_lowcarbon_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy defer scheduling, value-certified via a SCHEDULING ENVELOPE
    (the r9 envelope pattern for sequential algorithms): the output rows
    are the EXACT quantized workload both engines derive independently
    (query_id + actual slot demand — the scheduler's input contract),
    and every row carries two booleans the oracle emits as TRUE:

    * ``fits_ok`` — the greedy schedule is sequentially feasible (no
      placement before the cursor, horizon respected —
      ``assert_schedule_fits_sequential`` raised otherwise);
    * ``greedy_le_fifo_ok`` — realised sequential carbon of the greedy
      schedule <= the FIFO schedule's on the same workload/CI series
      (the defer-into-valleys guarantee the experiment grid also gates).

    The search recurrence stays non-SQL-expressible; full schedule rows
    remain law-tested over ``_greedy_schedule_rows`` and the experiment
    grid in tests/test_scheduling.py."""
    import numpy as np

    profile = carbon_profile(spark, sf_dir)
    ci = np.array(
        [r["ci"] for r in profile.select("slot", "ci").orderBy("slot").collect()]
    )
    workload = event_workload(spark, sf_dir).filter(F.col("query_id") < 100)
    greedy = schedulers.greedy_low_carbon_schedule(
        workload, ci, slot_sec=SLOT_SEC, search_hours=4.0,
        candidate_step_slots=10,
    )
    schedulers.assert_schedule_fits_sequential(workload, greedy, len(ci))
    fifo = {
        int(r["query_id"]): int(r["start_slot"])
        for r in schedulers.fifo_schedule(workload, policy="arrival")
        .select("query_id", "start_slot")
        .collect()
    }
    c_greedy = schedulers.realised_carbon_sequential(
        workload, greedy, ci, slot_sec=SLOT_SEC
    )
    c_fifo = schedulers.realised_carbon_sequential(
        workload, fifo, ci, slot_sec=SLOT_SEC
    )
    return workload.select(
        "query_id",
        "actual_slots",
        F.lit(True).alias("fits_ok"),
        F.lit(bool(c_greedy <= c_fifo + 1e-9)).alias("greedy_le_fifo_ok"),
    )


def _experiment_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's experiment grid end-to-end
    (``experiment.py:241-281`` → ``ExperimentResult.summary():28-51``):
    run {FIFO, greedy-defer} × {predicted, oracle} over one workload and
    CI profile and emit one summary row per experiment with the
    reference's metric keys — total/per-query/per-second gCO₂, makespan,
    slot length, power — plus ``overhead_vs_oracle``: per scheduler,
    (C_model − C_oracle) / C_oracle against the same scheduler's
    oracle-knowledge run (``stats.py:20-40``'s panel column; oracle rows
    carry 0 by construction).

    Data prep (CI series, workload quantization) is DataFrames; each
    simulation is the driver-side sequential fold the reference defines.
    The production operator; cross-experiment laws are pytest-gated in
    tests/test_scheduling.py and driver-certified through the
    ``scheduler_experiment_summary`` envelope."""
    import numpy as np

    profile = carbon_profile(spark, sf_dir)
    ci = np.array(
        [r["ci"] for r in profile.select("slot", "ci").orderBy("slot").collect()]
    )
    workload = event_workload(spark, sf_dir).filter(F.col("query_id") < 100)
    n_q = workload.count()
    grid: list[tuple] = []
    totals: dict[tuple[str, bool], float] = {}
    for oracle in (False, True):
        wl = schedulers.oracle_view(workload) if oracle else workload
        fifo = schedulers.fifo_schedule(wl, policy="arrival")
        fifo_sched = {
            int(r["query_id"]): int(r["start_slot"])
            for r in fifo.select("query_id", "start_slot").collect()
        }
        greedy_sched = schedulers.greedy_low_carbon_schedule(
            wl, ci, slot_sec=SLOT_SEC, search_hours=4.0, candidate_step_slots=10
        )
        slots = {
            int(r["query_id"]): int(r["actual_slots"])
            for r in wl.select("query_id", "actual_slots").collect()
        }
        for name, sched in (("fifo", fifo_sched), ("greedy", greedy_sched)):
            total = schedulers.realised_carbon_sequential(
                wl, sched, ci, slot_sec=SLOT_SEC
            )
            cursor = 0
            for qid in sorted(sched, key=lambda j: sched[j]):
                cursor = max(sched[qid], cursor) + slots[qid]
            makespan_s = cursor * SLOT_SEC
            totals[(name, bool(oracle))] = total
            grid.append((name, bool(oracle), total, makespan_s))
    rows = []
    for name, oracle, total, makespan_s in grid:
        c_oracle = totals[(name, True)]
        # tiny workloads can realise 0 g total (all slots in a zero-CI
        # window); the relative overhead is 0 when both totals are 0 and
        # undefined (NaN, as the reference emits) when only the oracle is
        overhead = (
            (total - c_oracle) / c_oracle
            if c_oracle != 0.0
            else (0.0 if total == 0.0 else float("nan"))
        )
        rows.append(
            (
                name,
                oracle,
                int(n_q),
                round(total, 6),
                round(total / n_q, 6),
                round(total / makespan_s, 9),
                float(makespan_s),
                float(SLOT_SEC),
                carbon.DEFAULT_POWER_KW,
                round(overhead, 9),
            )
        )
    return spark.createDataFrame(
        rows,
        "scheduler string, oracle boolean, num_queries int, "
        "carbon_total_gco2 double, carbon_per_query_gco2 double, "
        "carbon_per_second_gco2 double, makespan_seconds double, "
        "slot_length_sec double, power_kw double, "
        "overhead_vs_oracle double",
    )


@register(
    "scheduler_experiment_summary",
    oracle=f"""
    WITH {_WORKLOAD_CTES},
    n AS (SELECT CAST(count(*) AS INT) AS num_queries
          FROM workload WHERE query_id < 100)
    SELECT g.scheduler, g.oracle, n.num_queries,
           CAST({SLOT_SEC} AS DOUBLE) AS slot_length_sec,
           CAST(0.150 AS DOUBLE) AS power_kw,
           TRUE AS greedy_le_fifo_ok,
           TRUE AS overhead_law_ok,
           TRUE AS makespan_positive_ok
    FROM (VALUES ('fifo', false), ('fifo', true),
                 ('greedy', false), ('greedy', true))
         g(scheduler, oracle), n
    """,
)
def scheduler_experiment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The experiment grid, value-certified via a GRID-LAW ENVELOPE: one
    row per (scheduler, oracle-knowledge) experiment carrying the EXACT
    invariants both engines derive independently — the quantized workload
    size, the slot length, the fixed power draw — plus three booleans the
    oracle emits as TRUE:

    * ``greedy_le_fifo_ok`` — greedy's total carbon <= FIFO's under the
      same knowledge (the defer guarantee, both knowledge levels);
    * ``overhead_law_ok`` — oracle rows are their own baseline
      (overhead 0); predicted rows are >= 0 or NaN-when-zero-baseline
      (``stats.py:20-40`` semantics);
    * ``makespan_positive_ok`` — every simulated schedule takes time.

    The carbon totals themselves are outputs of the order-defined greedy
    search (non-SQL-expressible); their exact values stay pytest-gated
    over ``_experiment_grid`` in tests/test_scheduling.py."""
    import math

    grid = {
        (r["scheduler"], bool(r["oracle"])): r
        for r in _experiment_grid(spark, sf_dir).collect()
    }
    rows = []
    for (name, oracle), r in sorted(grid.items()):
        fifo_same = grid[("fifo", oracle)]
        le_ok = (
            grid[("greedy", oracle)]["carbon_total_gco2"]
            <= fifo_same["carbon_total_gco2"] + 1e-9
        )
        ov = r["overhead_vs_oracle"]
        ov_ok = (
            ov == 0.0 if oracle else (math.isnan(ov) or ov >= -1e-12)
        )
        rows.append(
            (
                name,
                oracle,
                int(r["num_queries"]),
                float(r["slot_length_sec"]),
                float(r["power_kw"]),
                bool(le_ok),
                bool(ov_ok),
                bool(r["makespan_seconds"] > 0),
            )
        )
    return spark.createDataFrame(
        rows,
        "scheduler string, oracle boolean, num_queries int, "
        "slot_length_sec double, power_kw double, "
        "greedy_le_fifo_ok boolean, overhead_law_ok boolean, "
        "makespan_positive_ok boolean",
    )
