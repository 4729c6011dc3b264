"""Carbon-aware workload scheduling (reference ``low-carbon-scheduling/src``).

Data prep is DataFrames; the greedy search itself is a driver-side loop over
collected arrays — the reference algorithm (``scheduler.py:122-194``) is
inherently sequential (each placement moves the time cursor that constrains
the next), so forcing it into DataFrames would only add scheduling overhead.
Inputs and outputs stay DataFrames; the collected CI array is the one small
object (a horizon of slots), never the workload tables.

* quantization  runtime→slots  (reference ``workload.py:13-18``)
* ordering policies            (reference ``workload.py:65-117``)
* oracle view pred:=actual     (reference ``workload.py:54-63``)
* FIFO schedule                (reference ``scheduler.py:67-94``) — a running
  sum window, fully SQL-expressible
* greedy low-carbon defer      (reference ``scheduler.py:96-194``)
* realised sequential carbon   (reference ``scheduler.py:14-49``)
* schedule-fits invariant      (reference ``scheduler.py:196-227``)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lakehouse_variance_spark.scheduling.carbon import DEFAULT_POWER_KW

# ---------------------------------------------------------------------------
# Workload shaping (DataFrame ops)
# ---------------------------------------------------------------------------


def runtime_to_slots(runtime_s: Column, slot_sec: float, add_variance: float = 1.0) -> Column:
    """max(1, int(ceil(runtime / slot_sec) * add_variance)) as a column expr
    (reference ``workload.py:13-18``: ceil first, then scale, then truncate).
    """
    scaled = F.ceil(runtime_s / F.lit(float(slot_sec))) * F.lit(float(add_variance))
    return F.greatest(F.lit(1), scaled.cast("long")).alias("slots")


def oracle_view(workload: DataFrame) -> DataFrame:
    """Perfect-predictor view: pred_slots := actual_slots
    (reference ``workload.py:54-63``)."""
    return workload.withColumn("pred_slots", F.col("actual_slots"))


def order_keys(policy: str) -> tuple[Column, ...]:
    """Sort keys for an ordering policy (reference ``workload.py:65-117``),
    with query_id tie-break so every policy is deterministic. Built lazily —
    Column construction needs an active SparkContext."""
    err = F.abs(F.col("actual_slots") - F.col("pred_slots"))
    policies = {
        "arrival": (F.col("query_id"),),
        "pred_longest_first": (F.col("pred_slots").desc(), F.col("query_id")),
        "pred_shortest_first": (F.col("pred_slots").asc(), F.col("query_id")),
        "actual_longest_first": (F.col("actual_slots").desc(), F.col("query_id")),
        "actual_shortest_first": (F.col("actual_slots").asc(), F.col("query_id")),
        "high_error_first": (err.desc(), F.col("query_id")),
        "low_error_first": (err.asc(), F.col("query_id")),
    }
    return policies[policy]


def ordered_workload(workload: DataFrame, policy: str = "arrival") -> DataFrame:
    """Workload ordering policies (reference ``workload.py:65-117``). The
    reference's ``random`` policy (seeded Python shuffle) maps to
    ``orderBy(rand(seed))`` — seeded but engine-specific, so it is excluded
    from oracle comparison."""
    if policy == "random":
        return workload.orderBy(F.rand(0), F.col("query_id"))
    return workload.orderBy(*order_keys(policy))


def fifo_schedule(workload: DataFrame, policy: str = "arrival") -> DataFrame:
    """FIFO planned starts: back-to-back in policy order using actual_slots
    (reference ``scheduler.py:67-94``). The slot cursor is a running sum
    window — one sort, no driver loop, any workload size."""
    w = W.orderBy(*order_keys(policy)).rowsBetween(W.unboundedPreceding, -1)
    return workload.withColumn(
        "start_slot", F.coalesce(F.sum("actual_slots").over(w), F.lit(0))
    )


# ---------------------------------------------------------------------------
# Driver-side algorithms over collected arrays
# ---------------------------------------------------------------------------


def _ci_prefix(ci: np.ndarray) -> np.ndarray:
    return np.concatenate([[0.0], np.cumsum(ci, dtype=float)])


def _window_carbon(
    prefix: np.ndarray, start: int, dur: int, power_kw: float, dt_hours: float
) -> float:
    n = len(prefix) - 1
    end = min(start + dur, n)
    if end <= start:
        return 0.0
    return float((prefix[end] - prefix[start]) * power_kw * dt_hours)


def greedy_low_carbon_schedule(
    workload: DataFrame,
    ci: np.ndarray,
    *,
    slot_sec: float,
    search_hours: float = 24.0,
    candidate_step_slots: int = 1,
    power_kw: float = DEFAULT_POWER_KW,
) -> dict[str, int]:
    """Greedy who-and-when defer scheduler (reference ``scheduler.py:96-194``).

    At every step, for each remaining query, find the cheapest start within
    the deferral horizon (via prefix sums, so each candidate window is O(1));
    place the globally cheapest (ties → smaller id), advance the cursor by
    the query's *predicted* duration. Sequential by construction — runs on
    the driver over the collected CI array; the workload rows themselves are
    only collected as (id, pred_slots), never the underlying fact data.
    """
    dt_hours = slot_sec / 3600.0
    prefix = _ci_prefix(ci)
    ci_len = len(ci)
    pred = {
        r["query_id"]: int(r["pred_slots"])
        for r in workload.select("query_id", "pred_slots").collect()
    }
    remaining = set(pred)
    search_range = int(np.ceil(search_hours / dt_hours))
    schedule: dict[str, int] = {}
    cursor = 0

    while remaining:
        best_id, best_start, best_cost = None, None, float("inf")
        for qid in sorted(remaining):
            d = pred[qid]
            earliest = cursor
            last = max(ci_len - d, earliest) if cursor < ci_len else cursor
            search_end = min(earliest + search_range, last)
            # Vectorized candidate scan: cost(s) = prefix[min(s+d,n)] -
            # prefix[min(s,n)]; argmin returns the FIRST minimum, matching a
            # strict-< sequential scan.
            starts = np.arange(earliest, search_end + 1, candidate_step_slots)
            costs = (
                prefix[np.minimum(starts + d, ci_len)]
                - prefix[np.minimum(starts, ci_len)]
            ) * (power_kw * dt_hours)
            idx = int(np.argmin(costs))
            q_cost, q_start = float(costs[idx]), int(starts[idx])
            if q_cost < best_cost or (q_cost == best_cost and (best_id is None or qid < best_id)):
                best_id, best_start, best_cost = qid, q_start, q_cost
        schedule[best_id] = best_start
        cursor = best_start + pred[best_id]
        remaining.remove(best_id)
    return schedule


def realised_carbon_sequential(
    workload: DataFrame,
    schedule: dict[str, int],
    ci: np.ndarray,
    *,
    slot_sec: float,
    power_kw: float = DEFAULT_POWER_KW,
    block_on_pred: bool = False,
) -> float:
    """Realised carbon on one machine executing in planned-start order
    (reference ``scheduler.py:14-49``): each query starts at
    max(planned, machine-free); carbon is charged over the *actual* runtime;
    the machine blocks for actual (default) or predicted slots."""
    dt_hours = slot_sec / 3600.0
    prefix = _ci_prefix(ci)
    rows = {
        r["query_id"]: (int(r["pred_slots"]), int(r["actual_slots"]))
        for r in workload.select("query_id", "pred_slots", "actual_slots").collect()
    }
    cursor, total = 0, 0.0
    for qid in sorted(schedule, key=lambda j: schedule[j]):
        pred_slots, actual_slots = rows[qid]
        start = max(schedule[qid], cursor)
        total += _window_carbon(prefix, start, actual_slots, power_kw, dt_hours)
        cursor = start + (pred_slots if block_on_pred else actual_slots)
    return total


def assert_schedule_fits_sequential(
    workload: DataFrame,
    schedule: dict[str, int],
    ci_len: int,
    *,
    oracle: bool = False,
    name: str = "schedule",
) -> None:
    """Invariant: under blocking semantics the schedule ends within the CI
    horizon (reference ``scheduler.py:196-227``)."""
    rows = {
        r["query_id"]: (int(r["pred_slots"]), int(r["actual_slots"]))
        for r in workload.select("query_id", "pred_slots", "actual_slots").collect()
    }
    cursor = 0
    for qid in sorted(schedule, key=lambda j: schedule[j]):
        pred_slots, actual_slots = rows[qid]
        cursor = max(schedule[qid], cursor)
        cursor += max(pred_slots, actual_slots) if oracle else pred_slots
    assert cursor <= ci_len, (
        f"{name} exceeds CI window: ends at slot {cursor}, CI length {ci_len}"
    )
