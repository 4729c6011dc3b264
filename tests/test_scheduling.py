"""Scheduler semantics vs hand-computed expectations (reference
low-carbon-scheduling/src/{carbon,workload,scheduler}.py).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_variance_spark.scheduling import carbon, schedulers

# CI series: cheap valley at slots 4-7.
CI = np.array([9.0, 9, 9, 9, 1, 1, 1, 1, 9, 9, 9, 9], dtype=float)
SLOT_SEC = 3600.0  # 1-hour slots -> dt_hours = 1, so carbon = sum(ci) * kW


def _workload(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, pred_slots long, actual_slots long"
    )


def test_runtime_to_slots(spark):
    df = spark.createDataFrame([(0.5,), (59.9,), (60.0,), (61.0,), (300.0,)], "r double")
    got = [
        r["slots"]
        for r in df.select(schedulers.runtime_to_slots(F.col("r"), 60.0)).collect()
    ]
    assert got == [1, 1, 1, 2, 5]
    # add_variance scales after ceil, then truncates (reference workload.py:17)
    got2 = [
        r["slots"]
        for r in df.select(
            schedulers.runtime_to_slots(F.col("r"), 60.0, add_variance=1.5)
        ).collect()
    ]
    assert got2 == [1, 1, 1, 3, 7]  # ceil(61/60)=2 -> 3.0 -> 3; 5 -> 7.5 -> 7


def test_fifo_schedule_running_sum(spark):
    w = _workload(spark, [("a", 2, 3), ("b", 1, 2), ("c", 4, 1)])
    starts = {
        r["query_id"]: r["start_slot"]
        for r in schedulers.fifo_schedule(w).collect()
    }
    assert starts == {"a": 0, "b": 3, "c": 5}


def test_window_carbon_batch_matches_prefix_math(spark):
    slots = spark.createDataFrame(
        [(i, float(c)) for i, c in enumerate(CI)], "slot long, ci double"
    )
    prefix = carbon.with_prefix(slots)
    cands = spark.createDataFrame(
        [(0, 0, 4), (1, 4, 4), (2, 10, 5), (3, 12, 2), (4, 5, 0)],
        "query_id long, start_slot long, duration_slots long",
    )
    got = {
        r["query_id"]: r["carbon_g"]
        for r in carbon.window_carbon_batch(
            prefix, cands, slot_sec=SLOT_SEC, power_kw=1.0
        ).collect()
    }
    assert got[0] == pytest.approx(36.0)  # 9*4
    assert got[1] == pytest.approx(4.0)  # valley
    assert got[2] == pytest.approx(18.0)  # clamps at series end (slots 10,11)
    assert got[3] == pytest.approx(0.0)  # start beyond series
    assert got[4] == pytest.approx(0.0)  # zero duration


def test_greedy_prefers_valley_and_respects_cursor(spark):
    w = _workload(spark, [("a", 4, 4), ("b", 4, 4)])
    schedule = schedulers.greedy_low_carbon_schedule(
        w, CI, slot_sec=SLOT_SEC, search_hours=12.0
    )
    # Both queries want the valley (slots 4-7, cost 4); tie -> 'a' first.
    # Cursor then sits at 8, so 'b' must start at 8 (all costs 36, first min).
    assert schedule == {"a": 4, "b": 8}
    schedulers.assert_schedule_fits_sequential(w, schedule, len(CI))


def test_realised_carbon_sequential_blocking(spark):
    w = _workload(spark, [("a", 2, 4), ("b", 2, 2)])
    # Planned: a@0, b@2 — but 'a' actually runs 4 slots, so 'b' is pushed to 4.
    realised = schedulers.realised_carbon_sequential(
        w, {"a": 0, "b": 2}, CI, slot_sec=SLOT_SEC, power_kw=1.0
    )
    assert realised == pytest.approx(36.0 + 2.0)  # a: 9*4; b: slots 4,5 -> 1+1
    # Blocking on predicted slots instead: 'b' starts at planned slot 2.
    realised_pred = schedulers.realised_carbon_sequential(
        w, {"a": 0, "b": 2}, CI, slot_sec=SLOT_SEC, power_kw=1.0, block_on_pred=True
    )
    assert realised_pred == pytest.approx(36.0 + 18.0)  # b: slots 2,3 -> 9+9


def test_oracle_view(spark):
    w = _workload(spark, [("a", 9, 4)])
    row = schedulers.oracle_view(w).collect()[0]
    assert row["pred_slots"] == row["actual_slots"] == 4


def test_distributed_prefix_sum_multi_bucket(spark):
    """The two-pass prefix sum must equal a sequential scan across bucket
    boundaries (bucket_width forced far below the row count)."""
    n = 1000
    rows = [(i, (i * 7) % 13) for i in range(n)]
    df = spark.createDataFrame(rows, "slot long, v long")
    got = {
        r["slot"]: r["p"]
        for r in carbon.distributed_prefix_sum(
            df, "slot", "v", "p", bucket_width=64
        ).collect()
    }
    acc = 0
    for i, v in rows:
        acc += v
        assert got[i] == acc, f"slot {i}"


def test_prefix_sum_has_no_global_window_over_rows(spark):
    """The full-size window must be partitioned; only the bucket-totals
    window (|rows|/bucket_width rows) may be unpartitioned."""
    n = 1000
    df = spark.createDataFrame([(i, 1) for i in range(n)], "slot long, v long")
    plan = (
        carbon.distributed_prefix_sum(df, "slot", "v", "p", bucket_width=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "no window in plan"
    # The full-size running sum partitions by the bucket column.
    assert any(s.strip().startswith("_b") and "slot" in s for s in specs), specs
    # Exactly one SinglePartition exchange: the |buckets|-row offsets path.
    assert plan.count("Exchange SinglePartition") == 1


def test_experiment_summary_grid_laws(spark):
    """Reference experiment-grid laws: 4 experiments over one workload;
    greedy (which may defer into cleaner slots) never emits MORE carbon
    than FIFO under the same knowledge; per-query/per-second metrics are
    exact quotients of the totals."""
    from lakehouse_variance_spark.scheduling.queries import _experiment_grid

    rows = {
        (r.scheduler, r.oracle): r
        for r in _experiment_grid(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(rows) == 4
    n = {r.num_queries for r in rows.values()}
    assert len(n) == 1 and n.pop() > 0
    for oracle in (False, True):
        assert (
            rows[("greedy", oracle)].carbon_total_gco2
            <= rows[("fifo", oracle)].carbon_total_gco2 + 1e-9
        )
    for r in rows.values():
        assert abs(r.carbon_per_query_gco2 - round(r.carbon_total_gco2 / r.num_queries, 6)) < 1e-6
        assert r.makespan_seconds > 0 and r.power_kw == 0.150
    # overhead_vs_oracle (stats.py:20-40): oracle rows are their own
    # baseline (0); predicted rows are the relative delta to the same
    # scheduler's oracle run and can never be negative — oracle knowledge
    # is at least as good as predictions for these deterministic sims.
    for name in ("fifo", "greedy"):
        assert rows[(name, True)].overhead_vs_oracle == 0.0
        c_oracle = rows[(name, True)].carbon_total_gco2
        got = rows[(name, False)].overhead_vs_oracle
        if c_oracle > 0:
            expected = (
                rows[(name, False)].carbon_total_gco2 - c_oracle
            ) / c_oracle
            assert abs(got - expected) < 1e-6
        else:  # both-zero workloads define overhead as 0
            assert rows[(name, False)].carbon_total_gco2 == 0.0
            assert got == 0.0
        assert got >= -1e-9
