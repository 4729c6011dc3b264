"""As-of join semantics: at-or-before matching, tie inclusion, missing-match
nulls, and the single-shuffle plan property that makes it scale."""

from __future__ import annotations

from datetime import datetime

from lakehouse_variance_spark.operators.temporal import asof_join


def _ts(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_tie_missing_and_ordering(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(5), 101), (2, _ts(7), 102)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 900), (1, _ts(3), 901), (3, _ts(1), 902)],
        "user_id long, ts timestamp, click_id long",
    )
    out = {
        r["event_id"]: (r["click_id"], r["ts_right"])
        for r in asof_join(
            left, right, on="user_id", ts="ts", right_payload=["click_id"]
        ).collect()
    }
    # Tie: a right row AT the left timestamp matches (at-or-before, <=).
    assert out[100] == (900, _ts(10))
    # Strictly-before: the latest earlier right row, not a later one.
    assert out[101] == (901, _ts(3))
    # No right row for the key at all -> typed NULLs, row preserved.
    assert out[102] == (None, None)
    assert len(out) == 3


def test_asof_join_single_shuffle(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 1)], "user_id long, ts timestamp, event_id long"
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 2)], "user_id long, ts timestamp, click_id long"
    )
    plan = (
        asof_join(left, right, on="user_id", ts="ts", right_payload=["click_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The union-marker pattern pays exactly ONE exchange (the window's hash
    # partitioning on the join key) — the property that makes it hold at
    # scale versus inequality-join + argmax (two shuffles + pair blow-up).
    assert plan.count("Exchange hashpartitioning") == 1
