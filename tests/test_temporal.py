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


# --- Property-based equivalence vs pandas merge_asof -----------------------

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Random (user, second, payload) rows; seconds collide deliberately so ties
# and duplicate-timestamp cases are generated.
_row = st.tuples(
    st.integers(min_value=1, max_value=4),    # user_id: few keys -> collisions
    st.integers(min_value=0, max_value=30),   # ts second
    st.integers(min_value=0, max_value=10**6),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=st.lists(_row, min_size=1, max_size=20),
    right_rows=st.lists(_row, min_size=0, max_size=20),
)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    """For arbitrary row sets, asof_join must agree with pandas.merge_asof
    (backward direction, at-or-before) — the library-of-record semantics.

    merge_asof picks the LAST right row at the matched timestamp, so right
    payloads are made unique per (user, ts) (dedup keeping max payload) to
    avoid comparing tie-breaks among identical timestamps, which are
    unspecified in both implementations.
    """
    right_dedup: dict[tuple[int, int], int] = {}
    for u, s, p in right_rows:
        key = (u, s)
        right_dedup[key] = max(right_dedup.get(key, p), p)
    # Left rows need unique ids to compare row-for-row.
    left_uniq = [
        (u, s, i) for i, (u, s, _p) in enumerate(left_rows)
    ]

    left = spark.createDataFrame(
        [(u, _ts(s), i) for u, s, i in left_uniq],
        "user_id long, ts timestamp, event_id long",
    )
    rd = [(u, _ts(s), p) for (u, s), p in right_dedup.items()]
    right = spark.createDataFrame(
        rd, "user_id long, ts timestamp, click_id long"
    )
    got = {
        r["event_id"]: r["click_id"]
        for r in asof_join(
            left, right, on="user_id", ts="ts", right_payload=["click_id"]
        ).collect()
    }

    lp = pd.DataFrame(
        [(u, _ts(s), i) for u, s, i in left_uniq],
        columns=["user_id", "ts", "event_id"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        rd or None, columns=["user_id", "ts", "click_id"]
    ).sort_values("ts", kind="stable")
    if rp.empty:
        want = {i: None for _u, _s, i in left_uniq}
    else:
        merged = pd.merge_asof(
            lp, rp, on="ts", by="user_id", direction="backward"
        )
        want = {
            int(r.event_id): (None if pd.isna(r.click_id) else int(r.click_id))
            for r in merged.itertuples()
        }
    assert got == want
