"""Invariants + plan shape for the time-series gap-fill operator."""

from __future__ import annotations

import datetime as dt

from lakehouse_variance_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def _rows(spark):
    return registry.QUERIES["ts_gap_fill_locf"](spark, SF_DIR).collect()


def test_gapfill_grid_is_dense_per_user(spark):
    rows = _rows(spark)
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.grid_day)
    for user, days in by_user.items():
        days.sort()
        span = (days[-1] - days[0]).days + 1
        assert len(days) == span, f"user {user} grid has holes"
        assert len(set(days)) == len(days)


def test_gapfill_locf_and_interp_laws(spark):
    rows = _rows(spark)
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, urows in by_user.items():
        urows.sort(key=lambda r: r.grid_day)
        # first grid day is an anchor (grid spans anchor min..max)
        assert urows[0].is_anchor == 1
        assert urows[-1].is_anchor == 1
        last_anchor_val = None
        for r in urows:
            if r.is_anchor:
                last_anchor_val = r.locf_value
                assert r.interp_value == r.locf_value
            else:
                assert r.locf_value == last_anchor_val
        # interpolated values lie between their neighbouring anchors
        anchors = [
            (i, r.locf_value) for i, r in enumerate(urows) if r.is_anchor
        ]
        for (i0, v0), (i1, v1) in zip(anchors, anchors[1:]):
            lo, hi = min(v0, v1), max(v0, v1)
            for k in range(i0 + 1, i1):
                assert lo - 1e-9 <= urows[k].interp_value <= hi + 1e-9


def test_gapfill_single_window_exchange(spark):
    df = registry.QUERIES["ts_gap_fill_locf"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both ignoreNulls windows ride the same user-partitioned sort: the
    # plan has Window nodes but only ONE exchange hashed on user_id alone
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 1
    assert plan.count("hashpartitioning(user_id") <= 2


def test_lttb_shape_preservation(spark):
    from lakehouse_variance_spark.operators.timeseries import LTTB_POINTS

    from lakehouse_variance_spark.operators.timeseries import _lttb_points

    ev = _lttb_points(spark, SF_DIR)
    rows = ev.collect()
    src = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .count()
        .collect()
    )
    n_by_user = {r.user_id: r["count"] for r in src}
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == set(n_by_user)
    for user, urows in by_user.items():
        urows.sort(key=lambda r: r.bucket_id)
        assert len(urows) == min(n_by_user[user], LTTB_POINTS)
        # monotone time, unique buckets
        ts = [r.ts for r in urows]
        assert ts == sorted(ts)
        assert len({r.bucket_id for r in urows}) == len(urows)


def test_lttb_keeps_endpoints_and_extremes_better_than_stride(spark):
    # endpoints are always kept, and the kept set contains the global
    # max-value point of each user's series (a property plain striding
    # routinely violates; LTTB keeps it because the max dominates any
    # triangle in its bucket).
    from lakehouse_variance_spark.operators.timeseries import _lttb_points

    ev = _lttb_points(spark, SF_DIR)
    kept = {}
    for r in ev.collect():
        kept.setdefault(r.user_id, []).append((r.ts, r.value))
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "ts", "value"
    )
    rpdf = raw.toPandas()
    for user, pts in kept.items():
        g = rpdf[rpdf.user_id == user].sort_values("ts")
        assert pts[0][0] == g.ts.iloc[0].to_pydatetime()
        assert pts[-1][0] == g.ts.iloc[-1].to_pydatetime()


def test_lttb_deterministic(spark):
    from lakehouse_variance_spark.operators.timeseries import _lttb_points

    a = sorted(
        (r.user_id, r.bucket_id, str(r.ts), r.value)
        for r in _lttb_points(spark, SF_DIR).collect()
    )
    b = sorted(
        (r.user_id, r.bucket_id, str(r.ts), r.value)
        for r in _lttb_points(spark, SF_DIR).collect()
    )
    assert a == b


def test_ohlc_no_window_one_exchange(spark):
    """Open/close come from struct argmin/argmax inside ordinary partial
    aggregation — no Window node, a single hash exchange."""
    from lakehouse_variance_spark import registry

    registry.load_all()
    df = registry.QUERIES["ts_ohlc_bars"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
    for r in df.collect():
        assert r.low_c <= r.open_c <= r.high_c
        assert r.low_c <= r.close_c <= r.high_c
        assert r.volume >= 1


def test_sorted_series_frame_rejects_null_ts_or_value():
    """The fused bracket pass documents a NULL-free events precondition;
    a NULL must fail loudly, not silently diverge from the oracle
    (pandas sorts NaT last where SQL min/max skip NULLs)."""
    import pandas as pd
    import pytest

    from lakehouse_variance_spark.operators.timeseries import (
        _sorted_series_frame,
    )

    cols = ["user_id", "ts", "event_id", "value"]
    good = pd.DataFrame(
        {
            "user_id": [1, 1],
            "ts": pd.to_datetime([1, 2], unit="s"),
            "event_id": [1, 2],
            "value": [1.0, 2.0],
        }
    )
    pdf, starts, ends = _sorted_series_frame([good], cols)
    assert len(pdf) == 2 and list(starts) == [0] and list(ends) == [2]
    for col, bad_val in (("ts", pd.NaT), ("value", float("nan"))):
        bad = good.copy()
        bad.loc[1, col] = bad_val
        with pytest.raises(ValueError, match="NULL ts/value"):
            _sorted_series_frame([bad], cols)


def test_series_partition_count_scales_with_volume(spark):
    """The sorted-series repartition is defaultParallelism at bench scale
    (AQE floor) but must grow with estimated input volume so the
    whole-partition pandas frame stays bounded (guide §5)."""
    from lakehouse_variance_spark.operators import timeseries as ts_mod
    from lakehouse_variance_spark.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    par = spark.sparkContext.defaultParallelism
    # sf0.1 events are ~2 MB: the floor wins, matching the r11 plan shape.
    assert ts_mod._series_partition_count(ev) == par
    # A 64 GB estimated input must fan out to est/128MB partitions: patch
    # the target down so the check runs against the real Catalyst estimate.
    est = int(str(ev._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    assert est > 0
    old = ts_mod._LTTB_TARGET_PARTITION_BYTES
    try:
        ts_mod._LTTB_TARGET_PARTITION_BYTES = max(1, est // (par * 4))
        assert ts_mod._series_partition_count(ev) >= par * 4
    finally:
        ts_mod._LTTB_TARGET_PARTITION_BYTES = old
