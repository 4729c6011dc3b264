"""Property-based tests for the Trino duration parser: a generated
<number><unit> string always parses to magnitude × unit-seconds, and
malformed strings always parse to NULL — over randomized magnitudes,
units, and corruptions (hypothesis), evaluated through the real Spark
expression in batches."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# The spark fixture is session-scoped underneath (one JVM for the whole
# run), so re-use across hypothesis examples is exactly what we want.
_SETTINGS = dict(
    deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

from lakehouse_variance_spark.functions.durations import (
    _UNIT_SECONDS,
    duration_to_seconds,
)
from pyspark.sql import functions as F

UNITS = sorted(_UNIT_SECONDS)

valid_cases = st.lists(
    st.tuples(
        st.floats(
            min_value=0.0, max_value=1e9, allow_nan=False, allow_infinity=False
        ),
        st.sampled_from(UNITS),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=1,
    max_size=30,
)

malformed = st.sampled_from(
    ["", "-1.2s", "1.2.3s", "abc", "12x", "1.2 m s", "s12", "1e3s", "+5m", "1,2s"]
)


@settings(max_examples=10, **_SETTINGS)
@given(valid_cases)
def test_valid_durations_parse_exactly(spark, cases):
    rows = [(f"{val:.{prec}f}{unit}", val, unit, prec) for val, unit, prec in cases]
    df = spark.createDataFrame(
        [(s,) for s, *_ in rows], "dur string"
    ).withColumn("sec", duration_to_seconds("dur"))
    got = [r["sec"] for r in df.collect()]
    for (s, val, unit, prec), sec in zip(rows, got):
        expected = float(f"{val:.{prec}f}") * _UNIT_SECONDS[unit]
        assert sec is not None, s
        assert abs(sec - expected) <= 1e-9 * max(1.0, expected), s


@settings(max_examples=10, **_SETTINGS)
@given(st.lists(malformed, min_size=1, max_size=10))
def test_malformed_durations_parse_to_null(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "dur string")
    out = df.withColumn("sec", duration_to_seconds("dur")).collect()
    assert all(r["sec"] is None for r in out), [r for r in out if r["sec"] is not None]
