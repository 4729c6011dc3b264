"""Trino duration-string parsing as pure Column expressions.

The reference's trace flattener converts Trino duration strings ("1.2m",
"340ms", "2.5h", "17us"/"17µs", "8ns", bare numbers) to float seconds in jq
(reference ``traces/tools/make_lakehouse_workload_logs.sh:24-44``,
``dur_to_seconds``). Here the same semantics are a single JVM-side expression
— regexp split into magnitude and unit, then a unit→multiplier CASE — so the
parse vectorizes inside whole-stage codegen with no Python in the loop.
Unrecognized strings yield NULL, exactly like the jq fallback branch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table

# Seconds per unit, matching the jq parser branch for branch. Longest-match
# ordering is handled by the regex (unit is the maximal trailing alpha run).
_UNIT_SECONDS: dict[str, float] = {
    "": 1.0,  # bare number => already seconds
    "s": 1.0,
    "ms": 1e-3,
    "us": 1e-6,
    "µs": 1e-6,  # micro sign variant Trino emits
    "ns": 1e-9,
    "m": 60.0,
    "h": 3600.0,
}

_NUM_RE = r"^([0-9]+(?:\.[0-9]+)?)"
_UNIT_RE = r"([a-zµ]*)$"


def duration_to_seconds(col: Column | str) -> Column:
    """Parse a Trino duration string column to DOUBLE seconds (NULL if malformed).

    Semantics of reference ``make_lakehouse_workload_logs.sh:24-44``: the
    string must be <number><unit> with unit in {s, ms, us, µs, ns, m, h} or
    empty (plain seconds); anything else (including a negative sign — the jq
    regexes are ^[0-9]-anchored) parses to NULL.
    """
    s = F.trim(F.col(col) if isinstance(col, str) else col)
    magnitude = F.regexp_extract(s, _NUM_RE, 1)
    unit = F.regexp_extract(s, _UNIT_RE, 1)
    # A valid parse consumes the whole string: number followed by the unit.
    whole = F.concat(magnitude, unit) == s
    items = iter(_UNIT_SECONDS.items())
    first_unit, first_mult = next(items)
    multiplier = F.when(unit == F.lit(first_unit), F.lit(first_mult))
    for u, mult in items:
        multiplier = multiplier.when(unit == F.lit(u), F.lit(mult))
    return F.when(
        whole & (magnitude != F.lit("")),
        magnitude.cast("double") * multiplier,
    )


@register(
    "duration_parse_seconds",
    oracle="""
    WITH durs AS (
        SELECT event_id,
               printf('%.3f', value) ||
               (['s', 'ms', 'µs', 'm', 'h'])[(event_id % 5) + 1] AS dur_str
        FROM events
    ),
    parsed AS (
        SELECT regexp_extract(dur_str, '^([0-9]+(?:\\.[0-9]+)?)', 1) AS mag,
               regexp_extract(dur_str, '([a-zµ]*)$', 1)              AS unit,
               dur_str
        FROM durs
    )
    SELECT unit,
           count(*) AS n,
           round(sum(CASE WHEN mag || unit = dur_str AND mag <> ''
                          THEN CAST(mag AS DOUBLE) *
                               CASE unit WHEN 's' THEN 1.0 WHEN 'ms' THEN 0.001
                                         WHEN 'µs' THEN 0.000001
                                         WHEN 'm' THEN 60.0 WHEN 'h' THEN 3600.0
                               END
                     END), 4) AS total_seconds,
           count(CASE WHEN mag || unit = dur_str AND mag <> ''
                      THEN 1 END) AS n_parsed
    FROM parsed
    GROUP BY unit
    """,
)
def duration_parse_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip exercise of the Trino-duration parser over a generated
    duration-string column (reference ``make_lakehouse_workload_logs.sh:24-44``).
    Negative magnitudes deliberately fail to parse (NULL), matching the jq
    parser's ^[0-9]-anchored regexes."""
    ev = load_table(spark, sf_dir, "events")
    units = F.array(*[F.lit(u) for u in ("s", "ms", "µs", "m", "h")])
    durs = ev.select(
        F.concat(
            F.format_string("%.3f", "value"),
            F.element_at(units, (F.pmod("event_id", F.lit(5)) + 1).cast("int")),
        ).alias("dur_str")
    )
    parsed = durs.select(
        F.regexp_extract("dur_str", _UNIT_RE, 1).alias("unit"),
        duration_to_seconds(F.col("dur_str")).alias("seconds"),
    )
    return parsed.groupBy("unit").agg(
        F.count("*").alias("n"),
        F.round(F.sum("seconds"), 4).alias("total_seconds"),
        F.count("seconds").alias("n_parsed"),
    )
