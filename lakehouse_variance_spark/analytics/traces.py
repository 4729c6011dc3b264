"""Workload-trace analytics: the reference's variance statistics as DataFrame ops.

Re-implements the analytical core of the reference's ``traces/tools/helpers.py``
Spark-first:

* ``load_workload_logs``    — NDJSON run logs → one tidy DataFrame
  (semantics of ``helpers.py:97-169`` ``load_trino_times``: tag each file with
  its run number, normalize ``"q96"`` → 96, coerce negative metrics to NULL).
* ``summarize_single_config`` — the paper's Table-1 row: per-run mean runtimes
  (Avg/Std/P50/P99) and per-query repeatability (Std and CV%, each
  Avg/P50/P99), with the reference's exact edge rule that a per-query std is
  only defined when the query has exactly 5 runtime samples
  (``helpers.py:40-70``, std lambda at ``:55``).
* ``compare_config_deltas`` — percentage deltas of mean runtime and CV stats
  between a baseline and a variant config (``helpers.py:198-228``).

Everything is groupBy/agg/percentile — two rounds of hash aggregation and one
single-row cross join; no driver-side loops, so the same code summarizes a
5-run paper trace or a 100 TB fleet-wide query log. Percentiles use Spark's
exact ``percentile`` (linear interpolation, the same estimator as
``np.percentile`` used by the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table

METRIC_COLUMNS = (
    "runtime_s",
    "elapsed_s",
    "execution_s",
    "planning_s",
    "resource_waiting_s",
)

def load_workload_logs(
    spark: SparkSession, path: str, tag: str = "BASE"
) -> DataFrame:
    """Read ``Workload_log_<tag>_<run>.ndjson`` files under ``path``.

    Distributed equivalent of reference ``helpers.py:97-169``: the run tag
    comes from the file name (via ``input_file_name`` — no driver-side
    listing, so a 1000-run log directory loads in parallel), query ids
    normalize ``"q96"``/``96`` → ``"96"`` (any other id is kept verbatim
    as a string so distinct ids never collide), and negative metric
    values (the
    reference's failure sentinel ``-1``, ``run_workload.py:62-64``) become
    NULL before any statistics.

    ``tag`` defaults to ``BASE`` (the reference loader's hardcoded match,
    ``helpers.py:93``) but is parameterized because the reference's own
    study_2 artifacts use per-config tags (``Workload_log_LOAD_2.ndjson``,
    ``…_LOCAL_…``, ``…_WARM_…``) that the published helper cannot load.
    """
    run_file_re = rf"Workload_log_{tag}_(\d+)\.ndjson"
    df = spark.read.json(f"{path}/Workload_log_{tag}_*.ndjson")
    if "Runtime (s)" in df.columns:
        df = df.withColumnRenamed("Runtime (s)", "runtime_s")
    df = df.withColumn(
        "run",
        F.concat(
            F.lit("Run "),
            F.regexp_extract(F.input_file_name(), run_file_re, 1),
        ),
    ).withColumn(
        "query_id",
        # Canonical STRING key: the reference's "q96"/96 forms normalize
        # to "96" (helpers.py compat); any other id — this engine's
        # battery names ("tpcds_q96"), multi-number ids ("ssb_q1_1") —
        # is kept verbatim, so distinct raw ids can NEVER merge.  (The
        # previous trailing-digits int extraction collided "ssb_q1_1"
        # with "ssb_q2_1" → 1, silently pooling their statistics.)
        F.when(
            F.col("query_id").cast("string").rlike(r"^q?\d+$"),
            F.regexp_extract(
                F.col("query_id").cast("string"), r"^q?(\d+)$", 1
            ),
        ).otherwise(F.col("query_id").cast("string")),
    )
    for col in METRIC_COLUMNS:
        if col in df.columns:
            cleaned = F.col(col).cast("double")
            df = df.withColumn(col, F.when(cleaned >= 0, cleaned))
    return df


def summarize_single_config(
    log: DataFrame,
    *,
    runtime_col: str = "runtime_s",
    run_col: str = "run",
    query_col: str = "query_id",
    required_samples: int = 5,
) -> DataFrame:
    """One-row variance summary of a workload log (reference ``helpers.py:10-90``).

    Columns (snake_case versions of the paper's Table-1 headers):
    ``mean_runtime_{avg,std,p50,p99}_s`` over per-run mean runtimes,
    ``std_{avg,p50,p99}_s`` and ``cv_{avg,p50,p99}_pct`` over per-query
    repeatability, plus ``runs`` and ``queries`` counts. Per-query std is NULL
    (and the query excluded) unless it has exactly ``required_samples``
    non-null runtimes — the reference's Bessel-at-n=5 rule (``helpers.py:55``).
    """
    rt = F.col(runtime_col)
    sub = log.filter(rt.isNotNull())

    per_run = sub.groupBy(run_col).agg(F.avg(rt).alias("run_mean"))
    across_runs = per_run.agg(
        F.avg("run_mean").alias("mean_runtime_avg_s"),
        F.stddev_samp("run_mean").alias("mean_runtime_std_s"),
        F.percentile("run_mean", F.lit(0.5)).alias("mean_runtime_p50_s"),
        F.percentile("run_mean", F.lit(0.99)).alias("mean_runtime_p99_s"),
        F.count("*").alias("runs"),
    )

    per_query = (
        sub.groupBy(query_col)
        .agg(
            F.avg(rt).alias("q_mean"),
            F.when(
                F.count(rt) == required_samples, F.stddev_samp(rt)
            ).alias("q_std"),
        )
        .filter(F.col("q_std").isNotNull())
        .withColumn("q_cv", 100.0 * F.col("q_std") / F.col("q_mean"))
    )
    across_queries = per_query.agg(
        F.avg("q_std").alias("std_avg_s"),
        F.percentile("q_std", F.lit(0.5)).alias("std_p50_s"),
        F.percentile("q_std", F.lit(0.99)).alias("std_p99_s"),
        F.avg("q_cv").alias("cv_avg_pct"),
        F.percentile("q_cv", F.lit(0.5)).alias("cv_p50_pct"),
        F.percentile("q_cv", F.lit(0.99)).alias("cv_p99_pct"),
        F.count("*").alias("queries"),
    )

    return across_runs.crossJoin(across_queries)


def compare_config_deltas(baseline: DataFrame, variant: DataFrame) -> DataFrame:
    """Variant summary row + percentage deltas vs baseline
    (reference ``helpers.py:198-228``): Δ of mean runtime and of the CV
    Avg/P50/P99 stats, each as ``100 * (variant - baseline) / baseline``.
    Both inputs are single-row ``summarize_single_config`` outputs; the join
    is a broadcast cross join of two 1-row frames.
    """
    base = baseline.select(
        *[F.col(c).alias(f"base_{c}") for c in baseline.columns]
    )

    def delta(col: str) -> F.Column:
        return 100.0 * (F.col(col) - F.col(f"base_{col}")) / F.col(f"base_{col}")

    return variant.crossJoin(F.broadcast(base)).select(
        *variant.columns,
        delta("mean_runtime_avg_s").alias("delta_mean_runtime_pct"),
        delta("cv_avg_pct").alias("delta_cv_avg_pct"),
        delta("cv_p50_pct").alias("delta_cv_p50_pct"),
        delta("cv_p99_pct").alias("delta_cv_p99_pct"),
    )


# ---------------------------------------------------------------------------
# Registered oracle-checked queries. The synthetic `events` table stands in
# for a trace log: run := event_id mod 5 (5 workload runs), query := user_id,
# runtime := mean event value per (run, query) — the same (5 runs × N queries)
# shape as the reference's Study-1 traces.
# ---------------------------------------------------------------------------


def _event_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.concat(F.lit("Run "), (F.pmod("event_id", F.lit(5)) + 1)).alias("run"),
            F.col("user_id").alias("query_id"),
        )
        .agg(F.avg("value").alias("runtime_s"))
    )


_EVENT_LOG_SQL = """
        SELECT concat('Run ', CAST((event_id % 5) + 1 AS VARCHAR)) AS run,
               user_id AS query_id,
               avg(value) AS runtime_s
        FROM events
        GROUP BY 1, 2
"""

_SUMMARY_SQL = """
    per_run AS (
        SELECT run, avg(runtime_s) AS run_mean FROM log GROUP BY run
    ),
    across_runs AS (
        SELECT avg(run_mean)                 AS mean_runtime_avg_s,
               stddev_samp(run_mean)         AS mean_runtime_std_s,
               quantile_cont(run_mean, 0.5)  AS mean_runtime_p50_s,
               quantile_cont(run_mean, 0.99) AS mean_runtime_p99_s,
               count(*)                      AS runs
        FROM per_run
    ),
    per_query AS (
        SELECT query_id,
               avg(runtime_s) AS q_mean,
               CASE WHEN count(runtime_s) = 5
                    THEN stddev_samp(runtime_s) END AS q_std
        FROM log
        GROUP BY query_id
    ),
    per_query_cv AS (
        SELECT q_std, 100.0 * q_std / q_mean AS q_cv
        FROM per_query WHERE q_std IS NOT NULL
    ),
    across_queries AS (
        SELECT avg(q_std)                 AS std_avg_s,
               quantile_cont(q_std, 0.5)  AS std_p50_s,
               quantile_cont(q_std, 0.99) AS std_p99_s,
               avg(q_cv)                  AS cv_avg_pct,
               quantile_cont(q_cv, 0.5)   AS cv_p50_pct,
               quantile_cont(q_cv, 0.99)  AS cv_p99_pct,
               count(*)                   AS queries
        FROM per_query_cv
    )
"""

_ROUNDED_SUMMARY = """
    SELECT round(mean_runtime_avg_s, 4) AS mean_runtime_avg_s,
           round(mean_runtime_std_s, 4) AS mean_runtime_std_s,
           round(mean_runtime_p50_s, 4) AS mean_runtime_p50_s,
           round(mean_runtime_p99_s, 4) AS mean_runtime_p99_s,
           round(std_avg_s, 4)          AS std_avg_s,
           round(std_p50_s, 4)          AS std_p50_s,
           round(std_p99_s, 4)          AS std_p99_s,
           round(cv_avg_pct, 4)         AS cv_avg_pct,
           round(cv_p50_pct, 4)         AS cv_p50_pct,
           round(cv_p99_pct, 4)         AS cv_p99_pct,
           runs, queries
    FROM across_runs CROSS JOIN across_queries
"""


def _round4(df: DataFrame, skip: tuple[str, ...] = ("runs", "queries")) -> DataFrame:
    return df.select(
        *[
            F.col(c) if c in skip else F.round(F.col(c), 4).alias(c)
            for c in df.columns
        ]
    )


@register(
    "trace_workload_summary",
    oracle=f"WITH log AS ({_EVENT_LOG_SQL}),{_SUMMARY_SQL}{_ROUNDED_SUMMARY}",
)
def trace_workload_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paper's core analytical query (Table 1): runtime-variance summary
    of a 5-run workload log (reference ``helpers.py:10-90`` + notebook
    ``traces/table_1.ipynb``). Two hash-aggregation pyramids (runs, queries)
    joined as single rows — shuffle volume is |runs| + |queries| regardless
    of log size."""
    return _round4(summarize_single_config(_event_log(spark, sf_dir)))


@register(
    "trace_variance_decomposition",
    oracle=f"""
    WITH log AS ({_EVENT_LOG_SQL}),
    grand AS (
        SELECT avg(runtime_s) AS gm, count(*) AS n FROM log),
    per_run AS (
        SELECT run,
               count(*) AS n_g,
               avg(runtime_s) AS mean_g,
               var_samp(runtime_s) AS var_g
        FROM log GROUP BY run),
    parts AS (
        SELECT sum(n_g * (mean_g - gm) * (mean_g - gm)) AS ss_between,
               sum((n_g - 1) * var_g)                   AS ss_within,
               count(*)                                 AS k,
               max(n)                                   AS n
        FROM per_run CROSS JOIN grand)
    SELECT round(ss_between, 4)                             AS ss_between,
           round(ss_within, 4)                              AS ss_within,
           round(ss_between + ss_within, 4)                 AS ss_total,
           CAST(k - 1 AS BIGINT)                            AS df_between,
           CAST(n - k AS BIGINT)                            AS df_within,
           round((ss_between / (k - 1))
                 / (ss_within / (n - k)), 4)                AS f_stat,
           round(ss_between / (ss_between + ss_within), 6)  AS eta_sq
    FROM parts
    """,
)
def trace_variance_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA decomposition of query runtimes by run — the
    between-run vs within-run split behind the paper's variance question
    ("how much of runtime variance is the platform's day-to-day noise?").
    Reports sums of squares, degrees of freedom, the F statistic, and the
    variance fraction explained by run identity (eta-squared).

    Scale: one groupBy(run) over the log (map-side partial mean/var), one
    scalar grand-mean aggregate, and a |runs|-row reduction — shuffle
    volume is |runs| rows regardless of log size.
    """
    log = _event_log(spark, sf_dir)
    grand = log.agg(
        F.avg("runtime_s").alias("gm"), F.count("*").alias("n")
    )
    per_run = log.groupBy("run").agg(
        F.count("*").alias("n_g"),
        F.avg("runtime_s").alias("mean_g"),
        F.var_samp("runtime_s").alias("var_g"),
    )
    dev = F.col("mean_g") - F.col("gm")
    parts = per_run.crossJoin(F.broadcast(grand)).agg(
        F.sum(F.col("n_g") * dev * dev).alias("ss_between"),
        F.sum((F.col("n_g") - 1) * F.col("var_g")).alias("ss_within"),
        F.count("*").alias("k"),
        F.max("n").alias("n"),
    )
    ssb, ssw = F.col("ss_between"), F.col("ss_within")
    k, n = F.col("k"), F.col("n")
    return parts.select(
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round(ssb + ssw, 4).alias("ss_total"),
        (k - 1).cast("bigint").alias("df_between"),
        (n - k).cast("bigint").alias("df_within"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 4).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 6).alias("eta_sq"),
    )


@register(
    "trace_config_delta",
    oracle=f"""
    WITH base_log AS (
        SELECT * FROM ({_EVENT_LOG_SQL}) WHERE query_id % 2 = 0
    ),
    var_log AS (
        SELECT * FROM ({_EVENT_LOG_SQL}) WHERE query_id % 2 = 1
    ),
    base AS (
        WITH log AS (SELECT * FROM base_log),{_SUMMARY_SQL}
        SELECT * FROM across_runs CROSS JOIN across_queries
    ),
    var AS (
        WITH log AS (SELECT * FROM var_log),{_SUMMARY_SQL}
        SELECT * FROM across_runs CROSS JOIN across_queries
    )
    SELECT round(var.mean_runtime_avg_s, 4) AS mean_runtime_avg_s,
           round(var.cv_avg_pct, 4)         AS cv_avg_pct,
           round(100.0 * (var.mean_runtime_avg_s - base.mean_runtime_avg_s)
                 / base.mean_runtime_avg_s, 4) AS delta_mean_runtime_pct,
           round(100.0 * (var.cv_avg_pct - base.cv_avg_pct)
                 / base.cv_avg_pct, 4)         AS delta_cv_avg_pct,
           round(100.0 * (var.cv_p50_pct - base.cv_p50_pct)
                 / base.cv_p50_pct, 4)         AS delta_cv_p50_pct,
           round(100.0 * (var.cv_p99_pct - base.cv_p99_pct)
                 / base.cv_p99_pct, 4)         AS delta_cv_p99_pct
    FROM var CROSS JOIN base
    """,
)
def trace_config_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-vs-config delta analysis (reference ``helpers.py:198-228``,
    Table 2): split the log into a baseline and a variant config and report
    the variant's stats plus percentage deltas."""
    log = _event_log(spark, sf_dir)
    base = summarize_single_config(log.filter(F.col("query_id") % 2 == 0))
    variant = summarize_single_config(log.filter(F.col("query_id") % 2 == 1))
    out = compare_config_deltas(base, variant)
    return _round4(
        out.select(
            "mean_runtime_avg_s",
            "cv_avg_pct",
            "delta_mean_runtime_pct",
            "delta_cv_avg_pct",
            "delta_cv_p50_pct",
            "delta_cv_p99_pct",
        )
    )


# ---------------------------------------------------------------------------
# Query-info flattener (EP3 step 2)
# ---------------------------------------------------------------------------


def flatten_query_info(docs: DataFrame, doc_col: str = "doc") -> DataFrame:
    """Nested Trino query-info documents → one workload-log row per query
    (reference ``make_lakehouse_workload_logs.sh:85-104``): pull
    ``queryStats.{elapsedTime, executionTime, analysisTime,
    resourceWaitingTime}``, convert Trino duration strings to float seconds,
    and normalize ``"q96"``-style ids to integers.

    JSON-path extraction + the duration parse are all JVM column
    expressions — flattening a 100 TB trace archive is one narrow scan."""
    from lakehouse_variance_spark.functions.durations import duration_to_seconds

    def stat(field: str) -> F.Column:
        return duration_to_seconds(
            F.get_json_object(F.col(doc_col), f"$.queryStats.{field}")
        )

    qid = F.regexp_extract(
        F.get_json_object(F.col(doc_col), "$.queryId"), r"q?(\d+)", 1
    ).cast("bigint")
    return docs.select(
        qid.alias("query_id"),
        F.round(stat("elapsedTime"), 6).alias("elapsed_s"),
        F.round(stat("executionTime"), 6).alias("execution_s"),
        F.round(stat("analysisTime"), 6).alias("planning_s"),
        F.round(stat("resourceWaitingTime"), 6).alias("resource_waiting_s"),
    )


@register(
    "trace_flatten_query_info",
    oracle="""
    WITH stats AS (
        SELECT event_id,
               CAST(printf('%.3f', value) AS DOUBLE) AS elapsed_mag,
               (['ms', 's', 'm'])[CAST(event_id % 3 AS INT) + 1] AS elapsed_unit,
               CAST(printf('%.3f', value * 0.8) AS DOUBLE) AS exec_mag,
               CAST(printf('%.1f', value * 10) AS DOUBLE) AS plan_mag,
               CAST(printf('%.2f', value * 5) AS DOUBLE) AS wait_mag
        FROM events
    )
    SELECT event_id AS query_id,
           round(elapsed_mag * CASE elapsed_unit WHEN 'ms' THEN 0.001
                                                 WHEN 's' THEN 1.0
                                                 ELSE 60.0 END, 6) AS elapsed_s,
           round(exec_mag, 6)          AS execution_s,
           round(plan_mag * 0.001, 6)  AS planning_s,
           round(wait_mag * 0.001, 6)  AS resource_waiting_s
    FROM stats
    """,
)
def trace_flatten_query_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flattening demo on synthesized query-info docs: each event becomes a
    nested JSON document whose queryStats carry Trino duration strings in
    mixed units; the flattener must recover the exact printed magnitudes
    (the oracle skips the string roundtrip — printf-then-CAST yields the
    identical rounded value — so any parser drift fails the hash)."""
    ev = load_table(spark, sf_dir, "events")
    # Format widths are chosen so printf never has to round (value carries
    # exactly 2 decimals, so value*0.8 has <=3 and value*5 has <=2): Java's
    # format_string rounds HALF_UP while C printf rounds half-even, and an
    # exact .5 boundary would diverge between the engines.
    unit = F.element_at(
        F.array(F.lit("ms"), F.lit("s"), F.lit("m")),
        (F.pmod("event_id", F.lit(3)) + 1).cast("int"),
    )
    doc = F.concat(
        F.lit('{"queryId": "q'),
        F.col("event_id").cast("string"),
        F.lit('", "queryStats": {"elapsedTime": "'),
        F.format_string("%.3f", F.col("value")),
        unit,
        F.lit('", "executionTime": "'),
        F.format_string("%.3f", F.col("value") * 0.8),
        F.lit('s", "analysisTime": "'),
        F.format_string("%.1f", F.col("value") * 10),
        F.lit('ms", "resourceWaitingTime": "'),
        F.format_string("%.2f", F.col("value") * 5),
        F.lit('ms"}}'),
    )
    return flatten_query_info(ev.select(doc.alias("doc")))


@register(
    "pandas_mad_per_type",
    oracle="""
    WITH med AS (
        SELECT event_type, median(value) AS med_value
        FROM events GROUP BY event_type)
    SELECT e.event_type,
           count(*) AS n,
           round(any_value(m.med_value), 4) AS median_value,
           round(median(abs(e.value - m.med_value)), 4) AS mad_value
    FROM events e JOIN med m USING (event_type)
    GROUP BY e.event_type
    """,
)
def pandas_mad_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust variance statistic (median absolute deviation) per event type
    via grouped ``applyInPandas`` — the batch Pandas-UDAF operator class:
    whole-group Arrow batches feed a vectorized pandas/NumPy function, for
    statistics that need the full group in memory (order statistics of
    derived quantities, which no built-in aggregate composes).

    Scale shape: one shuffle on the group key, like any aggregate; the
    constraint is max-single-group size fitting one task (fine for
    |event types|; for high-cardinality keys use the built-in
    percentile_approx path instead). Rounding is safe here: medians of
    2-decimal values are multiples of 0.005 = even multiples of the
    0.00005 rounding boundary, never on it."""
    import pandas as pd

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf["value"].median()
        return pd.DataFrame(
            [
                {
                    "event_type": pdf["event_type"].iloc[0],
                    "n": len(pdf),
                    "median_value": round(med, 4),
                    "mad_value": round((pdf["value"] - med).abs().median(), 4),
                }
            ]
        )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        mad, "event_type string, n bigint, median_value double, mad_value double"
    )


# Regression threshold: flag queries whose recent-run mean runtime exceeds
# 1.2x the early-run mean (the drift signal a per-config variance monitor
# raises before a full re-benchmark).
REGRESSION_FACTOR = 1.2


@register(
    "trace_regression_flags",
    oracle=f"""
    WITH per_q AS (
        SELECT user_id AS query_id,
               CAST(sum(CASE WHEN (event_id % 5) + 1 <= 2
                    THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
                   AS base_runtime_c,
               CAST(sum(CASE WHEN (event_id % 5) + 1 <= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS base_n,
               CAST(sum(CASE WHEN (event_id % 5) + 1 >= 4
                    THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
                   AS curr_runtime_c,
               CAST(sum(CASE WHEN (event_id % 5) + 1 >= 4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS curr_n
        FROM events
        GROUP BY user_id)
    SELECT query_id, base_runtime_c, base_n, curr_runtime_c, curr_n,
           CAST(CAST(curr_runtime_c AS DOUBLE) / CAST(curr_n AS DOUBLE)
                > {REGRESSION_FACTOR}
                  * (CAST(base_runtime_c AS DOUBLE) / CAST(base_n AS DOUBLE))
                AS INTEGER) AS regressed
    FROM per_q
    WHERE base_n > 0 AND curr_n > 0
    """,
)
def trace_regression_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query runtime-regression detector over the synthetic trace log:
    the pooled mean runtime of the two most recent runs compared against
    the two earliest runs, flagged when it exceeds {REGRESSION_FACTOR}x —
    the drift monitor a variance-tracking benchmark harness runs between
    full re-benchmarks (the reference's Study-2 config deltas,
    `traces/tools/helpers.py:198-228`, are the one-shot form of this).

    Determinism: runtimes accumulate as exact integer cents with exact
    counts; the threshold compare divides exact int64s to double (correctly
    rounded, identical on both engines) — one pass, no per-(run, query)
    intermediate."""
    ev = load_table(spark, sf_dir, "events")
    run = F.pmod("event_id", F.lit(5)) + 1
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_q = ev.groupBy(F.col("user_id").alias("query_id")).agg(
        F.sum(F.when(run <= 2, cents)).alias("base_runtime_c"),
        F.sum(F.when(run <= 2, 1).otherwise(0)).cast("bigint").alias("base_n"),
        F.sum(F.when(run >= 4, cents)).alias("curr_runtime_c"),
        F.sum(F.when(run >= 4, 1).otherwise(0)).cast("bigint").alias("curr_n"),
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n).cast("double")  # noqa: E731
    return per_q.filter((F.col("base_n") > 0) & (F.col("curr_n") > 0)).select(
        "query_id",
        "base_runtime_c",
        "base_n",
        "curr_runtime_c",
        "curr_n",
        (
            mean("curr_runtime_c", "curr_n")
            > REGRESSION_FACTOR * mean("base_runtime_c", "base_n")
        )
        .cast("int")
        .alias("regressed"),
    )


@register(
    "trace_runtime_trend",
    oracle="""
    WITH m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(hour(ts)) AS BIGINT) AS sx,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sy,
               CAST(sum(hour(ts) * hour(ts)) AS BIGINT) AS sxx,
               CAST(sum(hour(ts) * CAST(round(value * 100) AS BIGINT))
                    AS BIGINT) AS sxy
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type)
    SELECT event_type, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               AS slope_cents_per_hour
    FROM m
    """,
)
def trace_runtime_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS slope of value vs hour-of-day — the time-of-day trend
    the reference's variance study chases across cloud co-tenancy (daily
    load cycles are its co-tenant-noise hypothesis).

    NOT ``regr_slope``: that aggregate accumulates double co-moments whose
    cross-partition addition order varies run to run. The slope here comes
    from EXACT integer moments (n, Σx, Σy, Σx², Σxy; x = hour 0-23,
    y = cents) folded in one partial-aggregating scan, then a single
    double expression — order-free and bit-identical on both engines.
    Numerator/denominator multiply as doubles of exact int64s (each
    conversion exact below 2^53) — never bigint*bigint, which ANSI mode
    would overflow at trace scale."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    x = F.hour("ts").cast("bigint")
    y = F.round(F.col("value") * 100).cast("bigint")
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    return m.select("event_type", "n", slope.alias("slope_cents_per_hour"))
