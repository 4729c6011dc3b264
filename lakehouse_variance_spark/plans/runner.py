"""Benchmark query runner: sorted SQL loading, timed execution, NDJSON logs.

Spark-native re-expression of the reference's workload client
(``docker/trino-client/src/run_workload.py``):

* ``load_queries_from_directory`` — sorted ``q*.sql`` glob → (name, sql)
  pairs (``run_workload.py:26-30``; sorted iteration is the reference's
  determinism convention).
* ``run_query`` — execute one statement, fully drain the result, record
  wall-clock + phase times and UTC start/end stamps; failures return the
  reference's ``-1`` sentinel record instead of raising
  (``run_workload.py:32-64``).
* ``run_workload`` — loop a query list, write ``Workload_log_BASE_<n>.ndjson``
  (``run_workload.py:66-80``) in the exact shape the trace analytics load
  (``analytics.traces.load_workload_logs``).

Phase semantics mirror the Trino fields the reference scrapes
(``make_lakehouse_workload_logs.sh:91-95``): ``planning_s`` is Catalyst
analysis+optimization+physical planning (forcing ``executedPlan``),
``execution_s`` is the job run draining to a noop sink, ``elapsed_s`` the sum.
Spark has no separate queueing stage locally, so ``resource_waiting_s`` is 0.
"""

from __future__ import annotations

import itertools
import json
import os
import time
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession

SENTINEL = -1  # reference run_workload.py:62-64 failure marker


def load_queries_from_directory(directory: str | Path) -> list[tuple[str, str]]:
    """Sorted ``q*.sql`` files → [(stem, sql)] (reference ``run_workload.py:26-30``)."""
    return [
        (p.stem, p.read_text().strip())
        for p in sorted(Path(directory).glob("q*.sql"))
    ]


def _utc_now() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def run_query(
    spark: SparkSession,
    name: str,
    sql: str,
    timeout_s: float | None = None,
) -> dict[str, Any]:
    """Execute one SQL statement, drain it, and return a log record
    (semantics of reference ``run_workload.py:32-64``).

    Draining uses the ``noop`` DSv2 sink: every result row is produced by the
    executors and discarded, the distributed analogue of the reference's
    ``for _ in cursor: pass``, without funnelling rows to the driver.

    ``timeout_s`` enforces the reference's per-query kill budget
    (``docker/trino-client/src/config.py:6`` — 5 minutes): the query runs
    under its own job group and a daemon watchdog cancels the group when
    the budget expires, so a hung query yields the ``-1`` sentinel record
    (the reference's SF_1000 logs show 93-98/99 queries completing — the
    rest are exactly these sentinel rows) instead of stalling the run.
    """
    import threading

    start_stamp = _utc_now()
    t0 = time.perf_counter()
    sc = spark.sparkContext
    done = threading.Event()
    expired = threading.Event()
    group: str | None = None
    try:
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        df = spark.sql(sql)
        # Observed metrics ride the SAME job as the drain (accumulator
        # semantics) — per-query row accounting with NO second scan, the
        # only affordable way to log output cardinality at 100 TB.
        obs = Observation(f"lvs-{name}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows_out"))
        # Forcing the executed plan materializes analysis + optimization +
        # physical planning without running a job.
        df._jdf.queryExecution().executedPlan()
        t_planned = time.perf_counter()
        if timeout_s is not None:
            group = f"lvs-timeout-{name}-{start_stamp}"
            sc.setJobGroup(group, name, interruptOnCancel=True)

            # cancelJobGroup only hits jobs active at call time; an AQE
            # query is a SEQUENCE of jobs, so a single fire can land in a
            # gap between job submissions (or during planning) and miss.
            # Re-cancel in a loop until the query thread reports done —
            # that makes timeout_s a hard budget, not a one-shot signal.
            def _watch(grp: str = group) -> None:
                if done.wait(timeout_s):
                    return
                expired.set()
                while not done.is_set():
                    try:
                        sc.cancelJobGroup(grp)
                    except Exception:  # noqa: BLE001 — sc may be stopping
                        return
                    done.wait(1.0)

            threading.Thread(target=_watch, daemon=True).start()
        df.write.format("noop").mode("overwrite").save()
        if expired.is_set():
            # The cancel loop fired but the final job slipped through
            # (e.g. budget expired exactly between jobs): the budget is
            # still blown, so honor the reference's kill semantics.
            raise TimeoutError(
                f"query exceeded timeout_s={timeout_s} (cancel missed)"
            )
        t1 = time.perf_counter()
        try:
            rows_out = int(obs.get["rows_out"])
        except Exception:  # noqa: BLE001 — metrics must never fail a run
            rows_out = -1
        return {
            "query_id": name,
            "start_time": start_stamp,
            "end_time": _utc_now(),
            "Runtime (s)": t1 - t0,
            "elapsed_s": t1 - t0,
            "planning_s": t_planned - t0,
            "execution_s": t1 - t_planned,
            "resource_waiting_s": 0.0,
            "rows_out": rows_out,
        }
    except Exception as exc:  # noqa: BLE001 — sentinel instead of abort
        return {
            "query_id": name,
            "start_time": SENTINEL,
            "end_time": SENTINEL,
            "Runtime (s)": SENTINEL,
            "elapsed_s": SENTINEL,
            "planning_s": SENTINEL,
            "execution_s": SENTINEL,
            "resource_waiting_s": SENTINEL,
            "error": str(exc).split("\n", 1)[0][:500],
        }
    finally:
        done.set()
        if group is not None:
            sc.setJobGroup("", "")


def join_url(prefix: str, *parts: str) -> str:
    """Object-store URL join (reference ``run_workload.py:14-18``):
    right-strip the prefix, strip each part, single-``/`` join."""
    prefix = prefix.rstrip("/")
    tail = "/".join(p.strip("/\\") for p in parts if p)
    return f"{prefix}/{tail}" if tail else prefix


def upload_file(spark: SparkSession, local_path: str | Path, remote_url: str) -> None:
    """Copy a local file to an object-store / filesystem URI — the
    Spark-native equivalent of the reference's fsspec upload
    (``run_workload.py:19-24``): Hadoop's ``FileSystem.get(uri)`` resolves
    the scheme (``file://``, ``hdfs://``, and — with the standard cloud
    connectors on the cluster classpath — ``s3a://``, ``abfss://``,
    ``gs://``) and streams the copy; an unknown scheme raises rather than
    silently writing nowhere."""
    sc = spark.sparkContext
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    dst = jvm.org.apache.hadoop.fs.Path(remote_url)
    fs = dst.getFileSystem(hconf)
    parent = dst.getParent()
    if parent is not None:
        fs.mkdirs(parent)
    src = jvm.org.apache.hadoop.fs.Path(str(local_path))
    # delSrc=False, overwrite=True — reruns replace the attempt's log
    fs.copyFromLocalFile(False, True, src, dst)


def _is_remote_url(target: str | Path) -> bool:
    return isinstance(target, str) and "://" in target


def run_workload(
    spark: SparkSession,
    queries: list[tuple[str, str]],
    log_dir: str | Path | None = None,
    attempt: int = 1,
    timeout_s: float | None = None,
    resume: bool = False,
) -> list[dict[str, Any]]:
    """Run a query list sequentially and optionally write the NDJSON run log
    (reference ``run_workload.py:66-80``). The log file name matches the
    ``Workload_log_BASE_<attempt>.ndjson`` pattern the trace loader globs.

    Local log files are written INCREMENTALLY — one flushed line per
    completed query — so a multi-thousand-text bulk run killed mid-way
    keeps everything finished so far, and ``resume=True`` re-runs only
    what's missing: query ids already in the log with a non-sentinel
    runtime are skipped; failed (sentinel) entries are retried, their new
    record appended (the trace loader NULLs sentinel rows before any
    statistics, so the duplicate id is harmless by construction).

    ``log_dir`` accepts a local path OR any Hadoop-FS URI prefix (the
    reference's ``--results_path s3://... | abfss://... | gs://...``
    contract): URI targets are staged to a local temp file and uploaded
    whole via ``upload_file`` exactly like the reference's fsspec path
    (object stores have no cheap append, so no streaming/resume there)."""
    fname = f"Workload_log_BASE_{attempt}.ndjson"
    records: list[dict[str, Any]] = []
    done_ids: set[Any] = set()
    fh = None
    if log_dir is not None and not _is_remote_url(log_dir):
        d = Path(log_dir)
        d.mkdir(parents=True, exist_ok=True)
        local_path = d / fname
        if resume and local_path.exists():
            for line in local_path.read_text(encoding="utf-8").splitlines():
                if not line.strip():
                    continue
                rec = json.loads(line)
                records.append(rec)
                if rec.get("Runtime (s)", SENTINEL) != SENTINEL:
                    done_ids.add(rec["query_id"])
        fh = local_path.open("a" if resume else "w", encoding="utf-8")
    try:
        for name, sql in queries:
            if name in done_ids:
                continue
            rec = run_query(spark, name, sql, timeout_s=timeout_s)
            records.append(rec)
            if fh is not None:
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
    finally:
        if fh is not None:
            fh.close()
    if log_dir is not None and _is_remote_url(log_dir):
        import tempfile

        payload = "".join(json.dumps(rec) + "\n" for rec in records)
        with tempfile.NamedTemporaryFile(
            "w", suffix=".ndjson", delete=False, encoding="utf-8"
        ) as tmp:
            tmp.write(payload)
            staged = tmp.name
        try:
            upload_file(spark, staged, join_url(str(log_dir), fname))
        finally:
            os.unlink(staged)
    # Resume retries append a NEW record for a query whose sentinel record
    # was already loaded from the log; returning both would double-count the
    # id in any len()/sum() over the result (ADVICE r7). Keep the LATEST
    # record per query_id (the NDJSON log keeps the full history; the trace
    # loader NULLs sentinel rows there before statistics).
    latest: dict[Any, dict[str, Any]] = {r["query_id"]: r for r in records}
    return [latest[r["query_id"]] for r in records
            if latest[r["query_id"]] is r]


def run_workload_concurrent(
    spark: SparkSession,
    queries: list[tuple[str, str]],
    streams: int = 4,
    log_dir: str | Path | None = None,
) -> list[dict[str, Any]]:
    """Run ``streams`` copies of the query list CONCURRENTLY in one session
    — the multi-tenant load pattern whose runtime variance the reference
    paper measures (its co-tenant-load factor, ``traces/study_2/*/
    Increased co-tenant load``). Each stream is a thread submitting jobs
    into its own scheduler pool; Spark interleaves their stages across the
    executor cores (under FAIR scheduling each pool gets an equal share;
    under FIFO, later jobs fill whatever slots earlier stages leave free).

    Per-stream logs are written as ``Workload_log_BASE_<stream>.ndjson`` —
    the exact multi-run layout the trace analytics load, so
    ``summarize_single_config`` computes cross-stream variance directly.

    Threads use ``pyspark.InheritableThread`` so local properties (the
    pool tag) propagate correctly under py4j pinned-thread mode.
    """
    from pyspark import InheritableThread

    records: list[list[dict[str, Any]]] = [[] for _ in range(streams)]
    failures: list[tuple[int, BaseException]] = []

    def one_stream(i: int) -> None:
        # run_query sentinels per-QUERY failures; anything escaping it is a
        # harness-level error that must propagate, not die in the thread's
        # excepthook leaving a silently empty stream log.
        try:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"stream-{i}"
            )
            records[i - 1] = [
                dict(run_query(spark, name, sql), stream=i)
                for name, sql in queries
            ]
        except BaseException as exc:  # noqa: BLE001 — re-raised after join
            failures.append((i, exc))

    threads = [
        InheritableThread(target=one_stream, args=(i,))
        for i in range(1, streams + 1)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if failures:
        stream_ids = ", ".join(str(i) for i, _ in failures)
        raise RuntimeError(
            f"concurrent workload stream(s) {stream_ids} failed"
        ) from failures[0][1]
    if log_dir is not None:
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        for i, recs in enumerate(records, start=1):
            path = log_dir / f"Workload_log_BASE_{i}.ndjson"
            with path.open("w", encoding="utf-8") as f:
                for rec in recs:
                    f.write(json.dumps(rec) + "\n")
    return [rec for stream in records for rec in stream]


# ---------------------------------------------------------------------------
# Verbatim SQL-string execution (the reference's primary mode)
# ---------------------------------------------------------------------------

_SQL_TEXT_EXISTS_INTERVAL = """
WITH shipped AS (
    SELECT l_orderkey, min(l_shipdate) AS first_ship
    FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderpriority,
       count(*) AS n_orders,
       sum(CASE WHEN s.first_ship <= o.o_orderdate + INTERVAL '60' DAY
                THEN 1 ELSE 0 END) AS shipped_60d
FROM orders o
JOIN shipped s ON s.l_orderkey = o.o_orderkey
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = o.o_orderkey
                    AND l2.l_returnflag = 'R')
GROUP BY o.o_orderpriority
"""

# Dialect-portable text: runs verbatim under BOTH Spark SQL and DuckDB, so
# the oracle is literally the same string — the strongest form of the
# "execute the query text, don't re-express it" parity check.
_SQL_TEXT_ROLLUP_PIVOT = """
SELECT o_orderpriority,
       CAST(grouping(o_orderpriority) AS INT) AS g,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_open
FROM orders
GROUP BY ROLLUP (o_orderpriority)
"""

# Dialect-portable text #2: chained INTERSECT (reference q38.sql:11,20 and
# q14 — customers present in every channel/period; distinct set semantics).
_SQL_TEXT_INTERSECT3 = """
SELECT c.c_mktsegment AS c_mktsegment, count(*) AS n_loyal
FROM (
    SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
    INTERSECT
    SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
) loyal
JOIN customer c ON c.c_custkey = loyal.o_custkey
GROUP BY c.c_mktsegment
"""


# Dialect-portable text #3: partitioned running sum with an explicit ROWS
# frame over pre-aggregated daily cents (reference q51.sql:8,21,36,40 — the
# cumulative-series shape). Dates render through CAST(... AS STRING) so both
# engines emit the identical 'yyyy-MM-dd' text; money aggregates as integer
# cents, exact under any partitioning.
_SQL_TEXT_WINDOW_CUMULATIVE = """
WITH daily AS (
    SELECT o_orderpriority,
           CAST(CAST(o_orderdate AS DATE) AS STRING) AS d,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    GROUP BY o_orderpriority, d
)
SELECT o_orderpriority, d,
       CAST(sum(cents) OVER (PARTITION BY o_orderpriority ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
FROM daily
"""

# Dialect-portable text #4: OR-of-ANDs disjunctive multi-table predicate
# (reference q13.sql — three OR'd branches mixing columns of both tables).
_SQL_TEXT_OR_OF_ANDS = """
SELECT c.c_mktsegment AS c_mktsegment,
       count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE (c.c_mktsegment = 'BUILDING'
       AND o.o_totalprice BETWEEN 1000 AND 50000)
   OR (c.c_mktsegment = 'MACHINERY'
       AND o.o_totalprice BETWEEN 50000 AND 150000)
   OR (c.c_mktsegment = 'AUTOMOBILE' AND o.o_orderstatus = 'F')
GROUP BY c.c_mktsegment
"""


# Dialect-portable text #6: correlated scalar subquery over a shared CTE
# (reference q1.sql:12-14 — "total > 1.2 * per-group average"). Money sums
# aggregate as integer cents so the threshold comparison is exact in both
# engines regardless of partition order.
_SQL_TEXT_CORRELATED_SCALAR = """
WITH ct AS (
    SELECT c.c_custkey AS c_custkey,
           c.c_nationkey AS c_nationkey,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_nationkey)
SELECT ct1.c_custkey AS c_custkey,
       ct1.total_cents AS total_cents
FROM ct ct1
WHERE ct1.total_cents > (SELECT avg(ct2.total_cents) * 1.2
                         FROM ct ct2
                         WHERE ct2.c_nationkey = ct1.c_nationkey)
ORDER BY ct1.c_custkey
"""

# Dialect-portable text #7: HAVING over an aggregate + rank() window over
# the SAME aggregation's outputs + outer rank filter (the q16-style ORDER BY
# count(DISTINCT ...) and q67-style rank-over-aggregate composed as one
# statement). All-integer, tie-broken on the group key.
_SQL_TEXT_HAVING_WINDOW_RANK = """
SELECT l_suppkey, n_parts, rnk
FROM (
    SELECT l_suppkey,
           count(DISTINCT l_partkey) AS n_parts,
           rank() OVER (ORDER BY count(DISTINCT l_partkey) DESC,
                        l_suppkey) AS rnk
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(*) > 5) t
WHERE rnk <= 20
ORDER BY rnk
"""


# Dialect-portable text #8: explicit GROUPING SETS with grouping() markers —
# the generalization of the reference's ROLLUP queries (q22/q36/q67 etc. use
# ROLLUP, which is sugar for exactly these sets); grouping() disambiguates
# the NULLs of each grain.
_SQL_TEXT_GROUPING_SETS = """
SELECT l_returnflag,
       l_linestatus,
       grouping(l_returnflag) AS g_flag,
       grouping(l_linestatus) AS g_status,
       count(*) AS n_lines,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# Dialect-portable text #9: the verbatim q11/q4 year_total CTE self-join —
# one CTE instantiated twice per channel (4 logical instances), customers
# whose 'N'-channel growth beats their 'A'-channel growth
# (docker/trino-client/queries/q11.sql:1-60 down-scoped to our schema).
# The optimized single-scan rewrite of the same semantics is
# operators/relational_ds2.py:yoy_channel_growth_compare — this text proves
# the engine also executes the un-rewritten form the reference ships.
_SQL_TEXT_YEAR_TOTAL_SELFJOIN = """
WITH year_total AS (
    SELECT o.o_custkey AS custkey,
           year(o.o_orderdate) AS dyear,
           l.l_returnflag AS sale_type,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE year(o.o_orderdate) IN (1996, 1997)
      AND l.l_returnflag IN ('N', 'A')
    GROUP BY o.o_custkey, year(o.o_orderdate), l.l_returnflag)
SELECT t_n_1.custkey AS o_custkey,
       t_n_1.total_cents AS n_first_cents,
       t_n_2.total_cents AS n_second_cents,
       t_a_1.total_cents AS a_first_cents,
       t_a_2.total_cents AS a_second_cents
FROM year_total t_n_1
JOIN year_total t_n_2 ON t_n_2.custkey = t_n_1.custkey
JOIN year_total t_a_1 ON t_a_1.custkey = t_n_1.custkey
JOIN year_total t_a_2 ON t_a_2.custkey = t_n_1.custkey
WHERE t_n_1.sale_type = 'N' AND t_n_1.dyear = 1996
  AND t_n_2.sale_type = 'N' AND t_n_2.dyear = 1997
  AND t_a_1.sale_type = 'A' AND t_a_1.dyear = 1996
  AND t_a_2.sale_type = 'A' AND t_a_2.dyear = 1997
  AND t_n_1.total_cents > 0
  AND t_a_1.total_cents > 0
  AND CAST(t_n_2.total_cents AS DOUBLE) * CAST(t_a_1.total_cents AS DOUBLE)
    > CAST(t_a_2.total_cents AS DOUBLE) * CAST(t_n_1.total_cents AS DOUBLE)
"""


# Dialect-portable text #11: WITH RECURSIVE — a month calendar spine
# generated by recursion (Spark 4's recursive CTE support), left-joined to
# the fact so empty months surface as zero rows. The recursion depth is
# |months| (bounded by the data's date span), not data-sized; the join is
# a broadcast of the tiny spine. DuckDB runs the identical text.
_SQL_TEXT_RECURSIVE_CALENDAR = """
WITH RECURSIVE months(m) AS (
    SELECT TIMESTAMP '1995-01-01 00:00:00'
    UNION ALL
    SELECT m + INTERVAL 1 MONTH FROM months
    WHERE m < TIMESTAMP '2001-07-01 00:00:00'
)
SELECT months.m AS month_start,
       count(o_orderkey) AS n_orders,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
            AS BIGINT) AS total_cents
FROM months
LEFT JOIN orders
  ON o_orderdate >= months.m
 AND o_orderdate < months.m + INTERVAL 1 MONTH
GROUP BY months.m
"""


# Dialect-portable text #10: GROUP BY CUBE — the full 2^k-grain lattice
# (the reference's query set stops at ROLLUP; CUBE completes the grouping
# vocabulary). Spark plans ONE Expand x4 + one aggregate — no per-grain
# rescans — same as its ROLLUP/GROUPING SETS handling.
_SQL_TEXT_CUBE = """
SELECT o_orderpriority,
       o_orderstatus,
       grouping(o_orderpriority) AS g_priority,
       grouping(o_orderstatus) AS g_status,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def register_sf_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the scale-factor tables as temp views so verbatim SQL texts
    (the reference executes its 99 queries as raw strings,
    ``run_workload.py:38``) resolve against the same loaders the DataFrame
    queries use.

    Skips when the session's catalog-ownership token already says these
    exact table handles own the names (synth_common._CATALOG_STATE): the
    10 ``createOrReplaceTempView`` py4j round trips were a fixed per-text-
    query constant. The token embeds the handle ids, so a testdata rewrite
    (load_table's mtime-keyed memo returns fresh handles) re-registers."""
    from lakehouse_variance_spark.plans import synth_common as synth
    from lakehouse_variance_spark.tables import TABLE_NAMES, load_table

    dfs = [(name, load_table(spark, sf_dir, name)) for name in TABLE_NAMES]
    token = ("base", sf_dir, tuple(id(df) for _, df in dfs))
    if synth.catalog_state_get(spark) == token:
        return
    for name, df in dfs:
        df.createOrReplaceTempView(name)
    synth.catalog_state_set(spark, token)


def _register_sql_text_query() -> None:
    from lakehouse_variance_spark.registry import register

    @register(
        "sql_text_exists_interval",
        oracle="""
        WITH shipped AS (
            SELECT l_orderkey, min(l_shipdate) AS first_ship
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT o.o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CASE WHEN s.first_ship <= o.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS BIGINT) AS shipped_60d
        FROM orders o
        JOIN shipped s ON s.l_orderkey = o.o_orderkey
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
          AND NOT EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = o.o_orderkey
                            AND l2.l_returnflag = 'R')
        GROUP BY o.o_orderpriority
        """,
    )
    def sql_text_exists_interval(spark: SparkSession, sf_dir: str):
        """Verbatim Trino-dialect SQL text through ``spark.sql`` — the
        reference's execution mode (``run_workload.py:38``): CTE, EXISTS and
        NOT EXISTS subqueries (Catalyst rewrites to semi/anti joins), and
        ``INTERVAL '60' DAY`` date arithmetic, resolved against temp views of
        the sf tables. Proves the engine runs the query *strings*, not just
        DataFrame re-expressions."""
        register_sf_views(spark, sf_dir)
        return spark.sql(_SQL_TEXT_EXISTS_INTERVAL)

    @register("sql_text_rollup_pivot", oracle=_SQL_TEXT_ROLLUP_PIVOT)
    def sql_text_rollup_pivot(spark: SparkSession, sf_dir: str):
        """Verbatim ROLLUP + grouping() + conditional-aggregate SQL text
        (reference q36.sql:5-9, q22.sql:12 — 11 ROLLUP queries, 127 CASE
        WHEN) through ``spark.sql``. The oracle is the IDENTICAL string
        DuckDB executes — zero re-expression on either side."""
        register_sf_views(spark, sf_dir)
        return spark.sql(_SQL_TEXT_ROLLUP_PIVOT)

    @register("sql_text_intersect3", oracle=_SQL_TEXT_INTERSECT3)
    def sql_text_intersect3(spark: SparkSession, sf_dir: str):
        """Verbatim chained-INTERSECT SQL text (reference q38.sql:11,20,
        q14.sql — multi-period customer intersection with Trino's
        DISTINCT-set semantics, the §7 hard part), run through ``spark.sql``
        with the IDENTICAL string as the DuckDB oracle. Catalyst plans each
        INTERSECT as a left-semi join after aggregating both sides
        distinct."""
        register_sf_views(spark, sf_dir)
        return spark.sql(_SQL_TEXT_INTERSECT3)

    @register("sql_text_window_cumulative", oracle=_SQL_TEXT_WINDOW_CUMULATIVE)
    def sql_text_window_cumulative(spark: SparkSession, sf_dir: str):
        """Verbatim q51-shaped running-sum SQL text (PARTITION BY + ORDER BY
        + explicit ROWS frame over aggregated daily series; reference
        q51.sql:8,21,36,40) through ``spark.sql`` — the IDENTICAL string is
        the DuckDB oracle."""
        register_sf_views(spark, sf_dir)
        return spark.sql(_SQL_TEXT_WINDOW_CUMULATIVE)

    @register("sql_text_or_of_ands", oracle=_SQL_TEXT_OR_OF_ANDS)
    def sql_text_or_of_ands(spark: SparkSession, sf_dir: str):
        """Verbatim q13-shaped OR-of-ANDs SQL text through ``spark.sql``
        with the IDENTICAL string as the DuckDB oracle; Catalyst pushes the
        extractable single-table implications below the join."""
        register_sf_views(spark, sf_dir)
        return spark.sql(_SQL_TEXT_OR_OF_ANDS)

    @register("sql_text_correlated_scalar", oracle=_SQL_TEXT_CORRELATED_SCALAR)
    def sql_text_correlated_scalar(spark: SparkSession, sf_dir: str):
        """Verbatim correlated-scalar-subquery text (q1.sql:12-14 shape)
        through ``spark.sql`` with the IDENTICAL string as the DuckDB
        oracle; Catalyst decorrelates the subquery into an aggregate+join."""
        register_sf_views(spark, sf_dir)
        return spark.sql(_SQL_TEXT_CORRELATED_SCALAR)

    @register(
        "sql_text_having_window_rank", oracle=_SQL_TEXT_HAVING_WINDOW_RANK
    )
    def sql_text_having_window_rank(spark: SparkSession, sf_dir: str):
        """Verbatim HAVING + rank()-over-aggregate text (q16 ORDER BY
        count(DISTINCT) + q67 rank-over-aggregate composed); identical
        string on both engines."""
        register_sf_views(spark, sf_dir)
        return spark.sql(_SQL_TEXT_HAVING_WINDOW_RANK)

    @register("sql_text_grouping_sets", oracle=_SQL_TEXT_GROUPING_SETS)
    def sql_text_grouping_sets(spark: SparkSession, sf_dir: str):
        """Verbatim GROUPING SETS text with grouping() markers (the grain
        vocabulary behind the reference's 11 ROLLUP queries); identical
        string on both engines. Spark plans one Expand + one aggregate —
        no per-grain rescans."""
        register_sf_views(spark, sf_dir)
        return spark.sql(_SQL_TEXT_GROUPING_SETS)

    @register(
        "sql_text_recursive_calendar", oracle=_SQL_TEXT_RECURSIVE_CALENDAR
    )
    def sql_text_recursive_calendar(spark: SparkSession, sf_dir: str):
        """Verbatim WITH RECURSIVE month-spine text (Spark 4 recursive
        CTE) left-joined to the fact — identical string on both engines.
        Recursion depth is |months|, never data-sized; the spine
        broadcasts."""
        register_sf_views(spark, sf_dir)
        return spark.sql(_SQL_TEXT_RECURSIVE_CALENDAR)

    @register("sql_text_cube", oracle=_SQL_TEXT_CUBE)
    def sql_text_cube(spark: SparkSession, sf_dir: str):
        """Verbatim GROUP BY CUBE text — the full 2^k grouping lattice in
        one Expand + one aggregate; identical string on both engines.
        Completes the ROLLUP / GROUPING SETS / CUBE grouping vocabulary
        (the reference's 99 queries use ROLLUP only)."""
        register_sf_views(spark, sf_dir)
        return spark.sql(_SQL_TEXT_CUBE)

    @register(
        "sql_text_year_total_selfjoin", oracle=_SQL_TEXT_YEAR_TOTAL_SELFJOIN
    )
    def sql_text_year_total_selfjoin(spark: SparkSession, sf_dir: str):
        """Verbatim q11/q4 year_total CTE four-instance self-join —
        identical string on both engines. Spark plans the CTE once and
        reuses the exchange across the four instances; the semantically
        equal single-scan conditional-agg rewrite is
        ``yoy_channel_growth_compare`` (results must agree — tested)."""
        register_sf_views(spark, sf_dir)
        return spark.sql(_SQL_TEXT_YEAR_TOTAL_SELFJOIN)


_register_sql_text_query()


# ---------------------------------------------------------------------------
# Query-info capture (the reference scrapes Trino's /ui/api/query/{id} nested
# document per query, run_workload.py:49-56; Spark's equivalent store is
# SQLAppStatusStore, the same store that backs the SQL-tab REST API)
# ---------------------------------------------------------------------------


def capture_query_info(
    spark: SparkSession, query_id: str, record: dict[str, Any]
) -> dict[str, Any]:
    """Nested query-info document for the MOST RECENT SQL execution.

    Shape mirrors what the reference's trace pipeline consumes
    (``make_lakehouse_workload_logs.sh:91-95`` reads
    ``queryStats.{elapsedTime, executionTime, analysisTime,
    resourceWaitingTime}`` as Trino duration strings; ``scrub.jq`` walks the
    nested rest): phase stats as duration strings, the physical plan
    description, and every SQL metric of the execution (name, type,
    formatted value) keyed per operator accumulator. The document round-trips
    through ``analytics.traces.flatten_query_info`` — our own engine's runs
    feed the same trace analytics the reference applies to Trino's.
    """
    ok = record.get("elapsed_s", SENTINEL) != SENTINEL

    def dur(key: str) -> str:
        return f"{record[key] * 1000.0:.2f}ms" if ok else "0.00ms"

    doc: dict[str, Any] = {
        # Trino's field name — the flattener extracts the numeric id from it
        # (make_lakehouse_workload_logs.sh:91).
        "queryId": query_id,
        "state": "FINISHED" if ok else "FAILED",
        "queryStats": {
            "elapsedTime": dur("elapsed_s"),
            "executionTime": dur("execution_s"),
            "analysisTime": dur("planning_s"),
            "resourceWaitingTime": dur("resource_waiting_s"),
        },
        "metrics": [],
        "plan": None,
    }
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    if execs.size() == 0:
        return doc
    last = execs.apply(execs.size() - 1)
    eid = last.executionId()
    doc["execution_id"] = eid
    doc["plan"] = last.physicalPlanDescription()
    defs = {}
    mets = last.metrics()
    for i in range(mets.size()):
        m = mets.apply(i)
        defs[m.accumulatorId()] = (m.name(), m.metricType())
    values = {}
    it = store.executionMetrics(eid).iterator()
    while it.hasNext():
        kv = it.next()
        values[kv._1()] = kv._2()
    doc["metrics"] = [
        {"name": name, "metricType": mtype, "value": values[acc_id]}
        for acc_id, (name, mtype) in sorted(defs.items())
        if acc_id in values
    ]
    return doc


def run_query_with_info(
    spark: SparkSession,
    name: str,
    sql: str,
    info_dir: str | Path | None = None,
) -> tuple[dict[str, Any], dict[str, Any]]:
    """``run_query`` + query-info scrape + optional ``{name}.json`` save —
    the full per-query loop of reference ``run_workload.py:32-59``."""
    record = run_query(spark, name, sql)
    info = capture_query_info(spark, name, record)
    if info_dir is not None:
        info_dir = Path(info_dir)
        info_dir.mkdir(parents=True, exist_ok=True)
        (info_dir / f"{name}.json").write_text(json.dumps(info), "utf-8")
    return record, info


_OBS_IDS = itertools.count()


def run_with_observation(
    df, metrics: dict[str, "Column"], name: str | None = None
) -> tuple[int, dict[str, Any]]:
    """Drain a DataFrame while collecting aggregate metrics IN the same
    pass via ``Observation`` — zero extra jobs, zero extra scans.

    The reference scrapes per-query stats from the engine's UI API after
    each run (``run_workload.py:49-56``); ``df.observe`` is Spark's
    native, single-pass version of that telemetry: named aggregate
    expressions piggyback on the query's own execution and surface on the
    driver when the action completes. At 100 TB the alternative — a
    second ``df.agg(...)`` pass for row counts / null rates / value
    bounds — doubles the scan; observation is free.

    Returns ``(row_count, {metric: value})``.
    """
    from pyspark.sql import Observation

    # Unique name per call: observation names must be unique among active
    # queries in a session (same counter pattern as the memory-sink names
    # in streaming/logs.py).
    obs = Observation(name or f"lvs_obs_{next(_OBS_IDS)}")
    keys = list(metrics)
    observed = df.observe(obs, *[metrics[k].alias(k) for k in keys])
    n = observed.count()
    got = obs.get
    return n, {k: got[k] for k in keys}
