"""Shared machinery for derived synthetic schemas (tpcds_schema, tpch_ext).

Both modules define tables as self-contained SQL over the driver's base
tables and need the same four pieces, previously duplicated:

* base-table re-pointing (``FROM customer`` → ``FROM customer_base``) so
  a derived table may shadow a base table's name;
* a defs fingerprint keying the parquet cache (schema edits regenerate);
* the DuckDB WITH-prelude merge (prefix a query text with the schema
  definition CTEs, folding the query's own WITH-list when present);
* the Spark-side materialize-once-then-register-views flow.
"""

from __future__ import annotations

import hashlib
import os
import re as _re
from collections.abc import Callable

from pyspark.sql import SparkSession

from lakehouse_variance_spark.tables import _app_id


def sql_quoted_idents(spark: SparkSession, text: str):
    """spark.sql() for ANSI texts whose identifiers are double-quoted
    (the reference's generated SSB/IMDB workloads quote every column).

    Spark parses double quotes as string literals unless
    ``spark.sql.ansi.doubleQuotedIdentifiers`` is on; the flag is flipped
    only around the PARSE (parsing happens eagerly inside spark.sql) and
    restored, so other query texts in the session — where ``"..."`` may
    be a string literal — keep their meaning."""
    key = "spark.sql.ansi.doubleQuotedIdentifiers"
    old = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try:
        return spark.sql(text)
    finally:
        spark.conf.set(key, old)


def normalize_workload_sql(sql: str) -> str:
    """Mechanical dialect normalization for the reference's generated
    workload texts (`models/Queries/Baseline_*/*.ndjson`), applied ONCE
    at embed time so the SAME normalized string runs on both engines:

    * ``CAST(x AS varchar)`` -> ``CAST(x AS string)`` — Spark requires a
      length for VARCHAR; both engines accept STRING;
    * ``sum(expr)`` -> ``CAST(sum(expr) AS BIGINT)`` — DuckDB widens
      BIGINT sums to HUGEINT (rendered as float by pandas) while Spark
      returns int64; the cast pins both to int64.  Generated sum args
      never nest parentheses (verified over all 3,951 texts).
    """
    sql = _re.sub(r"(?i)\bAS\s+varchar\s*\)", "AS string)", sql)
    sql = _re.sub(
        r"(?i)\bsum\(([^()]*)\)", r"CAST(sum(\1) AS BIGINT)", sql
    )
    return sql.strip().rstrip(";")


def repoint(sql: str, base: str) -> str:
    """FROM/JOIN <base> → FROM/JOIN <base>_base (word-boundary safe; defs
    only reference base tables in FROM/JOIN clauses)."""
    return _re.sub(
        rf"\b(FROM|JOIN)\s+{base}\b(?!_base)", rf"\1 {base}_base", sql
    )


def repoint_all(sql: str, bases: tuple[str, ...]) -> str:
    for base in bases:
        sql = repoint(sql, base)
    return sql


def defs_fingerprint(defs: dict[str, str]) -> str:
    blob = "\n".join(f"{k}:{v}" for k, v in defs.items())
    return hashlib.md5(blob.encode()).hexdigest()[:12]


def wrap_with_prelude(prelude: str, query_text: str) -> str:
    """Prefix a query text with a WITH-prelude, merging WITH-lists when
    the query itself starts with WITH."""
    body = query_text.strip()
    m = _re.match(r"(?is)^with\b", body)
    if m:
        body = body[m.end():].lstrip()
        return f"WITH {prelude},\n{body}"
    return f"WITH {prelude}\n{body}"


def cache_dir(cache_root: str, sf_dir: str, fingerprint: str) -> str:
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fingerprint}".encode()
    ).hexdigest()[:16]
    return os.path.join(cache_root, key)


# (session id, cache dir, table) → parquet DataFrame, so re-registration
# after a shadowing module re-points the names is catalog-only.
_DF_CACHE: dict[tuple[int, str, str], object] = {}

# Catalog-ownership token per session: WHICH view family currently owns the
# shared names (tpcds/ssb/tpch_ext shadow base `customer` etc.) and WHICH
# DataFrame handles back them. `createOrReplaceTempView` costs a py4j round
# trip + plan wrap PER VIEW, and re-registering 10-34 unchanged views on
# every text-query invocation was a pure per-query constant (guide §1.2:
# don't redo work whose inputs didn't change). A register helper skips when
# the session's token already equals its own; ANY code that re-points a
# shared name outside the helpers must call `catalog_state_dirty` so the
# next helper call does the full re-registration. Keyed by applicationId
# (unique per session lifetime; id(spark) can be recycled by CPython).
_CATALOG_STATE: dict[str, tuple] = {}


def catalog_state_get(spark: SparkSession):
    return _CATALOG_STATE.get(_app_id(spark))


def catalog_state_set(spark: SparkSession, token: tuple) -> None:
    _CATALOG_STATE[_app_id(spark)] = token


def catalog_state_dirty(spark: SparkSession) -> None:
    """Invalidate the skip token (a shared view name was re-pointed
    outside the register helpers)."""
    _CATALOG_STATE.pop(_app_id(spark), None)


def materialize_and_register(
    spark: SparkSession,
    sf_dir: str,
    defs: dict[str, str],
    bases: tuple[str, ...],
    cache_root: str,
    *,
    build_sql: Callable[[str], str],
    register_during_build: bool = False,
) -> None:
    """Materialize every def into the fingerprint-keyed parquet cache (once
    per sf_dir + defs version), then register all defs as temp views.

    ``build_sql`` maps a def's SQL to the statement actually executed
    during the build (e.g. prefixing a digits CTE). When defs reference
    EARLIER defs by name (tpcds returns → sales), pass
    ``register_during_build=True`` so each table's view is visible to the
    next build statement."""
    from lakehouse_variance_spark.plans.runner import register_sf_views

    out = cache_dir(cache_root, sf_dir, defs_fingerprint(defs))
    done = os.path.join(out, "_DONE")
    # Fast path: this exact family (cache dir) with these exact DataFrame
    # handles already owns the catalog names — nothing to do. The token
    # carries the handle ids, so a session whose _DF_CACHE was refreshed
    # (or a different sf_dir / defs version) never matches stale views.
    token = _defs_token(spark, out, defs)
    if token is not None and catalog_state_get(spark) == token:
        return
    register_sf_views(spark, sf_dir)
    if not os.path.exists(done):
        # Concurrency-safe build: write into a pid-suffixed temp dir and
        # os.rename it into place, so the cache dir only ever appears
        # fully built — two sessions racing here each build privately and
        # exactly one rename wins (the loser's tree is discarded); readers
        # never observe a half-written or overwritten-in-place cache.
        tmp = f"{out}.build-{os.getpid()}"
        for base in bases:
            spark.table(base).createOrReplaceTempView(f"{base}_base")
        os.makedirs(tmp, exist_ok=True)
        # Whole-stage codegen is DISABLED for the build statements only.
        # The digit-product `_seq` derivations are cross-join fan-outs
        # (part × seq(131) × seq(5) → 1.31e9 rows at the 100× probe), and
        # Spark's generated BroadcastNestedLoopJoin code buffers each
        # emitted row (UnsafeRow.copy into the WSCG row buffer) without
        # yielding inside the build-side loops — measured to exhaust ANY
        # heap (OOM at 80g) on the doubly-nested fan-out, while the
        # interpreted iterator path streams the same 1.31B-row build in
        # 18s inside a 12g heap.  Query EXECUTION keeps codegen; only the
        # one-time generator writes run interpreted.
        prev_wscg = spark.conf.get("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        try:
            for name, sql in defs.items():
                df = spark.sql(build_sql(repoint_all(sql, bases)))
                df.write.mode("overwrite").parquet(os.path.join(tmp, name))
                if register_during_build:
                    spark.read.parquet(
                        os.path.join(tmp, name)
                    ).createOrReplaceTempView(name)
        finally:
            spark.conf.set("spark.sql.codegen.wholeStage", prev_wscg)
        with open(os.path.join(tmp, "_DONE"), "w") as fh:
            fh.write(defs_fingerprint(defs) + "\n")
        import shutil

        if os.path.isdir(out) and not os.path.exists(done):
            # Stale half-built tree from a pre-rename-scheme run.  Move it
            # aside atomically rather than rmtree-ing: a concurrent builder
            # could rename a COMPLETE cache into `out` between our staleness
            # check and a delete, and rmtree would then destroy a cache that
            # other sessions already registered DataFrames against.  A
            # rename either moves the genuinely-stale tree or (if the racer
            # won) moves the racer's tree — in which case `done` now exists
            # under the new name check below and we restore nothing, but our
            # own freshly built `tmp` renames into place with identical
            # contents (same defs fingerprint), so readers stay consistent.
            stale = f"{out}.stale-{os.getpid()}"
            try:
                os.rename(out, stale)
                if os.path.exists(os.path.join(stale, "_DONE")):
                    # We displaced a COMPLETE cache a racer just published;
                    # put it back and discard our private build instead.
                    try:
                        os.rename(stale, out)
                    except OSError:
                        # Yet another racer published an equal cache into
                        # `out` (same defs fingerprint); the displaced copy
                        # is redundant — reclaim it rather than leaking a
                        # full dataset tree per occurrence (ADVICE r7).
                        if os.path.exists(done):
                            shutil.rmtree(stale, ignore_errors=True)
                else:
                    shutil.rmtree(stale, ignore_errors=True)
            except OSError:
                pass  # `out` vanished or is being replaced; rename below decides
        try:
            os.rename(tmp, out)
        except OSError:
            if os.path.exists(done):  # a concurrent builder won the race
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                raise
    for name in defs:
        key = (id(spark), out, name)
        df = _DF_CACHE.get(key)
        if df is None:
            df = spark.read.parquet(os.path.join(out, name))
            _DF_CACHE[key] = df
        df.createOrReplaceTempView(name)
    token = _defs_token(spark, out, defs)
    if token is not None:
        catalog_state_set(spark, token)


def _defs_token(spark: SparkSession, out: str, defs: dict[str, str]):
    """Ownership token for a registered defs family, or None when any
    handle is not yet cached (first registration in this session)."""
    ids = []
    for name in defs:
        df = _DF_CACHE.get((id(spark), out, name))
        if df is None:
            return None
        ids.append(id(df))
    return ("defs", out, tuple(ids))
