"""TPC-H extension schema: partsupp + the columns the testdata lacks.

The reference's TPC-H-shaped workload assumes the full spec schema; the
driver's parquet tables omit the `partsupp` table and a handful of
columns (`l_commitdate`/`l_receiptdate`/`l_shipmode`, `p_mfgr`/
`p_container`, `s_address`/`s_phone`/`s_comment`, `o_comment`,
`c_phone`).  This module derives them DETERMINISTICALLY from the base
tables with one self-contained SQL definition per table, evaluated by
BOTH engines — the same mechanism as `tpcds_schema.py`:

* Spark materializes each extended table once per scale factor into a
  local parquet cache (registered queries scan real parquet, with
  pushdown/pruning, and no scalar-subquery cross joins in their plans);
* the DuckDB oracle re-derives the tables inline as a WITH-prelude
  (`oracle_sql_for_tpch`), so each oracle stays one self-contained
  ANSI-SQL string and every hash match verifies the generator on both
  engines as well as the query.

Determinism rules match tpcds_schema.py: BIGINT/DATE/VARCHAR columns
only, modular arithmetic for pseudo-randomness, float ops limited to
immediately-floor()ed divisions.  `ps_suppkey` assigns each part four
consecutive supplier residues mod S — distinct for any supplier count
S >= 4 — so (ps_partkey, ps_suppkey) is a true key like the spec's
partsupp primary key.

Reference parity: the reference ingests the full TPC-H schema via
`datasets/iceberg conversion/csv_to_iceberg.py` and runs verbatim query
files (`docker/trino-client/src/run_workload.py:26-44`); this module
exists so all 22 TPC-H texts can run unmodified in `tpch_texts.py`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from lakehouse_variance_spark.plans import synth_common as synth

# value domains (public TPC-H spec lists; subset)
CONTAINERS = [
    "SM CASE", "SM BOX", "SM BAG", "SM JAR", "SM PKG",
    "MED CASE", "MED BOX", "MED BAG", "MED JAR", "MED PKG",
    "LG CASE", "LG BOX", "LG BAG", "LG JAR", "LG PKG",
    "JUMBO CASE", "JUMBO BOX", "JUMBO BAG", "JUMBO JAR", "JUMBO PKG",
]
SHIPMODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]


def _pick(expr: str, values: list[str]) -> str:
    n = len(values)
    arms = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE ({expr}) % {n} {arms} END"


_LK = "(l_orderkey * 7 + l_linenumber)"


def _partsupp() -> str:
    # The spec's referential contract drives the shape: every
    # (l_partkey, l_suppkey) pair in lineitem MUST exist in partsupp (or
    # q9/q20-style partsupp joins silently drop most of the fact table),
    # and every part carries (at least) four canonical suppliers. So
    # partsupp is the UNION of the observed distinct lineitem pairs and
    # four per-part canonical suppliers, the latter picked by POSITION
    # over the actual supplier table (row_number join) — never by
    # assuming s_suppkey is a dense 0..S-1 range, which key-shifted
    # replicas (the 10x probe) and re-keyed datasets break. The
    # positional index decorrelates across parts via a large-prime mix;
    # four consecutive residues mod S are distinct for S >= 4.
    # ps_availqty/ps_supplycost are functions of (partkey, suppkey) so
    # both union arms value them identically.
    return """
SELECT ps_partkey,
       ps_suppkey,
       1 + (ps_partkey * 17 + ps_suppkey * 4999) % 9999 AS ps_availqty,
       1 + (ps_partkey * 7919 + ps_suppkey * 104729) % 99999 AS ps_supplycost
FROM (
    SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
    FROM lineitem
    UNION
    SELECT p_partkey, sup.s_suppkey
    FROM part,
         (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2
          UNION ALL SELECT 3) q,
         (SELECT count(*) AS s_cnt FROM supplier) c,
         (SELECT s_suppkey,
                 row_number() OVER (ORDER BY s_suppkey) - 1 AS s_idx
          FROM supplier) sup
    WHERE sup.s_idx = ((p_partkey * 7919) % 1000000007 + q.i) % c.s_cnt
) pairs
"""


def _lineitem() -> str:
    lk = _LK
    ship = "CAST(l_shipdate AS DATE)"
    return f"""
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
       l_shipdate,
       CAST({ship} + CAST(({lk} * 5) % 61 - 30 AS INT) AS TIMESTAMP)
           AS l_commitdate,
       CAST({ship} + CAST(1 + ({lk} * 3) % 30 AS INT) AS TIMESTAMP)
           AS l_receiptdate,
       {_pick(f'{lk} * 11', SHIPMODES)} AS l_shipmode
FROM lineitem
"""


def _part() -> str:
    return f"""
SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
       'Manufacturer#' || CAST(1 + p_partkey % 5 AS VARCHAR(1)) AS p_mfgr,
       {_pick('p_partkey * 13', CONTAINERS)} AS p_container
FROM part
"""


def _supplier() -> str:
    return """
SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
       'Address#' || CAST(s_suppkey AS VARCHAR(10)) AS s_address,
       CAST(10 + s_nationkey AS VARCHAR(2)) || '-' ||
           lpad(CAST((s_suppkey * 7919) % 10000000 AS VARCHAR(7)), 7, '0')
           AS s_phone,
       CASE WHEN s_suppkey % 13 = 0
            THEN 'slow deliveries. Customer unhappy Complaints filed'
            ELSE 'quiet account, nothing to report' END AS s_comment
FROM supplier
"""


def _orders() -> str:
    return """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority,
       CASE WHEN o_orderkey % 7 = 0
            THEN 'handle with special care and requests noted'
            ELSE 'routine order, no remarks' END AS o_comment
FROM orders
"""


def _customer() -> str:
    return """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
       CAST(10 + c_nationkey AS VARCHAR(2)) || '-' ||
           lpad(CAST((c_custkey * 104729) % 10000000 AS VARCHAR(7)), 7, '0')
           AS c_phone
FROM customer
"""


# Ordered; defs reference BASE tables only (no cross-def references).
TPCH_EXT_DEFS: dict[str, str] = {
    "partsupp": _partsupp(),
    "lineitem": _lineitem(),
    "part": _part(),
    "supplier": _supplier(),
    "orders": _orders(),
    "customer": _customer(),
}

_BASE_TABLES = ("lineitem", "part", "supplier", "orders", "customer")

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_CACHE_ROOT = os.path.join(_REPO_ROOT, ".tpch_ext_cache")

_PRELUDE: str | None = None


def oracle_prelude() -> str:
    """All extension defs as a WITH-list; base tables pinned via main.<t>
    so the shadow CTEs can reuse the base names (same namespace trick as
    tpcds_schema._prelude_ctes)."""
    global _PRELUDE
    if _PRELUDE is None:
        parts = [
            f"{base}_base AS (SELECT * FROM main.{base})"
            for base in _BASE_TABLES
        ]
        for name, sql in TPCH_EXT_DEFS.items():
            parts.append(
                f"{name} AS ({synth.repoint_all(sql, _BASE_TABLES)})"
            )
        _PRELUDE = ",\n".join(parts)
    return _PRELUDE


def oracle_sql_for_tpch(query_text: str) -> str:
    return synth.wrap_with_prelude(oracle_prelude(), query_text)


def register_tpch_ext_views(spark: SparkSession, sf_dir: str) -> None:
    """Materialize (if needed) and register the extended TPC-H tables,
    shadowing the base names; nation/region stay the base views.

    Re-registered on every call because tpcds_schema's `customer` (and
    interleaved base-table queries) can shadow these names in the same
    session; parquet DataFrames are cached so re-registration is
    catalog-only."""
    synth.materialize_and_register(
        spark,
        sf_dir,
        TPCH_EXT_DEFS,
        _BASE_TABLES,
        _CACHE_ROOT,
        build_sql=lambda sql: sql,
    )
