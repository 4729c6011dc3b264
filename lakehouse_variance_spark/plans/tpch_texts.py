"""Verbatim TPC-H query texts executed as raw SQL strings on BOTH engines.

The reference's primary execution mode is verbatim SQL files fed to the
engine (`docker/trino-client/src/run_workload.py:38`); plans/runner.py
already proves that mode on nine dialect-portable texts. The driver's
tables are TPC-H-shaped, so this module adds the classic TPC-H suite
itself — q3, q5, q6, q7, q10, q14, q18, q19 — as identical strings run by
``spark.sql`` and by the DuckDB oracle, down-scoped only where the
synthetic schema lacks a column (no partsupp / commitdate / receiptdate /
container / phone, so q2/q4/q8/q9/q12/q15/q16/q20/q21/q22 have no faithful
text) and adjusted for engine-stable arithmetic:

* revenue accumulates as ``round(l_extendedprice*(1-l_discount)*10000)``
  int64 e4-units — the true product is an exact integer at 1e4 scale
  (cents x integer percent), the double chain lands within 1e-7 of it on
  both engines, and integer sums are order-free;
* LIMIT queries carry a unique trailing ORDER BY key so the cut is
  deterministic;
* money/balance outputs are integer cents; ratio outputs are single
  IEEE divisions of exact int64s.

Every text still exercises the original query's PLAN shape: q3's
3-table join + top-k, q5's 6-table snowflake, q6's pure scan aggregate,
q7's dual-nation volume with the OR'd pair predicate, q10's returned-item
customer ranking, q14's conditional-share scan, q18's HAVING-subquery
join-back, q19's OR-of-(brand, size, qty) bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_variance_spark.plans.runner import register_sf_views
from lakehouse_variance_spark.registry import register

_REV_E4 = "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"

TPCH_TEXTS: dict[str, str] = {
    # q3 — shipping priority: top unshipped orders by revenue
    "tpch_q3": f"""
SELECT l_orderkey,
       CAST(sum({_REV_E4}) AS BIGINT) AS revenue_e4,
       o_orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    # q5 — local supplier volume: customer and supplier in the same nation
    "tpch_q5": f"""
SELECT n_name,
       CAST(sum({_REV_E4}) AS BIGINT) AS revenue_e4
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
    # q6 — forecasting revenue change: pure scan aggregate
    "tpch_q6": """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))
            AS BIGINT) AS revenue_e4,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
""",
    # q7 — volume shipping between two nations (both directions)
    "tpch_q7": f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume_e4) AS BIGINT) AS revenue_e4
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {_REV_E4} AS volume_e4
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    # q10 — returned item reporting: top customers by lost revenue
    "tpch_q10": f"""
SELECT c_custkey, c_name,
       CAST(sum({_REV_E4}) AS BIGINT) AS revenue_e4,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
       n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, acctbal_c, n_name
ORDER BY revenue_e4 DESC, c_custkey
LIMIT 20
""",
    # q14 — promotion effect: share of revenue from PROMO parts
    "tpch_q14": f"""
SELECT 100 * (CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                            THEN {_REV_E4} ELSE 0 END) AS DOUBLE)
              / CAST(sum({_REV_E4}) AS DOUBLE)) AS promo_revenue_pct,
       count(*) AS n_lines
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
""",
    # q18 — large volume customers: HAVING subquery + join-back
    "tpch_q18": """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS sum_qty_c
FROM customer, orders, lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 17500)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, totalprice_c
ORDER BY totalprice_c DESC, o_orderkey
LIMIT 100
""",
    # q19 — discounted revenue: OR of (brand, size band, quantity band)
    "tpch_q19": f"""
SELECT CAST(sum({_REV_E4}) AS BIGINT) AS revenue_e4,
       count(*) AS n_lines
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        AND l_quantity >= 1 AND l_quantity <= 30)
    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        AND l_quantity >= 10 AND l_quantity <= 40)
    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50
        AND l_quantity >= 20 AND l_quantity <= 50))
""",
}


def _register_tpch_texts() -> None:
    for name, text in TPCH_TEXTS.items():

        def run(spark: SparkSession, sf_dir: str, _text=text) -> DataFrame:
            register_sf_views(spark, sf_dir)
            return spark.sql(_text)

        run.__name__ = name
        run.__doc__ = (
            f"Verbatim TPC-H {name[5:]} text (module docstring has the "
            "determinism adjustments) — identical string on both engines; "
            "the reference executes its workload exactly this way "
            "(run_workload.py:38)."
        )
        register(name, oracle=text)(run)


_register_tpch_texts()
