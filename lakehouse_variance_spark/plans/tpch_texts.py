"""Verbatim TPC-H query texts executed as raw SQL strings on BOTH engines.

The reference's primary execution mode is verbatim SQL files fed to the
engine (`docker/trino-client/src/run_workload.py:38`); plans/runner.py
already proves that mode on nine dialect-portable texts. The driver's
tables are TPC-H-shaped, so this module adds the classic TPC-H suite
itself as identical strings run by ``spark.sql`` and by the DuckDB oracle.

Sixteen of the 22 queries are covered: q1, q3, q5, q6, q7, q8, q10, q14,
q15, q18, q19 are faithful texts (q15's stream-revenue VIEW becomes the
equivalent CTE), and q4, q9, q13, q17, q22 are minimally down-scoped where
the synthetic schema lacks a column — each keeps the original's PLAN shape
and swaps only the missing column in a predicate/expression:

* q4: the EXISTS probe tests ``l_returnflag = 'R'`` (no
  commitdate/receiptdate pair) — still semi-join + count per priority;
* q9: supply cost proxied as ``0.5 * p_retailprice`` (no partsupp) —
  still the 5-table profit join grouped by (nation, year);
* q13: the pushed-into-LEFT-JOIN filter is ``o_orderpriority NOT LIKE
  '%NOT%SPECIFIED%'`` (no o_comment) — same two-wildcard NOT LIKE inside
  the outer join's ON, same count-of-counts;
* q17: the part slice is ``p_brand || p_size`` (no p_container) — the
  correlated 0.2×avg(quantity) subquery is verbatim;
* q22: country code is ``c_nationkey`` (no c_phone substring) — the
  positive-balance global-avg scalar subquery and NOT EXISTS anti-join
  are verbatim.

The remaining six (q2, q11, q12, q16, q20, q21) are structurally
inexpressible without the partsupp table or the ship/commit/receipt date
triple; their plan shapes are covered by dedicated operators instead
(COVERAGE.md maps them).

All texts are adjusted for engine-stable arithmetic:

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
    # q1 — pricing summary report (faithful; integer-unit aggregates, avgs
    # are exact-int sums divided once — both engines' avg(BIGINT) is an
    # exact integer accumulation followed by one IEEE division)
    "tpch_q1": """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_base_price_c,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           * 1000000) AS BIGINT)) AS BIGINT) AS sum_charge_e6,
       avg(CAST(round(l_quantity * 100) AS BIGINT)) AS avg_qty_c,
       avg(CAST(round(l_extendedprice * 100) AS BIGINT)) AS avg_price_c,
       avg(CAST(round(l_discount * 10000) AS BIGINT)) AS avg_disc_e4,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
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
    # q4 — order priority checking (down-scoped EXISTS probe: the schema
    # has no commitdate/receiptdate pair, so the lineitem test is
    # l_returnflag = 'R'; plan shape — semi join + count per priority —
    # is the original's)
    "tpch_q4": """
SELECT o_orderpriority,
       count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT *
              FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
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
    # q8 — national market share (faithful: 8-table snowflake, share of a
    # supplier nation within a customer region's volume by order year)
    "tpch_q8": f"""
SELECT o_year,
       CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume_e4 ELSE 0 END)
            AS DOUBLE)
           / CAST(sum(volume_e4) AS DOUBLE) AS mkt_share
FROM (
    SELECT year(o_orderdate) AS o_year,
           {_REV_E4} AS volume_e4,
           n2.n_name AS nation
    FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
         region
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_nationkey = n1.n_nationkey
      AND n1.n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND s_nationkey = n2.n_nationkey
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                          AND TIMESTAMP '1997-12-31 00:00:00'
      AND p_type = 'PROMO'
) AS all_nations
GROUP BY o_year
ORDER BY o_year
""",
    # q9 — product type profit (down-scoped cost: no partsupp table, so
    # supply cost is proxied as 0.5 * p_retailprice — exact at e4 units;
    # plan shape — 5-table profit join grouped by (nation, year) — is the
    # original's)
    "tpch_q9": f"""
SELECT nation,
       o_year,
       CAST(sum(amount_e4) AS BIGINT) AS sum_profit_e4
FROM (
    SELECT n_name AS nation,
           year(o_orderdate) AS o_year,
           {_REV_E4}
               - CAST(round(0.5 * p_retailprice * l_quantity * 10000)
                      AS BIGINT) AS amount_e4
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey
      AND l_partkey = p_partkey
      AND l_orderkey = o_orderkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
) AS profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
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
    # q13 — customer distribution (down-scoped outer-join filter: no
    # o_comment column, so the two-wildcard NOT LIKE tests
    # o_orderpriority; the filter stays INSIDE the left join's ON — the
    # whole point of q13's plan — and the count-of-counts is verbatim)
    "tpch_q13": """
SELECT c_count,
       count(*) AS custdist
FROM (
    SELECT c_custkey,
           count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey
     AND o_orderpriority NOT LIKE '%NOT%SPECIFIED%'
    GROUP BY c_custkey
) AS c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
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
    # q15 — top supplier (faithful; the stream-revenue VIEW is the
    # equivalent CTE, referenced twice — once joined, once under max())
    "tpch_q15": f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(sum({_REV_E4}) AS BIGINT) AS total_revenue_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey,
       s_name,
       total_revenue_e4
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue_e4 = (SELECT max(total_revenue_e4) FROM revenue)
ORDER BY s_suppkey
""",
    # q17 — small-quantity-order revenue (down-scoped part slice: no
    # p_container, so the slice is p_brand + p_size; the correlated
    # 0.2*avg(quantity) scalar subquery — q17's defining feature — is
    # verbatim, in exact cent units on both engines)
    "tpch_q17": """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
           / 7.0 AS avg_yearly_c,
       count(*) AS n_lines
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#23'
  AND p_size < 10
  AND CAST(round(l_quantity * 100) AS BIGINT) <
      (SELECT 0.2 * avg(CAST(round(l_quantity * 100) AS BIGINT))
       FROM lineitem
       WHERE l_partkey = p_partkey)
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
    # q22 — global sales opportunity (down-scoped country code: no
    # c_phone, so the code is c_nationkey itself; the positive-balance
    # global-average scalar subquery and the NOT EXISTS anti-join are
    # verbatim — the anti-join tests "no orders since 1998" because every
    # synthetic customer has at least one order ever; balances compare in
    # exact cents so the threshold is engine-stable)
    "tpch_q22": """
SELECT cntrycode,
       count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS totacctbal_c
FROM (
    SELECT c_nationkey AS cntrycode,
           c_acctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND CAST(round(c_acctbal * 100) AS BIGINT) >
          (SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT))
           FROM customer
           WHERE c_acctbal > 0.00
             AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      AND NOT EXISTS (SELECT *
                      FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
) AS custsale
GROUP BY cntrycode
ORDER BY cntrycode
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
