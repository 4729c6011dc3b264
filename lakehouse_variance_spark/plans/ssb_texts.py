"""The 13 standard Star-Schema-Benchmark flights over the derived SSB schema.

The reference registers the SSB schema alongside TPC-DS/JOB
(`datasets/iceberg conversion/SSB_Trino_Schema.json`,
`docker/trino-client/src/register_hive.sh`) and its models consume
generated workloads over it (`models/Queries/Baseline_SSB/`); the 13
flights below are the public benchmark's own query set (O'Neil et al.,
"The Star Schema Benchmark"), executed as IDENTICAL SQL strings by
``spark.sql`` and the DuckDB oracle over `ssb_schema.py`'s derived
tables — the same contract as the TPC-DS battery.

Dialect/determinism adjustments (documented, same policy as
tpcds_texts.py):

* the reference's ``dim_date`` stores every column as VARCHAR
  (`SSB_Trino_Schema.json`), so year/week literals are quoted strings
  and the date join casts: ``lo_orderdate = CAST(d_datekey AS BIGINT)``;
* parameter literals sit inside the synthetic 1995-2001 date span
  (the spec's 1993/1994 windows shift to 1996/1997 — qgen variables,
  not query structure);
* every ``sum`` is wrapped ``CAST(... AS BIGINT)`` in the text itself so
  both engines emit int64 (DuckDB widens BIGINT sums to HUGEINT, which
  pandas renders as float); all summed quantities are exact integers.

Plan notes at scale: every flight is fact ⋈ broadcast-sized dimensions;
the date/part/supplier/customer sides are all far below the 64 MB
auto-broadcast threshold at any scale factor, so each flight is a
single scan of ``lineorder`` with map-side joins and one partial-agg
shuffle on the (few-valued) group keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_variance_spark.registry import register

_DATE_JOIN = "lo_orderdate = CAST(d_datekey AS BIGINT)"

SSB_TEXTS: dict[str, str] = {
    # -- flight 1: revenue impact of discount/quantity bands (no GROUP BY)
    "ssb_q1_1": f"""
SELECT CAST(sum(lo_extendedprice * lo_discount) AS BIGINT) AS revenue
FROM lineorder, dim_date
WHERE {_DATE_JOIN}
  AND d_year = '1996'
  AND lo_discount BETWEEN 1 AND 3
  AND lo_quantity < 25
""",
    "ssb_q1_2": f"""
SELECT CAST(sum(lo_extendedprice * lo_discount) AS BIGINT) AS revenue
FROM lineorder, dim_date
WHERE {_DATE_JOIN}
  AND d_yearmonthnum = '199701'
  AND lo_discount BETWEEN 4 AND 6
  AND lo_quantity BETWEEN 26 AND 35
""",
    "ssb_q1_3": f"""
SELECT CAST(sum(lo_extendedprice * lo_discount) AS BIGINT) AS revenue
FROM lineorder, dim_date
WHERE {_DATE_JOIN}
  AND d_weeknuminyear = '6' AND d_year = '1997'
  AND lo_discount BETWEEN 5 AND 7
  AND lo_quantity BETWEEN 26 AND 35
""",
    # -- flight 2: revenue by brand within a category/region, over years
    "ssb_q2_1": f"""
SELECT CAST(sum(lo_revenue) AS BIGINT) AS lo_revenue, d_year, p_brand1
FROM lineorder, dim_date, part, supplier
WHERE {_DATE_JOIN}
  AND lo_partkey = p_partkey
  AND lo_suppkey = s_suppkey
  AND p_category = 'MFGR#12'
  AND s_region = 'AMERICA'
GROUP BY d_year, p_brand1
ORDER BY d_year, p_brand1
""",
    "ssb_q2_2": f"""
SELECT CAST(sum(lo_revenue) AS BIGINT) AS lo_revenue, d_year, p_brand1
FROM lineorder, dim_date, part, supplier
WHERE {_DATE_JOIN}
  AND lo_partkey = p_partkey
  AND lo_suppkey = s_suppkey
  AND p_brand1 BETWEEN 'MFGR#2221' AND 'MFGR#2228'
  AND s_region = 'ASIA'
GROUP BY d_year, p_brand1
ORDER BY d_year, p_brand1
""",
    "ssb_q2_3": f"""
SELECT CAST(sum(lo_revenue) AS BIGINT) AS lo_revenue, d_year, p_brand1
FROM lineorder, dim_date, part, supplier
WHERE {_DATE_JOIN}
  AND lo_partkey = p_partkey
  AND lo_suppkey = s_suppkey
  AND p_brand1 = 'MFGR#2221'
  AND s_region = 'EUROPE'
GROUP BY d_year, p_brand1
ORDER BY d_year, p_brand1
""",
    # -- flight 3: revenue flows between geographies over time
    "ssb_q3_1": f"""
SELECT c_nation, s_nation, d_year,
       CAST(sum(lo_revenue) AS BIGINT) AS lo_revenue
FROM customer, lineorder, supplier, dim_date
WHERE lo_custkey = c_custkey
  AND lo_suppkey = s_suppkey
  AND {_DATE_JOIN}
  AND c_region = 'ASIA' AND s_region = 'ASIA'
  AND d_year >= '1995' AND d_year <= '2000'
GROUP BY c_nation, s_nation, d_year
ORDER BY d_year ASC, lo_revenue DESC
""",
    "ssb_q3_2": f"""
SELECT c_city, s_city, d_year,
       CAST(sum(lo_revenue) AS BIGINT) AS lo_revenue
FROM customer, lineorder, supplier, dim_date
WHERE lo_custkey = c_custkey
  AND lo_suppkey = s_suppkey
  AND {_DATE_JOIN}
  AND c_nation = 'UNITED STATES' AND s_nation = 'UNITED STATES'
  AND d_year >= '1995' AND d_year <= '2000'
GROUP BY c_city, s_city, d_year
ORDER BY d_year ASC, lo_revenue DESC
""",
    "ssb_q3_3": f"""
SELECT c_city, s_city, d_year,
       CAST(sum(lo_revenue) AS BIGINT) AS lo_revenue
FROM customer, lineorder, supplier, dim_date
WHERE lo_custkey = c_custkey
  AND lo_suppkey = s_suppkey
  AND {_DATE_JOIN}
  AND (c_city = 'UNITED KI1' OR c_city = 'UNITED KI5')
  AND (s_city = 'UNITED KI1' OR s_city = 'UNITED KI5')
  AND d_year >= '1995' AND d_year <= '2000'
GROUP BY c_city, s_city, d_year
ORDER BY d_year ASC, lo_revenue DESC
""",
    "ssb_q3_4": f"""
SELECT c_city, s_city, d_year,
       CAST(sum(lo_revenue) AS BIGINT) AS lo_revenue
FROM customer, lineorder, supplier, dim_date
WHERE lo_custkey = c_custkey
  AND lo_suppkey = s_suppkey
  AND {_DATE_JOIN}
  AND (c_city = 'UNITED KI1' OR c_city = 'UNITED KI5')
  AND (s_city = 'UNITED KI1' OR s_city = 'UNITED KI5')
  AND d_yearmonth = 'Dec1997'
GROUP BY c_city, s_city, d_year
ORDER BY d_year ASC, lo_revenue DESC
""",
    # -- flight 4: profit drill-down (region -> nation -> city)
    "ssb_q4_1": f"""
SELECT d_year, c_nation,
       CAST(sum(lo_revenue - lo_supplycost) AS BIGINT) AS profit
FROM dim_date, customer, supplier, part, lineorder
WHERE lo_custkey = c_custkey
  AND lo_suppkey = s_suppkey
  AND lo_partkey = p_partkey
  AND {_DATE_JOIN}
  AND c_region = 'AMERICA' AND s_region = 'AMERICA'
  AND (p_mfgr = 'MFGR#1' OR p_mfgr = 'MFGR#2')
GROUP BY d_year, c_nation
ORDER BY d_year, c_nation
""",
    "ssb_q4_2": f"""
SELECT d_year, s_nation, p_category,
       CAST(sum(lo_revenue - lo_supplycost) AS BIGINT) AS profit
FROM dim_date, customer, supplier, part, lineorder
WHERE lo_custkey = c_custkey
  AND lo_suppkey = s_suppkey
  AND lo_partkey = p_partkey
  AND {_DATE_JOIN}
  AND c_region = 'AMERICA' AND s_region = 'AMERICA'
  AND (d_year = '1997' OR d_year = '1998')
  AND (p_mfgr = 'MFGR#1' OR p_mfgr = 'MFGR#2')
GROUP BY d_year, s_nation, p_category
ORDER BY d_year, s_nation, p_category
""",
    "ssb_q4_3": f"""
SELECT d_year, s_city, p_brand1,
       CAST(sum(lo_revenue - lo_supplycost) AS BIGINT) AS profit
FROM dim_date, customer, supplier, part, lineorder
WHERE lo_custkey = c_custkey
  AND lo_suppkey = s_suppkey
  AND lo_partkey = p_partkey
  AND {_DATE_JOIN}
  AND s_nation = 'UNITED STATES'
  AND (d_year = '1997' OR d_year = '1998')
  AND p_category = 'MFGR#14'
GROUP BY d_year, s_city, p_brand1
ORDER BY d_year, s_city, p_brand1
""",
}


def _register_ssb_texts() -> None:
    from lakehouse_variance_spark.plans.ssb_schema import (
        oracle_sql_for_ssb,
        register_ssb_views,
    )

    for name, text in SSB_TEXTS.items():

        def run(spark: SparkSession, sf_dir: str, _text=text) -> DataFrame:
            register_ssb_views(spark, sf_dir)
            return spark.sql(_text)

        run.__name__ = name
        run.__doc__ = (
            f"SSB flight {name[6:].replace('_', '.')} — identical SQL "
            "string on both engines over the derived SSB schema "
            "(SSB_Trino_Schema.json parity; module docstring has the "
            "dialect adjustments)."
        )
        register(name, oracle=oracle_sql_for_ssb(text))(run)


_register_ssb_texts()
