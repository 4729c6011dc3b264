"""Deterministic synthetic Star-Schema-Benchmark schema, derived from the
base tables.

The reference ships the 5-table SSB schema as Trino-typed JSON
(`datasets/iceberg conversion/SSB_Trino_Schema.json`), registers it next
to TPC-DS/JOB (`docker/trino-client/src/register_hive.sh`), and trains/
evaluates its runtime models on thousands of generated SQL texts over it
(`models/Queries/Baseline_SSB/ssb_Baseline_test.ndjson`).  This module
derives that exact schema — same table names, same column names, same
column types (INTEGER facts, all-VARCHAR ``dim_date``) — from the
driver's TPC-H-shaped base tables with one self-contained SQL definition
per table, evaluated by BOTH engines (the `tpcds_schema.py` mechanism):

* Spark materializes each table once per scale factor into a local
  parquet cache (registered queries scan real parquet with pushdown);
* the DuckDB oracle re-derives the tables inline as a WITH-prelude, so
  every hash match verifies the generator on both engines as well as
  the query.

Determinism rules match tpcds_schema.py: BIGINT/VARCHAR columns only,
modular arithmetic on base keys for pseudo-randomness, float ops limited
to immediately-floor()ed divisions (``floor(x + 0.5)`` integerization of
the double base columns is exact: 0.5 has an exact binary
representation, so the sum and floor are single IEEE ops identical on
both engines).

Value domains are the public SSB spec's: the 5 regions, the 25 nations
with their spec region assignment, 9-char nation-prefix cities
(``'UNITED KI1'``), ``MFGR#m``/``MFGR#mc``/``MFGR#mcb`` part hierarchy,
the TPC-H color/type/container word lists.  That makes the reference's
generated workload predicates (``c_region NOT LIKE '%EUROPE%'``,
``p_name IN ('moccasin slate', ...)``, ``lo_shipmode = 'RAIL'``)
selective rather than vacuously empty.

Scale shape: ``lineorder`` is ``lineitem ⋈ orders`` (the SSB spec's own
denormalization of TPC-H), so the single fact table scales linearly with
the base scale factor while the four dimensions stay dimension-sized;
at 100 TB the fact-side derivations are narrow projections of one keyed
join and every dimension is broadcast-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from lakehouse_variance_spark.plans import synth_common as synth

# ---------------------------------------------------------------------------
# Public SSB/TPC-H value domains
# ---------------------------------------------------------------------------

# nation -> region per the SSB spec (5 nations per region)
NATION_REGION: list[tuple[str, str]] = [
    ("ALGERIA", "AFRICA"),
    ("ARGENTINA", "AMERICA"),
    ("BRAZIL", "AMERICA"),
    ("CANADA", "AMERICA"),
    ("EGYPT", "MIDDLE EAST"),
    ("ETHIOPIA", "AFRICA"),
    ("FRANCE", "EUROPE"),
    ("GERMANY", "EUROPE"),
    ("INDIA", "ASIA"),
    ("INDONESIA", "ASIA"),
    ("IRAN", "MIDDLE EAST"),
    ("IRAQ", "MIDDLE EAST"),
    ("JAPAN", "ASIA"),
    ("JORDAN", "MIDDLE EAST"),
    ("KENYA", "AFRICA"),
    ("MOROCCO", "AFRICA"),
    ("MOZAMBIQUE", "AFRICA"),
    ("PERU", "AMERICA"),
    ("CHINA", "ASIA"),
    ("ROMANIA", "EUROPE"),
    ("SAUDI ARABIA", "MIDDLE EAST"),
    ("VIETNAM", "ASIA"),
    ("RUSSIA", "EUROPE"),
    ("UNITED KINGDOM", "EUROPE"),
    ("UNITED STATES", "AMERICA"),
]

COLORS = [
    "almond", "antique", "aquamarine", "azure", "beige", "bisque", "black",
    "blanched", "blue", "blush", "brown", "burlywood", "burnished",
    "chartreuse", "chiffon", "chocolate", "coral", "cornflower", "cornsilk",
    "cream", "cyan", "dark", "deep", "dim", "dodger", "drab", "firebrick",
    "floral", "forest", "frosted", "gainsboro", "ghost", "goldenrod",
    "green", "grey", "honeydew", "hot", "indian", "ivory", "khaki", "lace",
    "lavender", "lawn", "lemon", "light", "lime", "linen", "magenta",
    "maroon", "medium", "metallic", "midnight", "mint", "misty", "moccasin",
    "navajo", "navy", "olive", "orange", "orchid", "pale", "papaya",
    "peach", "peru", "pink", "plum", "powder", "puff", "purple", "red",
    "rose", "rosy", "royal", "saddle", "salmon", "sandy", "seashell",
    "sienna", "sky", "slate", "smoke", "snow", "spring", "steel", "tan",
    "thistle", "tomato", "turquoise", "violet", "wheat", "white", "yellow",
]

TYPE_S1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE_S2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_S3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]

CONTAINERS = [
    "SM CASE", "SM BOX", "SM BAG", "SM JAR", "SM PKG",
    "MED CASE", "MED BOX", "MED BAG", "MED JAR", "MED PKG",
    "LG CASE", "LG BOX", "LG BAG", "LG JAR", "LG PKG",
    "JUMBO CASE", "JUMBO BOX", "JUMBO BAG", "JUMBO JAR", "JUMBO PKG",
]
SHIPMODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
SEASONS_BY_MONTH = [
    "Winter", "Winter", "Spring", "Spring", "Summer", "Summer", "Summer",
    "Summer", "Fall", "Fall", "Christmas", "Christmas",
]
MONTHS_FULL = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]
MONTHS_ABBR = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct",
    "Nov", "Dec",
]
DAY_NAMES = [
    "Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
    "Saturday",
]

# dim_date span covers the base o_orderdate/l_shipdate range (1995-2001).
DATE0 = "DATE '1995-01-01'"
N_DAYS = 2557  # 1995-01-01 .. 2001-12-31 (1996, 2000 are leap years)

_DIGITS = "SELECT 0 AS a " + " ".join(
    f"UNION ALL SELECT {i}" for i in range(1, 10)
)


def _seq(n: int, alias: str = "i") -> str:
    assert n <= 100000
    return f"""(
      SELECT d1.a + 10*d2.a + 100*d3.a + 1000*d4.a AS {alias}
      FROM digits d1, digits d2, digits d3, digits d4
      WHERE d1.a + 10*d2.a + 100*d3.a + 1000*d4.a < {n}
    )"""


def _pick(expr: str, values: list[str]) -> str:
    n = len(values)
    arms = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE ({expr}) % {n} {arms} END"


def _geo_select(key: str) -> str:
    """nation/region/city/phone columns from one key (shared by customer
    and supplier; region is picked by the SAME index so the spec's
    nation->region mapping holds row-by-row)."""
    # city digit comes from floor(key/25) so it is INDEPENDENT of the
    # nation residue (any multiplicative (key*a)%10 is a function of
    # key%25's key%5 component, which would pin each nation's cities to
    # two digits and make the spec's 'UNITED KI1' city unreachable).
    idx = f"({key} * 7 + 3) % 25"
    nation = _pick(idx, [n for n, _ in NATION_REGION])
    region = _pick(idx, [r for _, r in NATION_REGION])
    return f"""
       substr(rpad({nation}, 9, ' '), 1, 9) ||
           CAST(CAST(floor({key} / 25.0) AS BIGINT) % 10 AS VARCHAR(1))
           AS _city,
       {nation} AS _nation,
       {region} AS _region,
       CAST(10 + {idx} AS VARCHAR(2)) || '-' ||
           lpad(CAST(({key} * 104729) % 10000000 AS VARCHAR(7)), 7, '0')
           AS _phone
"""


def _customer() -> str:
    return f"""
SELECT c_custkey,
       'Customer#' || lpad(CAST(c_custkey AS VARCHAR(9)), 9, '0') AS c_name,
       'Address c' || CAST(c_custkey AS VARCHAR(10)) AS c_address,
       _city AS c_city, _nation AS c_nation, _region AS c_region,
       _phone AS c_phone, c_mktsegment
FROM (SELECT c_custkey, c_mktsegment, {_geo_select('c_custkey')}
      FROM customer) g
"""


def _supplier() -> str:
    return f"""
SELECT s_suppkey,
       'Supplier#' || lpad(CAST(s_suppkey AS VARCHAR(9)), 9, '0') AS s_name,
       'Address s' || CAST(s_suppkey AS VARCHAR(10)) AS s_address,
       _city AS s_city, _nation AS s_nation, _region AS s_region,
       _phone AS s_phone
FROM (SELECT s_suppkey, {_geo_select('s_suppkey')}
      FROM supplier) g
"""


def _part() -> str:
    # mfgr/category/brand digits come from independent base-5/base-40
    # positions of the key (floor-division, the blessed float pattern):
    # a multiplicative (pk*a)%5 is always a function of pk%5, which
    # would collapse the 5x5x40 hierarchy to 5 categories total.
    m = "CAST(1 + p_partkey % 5 AS VARCHAR(1))"
    c = "CAST(1 + CAST(floor(p_partkey / 5.0) AS BIGINT) % 5 AS VARCHAR(1))"
    b = "CAST(1 + CAST(floor(p_partkey / 25.0) AS BIGINT) % 40 AS VARCHAR(2))"
    c1 = _pick("p_partkey * 13", COLORS)
    c2 = _pick("CAST(floor(p_partkey / 92.0) AS BIGINT) + 7", COLORS)
    t1 = _pick("p_partkey * 3", TYPE_S1)
    t2 = _pick("p_partkey * 5 + 1", TYPE_S2)
    t3 = _pick("p_partkey * 11 + 2", TYPE_S3)
    return f"""
SELECT p_partkey,
       {c1} || ' ' || {c2} AS p_name,
       'MFGR#' || {m} AS p_mfgr,
       'MFGR#' || {m} || {c} AS p_category,
       'MFGR#' || {m} || {c} || {b} AS p_brand1,
       {c1} AS p_color,
       {t1} || ' ' || {t2} || ' ' || {t3} AS p_type,
       CAST(p_size AS BIGINT) AS p_size,
       {_pick('p_partkey * 19', CONTAINERS)} AS p_container
FROM part
"""


def _dim_date() -> str:
    # 1995-01-01 was a Sunday -> dow = i % 7 with 0=Sunday.
    d = f"{DATE0} + CAST(i AS INT)"
    mon = f"month({d})"
    return f"""
SELECT CAST(year({d}) * 10000 + month({d}) * 100 + day({d})
            AS VARCHAR(8)) AS d_datekey,
       {_pick(f'{mon} - 1', MONTHS_FULL)} || ' ' ||
           CAST(day({d}) AS VARCHAR(2)) || ', ' ||
           CAST(year({d}) AS VARCHAR(4)) AS d_date,
       {_pick('i', DAY_NAMES)} AS d_dayofweek,
       {_pick(f'{mon} - 1', MONTHS_FULL)} AS d_month,
       CAST(year({d}) AS VARCHAR(4)) AS d_year,
       CAST(year({d}) * 100 + month({d}) AS VARCHAR(6)) AS d_yearmonthnum,
       {_pick(f'{mon} - 1', MONTHS_ABBR)} ||
           CAST(year({d}) AS VARCHAR(4)) AS d_yearmonth,
       CAST(1 + i % 7 AS VARCHAR(1)) AS d_daynuminweek,
       CAST(day({d}) AS VARCHAR(2)) AS d_daynuminmonth,
       CAST(dayofyear({d}) AS VARCHAR(3)) AS d_daynuminyear,
       CAST(month({d}) AS VARCHAR(2)) AS d_monthnuminyear,
       CAST(1 + CAST(floor((dayofyear({d}) - 1) / 7.0) AS BIGINT)
            AS VARCHAR(2)) AS d_weeknuminyear,
       {_pick(f'{mon} - 1', SEASONS_BY_MONTH)} AS d_sellingseason,
       CASE WHEN i % 7 = 6 THEN '1' ELSE '0' END AS d_lastdayinweekfl,
       CASE WHEN day({DATE0} + CAST(i + 1 AS INT)) = 1
            THEN '1' ELSE '0' END AS d_lastdayinmonthfl,
       CASE WHEN (i * 17) % 50 = 0 THEN '1' ELSE '0' END AS d_holidayfl,
       CASE WHEN i % 7 IN (1, 2, 3, 4, 5) THEN '1' ELSE '0' END
           AS d_weekdayfl
FROM {_seq(N_DAYS)} s
"""


def _lineorder() -> str:
    lk = "(l_orderkey * 7 + l_linenumber)"
    od = "o_orderdate"
    cd = "l_shipdate"
    return f"""
SELECT l_orderkey AS lo_orderkey,
       CAST(l_linenumber AS BIGINT) AS lo_linenumber,
       o_custkey AS lo_custkey,
       l_partkey AS lo_partkey,
       l_suppkey AS lo_suppkey,
       CAST(year({od}) * 10000 + month({od}) * 100 + day({od}) AS BIGINT)
           AS lo_orderdate,
       o_orderpriority AS lo_orderpriority,
       CAST(0 AS BIGINT) AS lo_shippriority,
       CAST(floor(l_quantity + 0.5) AS BIGINT) AS lo_quantity,
       CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS lo_extendedprice,
       CAST(floor(o_totalprice + 0.5) AS BIGINT) AS lo_ordertotalprice,
       CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS lo_discount,
       CAST(floor(CAST(floor(l_extendedprice + 0.5) AS BIGINT) *
                  (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                  / 100.0) AS BIGINT) AS lo_revenue,
       1 + (l_partkey * 7919 + l_suppkey * 104729) % 99999 AS lo_supplycost,
       CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS lo_tax,
       CAST(year({cd}) * 10000 + month({cd}) * 100 + day({cd}) AS BIGINT)
           AS lo_commitdate,
       {_pick(f'{lk} * 11', SHIPMODES)} AS lo_shipmode
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


# Ordered; defs reference BASE tables only (no cross-def references).
SSB_DEFS: dict[str, str] = {
    "dim_date": _dim_date(),
    "customer": _customer(),
    "supplier": _supplier(),
    "part": _part(),
    "lineorder": _lineorder(),
}

_BASE_TABLES = ("customer", "supplier", "part", "lineitem", "orders")

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_CACHE_ROOT = os.path.join(_REPO_ROOT, ".ssb_cache")

_PRELUDE: str | None = None


def oracle_prelude() -> str:
    global _PRELUDE
    if _PRELUDE is None:
        parts = ["digits(a) AS (" + _DIGITS + ")"]
        for base in _BASE_TABLES:
            parts.append(f"{base}_base AS (SELECT * FROM main.{base})")
        for name, sql in SSB_DEFS.items():
            parts.append(
                f"{name} AS ({synth.repoint_all(sql, _BASE_TABLES)})"
            )
        _PRELUDE = ",\n".join(parts)
    return _PRELUDE


def oracle_sql_for_ssb(query_text: str) -> str:
    return synth.wrap_with_prelude(oracle_prelude(), query_text)


def register_ssb_views(spark: SparkSession, sf_dir: str) -> None:
    """Materialize (if needed) and register the 5 SSB tables, shadowing
    the base customer/supplier/part names (re-registered on every call,
    same contract as register_tpcds_views)."""
    synth.materialize_and_register(
        spark,
        sf_dir,
        SSB_DEFS,
        _BASE_TABLES,
        _CACHE_ROOT,
        build_sql=lambda sql: "WITH digits(a) AS (" + _DIGITS + ")\n" + sql,
    )
