"""Deterministic synthetic TPC-DS schema, derived from the base tables.

The reference's core contract is executing the 99 TPC-DS query texts
verbatim against the 24-table TPC-DS schema (`docker/trino-client/src/
run_workload.py:26-44`; table list `register_hive.sh:12-37`; schema
types `datasets/iceberg conversion/csv_to_iceberg.py:50-64`). The
driver's testdata is TPC-H-shaped, so this module DERIVES the full
TPC-DS schema from it with one self-contained SQL definition per table,
written in the common Spark-SQL/DuckDB dialect and evaluated by BOTH
engines:

* the Spark side materializes each table ONCE per scale factor into a
  local parquet cache (so registered queries scan real parquet with
  pushdown/pruning, and the generation cost is paid once, exactly like
  the reference's one-time csv→Iceberg ingestion);
* the DuckDB oracle re-derives the tables inline as a WITH-prelude in
  front of every query text (`oracle_sql_for`), keeping each oracle a
  single self-contained ANSI-SQL string.

Cross-engine equality of the generated data is therefore itself part of
the correctness gate: every tpcds_q* hash-match exercises both the
query AND the generator on both engines.

Determinism rules (the recurring cross-engine divergence classes:
round() over DOUBLE, HUGEINT widening of DuckDB sums, ANSI overflow /
DIVIDE_BY_ZERO where DuckDB widens or yields inf — each pinned here by
construction):
* every column is BIGINT, DATE, or VARCHAR — money is integer-valued
  BIGINT (think whole dollars), so sums/avgs are exact integer
  accumulations on both engines and order-free;
* pseudo-randomness is modular arithmetic on the base keys
  (`(k * prime) % modulus`) — no engine RNG, no floats;
* the only float ops are `x / c.0` divisions immediately floor()ed,
  which are engine-stable (exact int64→double conversion, one IEEE op).

Scale shape: the three sales channels split `lineitem ⋈ orders` by
`o_orderkey % 3`, so facts scale linearly with the base scale factor
while dimensions stay fixed-size (as in real TPC-DS, where dimension
growth is sublinear). Returns are deterministic subsets of their sales
channel, preserving the (item_sk, ticket/order_number) linkage the
returns-join queries rely on.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from lakehouse_variance_spark.plans import synth_common as synth

# ---------------------------------------------------------------------------
# Domains
# ---------------------------------------------------------------------------

N_DAYS = 1826  # 1998-01-01 .. 2002-12-31
N_TIMES = 1440  # minute granularity; t_time is the second-of-day
N_ADDR = 2000
N_CD = 7000
N_HD = 720
N_IB = 20
N_STORE = 12
N_CC = 6
N_WEBSITE = 12
N_WP = 60
N_WH = 5
N_PROMO = 300
N_REASON = 35
N_SM = 20
N_CP = 1000

_DIGITS = "SELECT 0 AS a " + " ".join(f"UNION ALL SELECT {i}" for i in range(1, 10))


def _seq(n: int, alias: str = "i") -> str:
    """0..n-1 as a derived table (digit cross-products; engine-free).

    ``i`` is BIGINT: when a workload predicate on a derived column (e.g.
    ``w_warehouse_sq_ft = 294242``) is pushed into the CTE, engines may
    evaluate the column expression over the UNFILTERED digit domain (up
    to 99999) before the ``< n`` range filter, and INT32 arithmetic like
    ``50000 * (i + 1)`` would overflow there (DuckDB throws Out of
    Range). BIGINT makes every downstream product safe for any i in the
    domain."""
    assert n <= 100000
    return f"""(
      SELECT CAST(d1.a + 10*d2.a + 100*d3.a + 1000*d4.a + 10000*d5.a
                  AS BIGINT) AS {alias}
      FROM digits d1, digits d2, digits d3, digits d4, digits d5
      WHERE d1.a + 10*d2.a + 100*d3.a + 1000*d4.a + 10000*d5.a < {n}
    )"""


def _pick(expr: str, values: list[str]) -> str:
    """CASE (expr % len(values)) -> quoted value list."""
    n = len(values)
    arms = " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(values)
    )
    return f"CASE ({expr}) % {n} {arms} END"


# value lists cover every literal the registered query texts filter on
CATEGORIES = [
    "Books", "Children", "Electronics", "Home", "Jewelry",
    "Men", "Music", "Shoes", "Sports", "Women",
]
CLASSES = [
    "computers", "stereo", "football", "shirts", "dresses", "pants",
    "pop", "classical", "fiction", "history", "romance", "self-help",
    "reference", "personal", "portable", "maternity", "swimwear",
    "birdal", "infants", "accessories",
]
COLORS = [
    "powder", "khaki", "slate", "forest", "blanched", "burnished",
    "brown", "honeydew", "cyan", "papaya", "floral", "deep", "ghost",
    "light", "cornflower", "midnight", "snow", "orange", "frosted",
    "pale", "purple", "burlywood", "indian", "spring", "medium",
    "almond",
]
SIZES = ["small", "medium", "large", "extra large", "economy", "N/A", "petite"]
UNITS = ["Box", "Pound", "Bunch", "Ton", "Cup", "Dram", "Each", "Tbl",
         "Lb", "Bundle", "N/A", "Dozen", "Ounce", "Oz", "Pallet", "Gross"]
CITIES = [
    "Midway", "Fairview", "Oakland", "Bethel", "Pleasant Hill",
    "Centerville", "Salem", "Springdale", "Union", "Greenfield",
    "Riverside", "Edgewood", "Wilson", "Oak Grove", "Five Points",
    "Liberty", "Mount Olive", "Glendale", "Mount Zion", "Antioch",
]
COUNTIES = [
    "Williamson County", "Walker County", "Ziebach County", "Daviess County",
    "Rush County", "Toole County", "Jefferson County", "Dona Ana County",
    "La Porte County", "Barrow County", "Franklin Parish", "Luce County",
    "Richland County", "Bronx County", "Orange County",
]
STATES = ["TN", "GA", "SD", "TX", "CA", "OH", "IL", "VA", "WA", "NC",
          "KY", "IN", "MI", "FL", "NY", "CO", "NJ", "NM", "LA", "IA",
          "AR", "MS", "ND", "OK", "OR", "MN", "WI", "CT"]
STORE_STATES = ["TN", "SD", "GA", "TX", "OH", "CA"]
COUNTRIES = ["United States", "Canada", "Mexico", "Brazil", "Germany",
             "France", "Japan", "India"]
DAY_NAMES = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
             "Friday", "Saturday"]
STORE_NAMES = ["ought", "able", "ese", "anti", "cally", "ation", "eing", "bar"]
# both capitalizations ship: the reference's query texts are qgen
# instantiations that spell it 'unknown' (q73) AND 'Unknown%' (q91)
BUY_POTENTIAL = [">10000", "unknown", "1001-5000", "5001-10000",
                 "501-1000", "0-500", "Unknown"]
EDUCATION = ["Primary", "Secondary", "College", "2 yr Degree",
             "4 yr Degree", "Advanced Degree", "Unknown"]
MARITAL = ["M", "S", "D", "W", "U"]
CREDIT = ["Low Risk", "Good", "High Risk", "Unknown"]
SM_TYPES = ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "LIBRARY"]
SM_CODES = ["AIR", "SURFACE", "SEA", "SHIP"]
SM_CARRIERS = ["UPS", "FEDEX", "AIRBORNE", "USPS", "TBS", "ZHOU",
               "LATVIAN", "MSC", "DIAMOND", "BARIAN", "DHL", "ORIENTAL"]
WEB_COMPANIES = ["pri", "unknown", "able", "ought", "bar", "ese"]
SALUTATIONS = ["Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"]
ZIPS = [
    "30122", "30431", "30010", "30469", "30625", "30903", "31016",
    "31029", "31387", "31671", "32213", "32754", "33123", "33282",
    "33515", "34102", "34322", "34425", "35258", "35474", "35850",
    "36420", "36446", "36634", "37125", "38122", "38415", "38935",
    "39127", "39516", "39736", "39972", "40162", "40604", "41248",
    "41766", "42029", "24128", "76232", "65084",
]
BRANDS = [
    "scholaramalgamalg #14", "scholaramalgamalg #7", "exportiunivamalg #9",
    "scholaramalgamalg #9", "amalgimporto #1", "edu packscholar #1",
    "exportiimporto #1", "importoamalg #1", "corpnameless #3",
    "edu packamalg #2", "importobrand #4", "univunivamalg #5",
]


def _date_dim() -> str:
    # d_dow: 1998-01-01 is a Thursday -> (i + 4) % 7 with 0=Sunday.
    return f"""
SELECT i AS d_date_sk,
       'D' || lpad(CAST(i AS VARCHAR(10)), 10, '0') AS d_date_id,
       CAST(DATE '1998-01-01' + CAST(i AS INT) AS TIMESTAMP) AS d_date,
       1176 + (year(DATE '1998-01-01' + CAST(i AS INT)) - 1998) * 12
            + month(DATE '1998-01-01' + CAST(i AS INT)) - 1 AS d_month_seq,
       5113 + CAST(floor((i + 4) / 7.0) AS BIGINT) AS d_week_seq,
       392 + (year(DATE '1998-01-01' + CAST(i AS INT)) - 1998) * 4
           + CAST(floor((month(DATE '1998-01-01' + CAST(i AS INT)) - 1) / 3.0)
                  AS BIGINT) AS d_quarter_seq,
       year(DATE '1998-01-01' + CAST(i AS INT)) AS d_year,
       (i + 4) % 7 AS d_dow,
       month(DATE '1998-01-01' + CAST(i AS INT)) AS d_moy,
       day(DATE '1998-01-01' + CAST(i AS INT)) AS d_dom,
       CAST(floor((month(DATE '1998-01-01' + CAST(i AS INT)) - 1) / 3.0)
            AS BIGINT) + 1 AS d_qoy,
       year(DATE '1998-01-01' + CAST(i AS INT)) AS d_fy_year,
       392 + (year(DATE '1998-01-01' + CAST(i AS INT)) - 1998) * 4
           + CAST(floor((month(DATE '1998-01-01' + CAST(i AS INT)) - 1) / 3.0)
                  AS BIGINT) AS d_fy_quarter_seq,
       5113 + CAST(floor((i + 4) / 7.0) AS BIGINT) AS d_fy_week_seq,
       {_pick('(i + 4)', DAY_NAMES)} AS d_day_name,
       CAST(year(DATE '1998-01-01' + CAST(i AS INT)) AS VARCHAR(4)) || 'Q' ||
           CAST(CAST(floor((month(DATE '1998-01-01' + CAST(i AS INT)) - 1)
                           / 3.0) AS BIGINT) + 1 AS VARCHAR(1))
           AS d_quarter_name,
       CASE WHEN (i * 13) % 50 = 0 THEN 'Y' ELSE 'N' END AS d_holiday,
       CASE WHEN (i + 4) % 7 IN (0, 6) THEN 'Y' ELSE 'N' END AS d_weekend,
       CASE WHEN ((i + 1) * 13) % 50 = 0 THEN 'Y' ELSE 'N' END
           AS d_following_holiday,
       i - day(DATE '1998-01-01' + CAST(i AS INT)) + 1 AS d_first_dom,
       i - day(DATE '1998-01-01' + CAST(i AS INT)) + 28 AS d_last_dom,
       i - 365 AS d_same_day_ly,
       i - 91 AS d_same_day_lq,
       'N' AS d_current_day,
       'N' AS d_current_week,
       'N' AS d_current_month,
       'N' AS d_current_quarter,
       'N' AS d_current_year
FROM {_seq(N_DAYS)} s
"""


def _time_dim() -> str:
    return f"""
SELECT i AS t_time_sk,
       'T' || lpad(CAST(i AS VARCHAR(10)), 10, '0') AS t_time_id,
       i * 60 AS t_time,
       CAST(floor(i / 60.0) AS BIGINT) AS t_hour,
       i % 60 AS t_minute,
       0 AS t_second,
       CASE WHEN i < 720 THEN 'AM' ELSE 'PM' END AS t_am_pm,
       CASE WHEN i < 480 THEN 'third' WHEN i < 960 THEN 'first'
            ELSE 'second' END AS t_shift,
       CASE WHEN i % 480 < 240 THEN 'early' ELSE 'late' END AS t_sub_shift,
       CASE WHEN CAST(floor(i / 60.0) AS BIGINT) BETWEEN 6 AND 8
                THEN 'breakfast'
            WHEN CAST(floor(i / 60.0) AS BIGINT) BETWEEN 11 AND 13
                THEN 'lunch'
            WHEN CAST(floor(i / 60.0) AS BIGINT) BETWEEN 17 AND 19
                THEN 'dinner'
            ELSE NULL END AS t_meal_time
FROM {_seq(N_TIMES)} s
"""


def _item() -> str:
    k = "p_partkey"
    return f"""
SELECT {k} AS i_item_sk,
       'I' || lpad(CAST({k} AS VARCHAR(10)), 16, '0') AS i_item_id,
       CAST(DATE '1997-01-01' AS TIMESTAMP) AS i_rec_start_date,
       CAST(NULL AS TIMESTAMP) AS i_rec_end_date,
       p_name AS i_item_desc,
       1 + {_hx(k, 15, 99)} AS i_current_price,
       1 + {_hx(k, 21, 80)} AS i_wholesale_cost,
       1001001 + {_hx(k, 25, 1000)} AS i_brand_id,
       {_pick(_hx(k, 27, len(BRANDS)), BRANDS)} AS i_brand,
       1 + {_hx(k, 33, len(CLASSES))} AS i_class_id,
       {_pick(_hx(k, 33, len(CLASSES)), CLASSES)} AS i_class,
       1 + {k} % {len(CATEGORIES)} AS i_category_id,
       {_pick(k, CATEGORIES)} AS i_category,
       ({k} * 11) % 997 AS i_manufact_id,
       'Manufact#' || CAST(({k} * 11) % 997 AS VARCHAR(4)) AS i_manufact,
       {_pick(_hx(k, 35, len(SIZES)), SIZES)} AS i_size,
       lpad(CAST(({k} * 19) % 100000 AS VARCHAR(8)), 20, '0')
           AS i_formulation,
       {_pick(_hx(k, 39, len(COLORS)), COLORS)} AS i_color,
       {_pick(_hx(k, 45, len(UNITS)), UNITS)} AS i_units,
       'Unknown' AS i_container,
       1 + {_hx(k, 51, 101)} AS i_manager_id,
       p_name AS i_product_name
FROM part
"""


def _customer() -> str:
    k = "c_custkey"
    return f"""
SELECT {k} AS c_customer_sk,
       'C' || lpad(CAST({k} AS VARCHAR(10)), 15, '0') AS c_customer_id,
       CASE WHEN ({k} * 7) % 41 = 0 THEN NULL
            ELSE {_hx(k, 11, N_CD)} END AS c_current_cdemo_sk,
       CASE WHEN ({k} * 11) % 43 = 0 THEN NULL
            ELSE {_hx(k, 13, N_HD)} END AS c_current_hdemo_sk,
       {_hx(k, 7, N_ADDR)} AS c_current_addr_sk,
       {_hx(k, 3, N_DAYS)} AS c_first_shipto_date_sk,
       CASE WHEN {_hx(k, 3, N_DAYS)} >= 30
            THEN {_hx(k, 3, N_DAYS)} - 30 ELSE 0 END
           AS c_first_sales_date_sk,
       {_pick(k, SALUTATIONS)} AS c_salutation,
       'First' || CAST({k} % 500 AS VARCHAR(4)) AS c_first_name,
       'Last' || CAST({k} % 700 AS VARCHAR(4)) AS c_last_name,
       CASE WHEN ({k} * 13) % 2 = 0 THEN 'Y' ELSE 'N' END
           AS c_preferred_cust_flag,
       1 + ({k} * 17) % 28 AS c_birth_day,
       1 + ({k} * 19) % 12 AS c_birth_month,
       1924 + ({k} * 23) % 70 AS c_birth_year,
       {_pick(f'{k} * 29', [c.upper() for c in COUNTRIES])} AS c_birth_country,
       CAST(NULL AS VARCHAR(10)) AS c_login,
       'user' || CAST({k} AS VARCHAR(10)) || '@example.com'
           AS c_email_address,
       ({k} * 37) % {N_DAYS} AS c_last_review_date
FROM customer
"""


def _customer_address() -> str:
    return f"""
SELECT i AS ca_address_sk,
       'A' || lpad(CAST(i AS VARCHAR(10)), 15, '0') AS ca_address_id,
       CAST(1 + (i * 7) % 999 AS VARCHAR(4)) AS ca_street_number,
       {_pick('i * 3', ['Main', 'Oak', 'Park', 'Elm', 'Church', 'Maple',
                        'Walnut', 'Railroad', 'Mill', 'River'])}
           AS ca_street_name,
       {_pick('i * 11', ['Street', 'Avenue', 'Road', 'Boulevard', 'Lane',
                         'Drive', 'Court', 'Way'])} AS ca_street_type,
       'Suite ' || CAST(i % 100 AS VARCHAR(3)) AS ca_suite_number,
       {_pick('i * 13', CITIES)} AS ca_city,
       -- every 4th address copies store (i/4 mod N_STORE)'s exact
       -- (county, state) pair so customer-geo = store-geo joins (q54's
       -- ca_county = s_county AND ca_state = s_state) have real matches
       CASE WHEN i % 4 = 0
            THEN {_pick(f'(CAST(floor(i / 4.0) AS BIGINT) % {N_STORE}) * 11',
                        COUNTIES[:4])}
            ELSE {_pick('i * 17', COUNTIES)} END AS ca_county,
       CASE WHEN i % 4 = 0
            THEN {_pick(f'(CAST(floor(i / 4.0) AS BIGINT) % {N_STORE}) * 13',
                        STORE_STATES)}
            ELSE {_pick('i * 19', STATES)} END AS ca_state,
       {_pick('i * 41', ZIPS)} AS ca_zip,
       CASE WHEN (i * 23) % 20 = 0 THEN {_pick('i * 29', COUNTRIES[1:])}
            ELSE 'United States' END AS ca_country,
       0 - (5 + (i * 7) % 4) AS ca_gmt_offset,
       {_pick('i * 31', ['condo', 'single family', 'apartment'])}
           AS ca_location_type
FROM {_seq(N_ADDR)} s
"""


def _customer_demographics() -> str:
    return f"""
SELECT i AS cd_demo_sk,
       CASE i % 2 WHEN 0 THEN 'M' ELSE 'F' END AS cd_gender,
       {_pick('CAST(floor(i / 2.0) AS BIGINT)', MARITAL)} AS cd_marital_status,
       {_pick('CAST(floor(i / 10.0) AS BIGINT)', EDUCATION)}
           AS cd_education_status,
       500 * (1 + (CAST(floor(i / 70.0) AS BIGINT) % 20))
           AS cd_purchase_estimate,
       {_pick('CAST(floor(i / 3.0) AS BIGINT)', CREDIT)} AS cd_credit_rating,
       i % 7 AS cd_dep_count,
       CAST(floor(i / 7.0) AS BIGINT) % 7 AS cd_dep_employed_count,
       CAST(floor(i / 49.0) AS BIGINT) % 7 AS cd_dep_college_count
FROM {_seq(N_CD)} s
"""


def _household_demographics() -> str:
    return f"""
SELECT i AS hd_demo_sk,
       i % {N_IB} AS hd_income_band_sk,
       {_pick('i', BUY_POTENTIAL)} AS hd_buy_potential,
       i % 10 AS hd_dep_count,
       CAST(floor(i / 10.0) AS BIGINT) % 6 - 1 AS hd_vehicle_count
FROM {_seq(N_HD)} s
"""


def _income_band() -> str:
    return f"""
SELECT i AS ib_income_band_sk,
       i * 10000 + 1 AS ib_lower_bound,
       (i + 1) * 10000 AS ib_upper_bound
FROM {_seq(N_IB)} s
"""


def _store() -> str:
    return f"""
SELECT i AS s_store_sk,
       'S' || lpad(CAST(i AS VARCHAR(4)), 15, '0') AS s_store_id,
       CAST(DATE '1997-01-01' AS TIMESTAMP) AS s_rec_start_date,
       CAST(NULL AS TIMESTAMP) AS s_rec_end_date,
       CAST(NULL AS BIGINT) AS s_closed_date_sk,
       {_pick('i', STORE_NAMES)} AS s_store_name,
       200 + i * 8 AS s_number_employees,
       5000001 + i * 500000 AS s_floor_space,
       {_pick('i * 5', ['8AM-8AM', '8AM-4PM', '8AM-12AM'])} AS s_hours,
       'Manager' || CAST(i AS VARCHAR(2)) AS s_manager,
       1 + i % 10 AS s_market_id,
       'Unknown' AS s_geography_class,
       'market description ' || CAST(i AS VARCHAR(2)) AS s_market_desc,
       'MktManager' || CAST(i % 5 AS VARCHAR(2)) AS s_market_manager,
       1 AS s_division_id,
       'Unknown' AS s_division_name,
       1 AS s_company_id,
       'Unknown' AS s_company_name,
       CAST(100 + i AS VARCHAR(4)) AS s_street_number,
       {_pick('i * 3', ['Main', 'Oak', 'Park', 'Elm', 'Church'])}
           AS s_street_name,
       'Street' AS s_street_type,
       'Suite ' || CAST(i AS VARCHAR(2)) AS s_suite_number,
       {_pick('i * 7', CITIES[:5])} AS s_city,
       {_pick('i * 11', COUNTIES[:4])} AS s_county,
       {_pick('i * 13', STORE_STATES)} AS s_state,
       {_pick('i * 7', ZIPS)} AS s_zip,
       'United States' AS s_country,
       0 - (5 + i % 2) AS s_gmt_offset,
       0 AS s_tax_percentage -- the reference's tables use the CORRECTED
       -- spelling (its generated workload texts filter on
       -- store.s_tax_percentage), not the TPC-DS spec's famous
       -- 's_tax_precentage' typo; the 99 q*.sql texts touch neither
FROM {_seq(N_STORE)} s
"""


def _call_center() -> str:
    return f"""
SELECT i AS cc_call_center_sk,
       'CC' || lpad(CAST(i AS VARCHAR(2)), 14, '0') AS cc_call_center_id,
       CAST(DATE '1997-01-01' AS TIMESTAMP) AS cc_rec_start_date,
       CAST(NULL AS TIMESTAMP) AS cc_rec_end_date,
       CAST(NULL AS BIGINT) AS cc_closed_date_sk,
       30 + i AS cc_open_date_sk,
       'call center ' || CAST(i AS VARCHAR(2)) AS cc_name,
       {_pick('i', ['small', 'medium', 'large'])} AS cc_class,
       50 + i * 25 AS cc_employees,
       10000 + i * 5000 AS cc_sq_ft,
       '8AM-8AM' AS cc_hours,
       'CCManager' || CAST(i AS VARCHAR(2)) AS cc_manager,
       1 + i % 6 AS cc_mkt_id,
       'mkt class ' || CAST(i % 3 AS VARCHAR(2)) AS cc_mkt_class,
       'mkt desc ' || CAST(i AS VARCHAR(2)) AS cc_mkt_desc,
       'MktMgr' || CAST(i % 3 AS VARCHAR(2)) AS cc_market_manager,
       1 AS cc_division,
       'Unknown' AS cc_division_name,
       1 AS cc_company,
       'Unknown' AS cc_company_name,
       CAST(200 + i AS VARCHAR(4)) AS cc_street_number,
       'Main' AS cc_street_name,
       'Street' AS cc_street_type,
       'Suite 1' AS cc_suite_number,
       {_pick('i * 5', CITIES[:4])} AS cc_city,
       {_pick('i * 7', COUNTIES[:3])} AS cc_county,
       {_pick('i * 11', STORE_STATES[:3])} AS cc_state,
       lpad(CAST(40000 + i * 1111 AS VARCHAR(5)), 5, '0') AS cc_zip,
       'United States' AS cc_country,
       -5 AS cc_gmt_offset,
       0 AS cc_tax_percentage
FROM {_seq(N_CC)} s
"""


def _web_site() -> str:
    return f"""
SELECT i AS web_site_sk,
       'WS' || lpad(CAST(i AS VARCHAR(2)), 14, '0') AS web_site_id,
       CAST(DATE '1997-01-01' AS TIMESTAMP) AS web_rec_start_date,
       CAST(NULL AS TIMESTAMP) AS web_rec_end_date,
       'site_' || CAST(i % 4 AS VARCHAR(2)) AS web_name,
       30 + i AS web_open_date_sk,
       CAST(NULL AS BIGINT) AS web_close_date_sk,
       'Unknown' AS web_class,
       'WebManager' || CAST(i AS VARCHAR(2)) AS web_manager,
       1 + i % 6 AS web_mkt_id,
       'mkt class ' || CAST(i % 3 AS VARCHAR(2)) AS web_mkt_class,
       'mkt desc ' || CAST(i AS VARCHAR(2)) AS web_mkt_desc,
       'MktMgr' || CAST(i % 4 AS VARCHAR(2)) AS web_market_manager,
       1 + i % 6 AS web_company_id,
       {_pick('i', WEB_COMPANIES)} AS web_company_name,
       CAST(300 + i AS VARCHAR(4)) AS web_street_number,
       'Main' AS web_street_name,
       'Street' AS web_street_type,
       'Suite 2' AS web_suite_number,
       {_pick('i * 3', CITIES[:6])} AS web_city,
       {_pick('i * 5', COUNTIES[:4])} AS web_county,
       {_pick('i * 7', STORE_STATES)} AS web_state,
       lpad(CAST(50000 + i * 1111 AS VARCHAR(5)), 5, '0') AS web_zip,
       'United States' AS web_country,
       -5 AS web_gmt_offset,
       0 AS web_tax_percentage
FROM {_seq(N_WEBSITE)} s
"""


def _web_page() -> str:
    return f"""
SELECT i AS wp_web_page_sk,
       'WP' || lpad(CAST(i AS VARCHAR(2)), 14, '0') AS wp_web_page_id,
       CAST(DATE '1997-01-01' AS TIMESTAMP) AS wp_rec_start_date,
       CAST(NULL AS TIMESTAMP) AS wp_rec_end_date,
       (i * 17) % {N_DAYS} AS wp_creation_date_sk,
       (i * 19) % {N_DAYS} AS wp_access_date_sk,
       CASE i % 2 WHEN 0 THEN 'Y' ELSE 'N' END AS wp_autogen_flag,
       CASE WHEN i % 5 = 0 THEN NULL ELSE (i * 23) % 1500 END
           AS wp_customer_sk,
       'http://www.example.com/page' || CAST(i AS VARCHAR(2)) AS wp_url,
       {_pick('i * 3', ['general', 'welcome', 'protected', 'dynamic',
                        'feedback', 'order', 'ad'])} AS wp_type,
       2500 + i * 100 AS wp_char_count,
       i % 25 AS wp_link_count,
       i % 7 AS wp_image_count,
       i % 4 AS wp_max_ad_count
FROM {_seq(N_WP)} s
"""


def _warehouse() -> str:
    return f"""
SELECT i AS w_warehouse_sk,
       'W' || lpad(CAST(i AS VARCHAR(2)), 15, '0') AS w_warehouse_id,
       'Warehouse number ' || CAST(i AS VARCHAR(2)) AS w_warehouse_name,
       50000 * (i + 1) AS w_warehouse_sq_ft,
       CAST(400 + i AS VARCHAR(4)) AS w_street_number,
       'Main' AS w_street_name,
       'Street' AS w_street_type,
       'Suite 3' AS w_suite_number,
       {_pick('i * 3', CITIES[:5])} AS w_city,
       {_pick('i * 5', COUNTIES[:3])} AS w_county,
       {_pick('i * 7', STORE_STATES[:3])} AS w_state,
       lpad(CAST(60000 + i * 1111 AS VARCHAR(5)), 5, '0') AS w_zip,
       'United States' AS w_country,
       -5 AS w_gmt_offset
FROM {_seq(N_WH)} s
"""


def _promotion() -> str:
    def yn(p: int) -> str:
        return f"CASE WHEN (i * {p}) % 3 = 0 THEN 'Y' ELSE 'N' END"

    return f"""
SELECT i AS p_promo_sk,
       'P' || lpad(CAST(i AS VARCHAR(4)), 15, '0') AS p_promo_id,
       (i * 11) % {N_DAYS} AS p_start_date_sk,
       ((i * 11) % {N_DAYS} + 60) % {N_DAYS} AS p_end_date_sk,
       (i * 13) % 2000 AS p_item_sk,
       1000 AS p_cost,
       100 AS p_response_target,
       'promo' || CAST(i % 5 AS VARCHAR(2)) AS p_promo_name,
       {yn(3)} AS p_channel_dmail,
       {yn(5)} AS p_channel_email,
       {yn(7)} AS p_channel_catalog,
       {yn(11)} AS p_channel_tv,
       {yn(13)} AS p_channel_radio,
       {yn(17)} AS p_channel_press,
       {yn(19)} AS p_channel_event,
       {yn(23)} AS p_channel_demo,
       'channel details ' || CAST(i AS VARCHAR(4)) AS p_channel_details,
       'purpose' || CAST(i % 4 AS VARCHAR(2)) AS p_purpose,
       CASE i % 2 WHEN 0 THEN 'Y' ELSE 'N' END AS p_discount_active
FROM {_seq(N_PROMO)} s
"""


def _reason() -> str:
    return f"""
SELECT i AS r_reason_sk,
       'R' || lpad(CAST(i AS VARCHAR(2)), 15, '0') AS r_reason_id,
       'reason ' || CAST(i AS VARCHAR(2)) AS r_reason_desc
FROM {_seq(N_REASON)} s
"""


def _ship_mode() -> str:
    return f"""
SELECT i AS sm_ship_mode_sk,
       'SM' || lpad(CAST(i AS VARCHAR(2)), 14, '0') AS sm_ship_mode_id,
       {_pick('i', SM_TYPES)} AS sm_type,
       {_pick('i * 3', SM_CODES)} AS sm_code,
       {_pick('i * 7', SM_CARRIERS)} AS sm_carrier,
       'contract' || CAST(i AS VARCHAR(2)) AS sm_contract
FROM {_seq(N_SM)} s
"""


def _catalog_page() -> str:
    return f"""
SELECT i AS cp_catalog_page_sk,
       'CP' || lpad(CAST(i AS VARCHAR(4)), 14, '0') AS cp_catalog_page_id,
       (i * 7) % {N_DAYS} AS cp_start_date_sk,
       ((i * 7) % {N_DAYS} + 90) % {N_DAYS} AS cp_end_date_sk,
       'DEPARTMENT' AS cp_department,
       1 + CAST(floor(i / 100.0) AS BIGINT) AS cp_catalog_number,
       1 + i % 100 AS cp_catalog_page_number,
       'page description ' || CAST(i AS VARCHAR(4)) AS cp_description,
       {_pick('i * 3', ['bi-annual', 'quarterly', 'monthly'])} AS cp_type
FROM {_seq(N_CP)} s
"""


def _inventory() -> str:
    # part x 5 warehouses x every-14th-day: dense enough that every 30-60
    # day query window contains 2-4 snapshot dates.
    return f"""
SELECT s.i * 14 AS inv_date_sk,
       p_partkey AS inv_item_sk,
       w.i AS inv_warehouse_sk,
       CASE WHEN (p_partkey * 13 + s.i * 3 + w.i) % 7 < 5 THEN 0
            ELSE (p_partkey * 17 + s.i * 13 + w.i * 7) % 1000
       END AS inv_quantity_on_hand
FROM part, {_seq(131)} s, {_seq(N_WH)} w
"""


# ---------------------------------------------------------------------------
# Fact channels: lineitem ⋈ orders split by o_orderkey % 3
# ---------------------------------------------------------------------------

_LK = "(l_orderkey * 7 + l_linenumber)"  # unique line key

# Nonlinear portable mixer. Purely LINEAR spreads ((a*k) % m) leave exact
# modular dependencies BETWEEN columns (e.g. a cd-attribute filter pinned
# lk mod 70, which pinned l_linenumber, which — with the channel's
# orderkey%3 split — made every surviving row's promo channel flag 'Y'
# and silently emptied q7). A quadratic over a large prime field breaks
# those cross-column linear relations while staying engine-exact in
# BIGINT: (r² + salt·r + c) mod P with r = k mod P, P = 1e9+7, so the
# largest intermediate is (P-1)² + 97(P-1) < 2^63.
_P = 1000000007


def _hx(expr: str, salt: int, m: int) -> str:
    assert 0 < salt < 100
    # Knuth-multiply FIRST so the mod-P wrap engages even for small keys
    # (a bare quadratic of a 5-digit key never exceeds P, making mod P the
    # identity and leaving the small-modulus structure intact); then one
    # quadratic round over the wrapped residue breaks linear relations.
    # The key is reduced mod P BEFORE the multiply: (P-1)·2654435761 ≈
    # 2.7e18 < 2^63, so the expression is ANSI-overflow-safe for any int64
    # key (the 10× probe's key-shifted replicas reach 9e10, where the raw
    # product would throw). Identical values for keys < P — every real
    # scale factor — so oracle parity is untouched by construction (both
    # engines evaluate this same string).
    r = f"(((({expr}) % {_P}) * 2654435761 + {salt}) % {_P})"
    return f"((({r} * {r} + {r}) % {_P}) % {m})"


def _sales_core(p: dict[str, int]) -> str:
    """Shared money/quantity machinery for one channel; `p` carries the
    per-channel spreading primes so channels decorrelate."""
    lk = _LK
    qty = "CAST(round(l_quantity) AS BIGINT)"
    sales_price = f"({lk} * {p['sp']}) % 200"
    list_price = f"({sales_price} + ({lk} * {p['lp']}) % 100 + 1)"
    wholesale = f"(({lk} * {p['wc']}) % 100 + 1)"
    ext_sales = f"({qty} * ({sales_price}))"
    ext_list = f"({qty} * {list_price})"
    ext_whole = f"({qty} * {wholesale})"
    coupon = (
        f"(CASE WHEN {lk} % 5 = 0 THEN least(({lk} * 11) % 100, {ext_sales}) "
        f"ELSE 0 END)"
    )
    tax = f"CAST(floor({ext_sales} / 10.0) AS BIGINT)"
    return f"""
       {qty} AS {p['pre']}quantity,
       {wholesale} AS {p['pre']}wholesale_cost,
       {list_price} AS {p['pre']}list_price,
       {sales_price} AS {p['pre']}sales_price,
       {ext_list} - {ext_sales} AS {p['pre']}ext_discount_amt,
       {ext_sales} AS {p['pre']}ext_sales_price,
       {ext_whole} AS {p['pre']}ext_wholesale_cost,
       {ext_list} AS {p['pre']}ext_list_price,
       {tax} AS {p['pre']}ext_tax,
       {coupon} AS {p['pre']}coupon_amt"""


def _null_every(expr: str, k: str, n: int) -> str:
    return f"CASE WHEN ({k}) % {n} = 0 THEN NULL ELSE {expr} END"


def _store_sales() -> str:
    lk = _LK
    p = {"pre": "ss_", "sp": 73, "lp": 37, "wc": 53}
    ext_sales = f"(CAST(round(l_quantity) AS BIGINT) * (({lk} * 73) % 200))"
    coupon = (
        f"(CASE WHEN {lk} % 5 = 0 THEN least(({lk} * 11) % 100, {ext_sales}) "
        f"ELSE 0 END)"
    )
    tax = f"CAST(floor({ext_sales} / 10.0) AS BIGINT)"
    net_paid = f"({ext_sales} - {coupon})"
    ext_whole = f"(CAST(round(l_quantity) AS BIGINT) * (({lk} * 53) % 100 + 1))"
    return f"""
SELECT {_hx('o_orderkey', 29, N_DAYS)} AS ss_sold_date_sk,
       {_hx(lk, 31, N_TIMES)} AS ss_sold_time_sk,
       l_partkey AS ss_item_sk,
       {_null_every('o_custkey', lk, 19)} AS ss_customer_sk,
       {_null_every(_hx(lk, 37, N_CD), lk, 23)} AS ss_cdemo_sk,
       {_null_every(_hx(lk, 41, N_HD), lk, 29)} AS ss_hdemo_sk,
       {_null_every(_hx('o_custkey', 43, N_ADDR), lk, 31)}
           AS ss_addr_sk,
       {_null_every(_hx('o_orderkey', 47, N_STORE), lk, 37)} AS ss_store_sk,
       {_null_every(_hx(lk, 53, N_PROMO), lk, 11)} AS ss_promo_sk,
       o_custkey * 4 + o_orderkey % 4 AS ss_ticket_number,
       {_sales_core(p)},
       {net_paid} AS ss_net_paid,
       {net_paid} + {tax} AS ss_net_paid_inc_tax,
       {net_paid} - {ext_whole} AS ss_net_profit
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderkey % 3 = 0
"""


def _catalog_sales() -> str:
    lk = _LK
    p = {"pre": "cs_", "sp": 79, "lp": 41, "wc": 59}
    ext_sales = f"(CAST(round(l_quantity) AS BIGINT) * (({lk} * 79) % 200))"
    coupon = (
        f"(CASE WHEN {lk} % 5 = 0 THEN least(({lk} * 11) % 100, {ext_sales}) "
        f"ELSE 0 END)"
    )
    tax = f"CAST(floor({ext_sales} / 10.0) AS BIGINT)"
    net_paid = f"({ext_sales} - {coupon})"
    ext_whole = f"(CAST(round(l_quantity) AS BIGINT) * (({lk} * 59) % 100 + 1))"
    ship_cost = f"(CAST(round(l_quantity) AS BIGINT) * (({lk} * 19) % 50))"
    return f"""
SELECT {_hx('o_orderkey', 59, N_DAYS)} AS cs_sold_date_sk,
       {_hx(lk, 61, N_TIMES)} AS cs_sold_time_sk,
       least({_hx('o_orderkey', 59, N_DAYS)} + 1 + {lk} % 120, {N_DAYS - 1})
           AS cs_ship_date_sk,
       o_custkey AS cs_bill_customer_sk,
       {_hx(lk, 37, N_CD)} AS cs_bill_cdemo_sk,
       {_hx(lk, 41, N_HD)} AS cs_bill_hdemo_sk,
       {_hx('o_custkey', 43, N_ADDR)} AS cs_bill_addr_sk,
       {_null_every('o_custkey', lk, 19)} AS cs_ship_customer_sk,
       -- ship-to demographics equal the bill-to demographics 4 rows in 5
       -- (most buyers ship to themselves); returner-demographic joins
       -- (q85's cd1 = refunded, cd2 = returning band pairs) depend on it
       CASE WHEN {lk} % 5 = 0 THEN {_hx(lk, 67, N_CD)}
            ELSE {_hx(lk, 37, N_CD)} END AS cs_ship_cdemo_sk,
       CASE WHEN {lk} % 5 = 0 THEN {_hx(lk, 71, N_HD)}
            ELSE {_hx(lk, 41, N_HD)} END AS cs_ship_hdemo_sk,
       {_null_every(_hx('o_custkey', 73, N_ADDR), lk, 31)}
           AS cs_ship_addr_sk,
       {_null_every(_hx('o_orderkey', 79, N_CC), lk, 37)}
           AS cs_call_center_sk,
       {_hx(lk, 83, N_CP)} AS cs_catalog_page_sk,
       {_hx(lk, 89, N_SM)} AS cs_ship_mode_sk,
       {_null_every(_hx(lk, 97, N_WH), lk, 43)} AS cs_warehouse_sk,
       l_partkey AS cs_item_sk,
       {_null_every(_hx(lk, 53, N_PROMO), lk, 11)} AS cs_promo_sk,
       o_orderkey AS cs_order_number,
       {_sales_core(p)},
       {ship_cost} AS cs_ext_ship_cost,
       {net_paid} AS cs_net_paid,
       {net_paid} + {tax} AS cs_net_paid_inc_tax,
       {net_paid} + {ship_cost} AS cs_net_paid_inc_ship,
       {net_paid} + {ship_cost} + {tax} AS cs_net_paid_inc_ship_tax,
       {net_paid} - {ext_whole} AS cs_net_profit
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderkey % 3 = 1
"""


def _web_sales() -> str:
    lk = _LK
    p = {"pre": "ws_", "sp": 83, "lp": 43, "wc": 61}
    ext_sales = f"(CAST(round(l_quantity) AS BIGINT) * (({lk} * 83) % 200))"
    coupon = (
        f"(CASE WHEN {lk} % 5 = 0 THEN least(({lk} * 11) % 100, {ext_sales}) "
        f"ELSE 0 END)"
    )
    tax = f"CAST(floor({ext_sales} / 10.0) AS BIGINT)"
    net_paid = f"({ext_sales} - {coupon})"
    ext_whole = f"(CAST(round(l_quantity) AS BIGINT) * (({lk} * 61) % 100 + 1))"
    ship_cost = f"(CAST(round(l_quantity) AS BIGINT) * (({lk} * 23) % 50))"
    return f"""
SELECT {_hx('o_orderkey', 23, N_DAYS)} AS ws_sold_date_sk,
       {_hx(lk, 19, N_TIMES)} AS ws_sold_time_sk,
       least({_hx('o_orderkey', 23, N_DAYS)} + 1 + {lk} % 120, {N_DAYS - 1})
           AS ws_ship_date_sk,
       l_partkey AS ws_item_sk,
       o_custkey AS ws_bill_customer_sk,
       {_hx(lk, 37, N_CD)} AS ws_bill_cdemo_sk,
       {_hx(lk, 41, N_HD)} AS ws_bill_hdemo_sk,
       {_hx('o_custkey', 43, N_ADDR)} AS ws_bill_addr_sk,
       {_null_every('o_custkey', lk, 19)} AS ws_ship_customer_sk,
       CASE WHEN {lk} % 5 = 0 THEN {_hx(lk, 67, N_CD)}
            ELSE {_hx(lk, 37, N_CD)} END AS ws_ship_cdemo_sk,
       CASE WHEN {lk} % 5 = 0 THEN {_hx(lk, 71, N_HD)}
            ELSE {_hx(lk, 41, N_HD)} END AS ws_ship_hdemo_sk,
       {_null_every(_hx('o_custkey', 73, N_ADDR), lk, 31)}
           AS ws_ship_addr_sk,
       {_hx(lk, 13, N_WP)} AS ws_web_page_sk,
       {_hx('o_orderkey', 17, N_WEBSITE)} AS ws_web_site_sk,
       {_hx(lk, 89, N_SM)} AS ws_ship_mode_sk,
       {_null_every(_hx(lk, 97, N_WH), lk, 43)} AS ws_warehouse_sk,
       {_null_every(_hx(lk, 53, N_PROMO), lk, 11)} AS ws_promo_sk,
       o_orderkey AS ws_order_number,
       {_sales_core(p)},
       {ship_cost} AS ws_ext_ship_cost,
       {net_paid} AS ws_net_paid,
       {net_paid} + {tax} AS ws_net_paid_inc_tax,
       {net_paid} + {ship_cost} AS ws_net_paid_inc_ship,
       {net_paid} + {ship_cost} + {tax} AS ws_net_paid_inc_ship_tax,
       {net_paid} - {ext_whole} AS ws_net_profit
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderkey % 3 = 2
"""


def _store_returns() -> str:
    amt = "(least(ss_quantity, 1 + ss_item_sk % 10) * ss_sales_price * 10)"
    cash = f"CAST(floor({amt} / 2.0) AS BIGINT)"
    rev = f"CAST(floor(({amt} - {cash}) / 2.0) AS BIGINT)"
    return f"""
SELECT least(ss_sold_date_sk + 7 + ss_item_sk % 84, {N_DAYS - 1})
           AS sr_returned_date_sk,
       ss_sold_time_sk AS sr_return_time_sk,
       ss_item_sk AS sr_item_sk,
       ss_customer_sk AS sr_customer_sk,
       ss_cdemo_sk AS sr_cdemo_sk,
       ss_hdemo_sk AS sr_hdemo_sk,
       ss_addr_sk AS sr_addr_sk,
       ss_store_sk AS sr_store_sk,
       (ss_ticket_number * 7 + ss_item_sk) % {N_REASON} AS sr_reason_sk,
       ss_ticket_number AS sr_ticket_number,
       least(ss_quantity, 1 + ss_item_sk % 10) AS sr_return_quantity,
       {amt} AS sr_return_amt,
       CAST(floor({amt} / 10.0) AS BIGINT) AS sr_return_tax,
       {amt} + CAST(floor({amt} / 10.0) AS BIGINT) AS sr_return_amt_inc_tax,
       (ss_item_sk * 3) % 50 AS sr_fee,
       (ss_item_sk * 7) % 100 AS sr_return_ship_cost,
       {cash} AS sr_refunded_cash,
       {rev} AS sr_reversed_charge,
       {amt} - {cash} - {rev} AS sr_store_credit,
       {amt} + (ss_item_sk * 3) % 50 + (ss_item_sk * 7) % 100 - {cash}
           AS sr_net_loss
FROM store_sales
WHERE (ss_ticket_number * 3 + ss_item_sk) % 4 = 0
"""


def _catalog_returns() -> str:
    amt = "(least(cs_quantity, 1 + cs_item_sk % 10) * cs_sales_price * 10)"
    cash = f"CAST(floor({amt} / 2.0) AS BIGINT)"
    rev = f"CAST(floor(({amt} - {cash}) / 2.0) AS BIGINT)"
    return f"""
SELECT least(cs_sold_date_sk + 7 + cs_item_sk % 84, {N_DAYS - 1})
           AS cr_returned_date_sk,
       cs_sold_time_sk AS cr_returned_time_sk,
       cs_item_sk AS cr_item_sk,
       cs_bill_customer_sk AS cr_refunded_customer_sk,
       cs_bill_cdemo_sk AS cr_refunded_cdemo_sk,
       cs_bill_hdemo_sk AS cr_refunded_hdemo_sk,
       cs_bill_addr_sk AS cr_refunded_addr_sk,
       cs_ship_customer_sk AS cr_returning_customer_sk,
       cs_ship_cdemo_sk AS cr_returning_cdemo_sk,
       cs_ship_hdemo_sk AS cr_returning_hdemo_sk,
       cs_ship_addr_sk AS cr_returning_addr_sk,
       cs_call_center_sk AS cr_call_center_sk,
       cs_catalog_page_sk AS cr_catalog_page_sk,
       cs_ship_mode_sk AS cr_ship_mode_sk,
       cs_warehouse_sk AS cr_warehouse_sk,
       (cs_order_number * 7 + cs_item_sk) % {N_REASON} AS cr_reason_sk,
       cs_order_number AS cr_order_number,
       least(cs_quantity, 1 + cs_item_sk % 10) AS cr_return_quantity,
       {amt} AS cr_return_amount,
       CAST(floor({amt} / 10.0) AS BIGINT) AS cr_return_tax,
       {amt} + CAST(floor({amt} / 10.0) AS BIGINT) AS cr_return_amt_inc_tax,
       (cs_item_sk * 3) % 50 AS cr_fee,
       (cs_item_sk * 7) % 100 AS cr_return_ship_cost,
       {cash} AS cr_refunded_cash,
       {rev} AS cr_reversed_charge,
       {amt} - {cash} - {rev} AS cr_store_credit,
       {amt} + (cs_item_sk * 3) % 50 + (cs_item_sk * 7) % 100 - {cash}
           AS cr_net_loss
FROM catalog_sales
WHERE (cs_order_number * 3 + cs_item_sk) % 4 = 0
"""


def _web_returns() -> str:
    amt = "(least(ws_quantity, 1 + ws_item_sk % 10) * ws_sales_price * 10)"
    cash = f"CAST(floor({amt} / 2.0) AS BIGINT)"
    rev = f"CAST(floor(({amt} - {cash}) / 2.0) AS BIGINT)"
    return f"""
SELECT least(ws_sold_date_sk + 7 + ws_item_sk % 84, {N_DAYS - 1})
           AS wr_returned_date_sk,
       ws_sold_time_sk AS wr_returned_time_sk,
       ws_item_sk AS wr_item_sk,
       ws_bill_customer_sk AS wr_refunded_customer_sk,
       ws_bill_cdemo_sk AS wr_refunded_cdemo_sk,
       ws_bill_hdemo_sk AS wr_refunded_hdemo_sk,
       ws_bill_addr_sk AS wr_refunded_addr_sk,
       ws_ship_customer_sk AS wr_returning_customer_sk,
       ws_ship_cdemo_sk AS wr_returning_cdemo_sk,
       ws_ship_hdemo_sk AS wr_returning_hdemo_sk,
       ws_ship_addr_sk AS wr_returning_addr_sk,
       ws_web_page_sk AS wr_web_page_sk,
       (ws_order_number * 7 + ws_item_sk) % {N_REASON} AS wr_reason_sk,
       ws_order_number AS wr_order_number,
       least(ws_quantity, 1 + ws_item_sk % 10) AS wr_return_quantity,
       {amt} AS wr_return_amt,
       CAST(floor({amt} / 10.0) AS BIGINT) AS wr_return_tax,
       {amt} + CAST(floor({amt} / 10.0) AS BIGINT) AS wr_return_amt_inc_tax,
       (ws_item_sk * 3) % 50 AS wr_fee,
       (ws_item_sk * 7) % 100 AS wr_return_ship_cost,
       {cash} AS wr_refunded_cash,
       {rev} AS wr_reversed_charge,
       {amt} - {cash} - {rev} AS wr_account_credit,
       {amt} + (ws_item_sk * 3) % 50 + (ws_item_sk * 7) % 100 - {cash}
           AS wr_net_loss
FROM web_sales
WHERE (ws_order_number * 3 + ws_item_sk) % 4 = 0
"""


# Ordered: every def may reference base views and EARLIER entries only.
TPCDS_DEFS: dict[str, str] = {
    "date_dim": _date_dim(),
    "time_dim": _time_dim(),
    "item": _item(),
    "customer": _customer(),
    "customer_address": _customer_address(),
    "customer_demographics": _customer_demographics(),
    "household_demographics": _household_demographics(),
    "income_band": _income_band(),
    "store": _store(),
    "call_center": _call_center(),
    "web_site": _web_site(),
    "web_page": _web_page(),
    "warehouse": _warehouse(),
    "promotion": _promotion(),
    "reason": _reason(),
    "ship_mode": _ship_mode(),
    "catalog_page": _catalog_page(),
    "inventory": _inventory(),
    "store_sales": _store_sales(),
    "catalog_sales": _catalog_sales(),
    "web_sales": _web_sales(),
    "store_returns": _store_returns(),
    "catalog_returns": _catalog_returns(),
    "web_returns": _web_returns(),
}

# TPC-DS table names shadow base-table names ("customer"); the defs above
# reference the BASE tables under these aliases so the prelude/view layer
# can re-point them safely.
_BASE_TABLES = ("lineitem", "orders", "part", "customer")


# ---------------------------------------------------------------------------
# Oracle prelude (DuckDB side)
# ---------------------------------------------------------------------------


def _prelude_ctes() -> str:
    """All 24 defs as a WITH-list, base tables aliased via *_base CTEs so
    the TPC-DS `customer` CTE can shadow the base `customer` view
    (main.<t> pins the BASE VIEW: DuckDB CTE names share one namespace,
    so an unqualified `customer` would circularly bind to the TPC-DS
    `customer` CTE)."""
    parts = ["digits(a) AS (" + _DIGITS + ")"]
    for base in _BASE_TABLES:
        parts.append(f"{base}_base AS (SELECT * FROM main.{base})")
    for name, sql in TPCDS_DEFS.items():
        parts.append(f"{name} AS ({synth.repoint_all(sql, _BASE_TABLES)})")
    return ",\n".join(parts)


_PRELUDE: str | None = None


def oracle_prelude() -> str:
    global _PRELUDE
    if _PRELUDE is None:
        _PRELUDE = _prelude_ctes()
    return _PRELUDE


def oracle_sql_for(query_text: str) -> str:
    """Wrap a verbatim TPC-DS query text with the schema prelude, merging
    WITH-lists when the query itself starts with WITH."""
    return synth.wrap_with_prelude(oracle_prelude(), query_text)


# ---------------------------------------------------------------------------
# Spark side: materialize once per (sf_dir, defs version) into parquet
# ---------------------------------------------------------------------------

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_CACHE_ROOT = os.path.join(_REPO_ROOT, ".tpcds_cache")


def register_tpcds_views(spark: SparkSession, sf_dir: str) -> None:
    """Materialize (if needed) and register all 24 TPC-DS tables as temp
    views over the parquet cache.

    Views are (re-)registered on EVERY call: the TPC-DS `customer` view
    shadows the base TPC-H `customer` view, and interleaved TPC-H /
    TPC-DS queries in one session would otherwise read the wrong one.
    The parquet DataFrames are cached per session so re-registration is
    a catalog-only operation. register_during_build: later defs
    (returns) reference earlier ones (sales) by name."""
    synth.materialize_and_register(
        spark,
        sf_dir,
        TPCDS_DEFS,
        _BASE_TABLES,
        _CACHE_ROOT,
        build_sql=lambda sql: "WITH digits(a) AS (" + _DIGITS + ")\n" + sql,
        register_during_build=True,
    )
