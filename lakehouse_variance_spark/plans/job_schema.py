"""Deterministic synthetic JOB/IMDB schema (21 tables), derived from the
base tables.

The reference ships the IMDB/JOB schema as Trino-typed JSON
(`datasets/iceberg conversion/JOB_Trino_Schema.json`), registers it in
`docker/trino-client/src/register_hive.sh`, and its README keeps the
workload *specifically* to stress join ordering
(`datasets/README.md:28-36`); thousands of generated SQL texts with
runtime labels run over it (`models/Queries/Baseline_IMDB/`).  This
module derives that exact 21-table schema — same table names, columns,
and column types (including the DOUBLE-typed nullable id columns) —
from the driver's TPC-H-shaped base tables, one self-contained SQL
definition per table evaluated by BOTH engines (the `tpcds_schema.py`
mechanism).

Key design points:

* **Referential integrity by construction**: every foreign key is the
  SAME arithmetic formula on the base keys as the primary key it
  references — ``title.id = o_orderkey*35`` and every ``movie_id`` is
  ``l_orderkey*35`` (l_orderkey ⊆ o_orderkey), person ids are
  ``o*350 + j*35 + 7`` for j in 0..4 on both the `name` side and the
  `cast_info`/`person_info` side, ``company_name.id = p_partkey*3+1``
  matches ``movie_companies.company_id = l_partkey*3+1``, and
  ``aka_name.id`` lives in the person keyspace because the workload
  joins ``cast_info.person_id = aka_name.id`` directly.  The id
  multipliers also stretch ids into the real IMDB ranges (~10^6-10^7)
  so the workload's numeric range predicates are selective.
* **DOUBLE columns are integer-valued or NULL** (`imdb_id`,
  `production_year`, `person_role_id`, `season_nr`, ...): double sums
  of exact integers below 2^53 are order-free, so aggregate hashes are
  engine- and partitioning-independent; NULL density mirrors the
  workload's `IS [NOT] NULL` predicates.
* **Value domains are the public IMDB ones** — the real
  `info_type`/`kind_type`/`company_type`/`link_type`/`role_type`/
  `comp_cast_type` catalogs, '[xx]' country codes, soundex-style
  pcodes, roman-numeral `imdb_index`, and name/title/company/note
  templates that contain the substrings the generated workload LIKEs
  against ('%Entertainment%', '%(USA)%', '%(voice)%', '%The%', ...).
* Determinism rules as tpcds_schema.py: BIGINT/VARCHAR/DOUBLE-of-int
  columns, modular arithmetic plus floor-division digit extraction
  (immediately-floor()ed divisions are the only float ops).

Scale shape: `title`/`name` scale with orders, the five fact-like
tables (`cast_info`, `movie_info`, `movie_info_idx`, `movie_keyword`,
`movie_companies`, `person_info`) scale with lineitem, and the nine
catalogs are constant-size — matching real IMDB's fact/dimension ratio,
so the workload's join-order stress (small catalogs vs large facts)
is preserved at any scale factor.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from lakehouse_variance_spark.plans import synth_common as synth

# ---------------------------------------------------------------------------
# Public IMDB catalogs
# ---------------------------------------------------------------------------

KIND_TYPES = [
    "movie", "tv series", "tv movie", "video movie", "tv mini series",
    "video game", "episode",
]
COMPANY_TYPES = [
    "distributors", "production companies", "special effects companies",
    "miscellaneous companies",
]
COMP_CAST_TYPES = ["cast", "crew", "complete", "complete+verified"]
ROLE_TYPES = [
    "actor", "actress", "producer", "writer", "cinematographer",
    "composer", "costume designer", "director", "editor",
    "miscellaneous crew", "production designer", "guest",
]
LINK_TYPES = [
    "follows", "followed by", "remake of", "remade as", "references",
    "referenced in", "spoofs", "spoofed in", "features", "featured in",
    "spin off from", "spin off", "version of", "similar to",
    "edited into", "edited from", "alternate language version of",
    "unknown link",
]
INFO_TYPES = [
    "runtimes", "color info", "genres", "languages", "certificates",
    "sound mix", "tech info", "countries", "taglines", "keywords",
    "alternate versions", "crazy credits", "goofs", "soundtrack",
    "quotes", "release dates", "trivia", "locations", "mini biography",
    "birth notes", "birth date", "height", "death date", "spouse",
    "other works", "birth name", "salary history", "nick names",
    "books", "agent address", "biographical movies", "portrayed in",
    "where now", "trade mark", "interviews", "article",
    "magazine cover photo", "death notes",
    "LD disc format", "LD year", "LD digital sound",
    "LD official retail price", "LD frequency response",
    "LD pressing plant", "LD length", "LD language", "LD review",
    "LD spaciality", "LD release date", "LD production country",
    "LD contrast", "LD color rendition", "LD picture format",
    "LD video noise", "LD video artifacts", "LD release country",
    "LD sharpness", "LD dynamic range", "LD audio noise",
    "LD color information", "LD group genre", "LD quality program",
    "LD close captions-teletext-ld-g", "LD category", "LD analog left",
    "LD certification", "LD audio quality", "LD video quality",
    "LD aspect ratio", "LD analog right", "LD additional information",
    "LD number of chapter stops", "LD dialogue intellegibility",
    "LD disc size", "LD master format", "LD subtitles",
    "LD status of availablility", "LD quality of source",
    "LD number of sides", "LD video standard", "LD supplement",
    "LD original title", "LD sound encoding", "LD number", "LD label",
    "LD catalog number", "LD laserdisc title", "screenplay-teleplay",
    "novel", "adaption", "book", "production process protocol",
    "interview", "printed media reviews", "essays", "other literature",
    "mpaa", "plot", "votes distribution", "votes", "rating",
    "production dates", "copyright holder", "filming dates", "budget",
    "weekend gross", "gross", "opening weekend", "rentals",
    "admissions", "studios", "top 250 rank", "bottom 10 rank",
]
assert len(INFO_TYPES) == 113

COUNTRY_CODES = [
    "[us]", "[gb]", "[de]", "[fr]", "[it]", "[es]", "[jp]", "[ca]",
    "[in]", "[br]", "[nl]", "[au]", "[at]", "[be]", "[ch]", "[se]",
    "[dk]", "[no]", "[fi]", "[pt]", "[gr]", "[ru]", "[pl]", "[cz]",
    "[hu]", "[ro]", "[bg]", "[tr]", "[mx]", "[ar]", "[cl]", "[co]",
    "[pe]", "[ve]", "[cn]", "[hk]", "[tw]", "[kr]", "[th]", "[ph]",
    "[id]", "[my]", "[sg]", "[vn]", "[eg]", "[za]", "[ng]", "[ke]",
    "[ma]", "[il]", "[ir]", "[sa]", "[ae]", "[nz]", "[ie]", "[az]",
    "[cr]", "[ly]", "[rs]", "[lr]",
]

SURNAMES = [
    "Smith", "Anderson", "Allen", "Alexander", "Johnson", "Williams",
    "Brown", "Jones", "Miller", "Davis", "Wilson", "Taylor", "Moore",
    "White", "Harris", "Martin", "Lee", "Walker", "Young", "King",
    "Wright", "Scott", "Green", "Baker", "Adams", "Nelson", "Hill",
    "Campbell", "Mitchell", "Roberts", "Carter", "Phillips", "Evans",
    "Turner", "Parker", "Collins", "Edwards", "Stewart", "Morris",
    "Murphy",
]
FIRSTS = [
    "John", "Michael", "David", "James", "Robert", "William", "Mary",
    "Anna", "Maria", "Elizabeth", "Jennifer", "Linda", "Richard",
    "Charles", "Joseph", "Thomas", "Christopher", "Daniel", "Paul",
    "Mark", "George", "Steven", "Peter", "Andrew", "J. Michael",
    "Dr. John", "A. David", "J. Carl", "Dr. Hans", "A. Thomas",
]
TITLE_ADJS = [
    "Secret", "Last", "Great", "Dark", "Silent", "Lost", "Golden",
    "Broken", "Hidden", "Final", "First", "Long", "Red", "Black",
    "White", "Wild", "Quiet", "Burning", "Frozen", "Distant",
]
TITLE_NOUNS = [
    "Night", "Journey", "River", "Mountain", "Garden", "House", "City",
    "Letter", "Promise", "Dream", "Road", "Storm", "Island", "Forest",
    "Shadow", "Summer", "Winter", "Heart", "Song", "Story",
]
COMPANY_STEMS = [
    "Universal", "Summit", "Crystal", "Northern", "Pacific", "Atlas",
    "Meridian", "Pinnacle", "Cascade", "Harbor", "Sterling", "Beacon",
    "Vanguard", "Horizon", "Riverside", "Monarch", "Cedar", "Falcon",
    "Aurora", "Gateway",
]
COMPANY_SUFFIXES = [
    " Entertainment", " Productions", " Pictures", " Film", " Studios",
    " Home Video", " TV", " Media Company",
]
CHAR_NAMES = [
    "Himself", "Herself", "Dancer", "Policeman", "Doctor", "Narrator",
    "Le Chef", "Maria de Souza", "The King", "Old Man in the Bar",
    "Anna de la Cruz", "Man in the Street", "Additional Voices",
    "The Mother", "Guard", "Bartender", "Nurse", "Reporter",
    "Taxi Driver", "Soldier",
]
CAST_NOTES = [
    "(voice)", "(uncredited)", "(archive footage)", "(as J. Smith)",
    "(credit only)", "(voice) (uncredited)", "(singing voice)",
    "(also archive footage)",
]
MC_COUNTRIES = ["USA", "Germany", "UK", "Netherlands", "France", "Japan"]
MC_MEDIA = ["DVD", "VHS", "theatrical", "TV", "video", "Blu-ray"]
MI_VALUES = [
    "English", "Portuguese", "Spanish", "Dutch", "Japanese", "French",
    "German", "Italian", "USA", "UK", "Germany", "France", "Canada",
    "Dolby Digital", "Dolby SR", "Stereo", "Mono", "DTS", "Drama",
    "Comedy", "Documentary", "Short", "Thriller", "Romance", "90",
    "95", "100", "112", "Technicolor", "Black and White", "Color",
    "16 mm", "35 mm", "1.85 : 1", "2.35 : 1",
]
PCODE_LETTERS = [
    "A", "B", "C", "D", "F", "G", "H", "I", "J", "K", "L", "M", "P",
    "Q", "R", "S", "T", "W", "Y", "Z",
]


def _roman(n: int) -> str:
    vals = [
        (1000, "M"), (900, "CM"), (500, "D"), (400, "CD"), (100, "C"),
        (90, "XC"), (50, "L"), (40, "XL"), (10, "X"), (9, "IX"),
        (5, "V"), (4, "IV"), (1, "I"),
    ]
    out = []
    for v, s in vals:
        while n >= v:
            out.append(s)
            n -= v
    return "".join(out)


ROMANS = [_roman(i) for i in range(1, 201)]

_DIGITS = "SELECT 0 AS a " + " ".join(
    f"UNION ALL SELECT {i}" for i in range(1, 10)
)


def _seq(n: int, alias: str = "i") -> str:
    assert n <= 1000
    return f"""(
      SELECT d1.a + 10*d2.a + 100*d3.a AS {alias}
      FROM digits d1, digits d2, digits d3
      WHERE d1.a + 10*d2.a + 100*d3.a < {n}
    )"""


def _pick(expr: str, values: list[str]) -> str:
    n = len(values)
    arms = " ".join(
        "WHEN {} THEN '{}'".format(i, v.replace("'", "''"))
        for i, v in enumerate(values)
    )
    return f"CASE ({expr}) % {n} {arms} END"


def _maybe_null(expr: str, cond_mod: str) -> str:
    """NULL when cond_mod holds, else expr."""
    return f"CASE WHEN {cond_mod} THEN NULL ELSE {expr} END"


def _div(expr: str, d: int) -> str:
    """Exact engine-stable floor division (the blessed float pattern)."""
    return f"CAST(floor(({expr}) / {d}.0) AS BIGINT)"


def _pcode(key: str) -> str:
    """Soundex-style code: letter + 3 digits (e.g. 'B463')."""
    return (
        _pick(key, PCODE_LETTERS)
        + f" || CAST(100 + ({key} * 13) % 900 AS VARCHAR(3))"
    )


def _md5ish(key: str) -> str:
    # The key expression is reduced mod P = 1e9+7 BEFORE the Knuth
    # multiply: (P-1)·2654435761 ≈ 2.7e18 < 2^63, so the expression is
    # ANSI-overflow-safe for any int64 key (the 10× probe's key-shifted
    # replicas reach 9e10·43, where the raw product throws
    # ARITHMETIC_OVERFLOW — the same class fixed mod-first in
    # tpcds_schema._hx and the shuffle-shard LCG). Values are identical
    # for every key expression < P — all real scale factors — so oracle
    # parity holds by construction (both engines run this same text).
    r = f"(({key}) % 1000000007)"
    return (
        f"lpad(CAST(({r} * 2654435761) % 100000000 AS VARCHAR(8)), 8, '0')"
        f" || lpad(CAST(({r} * 40503 + 17) % 100000000 AS VARCHAR(8)),"
        " 8, '0')"
    )


def _catalog(name_list: list[str]) -> str:
    """id/name catalog table from a literal list (1-based ids)."""
    return f"""
SELECT i + 1 AS id, {_pick('i', name_list)} AS _v
FROM {_seq(len(name_list))} s
"""


# person id formula: j in 0..4 alternates per (order, slot)
def _pid(okey: str, j: str) -> str:
    return f"({okey}) * 350 + ({j}) * 35 + 7"


_TITLE_EXPR = (
    "CASE (o_orderkey * 11) % 5 "
    f" WHEN 0 THEN 'The ' || {_pick('o_orderkey * 13', TITLE_ADJS)} || "
    f"' of the ' || {_pick('o_orderkey * 17 + 1', TITLE_NOUNS)} "
    f" WHEN 1 THEN {_pick('o_orderkey * 13', TITLE_ADJS)} || ' and the '"
    f" || {_pick('o_orderkey * 17 + 1', TITLE_NOUNS)} "
    f" WHEN 2 THEN 'A ' || {_pick('o_orderkey * 13', TITLE_ADJS)} || ' '"
    f" || {_pick('o_orderkey * 17 + 1', TITLE_NOUNS)} || ' to Remember' "
    f" WHEN 3 THEN 'Return to the ' || {_pick('o_orderkey * 19 + 2', TITLE_NOUNS)} "
    f" ELSE {_pick('o_orderkey * 17 + 1', TITLE_NOUNS)} || ' in the '"
    f" || {_pick('o_orderkey * 13', TITLE_ADJS)} || ' ' "
    f" || {_pick('o_orderkey * 23 + 3', TITLE_NOUNS)} "
    "END"
)


def _title() -> str:
    kind = (
        "CASE WHEN o_orderkey % 10 < 5 THEN 1 "
        f"ELSE 1 + {_div('o_orderkey', 10)} % 7 END"
    )
    year = f"CAST(1880 + (o_orderkey * 7) % 130 AS DOUBLE)"
    return f"""
SELECT o_orderkey * 35 AS id,
       {_TITLE_EXPR} AS title,
       {_maybe_null(_pick('o_orderkey * 31', ROMANS), 'o_orderkey % 10 > 0')}
           AS imdb_index,
       {kind} AS kind_id,
       {_maybe_null(year, 'o_orderkey % 29 = 0')} AS production_year,
       {_maybe_null(_pcode('o_orderkey * 37'), 'o_orderkey % 4 > 0')}
           AS imdb_id,
       {_maybe_null(_pcode('o_orderkey * 41'), 'o_orderkey % 3 = 0')}
           AS phonetic_code,
       CAST(NULL AS DOUBLE) AS episode_of_id,
       CASE WHEN ({kind}) = 7
            THEN CAST(1 + (o_orderkey * 3) % 12 AS DOUBLE) END AS season_nr,
       CASE WHEN ({kind}) = 7
            THEN CAST(1 + (o_orderkey * 13) % 24 AS DOUBLE) END
           AS episode_nr,
       CASE WHEN ({kind}) = 2
            THEN CAST(1940 + (o_orderkey * 11) % 60 AS VARCHAR(4)) || '-' ||
                 CAST(1941 + (o_orderkey * 11) % 60 + (o_orderkey * 3) % 20
                      AS VARCHAR(4)) END AS series_years,
       {_md5ish('o_orderkey * 43')} AS md5sum
FROM orders
"""


def _name() -> str:
    full = (
        f"{_pick('(o_orderkey * 5 + j) * 13', SURNAMES)} || ', ' || "
        f"{_pick('(o_orderkey * 5 + j) * 17 + 1', FIRSTS)}"
    )
    k = "(o_orderkey * 5 + j)"
    return f"""
SELECT {_pid('o_orderkey', 'j')} AS id,
       {full} AS name,
       {_maybe_null(_pick(f'{k} * 31', ROMANS), f'{k} % 12 > 0')}
           AS imdb_index,
       {_maybe_null(f'CAST(({k} * 29) % 3999999 AS DOUBLE)', f'{k} % 7 = 0')}
           AS imdb_id,
       {_maybe_null(_pick(k, ['m', 'f']), f'{k} % 11 = 0')} AS gender,
       {_maybe_null(_pcode(f'{k} * 37'), f'{k} % 5 = 0')} AS name_pcode_cf,
       {_maybe_null(_pcode(f'{k} * 41'), f'{k} % 6 = 0')} AS name_pcode_nf,
       {_maybe_null(_pcode(f'{k} * 43'), f'{k} % 4 = 0')} AS surname_pcode,
       {_md5ish(f'{k} * 47')} AS md5sum
FROM orders, (SELECT d1.a AS j FROM digits d1 WHERE d1.a < 5) js
"""


def _aka_name() -> str:
    k = "(o_orderkey * 5 + j)"
    full = (
        f"{_pick(f'{k} * 19', SURNAMES)} || ', ' || "
        f"{_pick(f'{k} * 23 + 2', FIRSTS)}"
    )
    return f"""
SELECT {_pid('o_orderkey', 'j')} AS id,
       {_pid('o_orderkey', f'(j + 1) % 5')} AS person_id,
       {full} AS name,
       {_maybe_null(_pick(f'{k} * 31', ROMANS), f'{k} % 9 > 0')}
           AS imdb_index,
       {_maybe_null(_pcode(f'{k} * 37'), f'{k} % 5 = 0')} AS name_pcode_cf,
       {_maybe_null(_pcode(f'{k} * 41'), f'{k} % 6 = 0')} AS name_pcode_nf,
       {_maybe_null(_pcode(f'{k} * 43'), f'{k} % 4 = 0')} AS surname_pcode,
       {_md5ish(f'{k} * 53')} AS md5sum
FROM orders, (SELECT d1.a AS j FROM digits d1 WHERE d1.a < 5) js
WHERE (o_orderkey * 7 + j) % 3 = 0
"""


def _aka_title() -> str:
    return f"""
SELECT o_orderkey * 35 + 3 AS id,
       o_orderkey * 35 AS movie_id,
       'Also: ' || {_TITLE_EXPR} AS title,
       {_maybe_null(_pick('o_orderkey * 31', ROMANS), 'o_orderkey % 8 > 0')}
           AS imdb_index,
       CASE WHEN o_orderkey % 10 < 5 THEN 1
            ELSE 1 + {_div('o_orderkey', 10)} % 7 END AS kind_id,
       {_maybe_null('CAST(1880 + (o_orderkey * 7) % 130 AS DOUBLE)',
                    'o_orderkey % 29 = 0')} AS production_year,
       {_maybe_null(_pcode('o_orderkey * 41'), 'o_orderkey % 3 = 0')}
           AS phonetic_code,
       CAST(NULL AS DOUBLE) AS episode_of_id,
       CAST(NULL AS DOUBLE) AS season_nr,
       CAST(NULL AS DOUBLE) AS episode_nr,
       {_maybe_null("'alternative title'", 'o_orderkey % 3 > 0')} AS note,
       {_md5ish('o_orderkey * 59')} AS md5sum
FROM orders
WHERE o_orderkey % 5 < 2
"""


_LK = "(l_orderkey * 7 + l_linenumber)"


def _cast_info() -> str:
    return f"""
SELECT {_LK} * 13 AS id,
       {_pid('l_orderkey', '(l_partkey * 3 + l_linenumber) % 5')}
           AS person_id,
       l_orderkey * 35 AS movie_id,
       {_maybe_null('CAST(l_partkey * 9 + 2 AS DOUBLE)', f'{_LK} % 3 = 0')}
           AS person_role_id,
       {_maybe_null(_pick(f'{_LK} * 7', CAST_NOTES), f'{_LK} % 3 > 0')}
           AS note,
       {_maybe_null(f'CAST(1 + {_LK} % 40 AS DOUBLE)', f'{_LK} % 3 = 1')}
           AS nr_order,
       1 + (l_partkey + l_linenumber) % 12 AS role_id
FROM lineitem
"""


def _movie_companies() -> str:
    note = (
        f"'(' || CAST(1980 + ({_LK} * 3) % 32 AS VARCHAR(4)) || ') (' || "
        f"{_pick(f'{_LK} * 5', MC_COUNTRIES)} || ') (' || "
        f"{_pick(f'{_LK} * 7 + 1', MC_MEDIA)} || ')'"
    )
    return f"""
SELECT {_LK} * 17 AS id,
       l_orderkey * 35 AS movie_id,
       l_partkey * 3 + 1 AS company_id,
       1 + (l_suppkey + l_linenumber) % 4 AS company_type_id,
       {_maybe_null(note, f'{_LK} % 4 = 0')} AS note
FROM lineitem
"""


def _movie_info() -> str:
    return f"""
SELECT {_LK} * 19 AS id,
       l_orderkey * 35 AS movie_id,
       1 + (l_partkey * 7 + l_linenumber) % 113 AS info_type_id,
       {_pick(f'{_LK} * 11 + l_partkey', MI_VALUES)} AS info,
       {_maybe_null("'(estimated)'", f'{_LK} % 5 > 0')} AS note
FROM lineitem
"""


def _movie_info_idx() -> str:
    it = (
        f"CASE ({_LK}) % 5 WHEN 0 THEN 100 WHEN 1 THEN 101 WHEN 2 THEN 102 "
        "WHEN 3 THEN 112 ELSE 113 END"
    )
    rating = (
        f"CAST(5 + ({_LK} * 3) % 5 AS VARCHAR(1)) || '.' || "
        f"CAST(({_LK} * 7) % 10 AS VARCHAR(1))"
    )
    return f"""
SELECT {_LK} * 23 AS id,
       l_orderkey * 35 AS movie_id,
       {it} AS info_type_id,
       CASE WHEN ({it}) = 102 THEN {rating}
            ELSE CAST(5 + ({_LK} * 13) % 99995 AS VARCHAR(6)) END AS info,
       CAST(NULL AS DOUBLE) AS note
FROM lineitem
WHERE l_linenumber <= 2
"""


def _movie_keyword() -> str:
    return f"""
SELECT {_LK} * 29 AS id,
       l_orderkey * 35 AS movie_id,
       l_partkey AS keyword_id
FROM lineitem
WHERE l_linenumber <= 3
"""


def _person_info() -> str:
    info = (
        "CASE ({lk}) % 4 "
        " WHEN 0 THEN 'He was born in ' || {city} || ' on May ' || "
        "CAST(1 + ({lk} * 3) % 28 AS VARCHAR(2)) "
        " WHEN 1 THEN 'She is known for works of ' || {noun} "
        " WHEN 2 THEN 'They were part of the ' || {adj} || ' movement' "
        " ELSE 'Date of birth: 12 May ' || "
        "CAST(1900 + ({lk} * 7) % 99 AS VARCHAR(4)) END"
    ).format(
        lk=_LK,
        city=_pick(f"{_LK} * 5", MC_COUNTRIES),
        noun=_pick(f"{_LK} * 11", TITLE_NOUNS),
        adj=_pick(f"{_LK} * 13", TITLE_ADJS),
    )
    return f"""
SELECT {_LK} * 31 AS id,
       {_pid('l_orderkey', '(l_partkey * 3 + l_linenumber) % 5')}
           AS person_id,
       19 + (l_partkey + l_linenumber) % 21 AS info_type_id,
       {info} AS info,
       {_maybe_null("'(print)'", f'{_LK} % 6 > 0')} AS note
FROM lineitem
WHERE l_linenumber <= 3
"""


def _company_name() -> str:
    name = (
        f"CASE WHEN p_partkey % 7 = 0 THEN 'The ' || "
        f"{_pick('p_partkey * 3', COMPANY_STEMS)} || ' Company' ELSE "
        f"{_pick('p_partkey * 3', COMPANY_STEMS)} || "
        f"{_pick(_div('p_partkey', 20), COMPANY_SUFFIXES)} END"
    )
    return f"""
SELECT p_partkey * 3 + 1 AS id,
       {name} AS name,
       {_maybe_null(_pick('p_partkey * 11', COUNTRY_CODES),
                    'p_partkey % 13 = 0')} AS country_code,
       {_maybe_null('CAST((p_partkey * 31) % 999999 AS DOUBLE)',
                    'p_partkey % 6 = 0')} AS imdb_id,
       {_maybe_null(_pcode('p_partkey * 37'), 'p_partkey % 5 = 0')}
           AS name_pcode_nf,
       {_maybe_null(_pcode('p_partkey * 41'), 'p_partkey % 4 = 0')}
           AS name_pcode_sf,
       {_md5ish('p_partkey * 61')} AS md5sum
FROM part
"""


def _char_name() -> str:
    nm = (
        f"CASE WHEN p_partkey % 3 = 0 THEN {_pick('p_partkey * 7', CHAR_NAMES)}"
        f" || ' #' || CAST(1 + p_partkey % 4 AS VARCHAR(1)) "
        f"ELSE {_pick('p_partkey * 7', CHAR_NAMES)} END"
    )
    return f"""
SELECT p_partkey * 9 + 2 AS id,
       {nm} AS name,
       {_maybe_null(_pick('p_partkey * 31', ROMANS), 'p_partkey % 10 > 1')}
           AS imdb_index,
       {_maybe_null('CAST((p_partkey * 29) % 2999999 AS DOUBLE)',
                    'p_partkey % 7 = 0')} AS imdb_id,
       {_maybe_null(_pcode('p_partkey * 43'), 'p_partkey % 5 = 0')}
           AS name_pcode_nf,
       {_maybe_null(_pcode('p_partkey * 47'), 'p_partkey % 4 = 0')}
           AS surname_pcode,
       {_md5ish('p_partkey * 67')} AS md5sum
FROM part
"""


def _keyword() -> str:
    kw = (
        f"{_pick('p_partkey * 13', TITLE_ADJS)} || '-' || "
        f"{_pick(_div('p_partkey', 20), TITLE_NOUNS)}"
    )
    return f"""
SELECT p_partkey AS id,
       lower({kw}) AS keyword,
       {_maybe_null(_pcode('p_partkey * 53'), 'p_partkey % 3 = 0')}
           AS phonetic_code
FROM part
"""


def _movie_link() -> str:
    return f"""
SELECT o_orderkey * 3 + 2 AS id,
       o_orderkey * 35 AS movie_id,
       o_orderkey * 35 AS linked_movie_id,
       1 + o_orderkey % 18 AS link_type_id
FROM orders
WHERE o_orderkey % 11 = 0
"""


def _complete_cast() -> str:
    return f"""
SELECT o_orderkey * 5 + 4 AS id,
       o_orderkey * 35 AS movie_id,
       1 + o_orderkey % 2 AS subject_id,
       3 + (o_orderkey * 3) % 2 AS status_id
FROM orders
WHERE o_orderkey % 7 < 2
"""


# Ordered; defs reference BASE tables only (no cross-def references).
# Catalog _v aliases are renamed per-table below.
JOB_DEFS: dict[str, str] = {
    "kind_type": _catalog(KIND_TYPES).replace("AS _v", "AS kind"),
    "company_type": _catalog(COMPANY_TYPES).replace("AS _v", "AS kind"),
    "comp_cast_type": _catalog(COMP_CAST_TYPES).replace("AS _v", "AS kind"),
    "role_type": _catalog(ROLE_TYPES).replace("AS _v", "AS role"),
    "link_type": _catalog(LINK_TYPES).replace("AS _v", "AS link"),
    "info_type": _catalog(INFO_TYPES).replace("AS _v", "AS info"),
    "title": _title(),
    "name": _name(),
    "aka_name": _aka_name(),
    "aka_title": _aka_title(),
    "cast_info": _cast_info(),
    "movie_companies": _movie_companies(),
    "movie_info": _movie_info(),
    "movie_info_idx": _movie_info_idx(),
    "movie_keyword": _movie_keyword(),
    "person_info": _person_info(),
    "company_name": _company_name(),
    "char_name": _char_name(),
    "keyword": _keyword(),
    "movie_link": _movie_link(),
    "complete_cast": _complete_cast(),
}

_BASE_TABLES = ("orders", "lineitem", "part")

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_CACHE_ROOT = os.path.join(_REPO_ROOT, ".job_cache")

_PRELUDE: str | None = None


def oracle_prelude() -> str:
    global _PRELUDE
    if _PRELUDE is None:
        parts = ["digits(a) AS (" + _DIGITS + ")"]
        for base in _BASE_TABLES:
            parts.append(f"{base}_base AS (SELECT * FROM main.{base})")
        for name, sql in JOB_DEFS.items():
            parts.append(
                f'"{name}" AS ({synth.repoint_all(sql, _BASE_TABLES)})'
            )
        _PRELUDE = ",\n".join(parts)
    return _PRELUDE


def oracle_sql_for_job(query_text: str) -> str:
    return synth.wrap_with_prelude(oracle_prelude(), query_text)


def register_job_views(spark: SparkSession, sf_dir: str) -> None:
    """Materialize (if needed) and register the 21 JOB/IMDB tables as
    temp views (none shadow base names; re-registration is catalog-only)."""
    synth.materialize_and_register(
        spark,
        sf_dir,
        JOB_DEFS,
        _BASE_TABLES,
        _CACHE_ROOT,
        build_sql=lambda sql: "WITH digits(a) AS (" + _DIGITS + ")\n" + sql,
    )
