"""Corpus-ingestion operators: URL canonicalization dedup, incremental
(batch-vs-seen) ingest dedup, and per-source size-concentration profiling.

These are the front-door operators of a training-data pipeline — the steps
that run on every crawl/ingest batch BEFORE content-level dedup
(`operators/dedup.py`) sees the data:

* **URL canonicalization** — collapse the raw-URL aliases a crawler emits
  (scheme/host case, `www.` prefix, default ports, tracking parameters,
  fragments, query-parameter order) to one canonical form and keep one
  document per canonical URL. This is the first and cheapest dedup tier in
  CommonCrawl-style pipelines: it needs no content comparison at all.
* **Incremental ingest dedup** — a new batch is deduped against the
  already-ingested corpus by content fingerprint (token-set hash), the
  snapshot-aware "have we seen this before" gate that makes re-crawls
  cheap. Composition: within-batch first-occurrence, then a left-anti
  join against the seen-fingerprint set.
* **Gini concentration** — per-source inequality of document sizes, the
  mixture-health diagnostic (a source whose token mass concentrates in a
  few giant documents behaves very differently under sampling than its
  document count suggests).

Reference parity: the reference's ingestion layer normalizes and dedups at
the *table* level (`datasets/iceberg conversion/csv_to_iceberg.py:23-29`
sanitizes identifiers; its workload logs are scrubbed/normalized by
`traces/tools/scrub.jq:1-44`); these operators apply the same
normalize-then-collapse discipline to the document corpus itself, as the
north-star LLM-pipeline extension requires.

Scale notes are per-operator; none of them collects to the driver, and the
only shuffles are key-partitioned aggregations/joins on bounded-width keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table, spread

# ---------------------------------------------------------------------------
# Deterministic raw-URL synthesis
# ---------------------------------------------------------------------------
# The documents table has no URL column, so both engines derive one from
# doc_id with the same modular arithmetic (the repo-wide synthesis rule —
# see plans/tpcds_schema.py). The *canonical* identity of a URL depends
# only on (doc_id % 5, % 8, % 3, % 2) → period 120, so documents collide
# into ~120 canonical groups; the *raw* text additionally varies with
# doc_id % 7 / % 11 / % 13 components (tracking params, default port,
# fragment) that canonicalization must strip — every alias class the
# operator handles is exercised inside each group.


def _raw_url_sql(cast: str) -> str:
    """The shared raw-URL expression; ``cast`` is STRING (Spark) / VARCHAR
    (DuckDB) — the only dialect difference."""
    return f"""
  CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END
  || '://'
  || CASE doc_id % 3 WHEN 0 THEN 'WWW.' WHEN 1 THEN 'www.' ELSE '' END
  || CASE doc_id % 3 WHEN 0 THEN 'Site' WHEN 1 THEN 'SITE' ELSE 'site' END
  || CAST(doc_id % 5 AS {cast})
  || CASE doc_id % 3 WHEN 0 THEN '.COM' ELSE '.com' END
  || CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END
  || '/articles/' || CAST(doc_id % 8 AS {cast})
  || '?'
  || CASE WHEN doc_id % 2 = 0
       THEN 'id=' || CAST(doc_id % 3 AS {cast})
            || '&utm_source=s' || CAST(doc_id % 7 AS {cast})
            || '&ref=r' || CAST(doc_id % 2 AS {cast})
       ELSE 'utm_campaign=c' || CAST(doc_id % 7 AS {cast})
            || '&ref=r' || CAST(doc_id % 2 AS {cast})
            || '&id=' || CAST(doc_id % 3 AS {cast}) END
  || CASE WHEN doc_id % 4 = 0 THEN '&fbclid=f' || CAST(doc_id % 13 AS {cast})
          ELSE '' END
  || CASE WHEN doc_id % 5 = 0 THEN '#sec' || CAST(doc_id % 7 AS {cast})
          ELSE '' END
"""


_TRACKING_PREFIXES = ("utm_", "fbclid=")


def canonicalize_url(url) -> "F.Column":
    """Canonical form of an arbitrary URL string column.

    Steps (each is a plain column expression — the whole thing stays inside
    whole-stage codegen, no UDF): strip the fragment; split off the query
    string; lowercase the scheme and host; drop a leading ``www.``; drop
    the scheme's default port (80/443); drop tracking parameters
    (``utm_*``, ``fbclid``); sort the surviving query parameters so
    parameter order is identity-irrelevant.
    """
    url = F.col(url) if isinstance(url, str) else url
    nofrag = F.regexp_replace(url, r"#.*$", "")
    halves = F.split(nofrag, r"\?", 2)  # limit=2: '?' never recurs afterwards
    base = F.get(halves, 0)
    qs = F.coalesce(F.get(halves, 1), F.lit(""))
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(base, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/]*)", 1)
    path = F.regexp_replace(rest, r"^[^/]*", "")
    host = F.regexp_replace(
        F.lower(F.regexp_replace(hostport, r":[0-9]+$", "")), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default_port = ((scheme == "https") & (port == "443")) | (
        (scheme == "http") & (port == "80")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "")
            & ~p.startswith(_TRACKING_PREFIXES[0])
            & ~p.startswith(_TRACKING_PREFIXES[1]),
        )
    )
    joined = F.array_join(kept, "&")
    query_part = F.when(joined == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), joined)
    )
    return F.concat(scheme, F.lit("://"), host, port_part, path, query_part)


# The identical canonicalization as one ANSI-SQL expression (DuckDB oracle
# side). `qs`/`base` come from a strpos split; list_filter/list_sort/
# array_to_string mirror F.filter/F.array_sort/F.array_join.
_CANON_SQL = """
WITH raw AS (
  SELECT doc_id, {raw_url} AS url FROM documents),
split2 AS (
  SELECT doc_id, url,
         CASE WHEN strpos(nofrag, '?') > 0
              THEN substr(nofrag, 1, strpos(nofrag, '?') - 1)
              ELSE nofrag END AS base,
         CASE WHEN strpos(nofrag, '?') > 0
              THEN substr(nofrag, strpos(nofrag, '?') + 1)
              ELSE '' END AS qs
  FROM (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag
        FROM raw)),
comp AS (
  SELECT doc_id, url, qs,
         lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
             AS scheme,
         regexp_extract(regexp_replace(base, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                        '^([^/]*)', 1) AS hostport,
         regexp_replace(regexp_replace(base, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                        '^[^/]*', '') AS path
  FROM split2),
comp2 AS (
  SELECT doc_id, url, qs, scheme, path,
         regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')),
                        '^www\\.', '') AS host,
         regexp_extract(hostport, ':([0-9]+)$', 1) AS port
  FROM comp),
canon AS (
  SELECT doc_id, url,
         scheme || '://' || host
         || CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                      OR (scheme = 'http' AND port = '80')
                 THEN '' ELSE ':' || port END
         || path
         || CASE WHEN array_to_string(list_sort(list_filter(
                      string_split(qs, '&'),
                      p -> p <> '' AND NOT starts_with(p, 'utm_')
                           AND NOT starts_with(p, 'fbclid='))), '&') = ''
                 THEN ''
                 ELSE '?' || array_to_string(list_sort(list_filter(
                      string_split(qs, '&'),
                      p -> p <> '' AND NOT starts_with(p, 'utm_')
                           AND NOT starts_with(p, 'fbclid='))), '&') END
             AS canonical_url
  FROM comp2)
SELECT canonical_url,
       count(*) AS n_docs,
       count(DISTINCT url) AS n_distinct_raw,
       min(doc_id) AS keeper_doc_id
FROM canon
GROUP BY canonical_url
"""


@register(
    "dedup_url_canonical",
    oracle=_CANON_SQL.format(raw_url=_raw_url_sql("VARCHAR")),
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-alias dedup: canonicalize every document's URL and collapse to
    one group per canonical form, reporting the alias-cluster size, how
    many distinct raw spellings it contained, and the keeper (min doc_id —
    first-crawled wins, the CommonCrawl convention).

    Scale: canonicalization is pure per-row string expressions (no UDF, no
    shuffle); the collapse is ONE partial-aggregated shuffle keyed on the
    canonical URL. At 100 TB this is the same shape as `dedup_exact` —
    map-side combine shrinks each partition to its distinct canonical
    forms before the exchange, and no driver-side state exists. Skewed
    hub URLs (one canonical form with millions of aliases) partial-agg
    cleanly because count/min are algebraic.
    """
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id", F.expr(_raw_url_sql("STRING")).alias("url")
    )
    canon = raw.select(
        "doc_id", "url", canonicalize_url("url").alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("url").alias("n_distinct_raw"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


# ---------------------------------------------------------------------------
# Incremental (batch-vs-seen) ingest dedup
# ---------------------------------------------------------------------------

# Token-SET fingerprint: md5 of the sorted distinct tokens. Deliberately
# coarser than exact-text equality (word order and repetition ignored), so
# it catches shuffled/re-joined near-copies that exact dedup misses while
# staying a pure equality key — the cheap fingerprint tier between
# `dedup_exact` and the MinHash tiers.
def _fingerprint_col() -> "F.Column":
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    )


_FP_SQL = (
    "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"
)


@register(
    "dedup_incremental",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, source, {_FP_SQL} AS fingerprint
        FROM documents),
    seen AS (
        SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 <> 0),
    batch_first AS (
        SELECT doc_id, source, fingerprint
        FROM (SELECT *, row_number() OVER (PARTITION BY fingerprint
                                           ORDER BY doc_id) AS rn
              FROM fp WHERE doc_id % 10 = 0)
        WHERE rn = 1)
    SELECT b.doc_id, b.source, b.fingerprint
    FROM batch_first b
    ANTI JOIN seen s ON b.fingerprint = s.fingerprint
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest gate: dedup a NEW batch (doc_id % 10 = 0 — the
    re-crawl) against the SEEN corpus (the other 90%) by content
    fingerprint, emitting only the rows to ingest. Two stages, exactly as
    a production pipeline runs them:

    1. within-batch first-occurrence (min doc_id per fingerprint) — the
       batch may repeat itself;
    2. left-anti join against the seen fingerprint set — the snapshot gate.

    Scale: the fingerprint is computed in the scan projection, so the
    heavy `text` column is consumed map-side and NEVER crosses an
    exchange — both stages shuffle on the 16-byte fingerprint only.
    The seen side reduces to DISTINCT fingerprints (partial-agg'd), so its
    shuffle volume is bounded by corpus cardinality, not size. With AQE's
    runtime bloom filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
    the anti-join's batch side is additionally pre-pruned executor-side at
    100 TB; semantics stay exact because the bloom is only a pre-filter for
    the exact join. In steady state the seen set is a maintained fingerprint
    table (a `sources/snapshots.py` snapshot), not a re-derivation.
    """
    # Fingerprint FIRST (in the scan tasks), spread the narrow result:
    # spreading the raw docs would round-robin the full text column through
    # an exchange just to parallelize cheap per-row hashing.
    docs = load_table(spark, sf_dir, "documents")
    fp = spread(
        docs.select(
            "doc_id", "source", _fingerprint_col().alias("fingerprint")
        )
    )
    seen = (
        fp.filter(F.col("doc_id") % 10 != 0).select("fingerprint").distinct()
    )
    batch = fp.filter(F.col("doc_id") % 10 == 0)
    # min(struct(doc_id, source)) == the row of the smallest doc_id: struct
    # ordering is field-order lexicographic and doc_id is unique.
    batch_first = (
        batch.groupBy("fingerprint")
        .agg(F.min(F.struct("doc_id", "source")).alias("first"))
        .select(
            F.col("first.doc_id").alias("doc_id"),
            F.col("first.source").alias("source"),
            "fingerprint",
        )
    )
    return batch_first.join(seen, "fingerprint", "left_anti").select(
        "doc_id", "source", "fingerprint"
    )


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle + shard
# ---------------------------------------------------------------------------

N_SHARDS = 8
# Seeded LCG permutation key: (a·x + c) mod m with m prime — a bijection on
# [0, m) for a ⊥ m, i.e. a reproducible pseudo-random global order. At real
# scale the key would be xxhash64(doc_id); the LCG is used here because both
# engines evaluate it bit-identically (pure int64 arithmetic, no engine hash
# functions), which is what makes the oracle exact. The multiplier is ~φ·m
# (golden-ratio fraction of the modulus), so consecutive doc_ids wrap the
# modulus ~62% of the time — a small multiplier would leave the "shuffle"
# locally monotonic in doc_id. doc_id is reduced mod m BEFORE the multiply:
# (doc_id % m)·a < m·a ≈ 6.2e17 < 2^63, so the expression cannot overflow
# under ANSI mode for ANY int64 doc_id (the 10× probe's key-shifted
# replicas reach 9e10, which a raw doc_id·a would not survive).
_LCG_A = 618_033_988
_LCG_C = 17
_LCG_M = 999_999_937  # prime


@register(
    "corpus_shuffle_shard",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               ((doc_id % {_LCG_M}) * {_LCG_A} + {_LCG_C}) % {_LCG_M} AS perm
        FROM documents)
    SELECT doc_id,
           CAST(perm % {N_SHARDS} AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY perm % {N_SHARDS}
                                   ORDER BY perm, doc_id) AS BIGINT)
               AS pos_in_shard,
           n_chars
    FROM keyed
    """,
)
def corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard of the corpus — the step that
    turns a curated dataset into training shards: every document gets a
    seeded pseudo-random permutation key, a shard (key mod N), and its
    position within the shard. Re-running with the same seed reproduces
    the exact training order; changing the seed constants reshuffles.

    Scale: NO global sort exists anywhere — the permutation key is a pure
    per-row expression, sharding is a mod, and the only shuffle is the
    within-shard window partitioned by shard (N_SHARDS-way, each shard
    sorted distributed + spillable). This is the standard trick for
    shuffling 100 TB: a keyed bijection replaces the impossible global
    random sort, and writers then emit shard files independently. Shard
    sizes concentrate tightly around n/N because the LCG output is
    equidistributed mod N (balance law tested).
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        (((F.col("doc_id") % _LCG_M) * _LCG_A + _LCG_C) % _LCG_M).alias(
            "perm"
        ),
    )
    w = Window.partitionBy(F.col("perm") % N_SHARDS).orderBy("perm", "doc_id")
    return keyed.select(
        "doc_id",
        (F.col("perm") % N_SHARDS).cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
        "n_chars",
    )


# ---------------------------------------------------------------------------
# Per-source size concentration (Gini)
# ---------------------------------------------------------------------------


@register(
    "corpus_gini_by_source",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn
        FROM documents)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(2 * sum(rn * n_chars) - (count(*) + 1) * sum(n_chars)
                AS BIGINT) AS gini_num,
           CAST(count(*) * sum(n_chars) AS BIGINT) AS gini_den,
           CAST(CAST(2 * sum(rn * n_chars) - (count(*) + 1) * sum(n_chars)
                     AS BIGINT) AS DOUBLE)
               / nullif(CAST(count(*) * sum(n_chars) AS BIGINT), 0) AS gini
    FROM ranked
    GROUP BY source
    """,
)
def corpus_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document sizes per source — the
    size-concentration diagnostic for mixture design (G = 0: every doc the
    same size; G → 1: one doc carries all the mass). Uses the rank formula
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over ascending sizes.

    Determinism: ties in n_chars make row_number() assignment arbitrary,
    but Σ i·x_i is invariant under permutations of equal x — so the exact
    integer numerator/denominator are order-free, and the only float op is
    one IEEE division of exact int64s per group (engine-stable; the
    verify-notes discipline).

    Scale: one sort-within-source (window) + one partial-agg'd groupBy on
    the same key — with `source` as the partition key the window sort and
    the aggregation share a single exchange. A skewed giant source is
    sorted within its own partitions by the window machinery (spillable),
    never driver-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars")
    ranked = docs.select(
        "source", "n_chars", F.row_number().over(w).alias("rn")
    )
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.col("rn") * F.col("n_chars")).alias("s1"),
    )
    num = (2 * F.col("s1") - (F.col("n_docs") + 1) * F.col("total_chars")).cast(
        "bigint"
    )
    den = (F.col("n_docs") * F.col("total_chars")).cast("bigint")
    # nullif guard: a source whose docs all have n_chars = 0 has den = 0 —
    # ANSI mode would throw DIVIDE_BY_ZERO where DuckDB yields NaN; NULL is
    # the agreed cross-engine value (and the honest answer: Gini of an
    # all-empty source is undefined).
    return agg.select(
        "source",
        "n_docs",
        "total_chars",
        num.alias("gini_num"),
        den.alias("gini_den"),
        (num.cast("double") / F.nullif(den, F.lit(0))).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Weighted systematic (PPS) sampling
# ---------------------------------------------------------------------------

K_SAMPLE = 100


@register(
    "sample_weighted_systematic",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ((doc_id % {_LCG_M}) * {_LCG_A} + {_LCG_C}) % {_LCG_M} AS perm
        FROM documents),
    pre AS (
        SELECT doc_id, source, n_chars,
               sum(n_chars) OVER (ORDER BY perm, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS w_incl
        FROM keyed),
    tot AS (SELECT sum(n_chars) AS t FROM documents)
    SELECT doc_id, source, n_chars,
           CAST((2 * {K_SAMPLE} * (w_incl - n_chars) + t - 1) // (2 * t)
                AS BIGINT) AS first_point
    FROM pre, tot
    WHERE (2 * {K_SAMPLE} * w_incl + t - 1) // (2 * t)
          > (2 * {K_SAMPLE} * (w_incl - n_chars) + t - 1) // (2 * t)
    """,
)
def sample_weighted_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted (PPS) systematic sample: K points spaced
    evenly along the weighted cumulative axis of the LCG-permuted corpus;
    a document is selected iff a point lands in its weight interval, so
    inclusion probability is proportional to n_chars (size-proportional
    sampling — the corpus-audit staple: inspect K docs holding a
    representative share of the TOKEN mass, not K uniformly tiny ones).
    Points sit at odd multiples of total/(2K), so f(x) = floor((2Kx+T-1)
    / (2T)) counts points below x and selection is f(w_incl) > f(w_excl)
    — pure int64 arithmetic, engine-exact and order-free (the permuted
    order is itself deterministic, [[corpus_shuffle_shard]]'s bijection).

    Scale: the cumulative weights come from `distributed_prefix_sum`
    (scheduling/carbon.py) — a bucket-partitioned window plus one
    broadcast offset join; NO global single-partition window anywhere.
    Overflow bound: 2K·T < 2^63 holds to T ≈ 4.6e16 total chars at
    K=100 (≈ a 46 PB text corpus).
    """
    from lakehouse_variance_spark.scheduling.carbon import (
        distributed_prefix_sum,
    )

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (((F.col("doc_id") % _LCG_M) * _LCG_A + _LCG_C) % _LCG_M).alias(
            "perm"
        ),
    )
    pre = distributed_prefix_sum(
        keyed,
        "perm",
        "n_chars",
        "w_incl",
        bucket_width=_LCG_M // 256,
        # perm is only injective for doc_id < LCG_M; tie-break by doc_id
        # (unique) so the cumulative order stays total for key-shifted
        # replicas — mirrored in the oracle's ORDER BY perm, doc_id.
        tie_col="doc_id",
    )
    total = docs.agg(F.sum("n_chars").cast("bigint").alias("t"))
    joined = pre.crossJoin(F.broadcast(total))
    f_incl = F.expr(
        f"(2 * {K_SAMPLE} * w_incl + t - 1) div (2 * t)"
    )
    f_excl = F.expr(
        f"(2 * {K_SAMPLE} * (w_incl - n_chars) + t - 1) div (2 * t)"
    )
    return (
        joined.withColumn("_fi", f_incl)
        .withColumn("_fe", f_excl)
        .filter(F.col("_fi") > F.col("_fe"))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("_fe").cast("bigint").alias("first_point"),
        )
    )
