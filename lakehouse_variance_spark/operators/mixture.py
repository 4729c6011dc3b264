"""Corpus-mixture operators — the sampling/packing layer of an LLM
pretraining pipeline, over the ``documents`` table.

Where textops.py scores individual documents and pipeline.py reshapes
them into training sequences, this module decides HOW MUCH of each slice
of the corpus to train on:

* mixture weights — temperature-scaled source sampling (the
  ``p_i ∝ n_i^alpha`` reweighting every multilingual/multi-source recipe
  uses to up-sample small sources; alpha = 0.5 here so the power is an
  IEEE-exact ``sqrt``);
* token-budget selection — the highest-quality documents per source until
  a per-source token budget is exhausted (quality-filtered corpus capping);
* FFD bin packing — first-fit-decreasing assignment of documents into
  fixed-capacity context windows, the waste-minimizing alternative to
  pipeline.py's concat-and-chop packing.

The first two are pure DataFrame ops with DuckDB oracles. FFD is
inherently sequential WITHIN a source (each placement depends on all
previous ones) so it runs as a grouped ``applyInPandas`` — one pandas
call per source, sources packed independently and in parallel, which is
exactly how a production packer shards: the corpus is huge but any one
shard fits one task. Registered rows-only; invariants are pytest-gated.

Determinism: token counts are exact integers; quality scores are exact
integer divisions (``div``/``//``); sqrt is correctly rounded by IEEE-754
on both engines and its result is floor-quantized to int64 BEFORE the
cross-source sum, so no float accumulates across rows anywhere.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table

# Temperature-sampling exponent alpha = 1/2 (sqrt) — IEEE-exact on both
# engines, unlike an arbitrary pow().
SQRT_QUANT = 1_000_000  # sqrt quantization: floor(sqrt(tokens)*1e6) -> int64

# Training-run token budget the per-source epoch counts are quoted at.
MIX_BUDGET_TOKENS = 10_000_000

# Per-source token budget for quality-capped selection.
SELECT_BUDGET_TOKENS = 800

# Context-window capacity (tokens) for FFD packing.
FFD_CAPACITY = 512

# Quality-score scale: score_m = (distinct_tokens * SCORE_SCALE) div tokens.
SCORE_SCALE = 1_000_000


@register(
    "data_mixture_weights",
    oracle=f"""
    WITH per_doc AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
    per_src AS (
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tokens,
               CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE))
                          * {SQRT_QUANT}) AS BIGINT) AS q
        FROM per_doc GROUP BY source),
    tot AS (
        SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
               CAST(sum(q) AS BIGINT) AS total_q
        FROM per_src)
    SELECT s.source, s.n_docs, s.tokens,
           CAST(s.tokens AS DOUBLE) / CAST(t.total_tokens AS DOUBLE)
               AS raw_share,
           CAST(s.q AS DOUBLE) / CAST(t.total_q AS DOUBLE) AS alpha_share,
           (CAST(s.q AS DOUBLE) / CAST(t.total_q AS DOUBLE))
               * (CAST({MIX_BUDGET_TOKENS} AS DOUBLE)
                  / CAST(s.tokens AS DOUBLE)) AS epochs_at_budget
    FROM per_src s, tot t
    """,
)
def data_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture: each source's sampling share is
    ``sqrt(tokens_i) / sum_j sqrt(tokens_j)`` (alpha = 0.5 temperature
    sampling), plus the epoch count that share implies at a fixed
    training budget — the up-sample-small-sources recipe used by
    multilingual and multi-source pretraining corpora.

    Spark-first / determinism: per-source token totals are one partial
    aggregation; sqrt(total) is a single correctly-rounded IEEE op and is
    floor-quantized to int64 BEFORE the cross-source normalizer sum, so
    the normalizer is an exact integer (order-free) rather than a float
    reduction. The epoch count multiplies two exact-int64→double
    divisions (each operand < 2^53) — a fixed two-op IEEE chain,
    bit-identical on both engines. The final normalize step joins a
    1-row aggregate (broadcast nested-loop over 1 row).
    """
    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.select(
            "source",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .withColumn(
            "q",
            F.floor(
                F.sqrt(F.col("tokens").cast("double")) * SQRT_QUANT
            ).cast("bigint"),
        )
    )
    tot = per_src.agg(
        F.sum("tokens").alias("total_tokens"), F.sum("q").alias("total_q")
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens",
        (F.col("tokens").cast("double") / F.col("total_tokens").cast("double"))
        .alias("raw_share"),
        (F.col("q").cast("double") / F.col("total_q").cast("double"))
        .alias("alpha_share"),
        (
            (F.col("q").cast("double") / F.col("total_q").cast("double"))
            * (
                F.lit(float(MIX_BUDGET_TOKENS))
                / F.col("tokens").cast("double")
            )
        ).alias("epochs_at_budget"),
    )


@register(
    "token_budget_select",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                * {SCORE_SCALE})
                   // CAST(len(string_split(text, ' ')) AS BIGINT)
                   AS score_m
        FROM documents),
    ranked AS (
        SELECT doc_id, source, n_tokens, score_m,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY score_m DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens
        FROM scored)
    SELECT doc_id, source, n_tokens, score_m, cum_tokens
    FROM ranked WHERE cum_tokens <= {SELECT_BUDGET_TOKENS}
    """,
)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-capped corpus selection: within each source, keep the
    highest-quality documents (distinct-token ratio) until a per-source
    token budget is exhausted — the greedy quality-filter used to cap
    over-represented domains in a pretraining mix.

    Spark-first: the running token total is a window partitioned BY
    SOURCE, so the sort is per-source (parallel across sources, no
    single-partition global window; a global budget would instead use
    per-partition partial sums + a broadcast offset join). The quality
    score is an exact integer division (``div`` / DuckDB ``//``), and the
    tie-break on doc_id makes the greedy prefix unique, so the kept set
    is deterministic on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(tokens).cast("bigint").alias("n_tokens"),
        F.expr(
            f"(CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"
            f" * {SCORE_SCALE})"
            f" div CAST(size(split(text, ' ')) AS BIGINT)"
        ).alias("score_m"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score_m").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return scored.withColumn("cum_tokens", F.sum("n_tokens").over(w)).filter(
        F.col("cum_tokens") <= SELECT_BUDGET_TOKENS
    )


def pack_ffd(docs: DataFrame, capacity: int = FFD_CAPACITY) -> DataFrame:
    """First-fit-decreasing bin packing of documents into fixed-capacity
    context windows, grouped by source.

    FFD is sequential within a group (every placement depends on the bins
    so far), so each source packs inside ONE ``applyInPandas`` call —
    sources are distributed and the per-source doc list is the unit of
    parallelism, mirroring how a production packer shards a corpus. An
    oversized document (> capacity) gets a bin of its own rather than
    being dropped, so the output always partitions the input exactly.
    """
    spark = docs.sparkSession
    schema = "doc_id bigint, source string, n_tokens bigint, bin_id bigint"

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bins: list[int] = []  # remaining capacity per bin
        assigned: list[int] = []
        for tok in pdf["n_tokens"]:
            placed = -1
            for i, rem in enumerate(bins):
                if tok <= rem:
                    placed = i
                    break
            if placed < 0:
                bins.append(max(capacity - tok, 0))
                placed = len(bins) - 1
            else:
                bins[placed] -= tok
            assigned.append(placed)
        pdf["bin_id"] = pd.Series(assigned, dtype="int64")
        return pdf[["doc_id", "source", "n_tokens", "bin_id"]]

    sized = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    return sized.groupBy("source").applyInPandas(pack_group, schema)


def _pack_ffd_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing context-window packing of the documents table
    (see :func:`pack_ffd`) — the production operator; capacity/partition/
    waste laws in tests/test_mixture.py."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_ffd(docs)


@register(
    "pack_bins_ffd",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN n > {FFD_CAPACITY} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oversized,
           CAST(sum(CASE WHEN n > {FFD_CAPACITY} THEN 1 ELSE 0 END)
                + (sum(CASE WHEN n <= {FFD_CAPACITY} THEN n ELSE 0 END)
                   + {FFD_CAPACITY} - 1) // {FFD_CAPACITY}
                AS BIGINT) AS lb_bins,
           TRUE AS partition_ok, TRUE AS capacity_ok,
           TRUE AS half_full_ok, TRUE AS bins_lb_ok
    FROM sized GROUP BY source
    """,
)
def pack_bins_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FFD packing, value-certified via a PACKING ENVELOPE (the r9
    envelope pattern for sequential recurrences): one row per source with
    EXACT brackets both engines compute — doc count, total tokens,
    oversized-doc count, and the adjusted volume lower bound
    ``n_oversized + ceil(fitting_tokens / capacity)`` — plus four
    booleans the oracle emits as TRUE:

    * ``partition_ok`` — the packing covers every input doc exactly once;
    * ``capacity_ok`` — every bin fits the capacity, except an oversized
      doc's dedicated singleton bin (pack_ffd's contract);
    * ``half_full_ok`` — at most ONE non-oversized bin per source is
      under half full (the classic first-fit theorem: when a second bin
      opens, every earlier bin has too little room left, i.e. is more
      than half full — so two under-half bins cannot coexist);
    * ``bins_lb_ok`` — the bin count meets the volume lower bound.

    The placement recurrence itself stays non-SQL-expressible; per-bin
    laws continue in tests/test_mixture.py over ``_pack_ffd_bins``."""
    cap = FFD_CAPACITY
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n"),
    )
    brackets = sized.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0))
        .cast("bigint")
        .alias("n_oversized"),
        (
            F.sum(F.when(F.col("n") > cap, 1).otherwise(0))
            + F.floor(
                (F.sum(F.when(F.col("n") <= cap, F.col("n")).otherwise(0))
                 + cap - 1)
                / cap
            )
        )
        .cast("bigint")
        .alias("lb_bins"),
    )
    packed = pack_ffd(docs)
    bins = packed.groupBy("source", "bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens"),
        F.count("*").alias("bin_docs"),
    )
    per_src_bins = bins.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_bins"),
        F.min(
            (F.col("bin_tokens") <= cap) | (F.col("bin_docs") == 1)
        ).alias("capacity_ok"),
        (
            F.sum(
                F.when(
                    (F.col("bin_tokens") <= cap)
                    & (F.col("bin_tokens") * 2 < cap),
                    1,
                ).otherwise(0)
            )
            <= 1
        ).alias("half_full_ok"),
    )
    per_src_docs = packed.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_packed"),
        F.countDistinct("doc_id").cast("bigint").alias("n_packed_distinct"),
    )
    return (
        brackets.join(per_src_bins, "source")
        .join(per_src_docs, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "n_oversized",
            "lb_bins",
            (
                (F.col("n_packed") == F.col("n_docs"))
                & (F.col("n_packed_distinct") == F.col("n_docs"))
            ).alias("partition_ok"),
            "capacity_ok",
            "half_full_ok",
            (F.col("n_bins") >= F.col("lb_bins")).alias("bins_lb_ok"),
        )
    )


# Grouped split fractions: hash buckets 0-79 train / 80-89 val / 90-99 test.
SPLIT_TRAIN_HI = 80
SPLIT_VAL_HI = 90


@register(
    "split_by_group_hash",
    oracle=f"""
    WITH tagged AS (
        SELECT CASE
                 WHEN ((user_id % 1000003) * 2654435761) % 4294967296 % 100
                      < {SPLIT_TRAIN_HI} THEN 'train'
                 WHEN ((user_id % 1000003) * 2654435761) % 4294967296 % 100
                      < {SPLIT_VAL_HI} THEN 'val'
                 ELSE 'test'
               END AS split,
               user_id
        FROM events)
    SELECT split,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM tagged GROUP BY split
    """,
)
def split_by_group_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split is a pure function of
    the GROUP key's hash (every event of a user lands in exactly one
    split), so entity leakage across splits is impossible by construction
    — the grouped-split rule every user-level eval needs, where a plain
    row-level random split silently leaks.

    The hash is an EXPLICIT Knuth multiplicative hash over exact int64
    arithmetic (``(id % 1000003) * 2654435761 mod 2^32 mod 100``) rather
    than an engine builtin — Spark's Murmur3 ``hash()`` and DuckDB's
    ``hash()`` disagree, and a split must be reproducible from the FORMULA
    forever (re-runs, other engines, audits), not from one engine's
    private hash. The pre-reduction keeps the product below 2^63 (ANSI
    overflow-safe at any key scale).

    Scale shape: a narrow map (two multiplies + case) and one
    partial-aggregated groupBy — nothing shuffles but |splits| partials
    plus the per-split distinct-user state.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        (F.col("user_id") % 1000003) * F.lit(2654435761)
    ) % F.lit(4294967296) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_HI, F.lit("train"))
        .when(bucket < SPLIT_VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        ev.select(split.alias("split"), "user_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


SAMPLE_PER_STRATUM = 20
SAMPLE_SEED = "lvs-r5"


@register(
    "sample_stratified_per_source",
    oracle=f"""
    WITH ranked AS (
        SELECT source, lang, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '{SAMPLE_SEED}'),
                            doc_id) AS rn
        FROM documents)
    SELECT source, lang, doc_id, n_chars, rn AS sample_rank
    FROM ranked WHERE rn <= {SAMPLE_PER_STRATUM}
    """,
)
def sample_stratified_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly min(n, 20) documents per
    source, chosen by a seeded content-independent pseudo-random order —
    the reproducible eval/inspection sample every corpus pipeline needs
    (rand()-based sampling is neither reproducible across retries nor
    auditable).

    The "random" order is the md5 of the key + seed, identical on every
    engine and run: changing the seed string redraws the sample, keeping
    it is a frozen artifact. One window per stratum — at 100 TB this is a
    single shuffle on `source` with partial top-k unnecessary only
    because k is tiny; for large k swap the row_number window for a
    per-partition top-k + merge.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SEED))),
        "doc_id",
    )
    return (
        docs.select(
            "source", "lang", "doc_id", "n_chars",
            F.row_number().over(w).alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= SAMPLE_PER_STRATUM)
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score each raw document by
# how target-like its hashed n-gram feature distribution is.
# ---------------------------------------------------------------------------

# Feature space: bigrams hashed into _DSIR_BUCKETS buckets by the same
# engine-exact polynomial rolling hash text_fingerprint uses (libm-free,
# identical fold on both engines). 4096 buckets keeps the per-bucket
# count tables broadcastable at any corpus size — that bound is the whole
# point of DSIR's hashing.
_DSIR_BUCKETS = 4096
_DSIR_MOD = 1_000_000_007
# Likelihood-ratio grid and clip: each bucket's p_target/p_raw ratio is
# floor-quantized to a 2^20 grid and clipped at 2^10 (DSIR
# implementations clip importance weights for variance control; here the
# clip also bounds q <= 2^30 so a document's int64 q-sum cannot overflow
# below 2^33 bigrams per doc). The ratio itself is an IEEE double
# multiply/divide tree over exact int64 counts — deterministic on both
# engines (the text_bigram_pmi argument); floor() of a double is exact.
_DSIR_GRID = 1 << 20
_DSIR_QCAP = 1 << 30

# DuckDB / Spark shared fold: polynomial hash of a bigram string -> bucket.
_DSIR_BUCKET_DUCK = f"""
    list_reduce(
        list_prepend(CAST(7 AS BIGINT),
            list_transform(generate_series(1, length(b)),
                           i -> CAST(ascii(substr(b, i, 1)) AS BIGINT))),
        (acc, c) -> (acc * 31 + c) % {_DSIR_MOD}) % {_DSIR_BUCKETS}
"""
_DSIR_BUCKET_SPARK = f"""
    aggregate(
        transform(sequence(1, length(b)), i -> ascii(substring(b, i, 1))),
        CAST(7 AS BIGINT),
        (acc, c) -> (acc * 31 + c) % {_DSIR_MOD}) % {_DSIR_BUCKETS}
"""
# the one bigram definition every operator shares (redaction.py owns it)
from lakehouse_variance_spark.operators.redaction import (  # noqa: E402
    _BIGRAMS_SQL as _DSIR_BIGRAMS_SQL,
)


@register(
    "select_dsir_importance",
    oracle=f"""
    WITH inst AS (
        SELECT doc_id, lang, {_DSIR_BUCKET_DUCK} AS bucket
        FROM (SELECT doc_id, lang, unnest({_DSIR_BIGRAMS_SQL}) AS b
              FROM documents)),
    raw AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS c_r FROM inst GROUP BY 1),
    tgt AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS c_t
        FROM inst WHERE lang = 'en' GROUP BY 1),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_r,
               CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_t
        FROM inst),
    ratio AS (
        SELECT raw.bucket,
               CASE WHEN tot.n_t > 0 THEN
                   LEAST(CAST(floor(
                       (CAST(COALESCE(tgt.c_t, 0) AS DOUBLE)
                        * CAST(tot.n_r AS DOUBLE))
                       / (CAST(raw.c_r AS DOUBLE) * CAST(tot.n_t AS DOUBLE))
                       * {_DSIR_GRID}) AS BIGINT), {_DSIR_QCAP})
               ELSE 0 END AS q
        FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket CROSS JOIN tot)
    SELECT inst.doc_id,
           CAST(count(*) AS BIGINT) AS n_features,
           CAST(sum(ratio.q) AS BIGINT) AS q_sum,
           CAST(sum(ratio.q) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               / {_DSIR_GRID} AS importance
    FROM inst JOIN ratio ON ratio.bucket = inst.bucket
    GROUP BY inst.doc_id
    """,
)
def select_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (Xie et al. 2023): estimate hashed-bigram
    unigram-of-features distributions for a TARGET domain (here the
    ``lang = 'en'`` slice — the stand-in for "looks like Wikipedia") and
    for the RAW corpus, then score every document by its mean per-feature
    likelihood ratio p_target(f)/p_raw(f). Documents whose feature mix
    resembles the target score above 1; off-domain documents score near
    0. Resampling the corpus with these weights IS the DSIR pipeline;
    the weights compose with `sample_weighted_systematic` for the draw.

    Determinism: the ratio-sum form replaces DSIR's log-ratio sum (same
    ordering for per-doc means under a monotone transform of each term;
    log() is libm and diverges across engines). Each bucket ratio is one
    IEEE multiply/divide tree over exact int64 counts, floor-quantized to
    a 2^20 grid and clipped at 2^10 (`_DSIR_QCAP`); per-doc sums are
    exact int64, so the result is bit-equal across engines and
    partitionings. Zero-target buckets score 0 without -inf handling.

    Scale: ONE pass over the corpus's bigram instances (explode + the
    char-fold hash, the dominant CPU) reduced immediately to per-(doc,
    bucket) counts and `localCheckpoint`ed — the 10x probe showed the
    hash fold re-running per consumer branch otherwise (7.4x ratio →
    ~2x). Everything downstream reads that materialized table: bucket
    counts via a second shrinking groupBy, the 4096-row ratio table and
    its 1-row totals broadcast back, one doc-keyed agg. At cluster
    scale swap the checkpoint for persist(DISK_ONLY) if the
    per-(doc,bucket) table outgrows executor memory; it is bounded by
    min(instances, docs x 4096).
    """
    from lakehouse_variance_spark.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    from lakehouse_variance_spark.operators.redaction import _bigrams_col

    n_db = (
        docs.select("doc_id", "lang", F.explode(_bigrams_col()).alias("b"))
        .select(
            "doc_id",
            "lang",
            F.expr(_DSIR_BUCKET_SPARK).cast("bigint").alias("bucket"),
        )
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint()
    )
    counts = n_db.groupBy("bucket").agg(
        F.sum("n").cast("bigint").alias("c_r"),
        F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("c_t"),
    )
    tot = counts.agg(
        F.sum("c_r").cast("bigint").alias("n_r"),
        F.sum("c_t").cast("bigint").alias("n_t"),
    )
    ratio = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        # empty target slice (n_t = 0): no evidence anything is
        # target-like — score 0, never 0/0 (NaN casts THROW under ANSI)
        F.when(
            F.col("n_t") > 0,
            F.least(
                F.floor(
                    (
                        F.col("c_t").cast("double")
                        * F.col("n_r").cast("double")
                    )
                    / (
                        F.col("c_r").cast("double")
                        * F.col("n_t").cast("double")
                    )
                    * F.lit(float(_DSIR_GRID))
                ).cast("bigint"),
                F.lit(_DSIR_QCAP),
            ),
        )
        .otherwise(F.lit(0))
        .alias("q"),
    )
    return (
        n_db.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_features"),
            F.sum(F.col("n") * F.col("q")).cast("bigint").alias("q_sum"),
        )
        .select(
            "doc_id",
            "n_features",
            "q_sum",
            (
                F.col("q_sum").cast("double")
                / F.col("n_features").cast("double")
                / F.lit(float(_DSIR_GRID))
            ).alias("importance"),
        )
    )


@register(
    "curriculum_training_order",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                   AS quality
        FROM documents),
    tiers AS (
        SELECT doc_id, source, quality,
               CAST(ntile(4) OVER (PARTITION BY source
                                   ORDER BY quality DESC, doc_id)
                    AS BIGINT) AS tier
        FROM scored),
    ranked AS (
        SELECT doc_id, source, quality, tier,
               CAST(row_number() OVER (PARTITION BY source, tier
                                       ORDER BY quality DESC, doc_id)
                    AS BIGINT) AS rank_in_tier
        FROM tiers),
    src AS (
        SELECT source,
               CAST(dense_rank() OVER (ORDER BY source) AS BIGINT)
                   AS source_idx
        FROM (SELECT DISTINCT source FROM documents))
    SELECT r.doc_id, r.source, r.tier, r.rank_in_tier,
           r.tier * 1152921504606846976 + r.rank_in_tier * 1048576
               + s.source_idx AS curriculum_key
    FROM ranked r JOIN src s ON s.source = r.source
    """,
)
def curriculum_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: a deterministic global training order
    that feeds the model highest-quality documents first (tier 1 → 4 by
    per-source quality quartile) while round-robin-interleaving sources
    inside each tier (rank-within-tier before source), so no source
    dominates any stretch of training. ``curriculum_key`` is a strictly
    ordered, collision-free int64 sort key — tier·2^60 + rank·2^20 +
    source_idx — valid for 2^20 sources and 2^40 (~1.1e12) docs per
    (source, tier), comfortably beyond a 100 TB corpus; sorting by it IS
    the training order, and shards cut from key ranges inherit the
    curriculum.

    Scale: quality is a narrow map; ntile/row_number windows partition BY
    SOURCE (the token_budget_select pattern — no global window, no global
    sort anywhere: the key is arithmetic, so the order materializes only
    when a consumer sorts or range-shards). The source-index table is
    |sources| rows, broadcast. Exact integer arithmetic end to end;
    doc_id tiebreaks make every window deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("bigint")
        .alias("quality"),
    )
    w_tier = Window.partitionBy("source").orderBy(
        F.desc("quality"), F.col("doc_id")
    )
    tiers = scored.withColumn(
        "tier", F.ntile(4).over(w_tier).cast("bigint")
    )
    w_rank = Window.partitionBy("source", "tier").orderBy(
        F.desc("quality"), F.col("doc_id")
    )
    ranked = tiers.withColumn(
        "rank_in_tier", F.row_number().over(w_rank).cast("bigint")
    )
    src = (
        docs.select("source")
        .distinct()
        .withColumn(
            "source_idx",
            F.dense_rank()
            .over(Window.orderBy("source"))
            .cast("bigint"),
        )
    )
    return ranked.join(F.broadcast(src), "source").select(
        "doc_id",
        "source",
        "tier",
        "rank_in_tier",
        (
            F.col("tier") * F.lit(1152921504606846976)
            + F.col("rank_in_tier") * F.lit(1048576)
            + F.col("source_idx")
        ).alias("curriculum_key"),
    )


# Corpus-wide token budget for the GLOBAL greedy selection variant.
GLOBAL_BUDGET_TOKENS = 5_000


@register(
    "token_budget_select_global",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                * {SCORE_SCALE})
                   // CAST(len(string_split(text, ' ')) AS BIGINT)
                   AS score_m
        FROM documents),
    ranked AS (
        SELECT doc_id, n_tokens, score_m,
               CAST(sum(n_tokens) OVER (
                   ORDER BY score_m DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens
        FROM scored)
    SELECT doc_id, n_tokens, score_m, cum_tokens
    FROM ranked WHERE cum_tokens <= {GLOBAL_BUDGET_TOKENS}
    """,
)
def token_budget_select_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-WIDE greedy quality selection: keep the globally
    highest-quality documents until one shared token budget is exhausted
    — the variant `token_budget_select`'s docstring promises for a global
    cap (best-k% corpus filtering where quality, not source, decides).

    Spark-first: the running token total over the global quality order
    uses `distributed_prefix_sum` (the carbon-scheduler two-pass scan) —
    rows bucket by quality band, the running sum is computed within each
    band in parallel, and only the ~16 per-band totals pass through an
    ordered global window. A naive `Window.orderBy(score)` would move the
    WHOLE CORPUS to one task. The order key is the exact integer
    `SCORE_SCALE - score_m` with doc_id tiebreak, so the greedy prefix is
    total, engine-exact, and partitioning-independent — mirrored by the
    oracle's ORDER BY score_m DESC, doc_id.
    """
    from lakehouse_variance_spark.scheduling.carbon import (
        distributed_prefix_sum,
    )

    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        F.size(tokens).cast("bigint").alias("n_tokens"),
        F.expr(
            f"(CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"
            f" * {SCORE_SCALE})"
            f" div CAST(size(split(text, ' ')) AS BIGINT)"
        ).alias("score_m"),
    ).withColumn("_ord", F.lit(SCORE_SCALE) - F.col("score_m"))
    cum = distributed_prefix_sum(
        scored, "_ord", "n_tokens", "cum_tokens", tie_col="doc_id"
    )
    return (
        cum.filter(F.col("cum_tokens") <= GLOBAL_BUDGET_TOKENS)
        .select(
            "doc_id",
            "n_tokens",
            "score_m",
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )
