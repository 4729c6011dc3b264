"""Text-analysis operators over the ``documents`` table.

Language-ID (stopword heuristic), quality scoring, token counting
(whitespace + word-regex), and document fingerprinting (polynomial rolling
hash) — all as pure column expressions (higher-order array functions), fully
SQL-expressible, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table

EN_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")
_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

# Polynomial rolling hash over characters, mod 1e9+7 (products stay < 2^35,
# so the arithmetic is exact in any engine's int64).
_FP_MOD = 1_000_000_007
_FP_SPARK = f"""
    aggregate(
        transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1))),
        CAST(7 AS BIGINT),
        (acc, c) -> (acc * 31 + c) % {_FP_MOD})
"""


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                       AS n_tokens,
           len(list_distinct(string_split(text, ' ')))        AS n_distinct_tokens,
           len(regexp_extract_all(text, '\\w+'))              AS n_word_tokens,
           length(text)                                       AS n_chars_measured,
           round(list_aggregate(list_transform(string_split(text, ' '),
                                               t -> length(t)), 'sum')
                 * 1.0 / len(string_split(text, ' ')), 4)     AS avg_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split + word-regex ("BPE-ish" pre-tokenizer)
    counts, distinct-token count, char count, mean token length."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(tokens).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(tokens)).cast("bigint").alias("n_distinct_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"\w+"), F.lit(0)))
        .cast("bigint")
        .alias("n_word_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
        F.round(
            F.aggregate(
                F.transform(tokens, lambda t: F.length(t)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            )
            / F.size(tokens),
            4,
        ).alias("avg_token_len"),
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           round(least(1.0, len(string_split(text, ' ')) / 50.0) *
                 (len(list_distinct(string_split(text, ' '))) * 1.0 /
                  len(string_split(text, ' '))), 4)              AS quality_score,
           CASE WHEN least(1.0, len(string_split(text, ' ')) / 50.0) *
                     (len(list_distinct(string_split(text, ' '))) * 1.0 /
                      len(string_split(text, ' '))) < 0.3
                THEN 1 ELSE 0 END                                 AS is_low_quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length saturation x lexical diversity
    (distinct/total token ratio), with a low-quality flag — the
    filter-before-training primitive of an LLM data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n = F.size(tokens)
    score = F.least(F.lit(1.0), n / F.lit(50.0)) * (
        F.size(F.array_distinct(tokens)) / n
    )
    return docs.select(
        "doc_id",
        F.round(score, 4).alias("quality_score"),
        F.when(score < 0.3, 1).otherwise(0).cast("int").alias("is_low_quality"),
    )


@register(
    "text_langid_stopwords",
    oracle=f"""
    SELECT lang,
           CASE WHEN len(list_filter(string_split(text, ' '),
                                     t -> t IN ({_STOP_SQL}))) * 1.0 /
                     len(string_split(text, ' ')) >= 0.05
                THEN 'en' ELSE 'unknown' END AS predicted_lang,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
)
def text_langid_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English-stopword density threshold, reported as
    a (true lang x predicted) confusion table. A real deployment swaps the
    stopword list per language; the operator shape is identical."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    stop_ratio = F.size(
        F.filter(tokens, lambda t: t.isin(*EN_STOPWORDS))
    ) / F.size(tokens)
    return (
        docs.select(
            "lang",
            F.when(stop_ratio >= 0.05, "en").otherwise("unknown").alias(
                "predicted_lang"
            ),
        )
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                   list_transform(generate_series(1, length(text)),
                                  i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % {_FP_MOD}) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint: polynomial rolling hash over the
    raw characters (content-addressable dedup key; engine-independent unlike
    xxhash/murmur, so it is oracle-checkable)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.expr(_FP_SPARK).cast("bigint").alias("fingerprint"))


@register(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm_text,
           length(trim(regexp_replace(regexp_replace(lower(text),
                                                     '[^a-z0-9 ]', ' ', 'g'),
                                      ' +', ' ', 'g'))) AS norm_len
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization for dedup/training pipelines: lowercase,
    strip non-alphanumerics to spaces, collapse runs, trim — the standard
    pre-pass before shingling/fingerprinting so near-dup detection ignores
    case and punctuation. Pure regexp_replace: one narrow JVM map, no
    shuffle, scales as a single scan."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_len")
    )


# GPT-2-style pre-tokenizer, restricted to the corpus's ASCII alphabet:
# leading-space-attached letter runs, digit runs, and punctuation runs —
# the segmentation BPE merges operate within. Identical RE2/Java semantics.
_BPE_PRETOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


@register(
    "text_bpe_pretokenize",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_PRETOKEN_RE}'))  AS n_pretokens,
           len(list_distinct(regexp_extract_all(text, '{_BPE_PRETOKEN_RE}')))
               AS n_distinct_pretokens,
           CAST(list_aggregate(list_transform(
                    regexp_extract_all(text, '{_BPE_PRETOKEN_RE}'),
                    t -> length(t)), 'sum') AS BIGINT) AS n_covered_chars
    FROM documents
    """,
)
def text_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: the GPT-2 pre-tokenizer segmentation
    (space-attached word / number / punctuation runs) as a pure regex
    column expression — the unit BPE merge tables operate on, and the
    honest train-token estimator (whitespace splitting undercounts
    punctuation-heavy text). Narrow map, no shuffle, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(_BPE_PRETOKEN_RE), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_pretokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_pretokens"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n_covered_chars"),
    )


@register(
    "text_doc_rarity_score",
    oracle="""
    WITH exploded AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
        WHERE length(text) > 0),
    doc_tokens AS (
        SELECT DISTINCT doc_id, token FROM exploded),
    docfreq AS (
        SELECT token, count(*) AS df FROM doc_tokens GROUP BY token),
    n_total AS (SELECT count(*) AS n_docs FROM documents
                WHERE length(text) > 0)
    SELECT t.doc_id,
           count(*) AS n_distinct_tokens,
           CAST(sum(f.df) AS BIGINT) AS df_sum,
           (CAST(sum(f.df) AS DOUBLE) / CAST(count(*) AS DOUBLE))
               / CAST(n.n_docs AS DOUBLE) AS commonness
    FROM doc_tokens t
    JOIN docfreq f ON f.token = t.token
    CROSS JOIN n_total n
    GROUP BY t.doc_id, n.n_docs
    """,
)
def text_doc_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative rarity scoring: each document's mean document
    frequency over its distinct tokens, normalized by corpus size — the
    log-free analogue of a unigram-LM perplexity proxy (CCNet-style
    quality bucketing ranks docs by how 'common' their vocabulary is).
    ``commonness`` near 1 means every token appears in every document;
    rare-vocabulary docs score near 1/N.

    The score is a rational of exact integers — Σdf / n_tokens / N — with
    two IEEE divisions at the end, so it is partition-order-independent and
    engine-exact (no log(), whose libm rounding differs across engines).

    Scale: ONE explode → distinct per (doc, token), one token-keyed
    groupBy for document frequencies, one join back on token, one doc
    groupBy. The df table is vocabulary-sized (Zipf: millions, not
    billions) and AQE broadcasts it when small; ultra-common tokens are
    the skew risk, mitigated the same way as stop-shingles in dedup
    (frequency-cap the vocab before the join at 100 TB).
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    doc_tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    docfreq = doc_tokens.groupBy("token").agg(F.count("*").alias("df"))
    n_total = docs.agg(F.count("*").alias("n_docs"))
    joined = doc_tokens.join(docfreq, "token")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.sum("df").alias("df_sum"),
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            "n_distinct_tokens",
            "df_sum",
            (
                (
                    F.col("df_sum").cast("double")
                    / F.col("n_distinct_tokens").cast("double")
                )
                / F.col("n_docs").cast("double")
            ).alias("commonness"),
        )
    )


@register(
    "text_quality_quartiles",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_distinct(string_split(text, ' '))) AS n_distinct
        FROM documents),
    bucketed AS (
        SELECT lang,
               ntile(4) OVER (PARTITION BY lang
                              ORDER BY n_distinct, doc_id) AS quartile,
               n_distinct
        FROM scored)
    SELECT lang, quartile,
           count(*) AS n_docs,
           min(n_distinct) AS min_distinct,
           max(n_distinct) AS max_distinct
    FROM bucketed
    GROUP BY lang, quartile
    """,
)
def text_quality_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-tier bucketing for data mixing: rank documents within each
    language by a quality signal (distinct-token count) and cut into
    quartiles — the CCNet-style head/middle/tail split that decides how
    much of each tier enters the training mix. Per (lang, quartile):
    volume and the signal's range.

    ``ntile`` is exact and, with doc_id as the tiebreak, fully
    deterministic — unlike approximate-quantile cuts, identical buckets on
    every engine and partitioning. Scale: the window partitions by lang
    (one exchange); at 100 TB with few giant languages, split the signal
    range per lang first (the distributed_prefix_sum bucketing in
    scheduling/carbon.py is the template) or swap the exact cut for
    percentile_approx thresholds — the tier semantics tolerate it.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    scored = docs.select(
        "doc_id",
        "lang",
        F.size(F.array_distinct(F.split("text", " "))).alias("n_distinct"),
    )
    w = Window.partitionBy("lang").orderBy("n_distinct", "doc_id")
    bucketed = scored.select(
        "lang", F.ntile(4).over(w).alias("quartile"), "n_distinct"
    )
    return bucketed.groupBy("lang", "quartile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_distinct").alias("min_distinct"),
        F.max("n_distinct").alias("max_distinct"),
    )


@register(
    "vocab_zipf_histogram",
    oracle="""
    WITH exploded AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE length(text) > 0),
    df AS (
        SELECT token, count(DISTINCT doc_id) AS doc_freq
        FROM exploded GROUP BY token)
    SELECT length(printf('%b', doc_freq)) AS freq_bucket,
           count(*) AS n_tokens,
           min(doc_freq) AS min_df,
           max(doc_freq) AS max_df
    FROM df
    GROUP BY 1
    """,
)
def vocab_zipf_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-profile of the corpus vocabulary: document frequency per token,
    bucketed by power of two — the sanity dashboard every corpus build
    checks (a healthy crawl shows the straight-line log-log decay; a
    collapsed head means boilerplate, a fat tail means OCR noise).

    The log₂ bucket is the BIT LENGTH of the integer frequency —
    ``length(bin(df))`` — exact integer arithmetic on both engines,
    immune to the ulp-at-the-boundary problem of ``floor(log2(x))``
    (libm log differs across engines at exact powers of two). One explode
    → distinct pair aggregate, one token groupBy, one |buckets| rollup:
    the same two shrinking shuffles as the rarity score.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    pairs = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    dfreq = pairs.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    return dfreq.groupBy(
        F.length(F.bin("doc_freq")).cast("bigint").alias("freq_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.min("doc_freq").alias("min_df"),
        F.max("doc_freq").alias("max_df"),
    )


@register(
    "vocab_source_keywords",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT doc_id, source, token
        FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
              FROM documents WHERE length(text) > 0)),
    a_tab AS (
        SELECT source, token, count(*) AS df_in
        FROM pairs GROUP BY source, token),
    df_tab AS (
        SELECT token, count(*) AS df_all
        FROM (SELECT DISTINCT doc_id, token FROM pairs) GROUP BY token),
    ns_tab AS (
        SELECT source, count(*) AS n_src
        FROM documents WHERE length(text) > 0 GROUP BY source),
    n_tab AS (
        SELECT count(*) AS n_all FROM documents WHERE length(text) > 0),
    cells AS (
        SELECT a.source, a.token, a.df_in,
               CAST(d.df_all - a.df_in AS BIGINT) AS df_out,
               CAST(a.df_in AS DOUBLE) AS fa,
               CAST(d.df_all - a.df_in AS DOUBLE) AS fb,
               CAST(s.n_src - a.df_in AS DOUBLE) AS fc,
               CAST(n.n_all - s.n_src - (d.df_all - a.df_in) AS DOUBLE) AS fd,
               CAST(d.df_all AS DOUBLE) AS fdf,
               CAST(s.n_src AS DOUBLE) AS fns,
               CAST(n.n_all AS DOUBLE) AS fn
        FROM a_tab a JOIN df_tab d ON a.token = d.token
                     JOIN ns_tab s ON a.source = s.source
                     CROSS JOIN n_tab n),
    scored AS (
        SELECT source, token, df_in, df_out,
               (fn * ((fa * fd - fb * fc) * (fa * fd - fb * fc)))
                   / (((fdf * (fn - fdf)) * fns) * (fn - fns)) AS chi2
        FROM cells
        WHERE fa * fd - fb * fc > 0)
    SELECT source, token, df_in, df_out, chi2
    FROM (SELECT *, row_number() OVER (PARTITION BY source
                                       ORDER BY chi2 DESC, token) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def vocab_source_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-signature keywords: per source, the 5 tokens most
    over-represented vs the rest of the corpus by the 2x2 chi-square
    statistic over document frequencies — the standard corpus-linguistics
    keyness measure, and the mixture-QA dashboard that spots a source
    whose vocabulary is drifting from the pool (boilerplate injection,
    scraper breakage, language drift).

    Determinism: all four contingency cells are exact int64 counts; chi2
    is computed in DOUBLE with one FIXED parenthesization mirrored
    verbatim in the oracle — every int64->double conversion is exact and
    both engines evaluate the identical IEEE expression tree, so the
    doubles are bit-equal (the positivity filter runs in double space too,
    avoiding a*d int64 overflow at web-corpus document frequencies).

    Scale: one explode -> distinct triple, one (source, token) groupBy;
    the token document-frequency table is vocabulary-sized and the
    per-source totals are |sources| rows — both broadcast. Top-5 per
    source is a WindowGroupLimit (partial top-k before the exchange).
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    pairs = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    a_tab = pairs.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("df_in")
    )
    # Each doc has exactly one source, so the corpus-wide doc frequency is
    # the per-source sum — one aggregation over the already-small a_tab
    # instead of a second full explode+distinct pass over the corpus.
    df_tab = a_tab.groupBy("token").agg(F.sum("df_in").alias("df_all"))
    ns_tab = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    n_tab = docs.agg(F.count(F.lit(1)).alias("n_all"))
    cells = (
        a_tab.join(df_tab, "token")
        .join(F.broadcast(ns_tab), "source")
        .crossJoin(F.broadcast(n_tab))
        .select(
            "source",
            "token",
            "df_in",
            (F.col("df_all") - F.col("df_in")).cast("bigint").alias("df_out"),
            F.col("df_in").cast("double").alias("fa"),
            (F.col("df_all") - F.col("df_in")).cast("double").alias("fb"),
            (F.col("n_src") - F.col("df_in")).cast("double").alias("fc"),
            (
                F.col("n_all") - F.col("n_src") - (F.col("df_all") - F.col("df_in"))
            ).cast("double").alias("fd"),
            F.col("df_all").cast("double").alias("fdf"),
            F.col("n_src").cast("double").alias("fns"),
            F.col("n_all").cast("double").alias("fn"),
        )
    )
    delta = F.col("fa") * F.col("fd") - F.col("fb") * F.col("fc")
    chi2 = (F.col("fn") * (delta * delta)) / (
        ((F.col("fdf") * (F.col("fn") - F.col("fdf"))) * F.col("fns"))
        * (F.col("fn") - F.col("fns"))
    )
    scored = cells.filter(delta > 0).select(
        "source", "token", "df_in", "df_out", chi2.alias("chi2")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.col("chi2").desc(), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "token", "df_in", "df_out", "chi2")
    )
