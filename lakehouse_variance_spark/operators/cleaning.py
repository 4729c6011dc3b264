"""Corpus-cleaning operators: the C4/Gopher-style filter battery.

Per-document text *scoring* lives in textops.py; this module adds the
corpus-level cleaning decisions a pretraining pipeline chains in front of
dedup (per Raffel et al. 2020 (C4) and Rae et al. 2021 (Gopher rules),
both public):

* repetition ratio — fraction of duplicated word n-grams inside a doc
  (high = boilerplate / spam, the Gopher "repetition" signal);
* filter pipeline — a rule battery (length bounds, mean-word-length
  bounds, repetition cap) folded into per-(lang, source) keep/drop
  accounting, the shape of a C4 cleaning report;
* n-gram containment — asymmetric near-dup (how much of doc A lives
  inside doc B), which Jaccard misses when sizes differ a lot;
* corpus vocabulary stats — per-language type/token counts, the
  sanity dashboard run after every cleaning pass.

Everything is built-in DataFrame expressions (explode / higher-order
array functions); no Python in the hot path, so each op carries a DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table, spread

# Word n-gram width for the repetition signal. 3 is the classic dup-trigram
# rule; the synthetic corpus's small vocabulary makes it fire often enough
# to exercise both branches of the filter.
REP_NGRAM = 3

# Filter thresholds (Gopher-flavored, tuned to the synthetic corpus's
# 48-553-char documents so every rule fires on some split).
MIN_TOKENS = 15
MAX_TOKENS = 95
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_REP_RATIO = 0.30

# Containment: same shingle width as the Jaccard dedup, threshold higher
# because containment is directional.
CONTAIN_NGRAM = 3
CONTAIN_THRESHOLD = 0.8
CONTAIN_DOC_MOD = 5  # probe subset: every 5th doc checked against the corpus


def _grams_sql(n: int) -> str:
    """DuckDB list expression: word n-grams of `text` (non-distinct)."""
    return (
        f"list_transform(generate_series(1, len(string_split(text, ' ')) - {n - 1}),"
        f" i -> array_to_string(list_slice(string_split(text, ' '), i, i + {n - 1}), ' '))"
    )


def _grams_col(n: int):
    # Docs with < n tokens must yield an EMPTY gram list: Spark's
    # sequence(1, 0) counts DOWN (slice(tokens, 0, n) then throws) where
    # DuckDB's generate_series is empty — verify-notes trap.
    tokens = F.split(F.col("text"), " ")
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.array_join(F.slice(tokens, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


@register(
    "text_repetition_ratio",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, lang, {_grams_sql(REP_NGRAM)} AS grams
        FROM documents)
    SELECT doc_id, lang,
           CAST(len(grams) AS BIGINT)                AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
           CAST(len(grams) - len(list_distinct(grams)) AS BIGINT)
               AS n_repeated
    FROM g
    WHERE len(grams) - len(list_distinct(grams)) > 0
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate-{REP_NGRAM}-gram counts — the Gopher
    repetition signal. Emits only docs with at least one repeated n-gram
    (the flagging set). Counts, not the float ratio, cross the gate so the
    hash is engine-exact; the ratio is n_repeated / n_grams downstream.

    Scale: per-row array math only — no shuffle at all; the filter prunes
    the output before any exchange.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    grams = _grams_col(REP_NGRAM)
    out = docs.select(
        "doc_id",
        "lang",
        F.size(grams).cast("bigint").alias("n_grams"),
        F.size(F.array_distinct(grams)).cast("bigint").alias("n_distinct_grams"),
    ).withColumn("n_repeated", F.col("n_grams") - F.col("n_distinct_grams"))
    return out.filter(F.col("n_repeated") > 0)


@register(
    "text_filter_pipeline",
    oracle=f"""
    WITH scored AS (
        SELECT lang, source,
               len(string_split(text, ' ')) AS n_tokens,
               (len(replace(text, ' ', '')) * 1.0)
                   / len(string_split(text, ' ')) AS mean_word_len,
               len({_grams_sql(REP_NGRAM)})
                   - len(list_distinct({_grams_sql(REP_NGRAM)})) AS n_rep,
               len({_grams_sql(REP_NGRAM)}) AS n_grams
        FROM documents),
    flagged AS (
        SELECT lang, source,
               CASE WHEN n_tokens < {MIN_TOKENS} THEN 1 ELSE 0 END AS f_short,
               CASE WHEN n_tokens > {MAX_TOKENS} THEN 1 ELSE 0 END AS f_long,
               CASE WHEN mean_word_len < {MIN_MEAN_WORD_LEN}
                         OR mean_word_len > {MAX_MEAN_WORD_LEN}
                    THEN 1 ELSE 0 END AS f_wordlen,
               CASE WHEN n_grams > 0
                         AND n_rep * 1.0 / n_grams > {MAX_REP_RATIO}
                    THEN 1 ELSE 0 END AS f_repeat
        FROM scored)
    SELECT lang, source,
           count(*)                    AS n_docs,
           CAST(sum(f_short) AS BIGINT)   AS n_too_short,
           CAST(sum(f_long) AS BIGINT)    AS n_too_long,
           CAST(sum(f_wordlen) AS BIGINT) AS n_bad_wordlen,
           CAST(sum(f_repeat) AS BIGINT)  AS n_repetitive,
           CAST(sum(CASE WHEN f_short + f_long + f_wordlen + f_repeat = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM flagged
    GROUP BY lang, source
    """,
)
def text_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning report: apply the rule battery (token-count
    bounds, mean-word-length bounds, repetition cap) to every document and
    roll keep/drop counts up per (lang, source) — the acceptance dashboard
    of a cleaning pass.

    The repetition rule compares n_rep/n_grams as one IEEE division per
    engine (exact int64→double inputs), which is stable; only integer
    counts cross the gate.

    Scale: scoring is a single pass of per-row expressions; the rollup is
    one partial-aggregated shuffle on a low-cardinality key pair.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    tokens = F.split(F.col("text"), " ")
    grams = _grams_col(REP_NGRAM)
    scored = docs.select(
        "lang",
        "source",
        F.size(tokens).alias("n_tokens"),
        (
            F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double")
            / F.size(tokens)
        ).alias("mean_word_len"),
        (F.size(grams) - F.size(F.array_distinct(grams))).alias("n_rep"),
        F.size(grams).alias("n_grams"),
    )
    flagged = scored.select(
        "lang",
        "source",
        F.when(F.col("n_tokens") < MIN_TOKENS, 1).otherwise(0).alias("f_short"),
        F.when(F.col("n_tokens") > MAX_TOKENS, 1).otherwise(0).alias("f_long"),
        F.when(
            (F.col("mean_word_len") < MIN_MEAN_WORD_LEN)
            | (F.col("mean_word_len") > MAX_MEAN_WORD_LEN),
            1,
        )
        .otherwise(0)
        .alias("f_wordlen"),
        F.when(
            (F.col("n_grams") > 0)
            & (F.col("n_rep").cast("double") / F.col("n_grams") > MAX_REP_RATIO),
            1,
        )
        .otherwise(0)
        .alias("f_repeat"),
    )
    keep = (
        F.col("f_short") + F.col("f_long") + F.col("f_wordlen") + F.col("f_repeat")
        == 0
    )
    return flagged.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f_short").cast("bigint").alias("n_too_short"),
        F.sum("f_long").cast("bigint").alias("n_too_long"),
        F.sum("f_wordlen").cast("bigint").alias("n_bad_wordlen"),
        F.sum("f_repeat").cast("bigint").alias("n_repetitive"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
    )


@register(
    "dedup_ngram_containment",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct({_grams_sql(CONTAIN_NGRAM)})) AS shingle
        FROM documents),
    sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    probe AS (
        SELECT * FROM sh WHERE doc_id % {CONTAIN_DOC_MOD} = 0),
    overlap AS (
        SELECT p.doc_id AS probe_id, c.doc_id AS host_id,
               count(*) AS n_common
        FROM probe p JOIN sh c USING (shingle)
        WHERE p.doc_id <> c.doc_id
        GROUP BY p.doc_id, c.doc_id)
    SELECT o.probe_id, o.host_id, o.n_common,
           s.n_sh AS probe_sh
    FROM overlap o JOIN sizes s ON s.doc_id = o.probe_id
    WHERE o.n_common * 1.0 / s.n_sh >= {CONTAIN_THRESHOLD}
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: flag probe documents whose distinct
    {CONTAIN_NGRAM}-gram set is ≥{CONTAIN_THRESHOLD:.0%} contained in
    another document — catches quote/excerpt duplication where Jaccard
    stays low because the host is much longer. Probe set = every
    {CONTAIN_DOC_MOD}th doc (a containment *audit* samples; an exhaustive
    run sets the mod to 1).

    Scale: one shuffle on the shingle key joins probe shingles to corpus
    shingles; the probe side is a fixed fraction, and the threshold
    division is a single IEEE op per pair (engine-stable on exact int64
    inputs).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(_grams_col(CONTAIN_NGRAM))).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    probe = sh.filter(F.col("doc_id") % CONTAIN_DOC_MOD == 0).withColumnRenamed(
        "doc_id", "probe_id"
    )
    overlap = (
        probe.join(sh.withColumnRenamed("doc_id", "host_id"), "shingle")
        .filter(F.col("probe_id") != F.col("host_id"))
        .groupBy("probe_id", "host_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        overlap.join(
            sizes.withColumnRenamed("doc_id", "probe_id").withColumnRenamed(
                "n_sh", "probe_sh"
            ),
            "probe_id",
        )
        .filter(
            F.col("n_common").cast("double") / F.col("probe_sh")
            >= F.lit(CONTAIN_THRESHOLD)
        )
        .select("probe_id", "host_id", "n_common", "probe_sh")
    )


@register(
    "corpus_vocab_stats",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents)
    SELECT lang,
           count(*)              AS total_tokens,
           count(DISTINCT token) AS distinct_tokens,
           min(len(token))       AS min_token_len,
           max(len(token))       AS max_token_len
    FROM tok
    GROUP BY lang
    """,
)
def corpus_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary dashboard after a cleaning pass: token
    volume, distinct-type count, token-length extremes. The type/token
    ratio is distinct_tokens/total_tokens downstream.

    Scale: count(DISTINCT) over an exploded column — Spark plans it as a
    two-stage partial-then-final aggregate on (lang, token); no driver-side
    set materializes.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select("lang", F.explode(F.split(F.col("text"), " ")).alias("token"))
    return tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.count_distinct("token").alias("distinct_tokens"),
        F.min(F.length("token")).alias("min_token_len"),
        F.max(F.length("token")).alias("max_token_len"),
    )


@register(
    "text_tfidf_top_term",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents),
    tf AS (
        SELECT doc_id, lang, token, count(*) AS tf
        FROM tok GROUP BY doc_id, lang, token),
    df AS (
        SELECT lang, token, count(DISTINCT doc_id) AS df
        FROM tok GROUP BY lang, token),
    n AS (
        SELECT lang, count(DISTINCT doc_id) AS n_docs
        FROM documents GROUP BY lang),
    scored AS (
        SELECT tf.doc_id, tf.token, tf.tf, df.df, n.n_docs,
               CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
                   / CAST(df.df AS DOUBLE) AS score,
               row_number() OVER (PARTITION BY tf.doc_id
                                  ORDER BY CAST(tf.tf AS DOUBLE)
                                           * CAST(n.n_docs AS DOUBLE)
                                           / CAST(df.df AS DOUBLE) DESC,
                                           tf.token) AS rn
        FROM tf
        JOIN df ON df.lang = tf.lang AND df.token = tf.token
        JOIN n ON n.lang = tf.lang)
    SELECT doc_id, token AS top_term, tf, df, n_docs, score
    FROM scored WHERE rn = 1
    """,
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term weighting: each document's most distinctive term by
    tf·N/df within its language (the idf kept as an exact rational rather
    than a log so both engines produce bit-identical doubles — one int64→
    double multiply and one divide; log/ln tables differ across libm
    builds). The standard keyword-extraction pass over a cleaned corpus.

    Scale: tf and df aggregate the same exploded token stream — Spark
    computes both from one scan with partial aggregation; the df join
    shuffles on (lang, token) and the per-language doc count broadcasts.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "lang", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("lang", "token").agg(
        F.count_distinct("doc_id").alias("df")
    )
    n = docs.groupBy("lang").agg(F.count_distinct("doc_id").alias("n_docs"))
    score = (
        F.col("tf").cast("double")
        * F.col("n_docs").cast("double")
        / F.col("df").cast("double")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("token"))
    scored = (
        tf.join(df, ["lang", "token"])
        .join(F.broadcast(n), "lang")
        .select(
            "doc_id",
            F.col("token").alias("top_term"),
            "tf",
            "df",
            "n_docs",
            score.alias("score"),
            F.row_number().over(w).alias("rn"),
        )
    )
    return scored.filter(F.col("rn") == 1).drop("rn")


_BM25_TERMS = ("join", "scan", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH dl AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (
        SELECT avg(CAST(dl AS DOUBLE)) AS avgdl,
               CAST(count(*) AS DOUBLE) AS n FROM dl),
    tf AS (
        SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        WHERE token IN ('join', 'scan', 'window')
        GROUP BY doc_id, token),
    idf AS (
        SELECT token,
               ln(1 + (stats.n - df + 0.5) / (df + 0.5)) AS idf
        FROM (SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
              FROM tf GROUP BY token), stats),
    s AS (
        SELECT tf.doc_id, tf.token,
               idf.idf * tf.tf * ({_BM25_K1} + 1)
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B}
                  * CAST(dl.dl AS DOUBLE) / stats.avgdl)) AS s
        FROM tf
        JOIN idf ON idf.token = tf.token
        JOIN dl ON dl.doc_id = tf.doc_id, stats),
    per_doc AS (
        SELECT doc_id,
               coalesce(max(CASE WHEN token = 'join' THEN s END), 0)
               + coalesce(max(CASE WHEN token = 'scan' THEN s END), 0)
               + coalesce(max(CASE WHEN token = 'window' THEN s END), 0)
                   AS raw,
               count(*) AS matched_terms
        FROM s GROUP BY doc_id)
    SELECT doc_id, round(raw, 3) AS bm25, matched_terms
    FROM per_doc
    ORDER BY round(raw, 3) DESC, doc_id
    LIMIT 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (Robertson-Spärck Jones; k1=1.2, b=0.75) of a fixed
    3-term query over the corpus, top-20 documents — the ranking stage of
    a search/RAG pipeline over cleaned training text.

    Determinism across engines: ln() can differ in the last ulp between
    libm builds (the reason text_tfidf_top_term keeps its idf rational),
    so the ORDER BY key is the score ROUNDED to 3 decimals with a doc_id
    tie-break — an ulp of ln noise cannot flip the rounded comparison —
    and the per-term contributions add in a FIXED textual order (three
    coalesced pivot columns), never via a float SUM whose partial order
    the engine picks.

    Scale: query terms filter the exploded token stream BEFORE any
    aggregation (three terms survive out of the whole vocabulary), idf is
    a 3-row broadcast, doc lengths join on the doc key, and the top-20 is
    a TakeOrdered — no corpus-wide shuffle beyond the tf groupBy.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    dl = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("dl")
    )
    stats = dl.agg(
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tf = (
        tok.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    idf = (
        tf.groupBy("token")
        .agg(F.count_distinct("doc_id").cast("double").alias("df"))
        .join(stats, F.lit(True))
        .select(
            "token",
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    s = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "doc_id")
        .join(F.broadcast(stats), F.lit(True))
        .select(
            "doc_id",
            "token",
            (
                F.col("idf")
                * F.col("tf")
                * (_BM25_K1 + 1)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        1
                        - _BM25_B
                        + _BM25_B
                        * F.col("dl").cast("double")
                        / F.col("avgdl")
                    )
                )
            ).alias("s"),
        )
    )
    per_doc = s.groupBy("doc_id").agg(
        (
            F.coalesce(
                F.max(F.when(F.col("token") == "join", F.col("s"))), F.lit(0.0)
            )
            + F.coalesce(
                F.max(F.when(F.col("token") == "scan", F.col("s"))), F.lit(0.0)
            )
            + F.coalesce(
                F.max(F.when(F.col("token") == "window", F.col("s"))),
                F.lit(0.0),
            )
        ).alias("raw"),
        F.count(F.lit(1)).alias("matched_terms"),
    )
    return (
        per_doc.select(
            "doc_id", F.round("raw", 3).alias("bm25"), "matched_terms"
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


__all__ = [
    "text_repetition_ratio",
    "text_filter_pipeline",
    "dedup_ngram_containment",
    "corpus_vocab_stats",
    "text_tfidf_top_term",
    "text_bm25_topk",
]


@register(
    "vocab_fuzzy_pairs",
    oracle="""
    WITH vocab AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS token
        FROM documents WHERE length(text) > 0),
    v AS (SELECT token FROM vocab WHERE length(token) > 0)
    SELECT a.token AS token_a, b.token AS token_b,
           levenshtein(a.token, b.token) AS dist
    FROM v a
    JOIN v b ON a.token < b.token
    WHERE levenshtein(a.token, b.token) <= 2
    """,
)
def vocab_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy vocabulary matching — token pairs within edit distance 2 —
    via the SymSpell deletion-neighborhood trick: tokens within edit
    distance d share a member of their depth-d deletion neighborhoods
    (the token plus every way of deleting up to d characters), so
    candidate generation is an EQUI-join on the deletion variant and the
    exact ``levenshtein`` check runs only on candidates. This is the
    OCR-noise / typo-collapse primitive of corpus cleaning.

    Scale: the naive formulation (the oracle's form) is an O(|V|²) theta
    join — fine for DuckDB on a test vocabulary, fatal at a real
    vocabulary of 10⁷. The deletion-neighborhood join explodes each token
    to O(len²) short strings equi-joined on a string key, then verifies
    candidates only: output tracks true near-match structure. Same
    candidates-then-verify discipline as the MinHash and SimHash dedup
    paths.

    Guard rail: Spark's ``sequence(a, b)`` yields a DESCENDING range when
    b < a (it does not return empty), so every sequence over a length
    expression is wrapped in a when()-guard for short tokens.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )
    tok = F.col("token")
    ln = F.length(tok)
    empty_arr = F.array().cast("array<string>")

    def del_one(t, i):
        # delete character i (1-based) from t
        return F.concat(t.substr(F.lit(1), i - 1), t.substr(i + 1, ln))

    d1 = F.when(
        ln >= 1,
        F.transform(F.sequence(F.lit(1), ln), lambda i: del_one(tok, i)),
    ).otherwise(empty_arr)
    # delete characters i < j: three splice segments
    d2 = F.when(
        ln >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), ln - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, ln),
                    lambda j: F.concat(
                        tok.substr(F.lit(1), i - 1),
                        tok.substr(i + 1, j - i - 1),
                        tok.substr(j + 1, ln),
                    ),
                ),
            )
        ),
    ).otherwise(empty_arr)
    variants = vocab.select(
        "token",
        F.explode(
            F.array_distinct(F.concat(F.array(tok), d1, d2))
        ).alias("variant"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .select(
            F.col("a.token").alias("token_a"),
            F.col("b.token").alias("token_b"),
        )
        .distinct()
    )
    return cand.select(
        "token_a",
        "token_b",
        F.levenshtein("token_a", "token_b").alias("dist"),
    ).filter(F.col("dist") <= 2)


CMS_CAND = 256  # bounded candidate set scored against the sketch


@register(
    "vocab_cms_topk",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
    cnt AS (
        SELECT w, CAST(count(*) AS BIGINT) AS n_exact FROM toks GROUP BY w
    )
    SELECT w, n_exact, n_total,
           TRUE AS never_undercount,
           TRUE AS overcount_in_envelope
    FROM cnt, tot
    ORDER BY n_exact DESC, w
    LIMIT 20
    """,
)
def vocab_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimation over corpus tokens (Cormode &
    Muthukrishnan 2005), vs the exact counts: the heavy-hitters sketch a
    100 TB pipeline uses where an exact token groupBy would shuffle
    |vocab| x |partitions| rows of hot-key skew.

    The sketch (eps=0.001, conf=0.99, seed=42 -> ~2.7k x 5 int64 cells,
    ~100 KB) is a fixed-size MERGEABLE state: partials build map-side and
    merge in one reduce, cost independent of both corpus size and
    cardinality. Candidates come from ONE exact token aggregation whose
    top-CMS_CAND is a distributed TakeOrderedAndProject — partial
    aggregation combines map-side so the shuffle carries |vocab| x
    |partitions| partials and the driver never sees more than CMS_CAND
    rows.  Exactly two scans of the token stream total (sketch pass +
    count pass; the r4-era third scan — a sampled candidate pre-pass
    feeding a broadcast re-count — was strictly dominated by counting
    once).

    Oracle-checked via the bracketing-envelope pattern (see
    agg_approx_percentiles): the output rows are the EXACT top-20 tokens
    by exact count — deterministic, oracle-reproducible — plus booleans
    asserting the CMS guarantee on each: the sketch NEVER undercounts
    (deterministic property), and overcounts by at most 3·eps·N (the
    one-sided Markov bound at 3x gives per-item failure ≤ (3e)^-depth ≈
    6e-5, negligible across 20 heavy hitters).  The same envelope is
    asserted with exact values in tests/test_redaction.py.
    """
    from pyspark import InheritableThread

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    # The sketch pass and the exact-count pass are independent Spark jobs
    # over the same scan; submitting them concurrently overlaps their
    # stages across the executor cores (wall ~= max, not sum).
    box: dict[str, object] = {}

    def _cms_job() -> None:
        try:
            box["agg"] = toks.agg(
                F.count_min_sketch(
                    "w", F.lit(0.001), F.lit(0.99), F.lit(42)
                ).alias("cms"),
                F.count("*").cast("bigint").alias("n_total"),
            ).collect()[0]
        except BaseException as exc:  # noqa: BLE001 — re-raised on join
            box["err"] = exc

    th = InheritableThread(target=_cms_job)
    th.start()
    exact = (
        toks.groupBy("w")
        .agg(F.count("*").cast("bigint").alias("n_exact"))
        .orderBy(F.desc("n_exact"), "w")
        .limit(CMS_CAND)
        .collect()
    )
    th.join()
    if "err" in box:
        # Surface the background job's real failure instead of the
        # KeyError a dead thread would otherwise leave behind.
        raise box["err"]  # type: ignore[misc]
    agg = box["agg"]
    sketch = spark.sparkContext._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(agg["cms"])
    )
    n_total = agg["n_total"]
    bound = 3 * 0.001 * n_total  # 3 · eps · stream length
    rows = []
    for r in exact[:20]:  # candidates are already (n_exact DESC, w) ordered
        est = int(sketch.estimateCount(r["w"]))
        rows.append(
            (
                r["w"],
                r["n_exact"],
                n_total,
                est >= r["n_exact"],
                est - r["n_exact"] <= bound,
            )
        )
    return spark.createDataFrame(
        rows,
        "w string, n_exact bigint, n_total bigint, "
        "never_undercount boolean, overcount_in_envelope boolean",
    ).orderBy(F.desc("n_exact"), "w")


# Reciprocal-rank-fusion constant (Cormack et al. 2009) and the exact
# integer grid the 1/(k+rank) terms are quantized to: floor(2^20/(60+r))
# is pure int64 arithmetic — bit-equal across engines, no float sums.
_RRF_K = 60
_RRF_GRID = 1 << 20


def _hybrid_rrf_oracle() -> str:
    # importing the module RUNS its @register decorators, guaranteeing
    # the cosine oracle exists regardless of load_all()'s import order
    from lakehouse_variance_spark.operators import similarity  # noqa: F401
    from lakehouse_variance_spark.registry import ORACLES

    lex = ORACLES["text_bm25_topk"].strip().rstrip(";")
    sem = ORACLES["embed_cosine_topk"].strip().rstrip(";")
    return f"""
    WITH lex_hits AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                    AS BIGINT) AS rank_lex
        FROM ({lex})),
    sem_hits AS (
        SELECT neighbor_id AS doc_id,
               CAST(row_number() OVER (ORDER BY cosine DESC, neighbor_id)
                    AS BIGINT) AS rank_sem
        FROM ({sem}) WHERE query_id = 0)
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           l.rank_lex, s.rank_sem,
           COALESCE({_RRF_GRID} // ({_RRF_K} + l.rank_lex), 0)
           + COALESCE({_RRF_GRID} // ({_RRF_K} + s.rank_sem), 0) AS rrf_q
    FROM lex_hits l FULL OUTER JOIN sem_hits s ON s.doc_id = l.doc_id
    """


@register("search_hybrid_rrf", oracle=_hybrid_rrf_oracle())
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval fusion: reciprocal-rank fusion (RRF, Cormack et
    al. 2009 — the standard hybrid-search combiner) of the lexical BM25
    ranking (`text_bm25_topk`) and the semantic cosine ranking
    (`embed_cosine_topk`, query vector 0), the two-channel retrieval
    stage of a RAG/search pipeline over curated training text. The
    oracle REUSES both registered oracle texts verbatim as CTEs, so this
    query's hash match also re-certifies the compositions.

    Determinism: both input rankings already order by (rounded score
    DESC, id) — engine-stable — and each RRF term is quantized exact
    integer arithmetic, ``floor(2^20 / (60 + rank))``, summed as int64:
    no float accumulation anywhere in the fusion.

    Scale: the two channels are the already-analyzed plans (BM25's
    term-filtered aggregation, cosine's broadcast-query single pass);
    fusion itself joins two ≤top-k tables — trivially broadcast.
    """
    from lakehouse_variance_spark.operators.similarity import (
        embed_cosine_topk,
    )
    from pyspark.sql import Window

    lex = text_bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.col("doc_id")))
        .cast("bigint")
        .alias("rank_lex"),
    )
    sem = (
        embed_cosine_topk(spark, sf_dir)
        .filter(F.col("query_id") == 0)
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.row_number()
            .over(Window.orderBy(F.desc("cosine"), F.col("neighbor_id")))
            .cast("bigint")
            .alias("rank_sem"),
        )
    )
    rrf = F.coalesce(
        F.expr(f"{_RRF_GRID} div ({_RRF_K} + rank_lex)"), F.lit(0)
    ) + F.coalesce(
        F.expr(f"{_RRF_GRID} div ({_RRF_K} + rank_sem)"), F.lit(0)
    )
    return lex.join(sem, "doc_id", "full_outer").select(
        "doc_id", "rank_lex", "rank_sem", rrf.alias("rrf_q")
    )
