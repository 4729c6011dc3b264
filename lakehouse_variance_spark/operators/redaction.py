"""PII redaction and corpus collocation mining.

Two corpus operators a training-data pipeline runs between cleaning and
dedup:

* ``text_pii_redact`` — regex redaction of emails / IPv4 addresses /
  phone numbers, the standard pre-release scrub (the reference scrubs
  its traces the same way — IPs and paths via jq regexes,
  ``traces/tools/scrub.jq:1-44``). The synthetic corpus contains no PII
  (word-bag documents), so the query first injects DETERMINISTIC
  synthetic PII derived from ``doc_id`` — identical integer arithmetic
  on both engines — then redacts it and proves the redaction by count
  and by md5 of the redacted text. A vacuous no-op pass would verify
  nothing.
* ``text_bigram_pmi`` — top word collocations by co-occurrence count
  with their PMI ratio ``P(w1 w2) / (P(w1)·P(w2))`` — the classic
  pointwise-mutual-information signal (Church & Hanks 1990), used to
  mine multi-word expressions before tokenizer training.

Scale notes: redaction is a narrow per-row map (zero shuffles, stays in
whole-stage codegen — regexp_replace/regexp_count are JVM expressions).
Bigram counting is the canonical explode → partial-aggregated groupBy;
the unigram and total tables are vocabulary-sized and broadcast back, so
the corpus is scanned twice and shuffled only at |vocab| and |vocab|²
granularity. PMI is computed as double products of exact int64 counts
((co·n)/(c1·c2) with each int→double conversion exact below 2^53 and
one multiply/divide tree identical on both engines) — never as
bigint·bigint, which ANSI mode would overflow at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table, spread

# Redaction patterns — shared subset of Java regex (Spark) and RE2
# (DuckDB): character classes, bounded quantifiers, \b word boundaries;
# no lookaround. Order matters: emails first (their domains contain
# dots that the IP pattern must never see), then IPs, then phones.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


@register(
    "text_pii_redact",
    oracle=f"""
    WITH injected AS (
        SELECT doc_id, lang,
               text
               || CASE WHEN doc_id % 3 <> 0
                       THEN ' contact user' || doc_id || '@mail-'
                            || (doc_id % 7) || '.example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 2 = 0
                       THEN ' from 10.' || (doc_id % 256) || '.'
                            || ((doc_id * 7) % 256) || '.' || (doc_id % 100)
                       ELSE '' END
               || ' call +1-555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents),
    red AS (
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(t, '{IPV4_RE}')) AS BIGINT)
                   AS n_ips,
               CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT)
                   AS n_phones,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(t, '{EMAIL_RE}', '[EMAIL]', 'g'),
                       '{IPV4_RE}', '[IP]', 'g'),
                   '{PHONE_RE}', '[PHONE]', 'g') AS redacted
        FROM injected)
    SELECT doc_id, lang, n_emails, n_ips, n_phones,
           md5(redacted) AS redacted_md5,
           CAST(length(redacted) AS BIGINT) AS n_chars_redacted
    FROM red
    ORDER BY doc_id
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inject deterministic synthetic PII, redact it, prove the scrub.

    Mirrors the reference's trace scrubbing (IP/path regex redaction,
    ``traces/tools/scrub.jq:1-20``) as a corpus operator. Counts come
    from ``regexp_count`` BEFORE redaction; the md5 of the redacted
    text pins the exact output bytes on both engines.
    """
    doc = F.col("doc_id")
    email = F.concat(
        F.lit(" contact user"),
        doc.cast("string"),
        F.lit("@mail-"),
        (doc % 7).cast("string"),
        F.lit(".example.com"),
    )
    ip = F.concat(
        F.lit(" from 10."),
        (doc % 256).cast("string"),
        F.lit("."),
        ((doc * 7) % 256).cast("string"),
        F.lit("."),
        (doc % 100).cast("string"),
    )
    phone = F.concat(
        F.lit(" call +1-555-"),
        F.lpad((doc % 10000).cast("string"), 4, "0"),
    )
    injected = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.when(doc % 3 != 0, email).otherwise(F.lit("")),
            F.when(doc % 2 == 0, ip).otherwise(F.lit("")),
            phone,
        ).alias("t"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), EMAIL_RE, "[EMAIL]"),
            IPV4_RE,
            "[IP]",
        ),
        PHONE_RE,
        "[PHONE]",
    )
    return (
        injected.select(
            "doc_id",
            "lang",
            F.regexp_count(F.col("t"), F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
            F.regexp_count(F.col("t"), F.lit(IPV4_RE)).cast("bigint").alias("n_ips"),
            F.regexp_count(F.col("t"), F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
            F.md5(redacted).alias("redacted_md5"),
            F.length(redacted).cast("bigint").alias("n_chars_redacted"),
        )
        .orderBy("doc_id")
    )


def _bigrams_col():
    # Guard single-token/empty docs: Spark's sequence(1, 0) counts DOWN
    # (step defaults to -1 when start > stop) and slice(tokens, 0, 2) then
    # raises — while DuckDB's generate_series(1, 0) is just empty. Emit an
    # empty bigram array for size<2 so both engines agree (same trap as
    # bpe_first_merge_pairs' length>=2 filter).
    tokens = F.split(F.col("text"), " ")
    return F.when(
        F.size(tokens) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - 1),
            lambda i: F.array_join(F.slice(tokens, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


_BIGRAMS_SQL = (
    "list_transform(generate_series(1, len(string_split(text, ' ')) - 1),"
    " i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' '))"
)


@register(
    "text_bigram_pmi",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    uni AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
    bg AS (
        SELECT unnest({_BIGRAMS_SQL}) AS bg FROM documents),
    bgc AS (
        SELECT split_part(bg, ' ', 1) AS w1,
               split_part(bg, ' ', 2) AS w2,
               CAST(count(*) AS BIGINT) AS co
        FROM bg GROUP BY 1, 2)
    SELECT w1, w2, co, u1.c AS c1, u2.c AS c2, n,
           (CAST(co AS DOUBLE) * CAST(n AS DOUBLE))
               / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS pmi_ratio
    FROM bgc
    JOIN uni u1 ON u1.w = w1
    JOIN uni u2 ON u2.w = w2
    CROSS JOIN tot
    ORDER BY co DESC, w1, w2
    LIMIT 20
    """,
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by bigram count with PMI ratio.

    Two explode → groupBy passes over the corpus (unigrams, bigrams);
    the |vocab|-sized unigram table and the 1-row total broadcast back
    onto the bigram counts, so nothing corpus-sized shuffles twice.
    """
    # spread() first: the one-file documents scan is a single task, and the
    # tokenize/explode work must fan out BEFORE the CPU multiplication
    # (SCALE.md scan rule); measured 2.1s -> 1.2s warm at sf0.1.
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").cast("bigint").alias("c"))
    tot = toks.agg(F.count("*").cast("bigint").alias("n"))
    bgc = (
        docs.select(F.explode(_bigrams_col()).alias("bg"))
        .select(
            F.split("bg", " ").getItem(0).alias("w1"),
            F.split("bg", " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("co"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = (
        (F.col("co").cast("double") * F.col("n").cast("double"))
        / (F.col("c1").cast("double") * F.col("c2").cast("double"))
    ).alias("pmi_ratio")
    return (
        bgc.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "co", "c1", "c2", "n", pmi)
        .orderBy(F.desc("co"), "w1", "w2")
        .limit(20)
    )


@register(
    "bpe_first_merge_pairs",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    wc AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM words WHERE length(w) >= 2 GROUP BY w),
    pairs AS (
        SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                     i -> substr(w, i, 2))) AS pair,
               c
        FROM wc)
    SELECT pair, CAST(sum(c) AS BIGINT) AS merge_count
    FROM pairs
    GROUP BY pair
    ORDER BY merge_count DESC, pair
    LIMIT 15
    """,
)
def bpe_first_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE training step (Sennrich et al. 2016): corpus-weighted
    adjacent-character-pair counts — the argmax pair is the first merge a
    tokenizer trainer records. Iterating this query with the winning pair
    substituted IS BPE training; one step is registered because each
    round's aggregation shape (and its scale profile) is identical.

    The pair generation runs over the DISTINCT word table weighted by
    word frequency — |vocab| rows, not |corpus| — so the expensive
    explode touches each unique word once (exactly how production BPE
    trainers batch by word frequency). Single-char words are excluded on
    both engines (Spark's sequence(1,0) counts down where DuckDB's
    generate_series is empty — the one dialect trap in this shape)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    wc = (
        words.filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    pairs = wc.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").cast("bigint").alias("merge_count"))
        .orderBy(F.desc("merge_count"), "pair")
        .limit(15)
    )


# Quantization grid for the bigram-LM conditional probabilities: each
# p(w2|w1) = c_bg/c_pre is stored as floor(c_bg·2^20 / c_pre) — EXACT
# int64 arithmetic on both engines (Spark `DIV`, DuckDB `//`; positive
# operands, so truncation == floor). c_bg ≤ c_pre always (a bigram's
# count cannot exceed its prefix's continuation count), so the product
# c_bg·2^20 stays below int64 until a single prefix word exceeds 2^43 ≈
# 8.8e12 bigram instances — beyond a 100 TB corpus's most common word.
# Under ANSI mode an overflow would THROW, not corrupt (fail-loud).
_LM_GRID = 1 << 20


@register(
    "text_bigram_lm_fluency",
    oracle=f"""
    WITH bg AS (
        SELECT doc_id,
               split_part(b, ' ', 1) AS w1,
               b
        FROM (SELECT doc_id, unnest({_BIGRAMS_SQL}) AS b FROM documents)),
    pre AS (
        SELECT w1, CAST(count(*) AS BIGINT) AS c_pre FROM bg GROUP BY w1),
    bgc AS (
        SELECT b, CAST(count(*) AS BIGINT) AS c_bg FROM bg GROUP BY b),
    q AS (
        SELECT bgc.b, (bgc.c_bg * {_LM_GRID}) // pre.c_pre AS q
        FROM bgc
        JOIN pre ON pre.w1 = split_part(bgc.b, ' ', 1))
    SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(q.q) AS BIGINT) AS q_sum,
           CAST(sum(q.q) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               / {_LM_GRID} AS lm_fluency
    FROM bg JOIN q ON q.b = bg.b
    GROUP BY bg.doc_id
    """,
)
def text_bigram_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model document scoring (Wenzek et al. 2020
    filter low-quality web text by LM perplexity): train a bigram LM on
    the corpus itself — p(w2|w1) = c(w1 w2)/c(w1 ·) — and score each
    document by its mean conditional bigram probability. High
    ``lm_fluency`` = word sequences the corpus-level LM finds likely
    (fluent, formulaic); near 0 = sequences never seen elsewhere
    (noise, boilerplate-breaking garbage). The arithmetic-mean-of-
    probabilities form replaces the geometric mean of perplexity so the
    score is a ratio of EXACT integers: probabilities are quantized to
    a 2^20 grid by floor division (see ``_LM_GRID``), the per-doc sum of
    quantized int64s is partition-order-free, and the only IEEE ops are
    two final divisions of exact operands — bit-equal across engines and
    partitionings, no log()/exp() libm divergence.

    Documents with fewer than two tokens have no bigrams and are
    excluded (no LM evidence either way).

    Scale: one corpus-sized explode per consumer branch (prefix counts,
    bigram counts, final join-back); the dominant cost at BOTH probe
    scales is the bigram-keyed shuffle of the join-back, not the explode
    — a localCheckpoint'ed per-(doc, bigram) pre-aggregation was
    measured and left out: it halves nothing (10x time 5.6s either way)
    while doubling the sf0.1 time. The scored bigram table joins back
    onto the instance stream keyed on the bigram (AQE broadcasts it when
    small). Ultra-common bigrams skew the join-back the same way
    stop-shingles skew dedup — frequency-cap the vocabulary before the
    join at 100 TB.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    bg = docs.select(
        "doc_id", F.explode(_bigrams_col()).alias("b")
    ).select("doc_id", F.split("b", " ").getItem(0).alias("w1"), "b")
    pre = bg.groupBy("w1").agg(F.count("*").cast("bigint").alias("c_pre"))
    bgc = bg.groupBy("b").agg(F.count("*").cast("bigint").alias("c_bg"))
    q = (
        bgc.withColumn("w1", F.split("b", " ").getItem(0))
        .join(pre, "w1")
        .select(
            "b",
            F.expr(f"(c_bg * {_LM_GRID}) DIV c_pre").alias("q"),
        )
    )
    return (
        bg.join(q, "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("q").cast("bigint").alias("q_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "q_sum",
            (
                F.col("q_sum").cast("double")
                / F.col("n_bigrams").cast("double")
                / F.lit(float(_LM_GRID))
            ).alias("lm_fluency"),
        )
    )


# Number of BPE merge rounds the trainer runs. Each round is one
# vocabulary-sized aggregation + a 1-row argmax collect, so k scales the
# number of Spark jobs, not the per-round cost.
BPE_TRAIN_ROUNDS = 6


def _bpe_merge_fold(a: str, b: str) -> str:
    """Greedy left-to-right merge of adjacent (a, b) token pairs inside a
    token array — the exact subword-nmt substitution semantics (an
    overlapping run 'a a a' under pair (a,a) merges the FIRST two), as a
    JVM higher-order fold, no Python in the loop."""
    def q(s: str) -> str:
        # backslashes first, then quotes — tokens land in SQL literals
        return s.replace("\\", "\\\\").replace("'", "\\'")

    qa, qb, qm = q(a), q(b), q(a + b)
    return f"""
    aggregate(toks, CAST(array() AS array<string>),
      (acc, t) -> CASE WHEN size(acc) > 0
                        AND element_at(acc, -1) = '{qa}' AND t = '{qb}'
                       THEN concat(slice(acc, 1, size(acc) - 1),
                                   array('{qm}'))
                       ELSE concat(acc, array(t)) END)
    """


def _bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAINING, the real loop (Sennrich et al. 2016): k rounds of
    (count weighted adjacent token pairs over the distinct-word table →
    merge the argmax pair everywhere) starting from characters. Returns
    the merge table — (round, left, right, merged, pair_count) — which
    IS the trained tokenizer artifact `bpe_first_merge_pairs` computes
    round 1 of. The production operator; exactness is pytest-gated
    against a pure-Python reference BPE trainer on the same word counts
    (`tests/test_redaction.py`), and determinism comes from exact int64
    pair counts with (count DESC, pair ASC) tie-breaks.

    Scale: the corpus collapses ONCE to the distinct-word count table
    (the standard BPE compression — pair statistics are word-count
    weighted, so training cost tracks |vocab|, not corpus bytes). Each
    round explodes the current token arrays to pairs (vocab-sized), one
    partial-aggregated groupBy, a 1-ROW argmax collect to the driver
    (bounded, like the scheduler inputs), and a JVM fold rewriting the
    token arrays (`_bpe_merge_fold` — greedy left-to-right, exact
    subword-nmt semantics). localCheckpoint per round caps lineage
    growth, the connected-components-loop discipline.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
        .select(
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ).alias("toks"),
            "c",
        )
        .localCheckpoint()
    )
    merges = []
    for rnd in range(1, BPE_TRAIN_ROUNDS + 1):
        pairs = (
            words.filter(F.size("toks") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1), "
                        "i -> struct(element_at(toks, i) AS l, "
                        "element_at(toks, i + 1) AS r))"
                    )
                ).alias("p"),
                "c",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("c").cast("bigint").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        l, r, cnt = pairs[0].l, pairs[0].r, pairs[0].cnt
        merges.append((rnd, l, r, l + r, cnt))
        words = words.select(
            F.expr(_bpe_merge_fold(l, r)).alias("toks"), "c"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "round INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    )


@register(
    "bpe_train_merge_table",
    oracle=f"""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    wc AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM words WHERE length(w) >= 2 GROUP BY w),
    pairs AS (
        SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                     i -> substr(w, i, 2))) AS pair,
               c
        FROM wc),
    top AS (
        SELECT pair, CAST(sum(c) AS BIGINT) AS cnt
        FROM pairs GROUP BY pair
        ORDER BY cnt DESC, pair LIMIT 1)
    SELECT substr(pair, 1, 1) AS round1_left,
           substr(pair, 2, 1) AS round1_right,
           pair AS round1_merged,
           cnt AS round1_count,
           CAST({BPE_TRAIN_ROUNDS} AS INT) AS n_rounds,
           TRUE AS counts_nonincreasing_ok,
           TRUE AS merged_is_concat_ok
    FROM top
    """,
)
def bpe_train_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training, value-certified via a TRAINING ENVELOPE (the r9
    envelope pattern for iterative recurrences): one row carrying EXACT
    round-1 brackets both engines compute independently — the argmax
    character pair and its weighted count (the round-1 statistics are
    one SQL aggregation; `bpe_first_merge_pairs`' proven oracle with
    LIMIT 1) — plus the trained run's law booleans the oracle emits as
    TRUE:

    * ``counts_nonincreasing_ok`` — per-round winning pair counts never
      increase (a BPE theorem: merging the best pair can only create new
      pairs with count <= the merges performed, and shrinks the rest);
    * ``merged_is_concat_ok`` — every merge row satisfies
      merged = left || right;

    and ``n_rounds`` = {BPE_TRAIN_ROUNDS} (the trainer's fixed budget;
    the fixture vocabulary never exhausts in fewer rounds). Rounds 2+
    remain non-SQL-expressible (each substitution depends on the prior
    winner); full-table exactness stays pytest-gated against the pure
    Python reference trainer over ``_bpe_train_merges``."""
    merges = _bpe_train_merges(spark, sf_dir).collect()
    first = merges[0]
    row = (
        first["left"],
        first["right"],
        first["merged"],
        first["pair_count"],
        len(merges),
        all(
            merges[i]["pair_count"] >= merges[i + 1]["pair_count"]
            for i in range(len(merges) - 1)
        ),
        all(m["merged"] == m["left"] + m["right"] for m in merges),
    )
    return spark.createDataFrame(
        [row],
        "round1_left STRING, round1_right STRING, round1_merged STRING, "
        "round1_count BIGINT, n_rounds INT, "
        "counts_nonincreasing_ok BOOLEAN, merged_is_concat_ok BOOLEAN",
    )
