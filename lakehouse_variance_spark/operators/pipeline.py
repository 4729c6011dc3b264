"""Training-data pipeline operators over the ``documents`` table.

Three first-class primitives of a large-scale LLM pretraining pipeline,
beyond the per-document text analysis in textops.py:

* sequence packing — GPT-style concat-and-chop token-offset assignment
  (which context window(s) each document lands in);
* chunk-level dedup — corpus-wide exact dedup of fixed-size token chunks
  (the sub-document granularity used to strip boilerplate);
* contamination check — n-gram overlap between an eval split and the
  training split (the decontamination pass every benchmark-clean corpus
  needs).

All three are pure DataFrame ops (no Python in the hot path) and fully
SQL-expressible, so each carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table, spread

# Context-window capacity for sequence packing (tokens per training sequence).
PACK_CONTEXT = 512

# Chunk width (tokens) for sub-document dedup.
CHUNK_TOKENS = 16

# n-gram width for the eval-contamination check. 4 keeps the signal sparse
# on the synthetic corpus (3-grams collide constantly on a small vocabulary,
# 5-grams almost never); real deployments use 8-13-gram windows — only this
# constant changes.
CONTAM_NGRAM = 4

# Deterministic eval split: doc_id % 97 == 0 stands in for "the benchmark
# set" so the check is self-contained on the driver's tables.
EVAL_MOD = 97


@register(
    "pack_token_offsets",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
    c AS (
        SELECT doc_id, source, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT) AS end_offset
        FROM t)
    SELECT doc_id, source, n_tokens,
           end_offset - n_tokens                                AS start_offset,
           (end_offset - n_tokens) // {PACK_CONTEXT}            AS seq_first,
           (end_offset - 1) // {PACK_CONTEXT}                   AS seq_last,
           CASE WHEN (end_offset - n_tokens) // {PACK_CONTEXT}
                     <> (end_offset - 1) // {PACK_CONTEXT}
                THEN 1 ELSE 0 END                               AS crosses_boundary
    FROM c
    """,
)
def pack_token_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate each source's documents in
    doc_id order and chop the token stream into fixed {PACK_CONTEXT}-token
    training sequences. Emits each document's [start_offset, end_offset)
    span in its source's stream, the first/last sequence ids it lands in,
    and whether it straddles a context boundary.

    Scale: the running sum partitions by ``source`` — at 100 TB each source
    shard is one window partition, so the scan distributes across sources
    (the per-source prefix sum is the same two-pass pattern as the carbon
    series; sources are bounded shards by construction in crawl pipelines).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_end = docs.select(
        "doc_id", "source", n_tokens.alias("n_tokens")
    ).withColumn("end_offset", F.sum("n_tokens").over(w))
    start = F.col("end_offset") - F.col("n_tokens")
    seq_first = F.floor(start / PACK_CONTEXT)
    seq_last = F.floor((F.col("end_offset") - 1) / PACK_CONTEXT)
    return with_end.select(
        "doc_id",
        "source",
        "n_tokens",
        start.alias("start_offset"),
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        F.when(seq_first != seq_last, 1).otherwise(0).alias("crosses_boundary"),
    )


# Chunk id packing: chunk_idx < 1000 always holds (documents are ~60 tokens,
# so < 8 chunks of 16); doc_id * 1000 + chunk_idx is a collision-free
# BIGINT keeper key both engines order identically.
_CHUNK_KEY_BASE = 1000


@register(
    "text_chunk_dedup",
    oracle=f"""
    WITH ex AS (
        SELECT doc_id,
               unnest(generate_series(
                   0, CAST(ceil(len(string_split(text, ' ')) / {CHUNK_TOKENS}.0)
                           AS INT) - 1))                        AS chunk_idx,
               unnest(list_transform(
                   generate_series(
                       0, CAST(ceil(len(string_split(text, ' ')) / {CHUNK_TOKENS}.0)
                               AS INT) - 1),
                   i -> array_to_string(
                       list_slice(string_split(text, ' '),
                                  i * {CHUNK_TOKENS} + 1,
                                  i * {CHUNK_TOKENS} + {CHUNK_TOKENS}),
                       ' ')))                                   AS chunk
        FROM documents),
    k AS (
        SELECT chunk,
               min(doc_id * {_CHUNK_KEY_BASE} + chunk_idx) AS keeper_key
        FROM ex GROUP BY chunk)
    SELECT e.doc_id,
           count(*)                                            AS n_chunks,
           CAST(sum(CASE WHEN e.doc_id * {_CHUNK_KEY_BASE} + e.chunk_idx
                         = k.keeper_key THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(1.0 - sum(CASE WHEN e.doc_id * {_CHUNK_KEY_BASE} + e.chunk_idx
                                     = k.keeper_key THEN 1 ELSE 0 END)
                       * 1.0 / count(*), 4)                    AS dup_ratio
    FROM ex e JOIN k USING (chunk)
    GROUP BY e.doc_id
    """,
)
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup: split every document into fixed
    {CHUNK_TOKENS}-token chunks, keep the corpus-wide first occurrence of
    each distinct chunk (min (doc_id, chunk_idx)), and report per document
    how many of its chunks survive — the boilerplate-stripping granularity
    between whole-doc dedup (dedup_exact) and shingle near-dup.

    Scale: one explode + one groupBy on the chunk text (map-side partial
    aggregation applies) + one hash join back — the same inverted-index
    shape as the shingle dedup, with bounded fan-out (len/16 chunks per
    doc). No window over the full corpus, no driver-side state.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    tokens = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(tokens) / F.lit(float(CHUNK_TOKENS))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(tokens, i * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "
        ),
    )
    ex = docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    chunk_key = (F.col("doc_id") * _CHUNK_KEY_BASE + F.col("chunk_idx")).cast(
        "bigint"
    )
    keepers = ex.groupBy("chunk").agg(F.min(chunk_key).alias("keeper_key"))
    kept_flag = F.when(chunk_key == F.col("keeper_key"), 1).otherwise(0)
    return (
        ex.join(keepers, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(kept_flag).alias("n_kept"),
            F.round(
                F.lit(1.0) - F.sum(kept_flag) / F.count("*"), 4
            ).alias("dup_ratio"),
        )
    )


@register(
    "contamination_ngram",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' '))
                                      - {CONTAM_NGRAM - 1}),
                   i -> array_to_string(
                       list_slice(string_split(text, ' '),
                                  i, i + {CONTAM_NGRAM - 1}), ' '))))
                   AS shingle
        FROM documents),
    eval_sh AS (
        SELECT DISTINCT shingle, doc_id AS eval_doc
        FROM sh WHERE doc_id % {EVAL_MOD} = 0),
    train_sh AS (
        SELECT doc_id, shingle FROM sh WHERE doc_id % {EVAL_MOD} <> 0)
    SELECT t.doc_id,
           count(DISTINCT t.shingle)   AS n_overlap_shingles,
           count(DISTINCT e.eval_doc)  AS n_eval_docs_hit
    FROM train_sh t JOIN eval_sh e USING (shingle)
    GROUP BY t.doc_id
    """,
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination check: flag training documents sharing any
    {CONTAM_NGRAM}-gram with the eval split (doc_id % {EVAL_MOD} == 0 stands
    in for the benchmark set). Per contaminated doc: distinct overlapping
    n-grams and distinct eval documents hit.

    Scale: the eval split's n-gram set is tiny relative to the corpus, so
    it is explicitly ``broadcast()`` — the training-side scan never
    shuffles; contamination checking at 100 TB is a broadcast-hash-join
    over a one-pass scan. The join and the distinct-aggregation run on
    ``xxhash64`` of the shingle (8-byte longs), not the ~100-byte n-gram
    strings — same 16-bytes-per-row discipline as the dedup family, with
    the same accepted n²·2⁻⁶⁴ collision odds; the counted values are
    hash-distinct, which equals string-distinct barring a collision.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    tokens = F.split(F.col("text"), " ")
    # Hash INSIDE the transform: the n-gram string exists only transiently
    # per element; the materialized array, the explode, and everything
    # downstream carry 8-byte longs. The when()-guard matters: Spark's
    # sequence(1, n) yields a DESCENDING range when n < 1 (documents
    # shorter than the n-gram width), which would crash slice() — short
    # docs simply contribute no shingles, like the oracle's empty
    # generate_series.
    grams = F.when(
        F.size(tokens) >= CONTAM_NGRAM,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tokens) - (CONTAM_NGRAM - 1)),
                lambda i: F.xxhash64(
                    F.array_join(F.slice(tokens, i, CONTAM_NGRAM), " ")
                ),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    sh = docs.select("doc_id", F.explode(grams).alias("shingle_h"))
    eval_sh = (
        sh.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.col("shingle_h"), F.col("doc_id").alias("eval_doc"))
        .distinct()
    )
    train_sh = sh.filter(F.col("doc_id") % EVAL_MOD != 0)
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle_h")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("shingle_h").alias("n_overlap_shingles"),
            F.count_distinct("eval_doc").alias("n_eval_docs_hit"),
        )
    )


# ---------------------------------------------------------------------------
# Python UDTF: arbitrary one-row -> many-rows logic as a SQL-callable table
# function (Spark 3.5+/4 API). Chunking is the demonstrative case; the hot
# path for THIS particular logic would be expression-only (see
# text_chunk_dedup) — a UDTF earns its Python cost when the per-row logic
# stops mapping onto built-ins (stateful parsers, tokenizers, format
# decoders).
# ---------------------------------------------------------------------------


CHUNK_WORDS = 16


def _chunk_udtf_class():
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_words int, first_word string")
    class ChunkWords:
        def eval(self, text: str, size: int):
            if not text:
                return
            words = text.split(" ")
            for i in range(0, len(words), size):
                chunk = words[i : i + size]
                yield (i // size, len(chunk), chunk[0])

    return ChunkWords


@register(
    "udtf_chunk_documents",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE length(text) > 0),
    chunks AS (
        SELECT doc_id,
               g.i AS chunk_idx,
               len(list_slice(w, g.i * {CHUNK_WORDS} + 1,
                              g.i * {CHUNK_WORDS} + {CHUNK_WORDS}))
                   AS n_words,
               w[g.i * {CHUNK_WORDS} + 1] AS first_word
        FROM words,
             LATERAL (SELECT unnest(generate_series(
                 0, CAST(ceil(len(w) * 1.0 / {CHUNK_WORDS}) AS BIGINT) - 1))
                 AS i) g)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(n_words AS INT) AS n_words, first_word
    FROM chunks
    """,
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking through a Python UDTF (user-defined TABLE
    function): each document row fans out to fixed-{CHUNK_WORDS}-word
    chunk rows via a SQL-callable ``LATERAL`` table function — the
    chunk-for-packing primitive written as arbitrary Python, not
    expression combinators.

    Scale: a UDTF executes Python per input row — keep it OFF the hot
    path when built-ins express the logic (text_chunk_dedup is this same
    fan-out as pure expressions). Its place is logic that does not map to
    built-ins; the plumbing (lateral join, schema declaration, pipelined
    fan-out without materializing the whole expansion) is what this
    registers. The UDTF is stateless per row, so it parallelizes exactly
    like explode.
    """
    docs = spread(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    chunker = _chunk_udtf_class()
    spark.udtf.register("chunk_words", chunker)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.n_words, c.first_word
        FROM _udtf_docs d,
             LATERAL chunk_words(d.text, {CHUNK_WORDS}) c
        """
    )
