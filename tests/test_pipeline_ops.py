"""Semantic invariants for the training-pipeline operators (pipeline.py).

The hash-vs-oracle equivalence is covered by test_registry_oracle; these
tests pin the *semantics* the oracle can't see: offset contiguity, keeper
uniqueness, and eval/train split hygiene.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_variance_spark import registry
from lakehouse_variance_spark.operators.pipeline import EVAL_MOD, PACK_CONTEXT
from tests.conftest import SF_DIR_MEDIUM

registry.load_all()


def test_pack_offsets_contiguous_per_source(spark):
    """Within each source, documents tile the token stream with no gaps:
    next start == previous end, first start == 0."""
    out = registry.QUERIES["pack_token_offsets"](spark, SF_DIR_MEDIUM)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    checked = out.select(
        "source",
        "start_offset",
        "n_tokens",
        (F.lag(F.col("start_offset") + F.col("n_tokens")).over(w)).alias(
            "prev_end"
        ),
    )
    bad = checked.filter(
        (
            F.col("prev_end").isNull() & (F.col("start_offset") != 0)
        )
        | (F.col("prev_end").isNotNull() & (F.col("start_offset") != F.col("prev_end")))
    )
    assert bad.count() == 0


def test_pack_seq_ids_consistent(spark):
    out = registry.QUERIES["pack_token_offsets"](spark, SF_DIR_MEDIUM)
    bad = out.filter(
        (F.col("seq_first") > F.col("seq_last"))
        | (F.col("seq_first") != F.floor(F.col("start_offset") / PACK_CONTEXT))
        | (
            (F.col("crosses_boundary") == 1)
            != (F.col("seq_first") != F.col("seq_last"))
        )
    )
    assert bad.count() == 0


def test_chunk_dedup_keeper_counts(spark):
    """Every document keeps at most its own chunk count, and the corpus-wide
    kept total equals the number of distinct chunks."""
    out = registry.QUERIES["text_chunk_dedup"](spark, SF_DIR_MEDIUM).cache()
    assert out.filter(F.col("n_kept") > F.col("n_chunks")).count() == 0
    assert out.filter((F.col("dup_ratio") < 0) | (F.col("dup_ratio") > 1)).count() == 0

    from lakehouse_variance_spark.operators.pipeline import CHUNK_TOKENS
    from lakehouse_variance_spark.tables import load_table

    docs = load_table(spark, SF_DIR_MEDIUM, "documents")
    tokens = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(tokens) / F.lit(float(CHUNK_TOKENS))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(tokens, i * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "),
    )
    n_distinct = (
        docs.select(F.explode(chunks).alias("chunk")).distinct().count()
    )
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    assert total_kept == n_distinct
    out.unpersist()


def test_contamination_only_train_docs(spark):
    out = registry.QUERIES["contamination_ngram"](spark, SF_DIR_MEDIUM)
    assert out.filter(F.col("doc_id") % EVAL_MOD == 0).count() == 0
    assert (
        out.filter(
            (F.col("n_overlap_shingles") < 1) | (F.col("n_eval_docs_hit") < 1)
        ).count()
        == 0
    )
