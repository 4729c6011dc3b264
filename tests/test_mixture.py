"""Invariants for the corpus-mixture operators (operators/mixture.py):
mixture-weight algebra, budget-selection greediness, FFD packing laws."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lakehouse_variance_spark import registry
from lakehouse_variance_spark.operators.mixture import (
    FFD_CAPACITY,
    SELECT_BUDGET_TOKENS,
)
from tests.conftest import SF_DIR

registry.load_all()


def test_mixture_weights_algebra(spark):
    rows = registry.QUERIES["data_mixture_weights"](spark, SF_DIR).collect()
    assert len(rows) >= 2
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.alpha_share for r in rows) - 1.0) < 1e-9
    # Temperature flattening: sqrt sampling moves every share toward the
    # mean — smaller sources gain share, bigger sources lose it.
    mean_tokens = sum(r.tokens for r in rows) / len(rows)
    for r in rows:
        if r.tokens < mean_tokens * 0.9:
            assert r.alpha_share > r.raw_share
        if r.tokens > mean_tokens * 1.1:
            assert r.alpha_share < r.raw_share
        assert r.epochs_at_budget > 0


def test_token_budget_select_is_greedy_prefix(spark):
    df = registry.QUERIES["token_budget_select"](spark, SF_DIR)
    rows = df.collect()
    assert rows, "budget selection kept nothing"
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, kept in by_src.items():
        kept.sort(key=lambda r: (-r.score_m, r.doc_id))
        cum = 0
        for r in kept:
            cum += r.n_tokens
            assert r.cum_tokens == cum
        assert cum <= SELECT_BUDGET_TOKENS


def test_ffd_packs_every_doc_within_capacity(spark):
    from lakehouse_variance_spark.operators.mixture import _pack_ffd_bins

    packed = _pack_ffd_bins(spark, SF_DIR)
    rows = packed.collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(rows) == docs.count()  # exact partition of the input
    assert len({r.doc_id for r in rows}) == len(rows)
    fill: dict[tuple, int] = {}
    for r in rows:
        fill[(r.source, r.bin_id)] = fill.get((r.source, r.bin_id), 0) + r.n_tokens
    for (src, b), tot in fill.items():
        assert tot <= FFD_CAPACITY, f"bin {src}/{b} overfull: {tot}"
    # FFD waste bound: bins never exceed what one-doc-per-bin would use,
    # and meets the volume lower bound ceil(total/capacity) per source.
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, srows in by_src.items():
        n_bins = len({r.bin_id for r in srows})
        total = sum(r.n_tokens for r in srows)
        assert n_bins <= len(srows)
        assert n_bins >= math.ceil(total / FFD_CAPACITY)


def test_ffd_deterministic_across_runs(spark):
    from lakehouse_variance_spark.operators.mixture import _pack_ffd_bins

    a = sorted(
        (r.doc_id, r.bin_id)
        for r in _pack_ffd_bins(spark, SF_DIR).collect()
    )
    b = sorted(
        (r.doc_id, r.bin_id)
        for r in _pack_ffd_bins(spark, SF_DIR).collect()
    )
    assert a == b


def test_group_split_is_leakage_free_and_exhaustive(spark):
    # per-user exclusivity: recompute the bucket formula per user and
    # confirm the aggregate matches an explicit per-user assignment
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bucket = ((F.col("user_id") % 1000003) * F.lit(2654435761)) % F.lit(
        4294967296
    ) % 100
    per_user = (
        ev.select("user_id", bucket.alias("b"))
        .groupBy("user_id")
        .agg(F.countDistinct("b").alias("nb"))
        .collect()
    )
    assert all(r.nb == 1 for r in per_user)  # pure function of user_id
    agg = {
        r.split: (r.n_events, r.n_users)
        for r in registry.QUERIES["split_by_group_hash"](spark, SF_DIR).collect()
    }
    assert set(agg) == {"train", "val", "test"}
    assert sum(v[0] for v in agg.values()) == ev.count()  # exhaustive
    assert sum(v[1] for v in agg.values()) == ev.select(
        "user_id"
    ).distinct().count()  # every user in exactly one split
    assert agg["train"][1] > agg["val"][1]  # 80/10/10 ordering holds


def test_dsir_importance_separates_target_domain(spark):
    from lakehouse_variance_spark.operators.mixture import (
        _DSIR_GRID,
        _DSIR_QCAP,
    )

    rows = registry.QUERIES["select_dsir_importance"](spark, SF_DIR).collect()
    assert rows
    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    by_lang: dict[str, list[float]] = {}
    for r in rows:
        # clipped quantized ratios: 0 <= q_sum <= n * QCAP, exact recompute
        assert 0 <= r.q_sum <= r.n_features * _DSIR_QCAP
        assert r.importance == float(r.q_sum) / float(r.n_features) / float(
            _DSIR_GRID
        )
        by_lang.setdefault(langs[r.doc_id], []).append(r.importance)
    means = {k: sum(v) / len(v) for k, v in by_lang.items()}
    # the target domain (en) must outscore every other language on average
    assert all(means["en"] > m for k, m in means.items() if k != "en"), means


def test_curriculum_order_laws(spark):
    rows = registry.QUERIES["curriculum_training_order"](
        spark, SF_DIR
    ).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs  # every document gets a position
    keys = [r.curriculum_key for r in rows]
    assert len(set(keys)) == len(keys)  # collision-free sort key
    # the key decomposes back into its (tier, rank, source_idx) digits
    for r in rows:
        assert r.tier == r.curriculum_key // (1 << 60)
        assert r.rank_in_tier == (r.curriculum_key >> 20) & ((1 << 40) - 1)
    # sorting by key yields tiers in order, and within a tier the source
    # stream round-robins: consecutive same-source runs never exceed the
    # gap left by exhausted sources (weak law: rank_in_tier nondecreasing)
    ordered = sorted(rows, key=lambda r: r.curriculum_key)
    assert [r.tier for r in ordered] == sorted(r.tier for r in rows)
    for a, b in zip(ordered, ordered[1:]):
        if a.tier == b.tier:
            assert (a.rank_in_tier, a.source) < (b.rank_in_tier, b.source)


def test_global_token_budget_is_greedy_prefix(spark):
    from lakehouse_variance_spark.operators.mixture import (
        GLOBAL_BUDGET_TOKENS,
    )

    kept = registry.QUERIES["token_budget_select_global"](
        spark, SF_DIR
    ).collect()
    assert kept
    assert max(r.cum_tokens for r in kept) <= GLOBAL_BUDGET_TOKENS
    # the kept set is a prefix of the global (score desc, doc_id asc)
    # order: every kept doc strictly outranks every dropped doc
    kept_ids = {r.doc_id for r in kept}
    worst_kept_rank = max((-r.score_m, r.doc_id) for r in kept)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            F.expr(
                "(CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"
                " * 1000000) div CAST(size(split(text, ' ')) AS BIGINT)"
            ).alias("score_m"),
        )
        .collect()
    )
    for d in docs:
        if d.doc_id not in kept_ids:
            assert (-d.score_m, d.doc_id) > worst_kept_rank
