"""Dedup-family cross-checks: the probabilistic methods (MinHash-LSH,
SimHash) are validated against the exact shingle-Jaccard result — the
property the rows-only registry entries rely on."""

from __future__ import annotations

from lakehouse_variance_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_lsh_matches_exact_jaccard(spark):
    """LSH candidates are exact-verified, so the result must be a SUBSET of
    the exact shingle-Jaccard pairs, with high recall (8 bands x 4 rows
    catches a Jaccard-0.5 pair w.p. ~0.96; the corpus' near-dups are mostly
    well above threshold)."""
    from lakehouse_variance_spark.operators.dedup import _minhash_lsh_pairs

    exact = _pairs(registry.QUERIES["dedup_shingle_jaccard"](spark, SF_DIR))
    lsh = _pairs(_minhash_lsh_pairs(spark, SF_DIR))
    assert lsh <= exact
    assert exact, "fixture corpus must contain near-duplicates"
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} below floor"


def test_simhash_identical_text_is_hamming_zero(spark):
    """Any two docs with IDENTICAL text have identical SimHash (Hamming 0).
    The fixture corpus has no identical-text pairs (its dups are near-dups),
    so assert the law on a constructed corpus where it is non-vacuous."""
    from lakehouse_variance_spark.operators.dedup import (
        shingle_hashes,
        simhash,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "an entirely different document about spark and scale"),
        ],
        "doc_id bigint, text string",
    )
    fp = {r.doc_id: r.simhash for r in simhash(shingle_hashes(docs)).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_simhash_pairs_subset_and_recall_vs_exact(spark):
    """The envelope booleans' measured basis (dedup.py:dedup_simhash):
    every SimHash Hamming<=3 pair is an exact Jaccard>=0.5 pair on this
    corpus, recall covers a meaningful share, and pairs are canonical."""
    from lakehouse_variance_spark.operators.dedup import (
        SIMHASH_RECALL_TAU,
        _simhash_pairs,
    )

    exact = _pairs(registry.QUERIES["dedup_shingle_jaccard"](spark, SF_DIR))
    sim = _pairs(_simhash_pairs(spark, SF_DIR))
    assert exact, "fixture corpus must contain near-duplicates"
    assert sim <= exact
    assert len(sim & exact) / len(exact) >= SIMHASH_RECALL_TAU
    assert all(a < b for a, b in sim)


def test_embedding_keeper_is_idempotent(spark):
    """Applying the keeper mapping twice changes nothing: keepers are their
    own keepers' ids or smaller, never larger."""
    res = {
        r["vec_id"]: r["keeper_id"]
        for r in registry.QUERIES["dedup_embedding"](spark, SF_DIR).collect()
    }
    assert all(keeper <= vid for vid, keeper in res.items())


def test_cc_star_converges_on_chains_longer_than_iter_budget(spark):
    """The large-star/small-star variant converges in O(log n) rounds on a
    path graph whose diameter exceeds CC_MAX_ITERS — the exact case where
    the label-propagation op raises — and agrees with it wherever both
    run."""
    from lakehouse_variance_spark import registry
    from lakehouse_variance_spark.operators.dedup import CC_MAX_ITERS, _cc_star_labels

    registry.load_all()
    n = CC_MAX_ITERS + 15  # diameter > iteration budget
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "s long, d long"
    )
    out = {r.doc_id: r.component_id for r in _cc_star_labels(chain).collect()}
    assert len(out) == n + 1 and set(out.values()) == {0}
    # agreement with the propagation op on the real pair graph
    a = sorted(
        (r.doc_id, r.component_id)
        for r in registry.QUERIES["dedup_connected_components"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.component_id)
        for r in registry.QUERIES["dedup_cc_star"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    )
    assert a == b
