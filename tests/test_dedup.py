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
    exact = _pairs(registry.QUERIES["dedup_shingle_jaccard"](spark, SF_DIR))
    lsh = _pairs(registry.QUERIES["dedup_minhash_lsh"](spark, SF_DIR))
    assert lsh <= exact
    assert exact, "fixture corpus must contain near-duplicates"
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} below floor"


def test_simhash_finds_exact_duplicates(spark):
    """Any two docs with IDENTICAL text have identical SimHash (Hamming 0),
    so every exact-duplicate pair must surface in the SimHash result."""
    docs = registry.QUERIES["dedup_exact"](spark, SF_DIR)
    multi = {r["keeper_id"] for r in docs.filter("n_copies > 1").collect()}
    sim = registry.QUERIES["dedup_simhash"](spark, SF_DIR)
    zero_pairs = _pairs(sim.filter("hamming = 0"))
    # Each multi-copy group keeps min id; its duplicates must pair with it.
    paired_ids = {x for p in zero_pairs for x in p}
    assert multi <= paired_ids
    # And SimHash must never report an asymmetric/self pair.
    assert all(a < b for a, b in _pairs(sim))


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
