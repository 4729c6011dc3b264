"""Deduplication operators for large-scale training-data pipelines.

Four tiers, all over the ``documents`` table:

* exact           — hash group-by on the full text (dropDuplicates-style).
* shingle Jaccard — exact near-dup pairs via 3-word-shingle inverted-index
                    join (the scalable exact algorithm: candidates only come
                    from shared shingles, never a cartesian product).
* MinHash + LSH   — probabilistic candidates (band-bucket join) verified with
                    exact Jaccard; the 100 TB path, since the candidate set is
                    ~linear in the number of true near-dup pairs.
* SimHash         — 64-bit fingerprints + banded Hamming join.

The first two are SQL-expressible and oracle-checked; the hash-based two are
registered rows-only (their hash functions are Spark-internal xxhash64) and
cross-checked against the exact method in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table, spread

JACCARD_THRESHOLD = 0.5

# 3-word shingles over a pre-split words array (element_at is 1-based). The
# words column is materialized first so split() runs once per document, not
# once per shingle element.
_SHINGLES_EXPR = """
    CASE WHEN size(words) >= 3 THEN
        transform(
            sequence(1, size(words) - 2),
            i -> concat_ws(' ',
                           element_at(words, i),
                           element_at(words, i + 1),
                           element_at(words, i + 2)))
    ELSE array() END
"""


def shingled(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) pairs, distinct per doc. The input is spread across
    the cluster first: shingling multiplies rows ~500× and a small-file scan
    would otherwise run it on one task."""
    return (
        spread(docs).select("doc_id", F.split("text", " ").alias("words"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(F.expr(_SHINGLES_EXPR))).alias("shingle"),
        )
    )


def shingle_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, h) pairs — each distinct shingle reduced to its 64-bit
    xxhash64 at the source. Every downstream stage (counts, inverted-index
    self-join, MinHash, verification) only needs shingle EQUALITY, so the
    ~25-byte string is dropped before any shuffle: the exchanged row is two
    longs (16 bytes), a 2-3× shuffle-byte cut that compounds at 100 TB. A
    64-bit collision between distinct shingles inside one compared pair
    (probability ~n²·2⁻⁶⁴) is the accepted error, same as the MinHash tier
    which already keys on this hash."""
    return shingled(docs).select("doc_id", F.xxhash64("shingle").alias("h"))


def _shingle_counts(pairs: DataFrame) -> DataFrame:
    return pairs.groupBy("doc_id").agg(F.count("*").alias("n_sh"))


@register(
    "dedup_exact",
    oracle="""
    SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate grouping: one keeper (min doc_id) per distinct text.

    A single hash-aggregate on the text column — at 100 TB, group on a
    64/128-bit content hash instead of the raw text so the shuffle carries
    16 bytes per row, with an optional equality re-check to rule out
    collisions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies")
    ).select("keeper_id", "n_copies")


@register(
    "dedup_shingle_jaccard",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
            i -> string_split(text, ' ')[i] || ' ' ||
                 string_split(text, ' ')[i + 1] || ' ' ||
                 string_split(text, ' ')[i + 2])) AS shingle
        FROM documents),
    counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common), 4) AS jaccard
    FROM common
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_shingle_jaccard(
    spark: SparkSession, sf_dir: str, sh: DataFrame | None = None
) -> DataFrame:
    """Exact near-duplicate pairs by 3-word-shingle Jaccard >= 0.5.

    Inverted-index self-join: only documents sharing at least one shingle
    become candidate pairs, so cost tracks the true overlap structure. The
    join keys on the 64-bit shingle hash (see shingle_hashes) so the shuffle
    carries 16-byte rows, not strings. The per-shingle fan-out is the skew
    risk at scale — mitigated by dropping ultra-frequent shingles
    (stop-shingles) before the join, the same prefix-filtering idea used by
    fuzzy-join systems.

    ``sh`` accepts an already-checkpointed shingle table so the envelope
    wrappers (dedup_minhash_lsh / dedup_simhash) materialize the explode
    ONCE for both their exact bracket and their approximate side."""
    if sh is None:
        docs = load_table(spark, sf_dir, "documents")
        # Three plan branches consume the shingle table (both join sides
        # + counts); materialize the explode once instead of recomputing
        # it per branch (same rationale as dedup_minhash_lsh).
        sh = shingle_hashes(docs).localCheckpoint()
    counts = _shingle_counts(sh)
    a = sh.withColumnRenamed("doc_id", "doc_a")
    b = sh.withColumnRenamed("doc_id", "doc_b")
    common = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jaccard = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .filter(jaccard >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jaccard, 4).alias("jaccard"))
    )


# --- MinHash + LSH ---------------------------------------------------------

N_HASHES = 32
BAND_SIZE = 4  # 8 bands of 4 -> catches Jaccard>=0.5 pairs w.p. ~0.96


# Universal-hash family over the Mersenne prime 2^31-1: the shingle string is
# hashed ONCE (xxhash64), then each permutation hash is a multiply-add on that
# base value. Products stay < 2^62, so the arithmetic never overflows int64
# (safe under Spark 4's default ANSI mode).
_MERSENNE = (1 << 31) - 1
_HASH_A = [(2 * i + 1) * 2654435761 % _MERSENNE for i in range(1, 65)]
_HASH_B = [(i * 40503 + 12345) % _MERSENNE for i in range(1, 65)]


def minhash_signatures(sh: DataFrame, with_count: bool = False) -> DataFrame:
    """Per-doc MinHash signature over (doc_id, h) shingle-hash pairs:
    min over shingles of h_i(x) = (a_i * base(x) + b_i) mod 2^31-1, with
    base = the precomputed 64-bit shingle hash.

    One string hash per shingle instead of one per (shingle, permutation) —
    32x less hashing on the wide fact scan; everything JVM-side columnar.
    ``with_count`` folds the per-doc shingle count (``n_sh``) into the SAME
    aggregation — one pass and one shuffle over the shingle table instead of
    two, since Jaccard verification needs both outputs anyway."""
    hashed = sh.withColumn("h_base", F.pmod(F.col("h"), F.lit(_MERSENNE)))
    mins = [
        F.min(
            F.pmod(F.col("h_base") * _HASH_A[i] + _HASH_B[i], F.lit(_MERSENNE))
        ).alias(f"mh_{i}")
        for i in range(N_HASHES)
    ]
    extra = [F.count("*").alias("n_sh")] if with_count else []
    return hashed.groupBy("doc_id").agg(*extra, *mins)


def lsh_candidates(signatures: DataFrame) -> DataFrame:
    """Band the signature and self-join on (band_id, band_hash).

    The self-join plans the signature-aggregation subtree TWICE (once per
    join side; neither ReuseExchange nor AQE stage reuse deduplicates the
    localCheckpoint-fed subtrees — 64 partial_min functions in the executed
    envelope plan). A bucket-collect rewrite (ONE aggregation via
    collect_list per (band_id, band_hash) + in-bucket pair explode) was
    probed in r11 and REJECTED: 1.20x slower interleaved at sf0.1 —
    collect_list + lambda-transform pair expansion costs more than the
    duplicated columnar min-aggregation, whose second copy feeds a cheap
    broadcast build. Identical candidate sets verified."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.col(f"mh_{b * BAND_SIZE + r}") for r in range(BAND_SIZE)]
                ).alias("band_hash"),
            )
            for b in range(N_HASHES // BAND_SIZE)
        ]
    )
    banded = signatures.select(
        "doc_id", F.explode(bands).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")
    a = banded.withColumnRenamed("doc_id", "doc_a")
    b = banded.withColumnRenamed("doc_id", "doc_b")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str, sh: DataFrame | None = None
) -> DataFrame:
    """MinHash-LSH near-dup pairs (doc_a, doc_b, jaccard), exact-verified
    on the candidate set only — the production operator.

    The scale path: candidate generation is a band-bucket equi-join whose
    output is ~linear in true near-dups, so the exact-Jaccard verification
    only runs on that small candidate set. ``sh`` accepts a precomputed
    checkpointed shingle table (see dedup_shingle_jaccard)."""
    if sh is None:
        docs = load_table(spark, sf_dir, "documents")
        # The shingle-hash table feeds four plan branches (signatures,
        # counts, both sides of the verification join). localCheckpoint
        # materializes it once — unlike cache() it bypasses the
        # CacheManager, whose per-entry plan canonicalization costs grow
        # across a long session, and its blocks are GC-reclaimed with the
        # DataFrame. Rows are two longs, so the checkpointed footprint is
        # ~16 bytes/shingle.
        sh = shingle_hashes(docs).localCheckpoint()
    # Signatures and shingle counts come out of ONE aggregation pass.
    sig = minhash_signatures(sh, with_count=True).localCheckpoint()
    candidates = lsh_candidates(sig)
    counts = sig.select("doc_id", "n_sh")
    # Verify ONLY the candidate pairs: broadcast the (small) candidate set
    # into the shingle table, then count shared shingle hashes per pair —
    # the big shingle self-join never materializes.
    a = sh.withColumnRenamed("doc_id", "doc_a")
    b = sh.withColumnsRenamed({"doc_id": "doc_b"})
    common = (
        F.broadcast(candidates)
        .join(a, "doc_a")
        .join(b, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jaccard = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .filter(jaccard >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jaccard, 4).alias("jaccard"))
    )


MINHASH_RECALL_TAU = 0.7  # pair-recall floor vs exact (measured 0.8-1.0;
                          # 8 bands x 4 rows catch a Jaccard-0.5 pair
                          # w.p. ~0.96, fixture dups are mostly higher)

from lakehouse_variance_spark.registry import ORACLES as _REG_ORACLES

_EXACT_JACCARD_SQL = _REG_ORACLES["dedup_shingle_jaccard"]


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    SELECT *, TRUE AS lsh_subset_ok, TRUE AS lsh_recall_ok
    FROM ({_EXACT_JACCARD_SQL})
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection, value-certified via an EQUIVALENCE
    ENVELOPE (VERDICT r8 item 7; the ANN recall-envelope pattern): the
    output rows are the EXACT shingle-Jaccard pairs (DuckDB reproduces
    them independently — dedup_shingle_jaccard's own oracle), and every
    row carries two booleans the oracle emits as TRUE:

    * ``lsh_subset_ok`` — every LSH-reported pair IS an exact near-dup
      pair (deterministic: candidates are exact-verified at the same
      threshold over the same shingle table);
    * ``lsh_recall_ok`` — the LSH pair set covers >= {MINHASH_RECALL_TAU}
      of the exact pairs (banding theory: 8 bands x 4 rows catch a
      Jaccard-0.5 pair w.p. ~0.96; deterministic seeded hashes, so the
      sf0.01 driver check sees a constant value).

    The production operator is ``_minhash_lsh_pairs`` (band-bucket
    equi-join candidates, exact verify on candidates only — the 100 TB
    path, 100x probe 15.7x in SCALE.md); this envelope is the
    verification HARNESS around it. The shingle explode is materialized
    ONCE and shared by the bracket and the LSH side.

    r11 plan cut: the envelope already materializes the EXACT pair set,
    and verified-LSH ≡ candidates ∩ exact — both sides apply the same
    jaccard >= {JACCARD_THRESHOLD} filter from the same shingle table
    with the identical expression tree, so re-running the candidate
    verification join (broadcast candidates into the shingle table
    twice + a groupBy, plus its own signature checkpoint) inside the
    envelope recomputed a set the intersection yields bit-identically.
    Standalone ``_minhash_lsh_pairs`` keeps the real verification join
    (it has no exact table to intersect with); its laws stay in
    tests/test_dedup.py. Measured 4.6-6.2 s -> ~2.9 s at sf0.1,
    identical rows."""
    sh = shingle_hashes(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint()
    exact = dedup_shingle_jaccard(spark, sf_dir, sh=sh).localCheckpoint()
    # Signatures are materialized once: lsh_candidates consumes them on BOTH
    # sides of its band self-join, and neither ReuseExchange nor AQE stage
    # reuse deduplicates the two subtrees (64 partial_min in the executed
    # plan without this). r11 interleaved A/B: 0.93x, and at scale it is one
    # |docs|-signature pass instead of two.
    cand = lsh_candidates(minhash_signatures(sh).localCheckpoint())
    lsh = cand.join(exact.select("doc_a", "doc_b"), ["doc_a", "doc_b"])
    both = lsh.select("doc_a", "doc_b").withColumn("in_lsh", F.lit(1)).join(
        exact.select("doc_a", "doc_b").withColumn("in_exact", F.lit(1)),
        ["doc_a", "doc_b"],
        "full",
    )
    scalar = both.agg(
        (
            F.sum(
                F.when(
                    F.col("in_lsh").isNotNull() & F.col("in_exact").isNull(),
                    1,
                ).otherwise(0)
            )
            == 0
        ).alias("lsh_subset_ok"),
        (
            F.sum(
                F.when(
                    F.col("in_lsh").isNotNull()
                    & F.col("in_exact").isNotNull(),
                    1,
                ).otherwise(0)
            )
            / F.sum(F.when(F.col("in_exact").isNotNull(), 1).otherwise(0))
            >= F.lit(MINHASH_RECALL_TAU)
        ).alias("lsh_recall_ok"),
    )
    # pair-rows x 1-row scalar join (constant-size BNLJ, audited in
    # tests/test_plan_sweep.py).
    return exact.crossJoin(F.broadcast(scalar))


# --- Embedding-cosine near-dup ---------------------------------------------

EMB_DUP_THRESHOLD = 0.45


@register(
    "dedup_embedding",
    oracle=f"""
    SELECT a.vec_id AS vec_id,
           least(a.vec_id, coalesce(min(b.vec_id), a.vec_id)) AS keeper_id,
           count(b.vec_id) AS n_similar
    FROM embeddings a
    LEFT JOIN embeddings b
      ON a.vec_id <> b.vec_id
     AND list_cosine_similarity(a.embedding::DOUBLE[],
                                b.embedding::DOUBLE[]) >= {EMB_DUP_THRESHOLD}
    GROUP BY a.vec_id
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate canonicalization: each vector maps to
    the minimum vec_id in its cosine>=threshold neighborhood (itself
    included) — the one-hop keeper rule used to pick a canonical
    representative per near-dup cluster.

    EXACT result via candidate pruning, never all-pairs: a seeded KMeans
    coarse quantizer assigns every (unit-normalized) vector to a cluster;
    for clusters i,j a qualifying pair (cos >= t  ⟺  ||u_a - u_b|| <=
    θ = sqrt(2-2t)) can only exist if ||c_i - c_j|| <= r_i + r_j + θ
    (triangle inequality through both centroids), so only those cluster
    PAIRS are joined — an equi-join on cluster id against a tiny broadcast
    pair table — and cosine is verified on candidates only. Full recall is
    guaranteed by the bound (no LSH miss probability); pruning power grows
    with the threshold and with cluster tightness. At 100 TB the corpus is
    laid out partitioned by cluster id (see ann_ivf_topk) and each cluster
    pair is a co-located partition join; the all-pairs broadcast variant
    survives only as the test oracle (tests/test_dedup.py)."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from lakehouse_variance_spark.operators.similarity import _prepped, dot

    emb = _prepped(load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    # Zero-norm vectors have no direction: cosine is undefined, so they are
    # their own keepers (the pre-rewrite all-pairs code reached the same
    # outcome via NULL cosines failing the threshold). Splitting them out
    # also keeps the unit-normalize division NULL-free — KMeans/
    # array_to_vector throw on NULL components.
    degenerate = emb.filter(F.col("nrm") <= 0.0).select("vec_id")
    unit = emb.filter(F.col("nrm") > 0.0).select(
        "vec_id",
        F.zip_with(
            "v", F.array_repeat("nrm", F.size("v")), lambda x, n: x / n
        ).alias("u"),
    )
    feats = unit.withColumn("features", array_to_vector("u")).localCheckpoint()
    n_unit = feats.count()
    self_keepers = degenerate.select(
        "vec_id",
        F.col("vec_id").alias("keeper_id"),
        F.lit(0).cast("long").alias("n_similar"),
    )
    if n_unit == 0:  # nothing to cluster — KMeans.fit raises on 0 rows
        return self_keepers
    k = max(2, min(32, n_unit // 64 + 1))
    model = KMeans(
        k=k, seed=0, featuresCol="features", predictionCol="cluster"
    ).fit(feats)
    assigned = model.transform(feats).drop("features")
    centers = np.array([c for c in model.clusterCenters()], dtype=np.float64)
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cluster int, cvec array<double>",
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with("u", "cvec", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    radii = {
        r["cluster"]: r["radius"]
        for r in assigned.join(F.broadcast(cent_df), "cluster")
        .groupBy("cluster")
        .agg(F.max(l2).alias("radius"))
        .collect()
    }
    theta = float(np.sqrt(2.0 - 2.0 * EMB_DUP_THRESHOLD))
    cand_pairs = [
        (i, j)
        for i in radii
        for j in radii
        if float(np.linalg.norm(centers[i] - centers[j]))
        <= radii[i] + radii[j] + theta
    ]
    pairs_df = spark.createDataFrame(cand_pairs, "ca int, cb int")
    a = assigned.withColumnsRenamed({"u": "ua", "cluster": "ca"})
    b = assigned.withColumnsRenamed(
        {"vec_id": "vec_b", "u": "ub", "cluster": "cb"}
    )
    cos = dot(F.col("ua"), F.col("ub"))
    matched = (
        a.join(F.broadcast(pairs_df), "ca")
        .join(b, "cb")
        .filter((F.col("vec_id") != F.col("vec_b")) & (cos >= EMB_DUP_THRESHOLD))
        .select("vec_id", "vec_b")
    )
    return (
        unit.select("vec_id")
        .join(matched, "vec_id", "left")
        .groupBy("vec_id")
        .agg(
            F.least(
                F.col("vec_id"), F.coalesce(F.min("vec_b"), F.col("vec_id"))
            ).alias("keeper_id"),
            F.count("vec_b").alias("n_similar"),
        )
        .unionByName(self_keepers)
    )


# --- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 64
# Manku et al. (WWW'07) near-dup setting for 64-bit SimHash. With 4 banded
# 16-bit chunks, pigeonhole guarantees any pair within Hamming distance 3
# shares at least one chunk exactly (3 differing bits touch <= 3 chunks), so
# the equi-join has FULL recall at this threshold.
HAMMING_MAX = 3


def simhash(sh: DataFrame) -> DataFrame:
    """64-bit SimHash per doc over (doc_id, h) shingle-hash pairs: sign of
    the per-bit sum of shingle-hash bits."""
    h = F.col("h")
    bit_votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b_{i}")
        for i in range(SIMHASH_BITS)
    ]
    votes = sh.groupBy("doc_id").agg(*bit_votes)
    fingerprint = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b_{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        fingerprint = term if fingerprint is None else fingerprint.bitwiseOR(term)
    return votes.select("doc_id", fingerprint.alias("simhash"))


def _simhash_pairs(
    spark: SparkSession, sf_dir: str, sh: DataFrame | None = None
) -> DataFrame:
    """SimHash near-dup pairs (doc_a, doc_b, hamming <= 3 on 64-bit
    fingerprints) — the production operator.

    Banded join on 16-bit chunks: any pair within Hamming distance 3 of a
    64-bit code shares at least one of 4 chunks exactly (pigeonhole: 3
    differing bits can land in at most 3 of the 4 chunks), so the join is an
    equi-join on (chunk_id, chunk_value) with full recall, never all-pairs.
    ``sh`` accepts a precomputed shingle table (see
    dedup_shingle_jaccard)."""
    if sh is None:
        sh = shingle_hashes(load_table(spark, sf_dir, "documents"))
    fp = simhash(sh)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright(F.col("simhash"), 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_value"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk_id", "ch.chunk_value")
    a = chunks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
        "chunk_id",
        "chunk_value",
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
        "chunk_id",
        "chunk_value",
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["chunk_id", "chunk_value"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= HAMMING_MAX)
    )


SIMHASH_RECALL_TAU = 0.3  # share of exact Jaccard pairs SimHash finds
                          # (measured 0.48-0.61 across sf0.001/0.01/0.1)


@register(
    "dedup_simhash",
    oracle=f"""
    SELECT *, TRUE AS simhash_subset_ok, TRUE AS simhash_recall_ok
    FROM ({_EXACT_JACCARD_SQL})
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection, value-certified via an EQUIVALENCE
    ENVELOPE (VERDICT r8 item 7; same shape as dedup_minhash_lsh): the
    output rows are the EXACT shingle-Jaccard pairs (DuckDB reproduces
    them independently) and every row carries two booleans the oracle
    emits as TRUE:

    * ``simhash_subset_ok`` — every SimHash Hamming<=3 pair IS an exact
      Jaccard>=0.5 pair (measured precision 1.0 at sf0.001/0.01/0.1: a
      64-bit fingerprint within Hamming 3 over 3-word-shingle sets only
      happens for heavily overlapping docs in this corpus);
    * ``simhash_recall_ok`` — SimHash covers >= {SIMHASH_RECALL_TAU} of
      the exact pairs (measured 0.48-0.61; deterministic fingerprints, so
      the sf0.01 driver check sees a constant value).

    The production operator is ``_simhash_pairs`` (banded 16-bit-chunk
    fingerprint equi-join with guaranteed Hamming<=3 recall by
    pigeonhole, never all-pairs); its structural laws (canonical a<b
    pairs, identical-text => Hamming 0) stay in tests/test_dedup.py."""
    sh = shingle_hashes(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint()
    exact = dedup_shingle_jaccard(spark, sf_dir, sh=sh).localCheckpoint()
    sim = _simhash_pairs(spark, sf_dir, sh=sh)
    both = sim.select("doc_a", "doc_b").withColumn("in_sim", F.lit(1)).join(
        exact.select("doc_a", "doc_b").withColumn("in_exact", F.lit(1)),
        ["doc_a", "doc_b"],
        "full",
    )
    scalar = both.agg(
        (
            F.sum(
                F.when(
                    F.col("in_sim").isNotNull() & F.col("in_exact").isNull(),
                    1,
                ).otherwise(0)
            )
            == 0
        ).alias("simhash_subset_ok"),
        (
            F.sum(
                F.when(
                    F.col("in_sim").isNotNull()
                    & F.col("in_exact").isNotNull(),
                    1,
                ).otherwise(0)
            )
            / F.sum(F.when(F.col("in_exact").isNotNull(), 1).otherwise(0))
            >= F.lit(SIMHASH_RECALL_TAU)
        ).alias("simhash_recall_ok"),
    )
    # pair-rows x 1-row scalar join (constant-size BNLJ, audited in
    # tests/test_plan_sweep.py).
    return exact.crossJoin(F.broadcast(scalar))


# --- Near-dup clustering (connected components) ----------------------------

from lakehouse_variance_spark.registry import ORACLES as _ORACLES

# The component oracle runs over exactly the pairs the Jaccard query emits.
_PAIRS_SQL = _ORACLES["dedup_shingle_jaccard"]

CC_MAX_ITERS = 20


@register(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION
        SELECT doc_b AS s, doc_a AS d FROM pairs
    ),
    reach(s, d) AS (
        SELECT s, d FROM edges
        UNION
        SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    )
    SELECT s AS doc_id, least(s, min(d)) AS component_id
    FROM reach
    GROUP BY s
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the
    Jaccard>=threshold pair graph, labeling every involved document with the
    minimum doc_id of its component (the canonical keeper). This is the step
    a real dedup pipeline runs after pair generation — transitive closure, so
    A~B~C collapses to ONE keeper even when A and C are not directly similar
    (pairwise keeper rules can't express that).

    Iterative min-label propagation, driver-controlled: each round joins the
    edge list to the current labels, takes the per-vertex neighborhood min,
    and stops when no label changes (an inherently iterative algorithm — the
    loop is control flow only; all data work is distributed joins/aggs on the
    vertex key). Rounds needed = graph diameter; the 100 TB path is
    ``dedup_cc_star`` below — the large-star/small-star alternation
    (Kiveris et al.), which contracts the same components in O(log n)
    rounds with identical output. The oracle is DuckDB's recursive-CTE
    reachability over the same pair query."""
    pairs = dedup_shingle_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
        )
        .localCheckpoint()  # the loop re-reads edges every round
    )
    labels = (
        edges.select(F.col("s").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(CC_MAX_ITERS):
        nbr_min = (
            edges.join(labels, edges.d == labels.doc_id)
            .groupBy("s")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.s, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # cut lineage: plans grow linearly otherwise
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "doc_id")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Exhausting the budget with labels still moving means some chain
        # is longer than CC_MAX_ITERS hops; silently returning the
        # intermediate labels would split real clusters. Fail loudly — the
        # documented fix is the O(log n) large-star/small-star variant.
        raise RuntimeError(
            f"connected components did not converge in {CC_MAX_ITERS} "
            f"rounds ({changed} labels still changing) — graph diameter "
            "exceeds the iteration budget"
        )
    return labels.select("doc_id", F.col("label").alias("component_id"))


def _cc_star_labels(edges: DataFrame) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond" — public): alternate two
    edge rewrites until the edge set is stable; at fixpoint every vertex is
    linked directly to its component's minimum id.

    * large-star keyed by u over its FULL neighborhood: link every larger
      neighbor to m = min(N(u) ∪ {u});
    * small-star keyed by u over its ≤-neighborhood: link those neighbors
      (and u) to the local minimum.

    The two rewrites run SEQUENTIALLY each round — large-star first, then
    small-star over large-star's output — exactly the alternation whose
    O(log n) convergence the paper proves (running both on the same edge
    set and unioning the outputs is a different, unanalyzed iteration).
    Each rewrite is one groupBy-min + join pass over the edge list — the
    same shuffle shape as one label-propagation round — but rounds needed
    are O(log n) instead of the graph diameter, which is the whole
    upgrade: a 10,000-hop chain converges in ~14 rounds, not 10,000.
    Edges shrink toward |V| as stars contract, so later rounds are cheap.
    Like dedup_connected_components, exhausting the round budget with the
    edge set still moving raises instead of returning split components.
    """

    def _large_star(e: DataFrame) -> DataFrame:
        adj = e.unionByName(
            e.select(F.col("d").alias("s"), F.col("s").alias("d"))
        )
        m_full = adj.groupBy("s").agg(
            F.least(F.min("d"), F.first("s")).alias("m")
        )
        return (
            adj.join(m_full, "s")
            .filter(F.col("d") > F.col("s"))
            .select(F.col("d").alias("s"), F.col("m").alias("d"))
            .filter(F.col("s") != F.col("d"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        adj = e.unionByName(
            e.select(F.col("d").alias("s"), F.col("s").alias("d"))
        )
        low = adj.filter(F.col("d") <= F.col("s"))
        m_low = low.groupBy("s").agg(
            F.least(F.min("d"), F.first("s")).alias("m")
        )
        return (
            low.join(m_low, "s")
            .select(F.col("d").alias("s"), F.col("m").alias("d"))
            .unionByName(m_low.select("s", F.col("m").alias("d")))
            .filter(F.col("s") != F.col("d"))
            .distinct()
        )

    edges = (
        edges.filter(F.col("s") != F.col("d"))
        .select("s", "d")
        .distinct()
        .localCheckpoint()
    )
    CC_STAR_MAX_ROUNDS = 64  # ~2^64-vertex diameter at O(log n) — ample
    for _ in range(CC_STAR_MAX_ROUNDS):
        new_edges = _small_star(_large_star(edges)).localCheckpoint()
        changed = (
            new_edges.exceptAll(edges).count() + edges.exceptAll(new_edges).count()
        )
        edges = new_edges
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"large-star/small-star did not converge in "
            f"{CC_STAR_MAX_ROUNDS} rounds ({changed} edge changes in the "
            "last round) — returning would risk silently split components"
        )
    # Fixpoint edges are (v, root): every non-root points at its component
    # min; roots get their own row.
    verts = edges.select("s").unionByName(edges.select(F.col("d").alias("s")))
    return (
        verts.distinct()
        .join(edges.withColumnsRenamed({"s": "doc_id", "d": "root"}),
              F.col("s") == F.col("doc_id"), "left")
        .select(
            F.col("s").alias("doc_id"),
            F.coalesce(F.col("root"), F.col("s")).alias("component_id"),
        )
        .groupBy("doc_id")
        .agg(F.min("component_id").alias("component_id"))
    )


@register("dedup_cc_star", oracle=_ORACLES["dedup_connected_components"])
def dedup_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB connected-components path promised in
    dedup_connected_components' docstring, made real: large-star/small-star
    over the same Jaccard pair graph, same output contract (doc_id →
    minimum-id component keeper), same recursive-CTE oracle — but O(log n)
    rounds instead of graph-diameter rounds, so billion-node near-dup
    graphs with long chains converge where label propagation would exhaust
    any fixed iteration budget (the naive op now RAISES in that case; this
    one is the documented fix). Chain-convergence law tested in
    tests/test_dedup.py on a path graph longer than CC_MAX_ITERS."""
    pairs = dedup_shingle_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("s"), F.col("doc_b").alias("d")
    )
    return _cc_star_labels(pairs)


@register(
    "dedup_repeated_spans",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    sh AS (
        SELECT doc_id, i AS pos, array_to_string(l[i:i+7], ' ') AS s
        FROM toks, LATERAL unnest(generate_series(1, len(l) - 7)) AS t(i)
        WHERE len(l) >= 8),
    shared AS (
        SELECT s FROM sh GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
    marked AS (SELECT DISTINCT doc_id, pos FROM sh JOIN shared USING (s)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                              ORDER BY pos) <= 7
                    THEN 0 ELSE 1 END AS brk
        FROM marked),
    grp AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS g
        FROM flagged)
    SELECT doc_id,
           min(pos) AS span_start,
           max(pos) + 7 AS span_end,
           max(pos) + 7 - min(pos) + 1 AS n_tokens
    FROM grp GROUP BY doc_id, g
    """,
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-SUBSTRING detection (the span-level dedup pass of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better" — public): every maximal token span of >= 8 tokens that also
    appears verbatim in ANOTHER document, reported as removal spans
    (doc_id, 1-based token start/end). Doc-level dedup (dedup_exact /
    minhash) misses these partial copies — boilerplate headers, quoted
    passages — which is why the span pass exists as its own operator.

    Shape: one 8-token sliding shingle per position (array slice +
    concat, pure column exprs), a groupBy on the shingle to find
    cross-document shingles, then gaps-and-islands with a gap tolerance
    of 7 (two marked shingle STARTS within 7 positions cover overlapping
    token ranges — a plain pos-minus-row_number island split there would
    emit overlapping spans and double-count tokens) to merge marked
    positions into maximal non-overlapping spans. At 100 TB the shingle key is xxhash64'd to 8 bytes before the
    shuffle (the string key here keeps the DuckDB oracle engine-neutral;
    the plan is identical) and the suffix-array construction of the
    paper is replaced by this shingle-mark-merge, which needs only
    groupBy/join/window — no per-node suffix automaton state.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.split("text", " ").alias("l")).filter(
        F.size("l") >= 8
    )
    # sequence(1, n) is safe only for n >= 1 (sequence counts DOWN for
    # n < 1 — the sequence(1,0) trap); the size filter above guarantees it
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(l) - 7), "
                "i -> struct(i AS pos, concat_ws(' ', slice(l, i, 8)) AS s))"
            )
        ).alias("x"),
    ).select("doc_id", F.col("x.pos").alias("pos"), F.col("x.s").alias("s"))
    shared = (
        sh.groupBy("s")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("s")
    )
    marked = sh.join(shared, "s").select("doc_id", "pos").distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = marked.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) <= 7, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    grp = flagged.withColumn(
        "g",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return grp.groupBy("doc_id", "g").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + 7).alias("span_end"),
        (F.max("pos") + 7 - F.min("pos") + 1).alias("n_tokens"),
    ).drop("g")
