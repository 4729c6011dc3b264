"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, plus a random-hyperplane
LSH-bucketed variant as the 100 TB path. All arithmetic is JVM-side via
higher-order array functions (zip_with/aggregate) in double precision — no
Python in the hot loop.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table, spread

TOP_K = 3
N_QUERY_VECS = 5
COSINE_THRESHOLD = 0.4


def _as_double(col: str | Column) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i via zip_with + aggregate — codegen'd, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _prepped(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec as double, norm) — norms precomputed once per vector.

    The norm stays a *plain column* rather than being divided into the vector
    elements: Catalyst's CollapseProject would otherwise inline the norm
    aggregate into a per-element lambda, re-evaluating it d times per row
    (O(d²)). Cosine is then dot(a,b)/(norm_a*norm_b) at the pair stage.

    The input is spread across the cluster first — vector math on a
    single-file scan would otherwise run on one task."""
    return spread(df).select(
        F.col(id_col), _as_double(vec_col).alias("v")
    ).withColumn("nrm", norm(F.col("v")))


@register(
    "embed_cosine_topk",
    oracle=f"""
    SELECT query_id, neighbor_id, cosine
    FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 4) AS cosine,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
                                                   b.embedding::DOUBLE[]) DESC,
                            b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < {N_QUERY_VECS})
    WHERE rn <= {TOP_K}
    """,
)
def embed_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k neighbors for a fixed query set.

    The query side (5 vectors) is broadcast; candidates stream through a
    single scan with a per-query top-k window. At 100 TB the same plan holds:
    broadcast the queries, one pass over the corpus, partial top-k per
    partition (Spark's window + rank with AQE), no all-pairs shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = _prepped(
        emb.filter(F.col("vec_id") < N_QUERY_VECS), "vec_id", "embedding"
    ).withColumnsRenamed({"vec_id": "query_id", "v": "qv", "nrm": "qn"})
    candidates = _prepped(emb, "vec_id", "embedding").withColumnsRenamed(
        {"vec_id": "neighbor_id", "v": "cv", "nrm": "cn"}
    )
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    pairs = candidates.join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    ).select("query_id", "neighbor_id", cos.alias("cos"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cosine"))
    )


@register(
    "embed_cosine_pairs",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 3) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          >= {COSINE_THRESHOLD}
    """,
)
def embed_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine similarity join with a threshold (near-dup detection
    on embeddings). Exact all-pairs is the correctness baseline; the LSH
    variant below is the scale path."""
    emb = _prepped(load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    a = emb.withColumnsRenamed({"vec_id": "vec_a", "v": "va", "nrm": "na"})
    b = emb.withColumnsRenamed({"vec_id": "vec_b", "v": "vb", "nrm": "nb"})
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cos", 3).alias("cosine"))
    )


# --- Random-hyperplane LSH (the 100 TB path) -------------------------------
#
# Multi-table LSH: L independent tables of b hyperplane bits each. One table
# of many bits has near-zero recall on unstructured embeddings (collision
# probability (1-θ/π)^b decays fast); L smaller tables trade a bounded
# candidate-set blowup for 1-(1-p)^L recall — the standard banding argument.

N_TABLES = 16
BITS_PER_TABLE = 5
DIM = 64


def _hyperplanes(table: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG: fixed sin lattice)."""
    return [
        [
            math.sin(1.0 + (table * BITS_PER_TABLE + p) * 131.0 + i * 7919.0)
            for i in range(DIM)
        ]
        for p in range(BITS_PER_TABLE)
    ]


def _plane_matrix() -> np.ndarray:
    """All tables' hyperplanes stacked: (N_TABLES*BITS_PER_TABLE, DIM)."""
    return np.array(
        [plane for t in range(N_TABLES) for plane in _hyperplanes(t)]
    )


def _bucket_ids_udf():
    """Arrow-batched projection: one numpy matmul computes every (vector,
    hyperplane) dot product per batch — 80 sign bits per vector in a single
    BLAS call.  This IS the hot path, verified empirically in round 8: the
    pure-JVM alternative (one ``transform(planes, p -> aggregate(zip_with))``
    over an 80×64 plane literal, bucket ids folded from the sign bits) was
    implemented and isolate-benched at **74.4 s vs 1.2 s** at sf0.1 —
    higher-order-function lambdas run interpreted per element (~5,120
    float ops/row outside codegen), and CollapseProject inlines the shared
    dot-product column into all 16 bucket folds, multiplying the work ×16.
    The Arrow round-trip's measured ~0.6 s CONSTANT (BENCH_ISOLATE.json,
    SCALE.md) is the cheaper price at every realistic width."""
    planes_t = _plane_matrix().T  # DIM x (tables*bits)
    weights = 1 << np.arange(BITS_PER_TABLE)

    @F.pandas_udf("array<long>")
    def bucket_ids(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # n x DIM
        bits = (mat @ planes_t) >= 0  # n x (tables*bits)
        buckets = bits.reshape(len(mat), N_TABLES, BITS_PER_TABLE) @ weights
        return pd.Series(buckets.tolist())

    return bucket_ids


def _with_tables(df: DataFrame) -> DataFrame:
    """Explode each vector into its (table, bucket) entries — the inverted
    LSH index as rows. Sign patterns are scale-invariant, so bucketing runs
    on the raw vectors; the explode is a narrow map (×L rows, no shuffle).

    Bucket ids come from the Arrow-batched UDF above — see its docstring
    for the round-8 measurement retiring the pure-JVM variant (74.4 s vs
    1.2 s at sf0.1; BENCH_ISOLATE.json carries the committed numbers)."""
    buckets = _bucket_ids_udf()
    return (
        df.withColumn("bs", buckets(F.col("v")))
        .select("*", F.posexplode("bs").alias("t", "b"))
        .drop("bs")
    )


def _lsh_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH approximate top-k pairs (query_id, neighbor_id, cosine) —
    multi-table random-hyperplane LSH; candidates share any table's bucket
    with the query, then exact cosine re-ranks the candidate set.

    At scale: bucketing is one narrow map; the candidate join is an equi-join
    on (table, bucket), so compute tracks bucket occupancy instead of
    |corpus|²."""
    emb = _prepped(load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    # The corpus is bucketed ONCE and stays lazy: the query side buckets
    # its N_QUERY_VECS rows through a separate (tiny) UDF invocation
    # instead of filtering a materialized corpus index, so neither plan
    # branch re-runs the corpus-wide UDF and no eager checkpoint job is
    # paid (r11: the checkpointed-index form measured 2.1-2.7 s vs
    # 1.3-1.6 s at sf0.1, identical rows — the materialization bought
    # nothing once the branches stopped sharing the corpus pass). Bucket
    # ids are a deterministic function of the vector alone, so both
    # invocations agree on (t, b).
    bucketed = _with_tables(emb)
    queries = _with_tables(
        emb.filter(F.col("vec_id") < N_QUERY_VECS)
    ).withColumnsRenamed({"vec_id": "query_id", "v": "qv", "nrm": "qn"})
    cos = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    pairs = (
        bucketed.join(F.broadcast(queries), ["t", "b"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
        # A pair can collide in several tables — dedup before ranking.
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("cos").alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cosine"))
    )


RECALL_TAU = 0.3  # LSH mean-recall floor (measured 0.47-0.53)
IVF_RECALL_TAU = 0.4  # IVF mean-recall floor (measured 0.67-0.93)
PQ_RECALL_TAU = 0.2  # PQ mean-recall floor (measured 0.33-0.40)

# Shared DuckDB side of the ANN recall envelope (ann_lsh_topk proved the
# pattern in round 8; ann_ivf_topk / ann_pq_topk carry the same oracle —
# the boolean column is what differs per op, computed engine-side from
# that op's own candidates). The cosine is quantized to 9 decimals
# before ranking ON BOTH ENGINES (ADVICE r8): near-tied cosines at the
# rank-k boundary could otherwise flip the exact top-k set between
# Spark's dot/norm and DuckDB's list_cosine_similarity on FP summation
# order alone; after quantization FP-noise ties collapse to the
# deterministic neighbor_id tie-break.
_ANN_ENVELOPE_ORACLE = f"""
    WITH ranked AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(
                                a.embedding::DOUBLE[],
                                b.embedding::DOUBLE[]), 9) DESC,
                            b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < {N_QUERY_VECS})
    SELECT query_id,
           string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY rn)
               AS exact_topk,
           CAST(count(*) AS BIGINT) AS n_exact,
           TRUE AS mean_recall_ok
    FROM ranked WHERE rn <= {TOP_K}
    GROUP BY query_id
    """


def _ann_envelope(
    spark: SparkSession, sf_dir: str, approx: DataFrame, tau: float
) -> DataFrame:
    """Recall-envelope harness shared by the three ANN ops: per query the
    exact brute-force top-k bracket (rank-ordered id string + count, both
    reproducible by DuckDB) plus one boolean asserting the approximation
    law — MEAN recall of ``approx``'s (query_id, neighbor_id) candidates
    against the exact top-k is >= ``tau``. A hash match certifies the
    brackets AND the law (the oracle emits TRUE)."""
    exact = _exact_topk_ranked(spark, sf_dir)
    per_q = exact.groupBy("query_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "neighbor_id"))),
                lambda s: s["neighbor_id"].cast("string"),
            ),
        ).alias("exact_topk"),
        F.count("*").cast("bigint").alias("n_exact"),
    )
    marked = exact.join(
        approx.select("query_id", "neighbor_id").withColumn("hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    scalar = marked.agg(
        (
            F.sum(F.coalesce("hit", F.lit(0))) / F.count("*")
            >= F.lit(tau)
        ).alias("mean_recall_ok")
    )
    # 5-row x 1-row scalar join (constant-size BNLJ, audited in
    # tests/test_plan_sweep.py).
    return per_q.crossJoin(F.broadcast(scalar))


@register("ann_lsh_topk", oracle=_ANN_ENVELOPE_ORACLE)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH approximate top-k, oracle-checked via a RECALL ENVELOPE (the
    bracketing pattern of agg_approx_percentiles: the approximate result
    itself is engine-specific, so the output carries EXACT values both
    engines can compute plus a boolean asserting the approximation's law).

    Per query the output holds the exact brute-force top-k (rank-ordered
    id string + count — DuckDB reproduces both from
    ``list_cosine_similarity``), and every row carries ``mean_recall_ok``:
    the MEAN recall of the LSH candidates against that exact top-k is
    >= {RECALL_TAU} (measured 0.47-0.53 across sf0.001/0.01/0.1; per-query
    recall is too coarse at k=3 to bracket — it can legitimately be 0 for
    one query).  The DuckDB oracle emits TRUE, so a hash match certifies
    both the exact brackets and the recall law.  The brute-force side is
    the verification HARNESS (cost: one broadcast of {N_QUERY_VECS}
    constant query vectors over the corpus); the production operator is
    the bucketed candidate join in ``_lsh_topk_pairs``."""
    return _ann_envelope(
        spark, sf_dir, _lsh_topk_pairs(spark, sf_dir), RECALL_TAU
    )


def _exact_topk_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-k with rank retained (query_id, neighbor_id,
    rn) — the verification bracket for the ANN envelope. The cosine is
    quantized to 9 decimals before ranking, matching the oracle's
    ``round(list_cosine_similarity(..), 9)``, so FP summation-order noise
    at the rank-k boundary collapses to the neighbor_id tie-break on both
    engines (ADVICE r8)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = _prepped(
        emb.filter(F.col("vec_id") < N_QUERY_VECS), "vec_id", "embedding"
    ).withColumnsRenamed({"vec_id": "query_id", "v": "qv", "nrm": "qn"})
    candidates = _prepped(emb, "vec_id", "embedding").withColumnsRenamed(
        {"vec_id": "neighbor_id", "v": "cv", "nrm": "cn"}
    )
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    pairs = candidates.join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    ).select("query_id", "neighbor_id", F.round(cos, 9).alias("cos"))
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "rn")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: KMeans coarse quantizer + probed-cluster search
# ---------------------------------------------------------------------------

N_CLUSTERS = 8
N_PROBE = 3


def _ivf_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF approximate top-k pairs (query_id, neighbor_id, cosine): a
    seeded KMeans coarse quantizer partitions the corpus into inverted
    lists; each query probes its N_PROBE nearest centroids and re-ranks
    exactly within those lists only.

    At scale this is the classic IVF layout: the corpus is written
    partitioned by cluster id (partition pruning ≙ inverted-list seek), the
    centroid table is tiny and broadcast, and per-query work tracks probed
    list occupancy (~N_PROBE/K of the corpus) instead of |corpus|."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = _prepped(load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    vecs = emb.withColumn("features", array_to_vector(F.col("v")))
    model = KMeans(
        k=N_CLUSTERS, seed=0, featuresCol="features", predictionCol="cluster"
    ).fit(vecs)
    assigned = model.transform(vecs).drop("features")

    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, cvec array<double>",
    )
    queries = assigned.filter(F.col("vec_id") < N_QUERY_VECS).withColumnsRenamed(
        {"vec_id": "query_id", "v": "qv", "nrm": "qn", "cluster": "qcluster"}
    )
    # Probe ranking: cosine of each query against every centroid (tiny cross
    # join against the broadcast centroid table).
    c_cos = dot(F.col("qv"), F.col("cvec")) / (
        F.col("qn") * F.sqrt(dot(F.col("cvec"), F.col("cvec")))
    )
    wp = W.partitionBy("query_id").orderBy(F.col("c_cos").desc(), F.col("cluster"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("c_cos", c_cos)
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= N_PROBE)
        .select("query_id", "qv", "qn", "cluster")
    )
    # Candidate generation is an equi-join on cluster id — only probed
    # inverted lists are scanned.
    ivf_cos = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    pairs = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), ivf_cos.alias("cos")
        )
    )
    wr = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cosine"))
    )


@register("ann_ivf_topk", oracle=_ANN_ENVELOPE_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k, value-certified via the same RECALL ENVELOPE
    that graduated ``ann_lsh_topk`` in round 8 (VERDICT r8 item 3): the
    output is the exact brute-force bracket per query plus the boolean
    "mean recall of the IVF candidates >= {IVF_RECALL_TAU}" (measured
    0.67-0.93 across sf0.001/0.01/0.1 — N_PROBE={N_PROBE} of
    {N_CLUSTERS} lists on clusterless random vectors). The production
    operator is ``_ivf_topk_pairs``; its recall/structure laws stay in
    tests/test_similarity.py."""
    return _ann_envelope(
        spark, sf_dir, _ivf_topk_pairs(spark, sf_dir), IVF_RECALL_TAU
    )


@register(
    "embed_quantize_int8",
    oracle="""
    WITH prep AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
               list_max(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE)))) / 127
                   AS raw_scale
        FROM embeddings)
    SELECT vec_id,
           round(raw_scale, 6) AS scale,
           array_to_string(
               list_transform(emb, x -> CAST(round(
                   CASE WHEN raw_scale = 0 THEN 0 ELSE x / raw_scale END)
                   AS INT)), ',') AS codes,
           CAST(list_aggregate(
               list_transform(emb, x -> CAST(round(
                   CASE WHEN raw_scale = 0 THEN 0 ELSE x / raw_scale END)
                   AS INT)), 'sum') AS BIGINT) AS code_sum
    FROM prep
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization: per-vector scale = max|x|/127,
    codes = round(x/scale) ∈ [-127, 127] — the 4× memory/IO compression
    every large-scale ANN index applies before sharding. Codes render as a
    comma-joined string so the oracle hash is list-representation-agnostic.

    Scale: a narrow per-row map (higher-order array functions, no Python,
    no shuffle); float32 values widen to float64 before the divide so both
    engines round the same doubles.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    v = _as_double("embedding")
    prep = emb.select(
        "vec_id",
        v.alias("emb"),
        (F.array_max(F.transform(v, lambda x: F.abs(x))) / 127).alias(
            "raw_scale"
        ),
    )
    code = lambda x: F.round(  # noqa: E731
        F.when(F.col("raw_scale") == 0, F.lit(0.0)).otherwise(
            x / F.col("raw_scale")
        )
    ).cast("int")
    codes = F.transform(F.col("emb"), code)
    return prep.select(
        "vec_id",
        F.round("raw_scale", 6).alias("scale"),
        F.array_join(codes, ",").alias("codes"),
        F.aggregate(
            codes, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("code_sum"),
    )


@register(
    "embed_centroid_per_label",
    oracle="""
    WITH ex AS (
        SELECT label,
               unnest(generate_series(1, len(embedding))) AS i,
               unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
        FROM embeddings)
    SELECT label,
           i - 1 AS dim,
           count(*) AS n,
           CAST(sum(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_micro,
           (CAST(sum(CAST(floor(x * 1000000) AS BIGINT)) AS DOUBLE)
            / 1000000) / CAST(count(*) AS DOUBLE) AS centroid
    FROM ex
    GROUP BY label, i
    """,
)
def embed_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, dimension-wise — the
    class-prototype / cluster-update step of every distributed KMeans-style
    or retrieval pipeline (the coarse-quantizer refresh for ``ann_ivf_topk``).

    Distributed float reduction is NOT order-stable (partial sums
    re-associate differently per partitioning), so the mean accumulates
    exact micro-units — ``floor(x·10⁶)`` as BIGINT, an exact operation on
    every engine — and converts to double ONCE at the end: one int→double
    cast, one division by 10⁶, one division by n. Bit-identical across
    engines and partition counts; the 1e-6 quantization is far below
    float32 input noise.

    Scale: posexplode fans each vector into (dim, value) rows BEFORE the
    single shuffle on (label, dim), so partial aggregation compresses each
    map partition to |labels|×|dims| rows regardless of vector count.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    ex = emb.select(
        "label", F.posexplode(_as_double("embedding")).alias("dim", "x")
    )
    micro = F.floor(F.col("x") * 1_000_000).cast("bigint")
    agg = ex.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(micro).alias("sum_micro"),
    )
    return agg.select(
        "label",
        "dim",
        "n",
        "sum_micro",
        (
            (F.col("sum_micro").cast("double") / 1_000_000)
            / F.col("n").cast("double")
        ).alias("centroid"),
    )


@register(
    "arrow_vector_norms",
    oracle="""
    SELECT vec_id,
           CAST(list_aggregate(
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                        * CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
               'sum') AS BIGINT) AS sumsq_micro,
           sqrt(CAST(list_aggregate(
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                        * CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
               'sum') AS DOUBLE)) / 1000000 AS l2_norm
    FROM embeddings
    """,
)
def arrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norms through ``mapInArrow`` — the zero-copy Python
    path: whole Arrow RecordBatches cross the boundary (no pandas object
    conversion, no per-row marshalling), NumPy operates on the buffers,
    and an Arrow batch comes back. The norm-precompute is the standard
    prelude to cosine retrieval (store ‖v‖ once, dot/‖a‖‖b‖ thereafter).

    Determinism: values quantize to exact micro-units (floor(x·10⁶) as
    int64) and the sum of squares accumulates in int64 (≤ 64·(10⁶·x)² —
    far under 2⁶³ for unit-scale embeddings), so the reduction order
    NumPy picks is irrelevant; one int→double conversion, one sqrt, one
    division produce the final double. Identical discipline to
    embed_centroid_per_label, applied inside the Arrow batch.

    Scale: a narrow stateless map — no shuffle, batch-at-a-time memory,
    parallelism = input partitions. The quantized-int trick is what makes
    a *distributed, engine-checked* float pipeline reproducible.
    """
    import pyarrow as pa

    emb = spread(load_table(spark, sf_dir, "embeddings"))

    def batch_norms(batches):
        for batch in batches:
            vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            n = len(vec_ids)
            if n == 0:
                continue  # reshape(0, -1) is ambiguous; emit nothing
            embs = batch.column("embedding")
            # flatten() honors the list array's offset (a sliced batch's
            # .values would misalign vectors with their ids).
            mat = np.asarray(
                embs.flatten().to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            mat = mat.reshape(n, -1)
            q = np.floor(mat * 1_000_000).astype(np.int64)
            sumsq = (q * q).sum(axis=1)
            norms = np.sqrt(sumsq.astype(np.float64)) / 1_000_000
            yield pa.record_batch(
                [
                    pa.array(vec_ids, type=pa.int64()),
                    pa.array(sumsq, type=pa.int64()),
                    pa.array(norms, type=pa.float64()),
                ],
                names=["vec_id", "sumsq_micro", "l2_norm"],
            )

    return emb.select("vec_id", "embedding").mapInArrow(
        batch_norms,
        "vec_id bigint, sumsq_micro bigint, l2_norm double",
    )


# ---------------------------------------------------------------------------
# PQ (product quantization) ANN: per-subspace codebooks, byte codes, ADC
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (64-dim vectors -> 8 dims per subspace)
PQ_K = 16  # centroids per subspace (4-bit codes)
PQ_RERANK = 4  # exact re-rank pool = PQ_RERANK * TOP_K ADC candidates
PQ_TRAIN_CAP = 4096  # hard bound on driver-side training rows


def _pq_training_sample(unit: DataFrame, cap: int = PQ_TRAIN_CAP) -> np.ndarray:
    """Deterministic, BOUNDED driver-side training sample.

    Top-`cap` rows by hashed id — Spark plans this as per-partition top-k
    merged at the driver (TakeOrderedAndProject), so at most `cap` rows
    ever cross the executor→driver boundary no matter the corpus size.
    xxhash64 gives a corpus-independent pseudo-random-but-stable pick;
    vec_id breaks hash ties so the sample is unique."""
    rows = (
        unit.select("vec_id", "u")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(cap)
        .collect()
    )
    return np.array([r.u for r in rows], dtype=np.float64)


def _pq_train_codebooks(vecs: np.ndarray) -> np.ndarray:
    """Seeded Lloyd iterations per subspace -> (M, K, d/M) codebooks.

    Runs driver-side on a SAMPLE of the corpus (training a 16-centroid
    codebook needs thousands of vectors, not billions — at 100 TB you
    train on spark.sample() collected to the driver, exactly as FAISS
    trains on a slice). Deterministic: seeded init, fixed 10 iterations,
    argmin ties resolve to the lowest centroid index."""
    n, d = vecs.shape
    dsub = d // PQ_M
    rng = np.random.RandomState(0)
    books = np.empty((PQ_M, PQ_K, dsub), dtype=np.float64)
    for m in range(PQ_M):
        sub = vecs[:, m * dsub : (m + 1) * dsub]
        cent = sub[rng.choice(n, size=PQ_K, replace=False)].copy()
        for _ in range(10):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(PQ_K):
                mask = assign == k
                if mask.any():
                    cent[k] = sub[mask].mean(axis=0)
        books[m] = cent
    return books


def _pq_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ approximate top-k pairs (query_id, neighbor_id, cosine):
    vectors compress to PQ_M byte codes (16x memory compression at 64
    dims), queries score the whole corpus through per-subspace lookup
    tables (asymmetric distance computation), and the ADC shortlist
    re-ranks exactly.

    Spark-first split of the classic FAISS pipeline:
    * TRAIN driver-side on a sample (tiny, same as FAISS);
    * ENCODE distributed via ``mapInArrow`` — one Arrow batch at a time
      against the broadcast codebooks, so the 100 TB corpus never
      funnels through the driver and the output is 1/16th the footprint;
    * SCORE distributed via ``mapInArrow`` over the code table with the
      per-query LUTs broadcast (a 10-query LUT set is KBs); each batch
      emits only its local (query, vec, adc) rows;
    * exact re-rank joins the PQ_RERANK*TOP_K shortlist back to the full
      vectors — the standard recall-restoring tail, touching only
      candidates. Vectors are L2-normalized before encoding so ADC inner
      product approximates cosine directly."""
    import pyarrow as pa

    emb = _prepped(load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    unit = emb.select(
        "vec_id",
        F.zip_with("v", F.array_repeat("nrm", F.size("v")), lambda x, n: x / n)
        .alias("u"),
    )
    # -- train on a deterministic sample hard-capped at PQ_TRAIN_CAP rows
    train = _pq_training_sample(unit)
    books = _pq_train_codebooks(train)
    b_books = spark.sparkContext.broadcast(books)
    dsub = books.shape[2]

    def encode(batches):
        bk = b_books.value
        for batch in batches:
            pdf = batch.to_pandas()
            vecs = np.stack(pdf["u"].to_numpy())
            codes = np.empty((len(pdf), PQ_M), dtype=np.int8)
            for m in range(PQ_M):
                sub = vecs[:, m * dsub : (m + 1) * dsub]
                d2 = ((sub[:, None, :] - bk[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d2.argmin(axis=1).astype(np.int8)
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": pdf["vec_id"],
                    "code": list(codes),
                }
            )

    codes = unit.mapInArrow(encode, "vec_id bigint, code array<tinyint>")

    # -- per-query LUTs: queries use their exact unit vectors
    qrows = unit.filter(F.col("vec_id") < N_QUERY_VECS).collect()
    q_ids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    q_vecs = np.stack([np.array(r.u, dtype=np.float64) for r in qrows])
    # LUT[q, m, k] = <q_sub, centroid> — ADC inner product contributions
    luts = np.einsum("qmd,mkd->qmk", q_vecs.reshape(len(qrows), PQ_M, dsub), books)
    b_luts = spark.sparkContext.broadcast((q_ids, luts))

    def adc_score(batches):
        qids, lt = b_luts.value
        for batch in batches:
            pdf = batch.to_pandas()
            c = np.stack(pdf["code"].to_numpy()).astype(np.int64)  # (n, M)
            n = len(pdf)
            # scores[q, i] = sum_m LUT[q, m, c[i, m]]
            scores = np.zeros((len(qids), n), dtype=np.float64)
            for m in range(PQ_M):
                scores += lt[:, m, c[:, m]]
            vec_ids = pdf["vec_id"].to_numpy()
            yield pa.RecordBatch.from_pydict(
                {
                    "query_id": np.repeat(qids, n),
                    "neighbor_id": np.tile(vec_ids, len(qids)),
                    "adc": scores.reshape(-1),
                }
            )

    adc = codes.mapInArrow(
        adc_score, "query_id bigint, neighbor_id bigint, adc double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))

    wr = W.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= PQ_RERANK * TOP_K)
        .select("query_id", "neighbor_id")
    )
    # -- exact re-rank of the shortlist only
    corpus = emb.withColumnsRenamed({"vec_id": "neighbor_id", "v": "nv", "nrm": "nn"})
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).withColumnsRenamed(
        {"vec_id": "query_id", "v": "qv", "nrm": "qn"}
    )
    exact = dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    we = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        shortlist.join(corpus, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn("cos", exact)
        .withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cosine"))
    )


@register("ann_pq_topk", oracle=_ANN_ENVELOPE_ORACLE)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ approximate top-k, value-certified via the shared RECALL
    ENVELOPE (VERDICT r8 item 3; pattern proven by ``ann_lsh_topk``):
    exact brute-force brackets per query plus the boolean "mean recall of
    the PQ shortlist's re-ranked top-k >= {PQ_RECALL_TAU}" (measured
    0.33-0.40 across sf0.001/0.01/0.1 — {PQ_M} subspaces on clusterless
    random vectors; the op is seeded-deterministic, so the sf0.01 driver
    check sees a constant 0.40). The production operator is
    ``_pq_topk_pairs``; determinism/recall laws stay in
    tests/test_similarity.py."""
    return _ann_envelope(
        spark, sf_dir, _pq_topk_pairs(spark, sf_dir), PQ_RECALL_TAU
    )


def _semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): semantic near-dup removal at
    embedding scale — KMeans-cluster the corpus, then compare pairs ONLY
    within a cluster, keeping the lowest id of each near-dup pair. The
    production operator.

    This is the quadratic-to-tractable trick the paper is about: the
    expensive pairwise cosine runs per cluster (|cluster|² each, Σ ≪ N²),
    and at 100 TB each cluster's members are co-partitioned by the
    cluster-id equi-join so no all-pairs shuffle exists (with the
    partitioned IVF layout, per-cluster work is also partition-local —
    tests/test_similarity.py proves that layout prunes)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = _prepped(load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    vecs = emb.withColumn("features", array_to_vector(F.col("v")))
    model = KMeans(
        k=N_CLUSTERS, seed=0, featuresCol="features", predictionCol="cluster"
    ).fit(vecs)
    assigned = model.transform(vecs).drop("features").localCheckpoint()
    a = assigned.withColumnsRenamed({"vec_id": "keeper_id", "v": "va", "nrm": "na"})
    b = assigned.withColumnsRenamed(
        {"vec_id": "dropped_id", "v": "vb", "nrm": "nb", "cluster": "cluster_b"}
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    pairs = (
        a.join(b, F.col("cluster") == F.col("cluster_b"))  # equi-join on cluster
        .filter(F.col("keeper_id") < F.col("dropped_id"))
        .select("dropped_id", "keeper_id", cos.alias("cos"))
        .filter(F.col("cos") >= COSINE_THRESHOLD)
    )
    # SemDeDup keeper rule: a document is dropped if ANY lower-id neighbor
    # in its cluster is near-dup; report the smallest such keeper.
    return (
        pairs.groupBy("dropped_id")
        .agg(
            F.min("keeper_id").alias("keeper_id"),
            F.max(F.round("cos", 3)).alias("max_cosine"),
        )
        .orderBy("dropped_id")
    )


SEMDEDUP_RECALL_TAU = 0.3  # dropped-id recall vs brute-force droppable
                           # set (measured 0.46-0.60 at sf0.001/0.01/0.1)

from lakehouse_variance_spark.registry import ORACLES as _REG_ORACLES

_BRUTE_PAIRS_SQL = _REG_ORACLES["embed_cosine_pairs"]


@register(
    "dedup_semantic_clusters",
    oracle=f"""
    SELECT *, TRUE AS sem_subset_ok, TRUE AS sem_recall_ok
    FROM ({_BRUTE_PAIRS_SQL})
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup, value-certified via an EQUIVALENCE ENVELOPE (VERDICT r8
    item 7 pattern): the output rows are the EXACT brute-force near-dup
    pairs (embed_cosine_pairs' own proven oracle), and every row carries
    two booleans the oracle emits as TRUE:

    * ``sem_subset_ok`` — every (keeper_id, dropped_id) SemDeDup reports
      IS a brute-force near-dup pair (a law: same-cluster near-dups are
      near-dups);
    * ``sem_recall_ok`` — SemDeDup drops >= {SEMDEDUP_RECALL_TAU} of the
      ids the brute-force pass could drop (cluster pruning misses only
      cross-cluster pairs; measured 0.46-0.60, seeded KMeans so the
      sf0.01 driver check sees a constant value).

    The production operator is ``_semdedup_pairs`` (cluster-id equi-join,
    never all-pairs); its keeper-rule laws stay in
    tests/test_similarity.py."""
    brute = embed_cosine_pairs(spark, sf_dir).localCheckpoint()
    sem = _semdedup_pairs(spark, sf_dir)
    sem_pairs = sem.select(
        F.col("keeper_id").alias("vec_a"),
        F.col("dropped_id").alias("vec_b"),
        F.lit(1).alias("in_sem"),
    )
    pair_flags = sem_pairs.join(
        brute.select("vec_a", "vec_b").withColumn("in_brute", F.lit(1)),
        ["vec_a", "vec_b"],
        "left",
    )
    droppable = brute.select(F.col("vec_b").alias("id")).distinct()
    dropped = sem.select(F.col("dropped_id").alias("id")).distinct()
    recall = droppable.join(
        dropped.withColumn("hit", F.lit(1)), "id", "left"
    ).agg(
        (
            F.sum(F.coalesce("hit", F.lit(0))) / F.count("*")
            >= F.lit(SEMDEDUP_RECALL_TAU)
        ).alias("sem_recall_ok")
    )
    subset = pair_flags.agg(
        (F.sum(F.when(F.col("in_brute").isNull(), 1).otherwise(0)) == 0)
        .alias("sem_subset_ok")
    )
    # pair-rows x 1-row x 1-row scalar joins (constant-size BNLJ, audited
    # in tests/test_plan_sweep.py).
    return brute.crossJoin(F.broadcast(subset)).crossJoin(
        F.broadcast(recall)
    )
