"""Iterative graph analytics over the document corpus.

PageRank is the canonical link-quality signal of web-corpus pipelines
(CommonCrawl publishes host-level PageRank/harmonic centrality for
exactly this: weighting crawl quality during training-data selection).
The documents table has no link column, so the operator derives a
deterministic 3-out-regular link graph from doc_id with the repo's
modular-synthesis rule (same SQL on both engines — the precedent set by
`operators/ingest.py`'s URL synthesis); the operator's substance is the
distributed iterate machinery, which takes any (src, dst) edge table.

Why this is oracle-checkable at all: the iteration runs in FIXED-POINT
INTEGER arithmetic (ranks are int64 micro-units, per-edge contribution is
`rank div outdeg`, damping is `150000 + (85 * inflow) div 100` — all
floor divisions). Integer sums are associative and order-free, so the
result is bit-identical across engines and partitionings where a float
PageRank would drift with shuffle order. The DuckDB oracle unrolls the
same eight iterations as chained CTEs — no recursion, no floats.

Sibling iterative operators: `operators/dedup.py` connected components
(label propagation + large-star/small-star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table

UNIT = 1_000_000  # rank fixed-point scale (micro-units)
OUTDEG = 3
N_ITER = 8
_EDGE_A = 48_271  # MINSTD multiplier for the synthetic dst derivation

# Overflow headroom (ANSI mode throws): per-node inflow is bounded by the
# conserved total mass n·UNIT, so `85 * inflow` stays under 2^63 for
# n < 1e11 documents; beyond that, shrink UNIT with corpus size.


def _edges_sql(n: str) -> str:
    """dst expression for src ``doc_id`` and fan-out index j (1..OUTDEG).

    The map is QUADRATIC in src on purpose: a linear (a·src + j) mod n is
    a bijection per j, which makes the graph in-regular and PageRank
    exactly uniform — a correct but information-free fixture. Squaring
    first makes ~half the nodes quadratic residues with two preimages and
    the rest dangling receivers, so in-degrees (and ranks) spread.

    Contract: doc_ids form a contiguous [0, n) id space (the testdata
    shape) with n < 3e9 (the squared residue stays under 2^63); general
    graphs skip this derivation and feed an edge table into the iterate.
    """
    s = f"(doc_id % {n})"
    return f"((({s} * {s}) % {n}) * {_EDGE_A} + j.j) % {n}"


def _oracle() -> str:
    iters = []
    prev = "p0"
    for i in range(1, N_ITER + 1):
        iters.append(
            f"""p{i} AS (
        SELECT nd.doc_id,
               CAST(150000 + (85 * coalesce(c.s, 0)) // 100 AS BIGINT)
                   AS rank
        FROM nodes nd LEFT JOIN (
            SELECT e.dst AS doc_id, sum(p.rank // {OUTDEG}) AS s
            FROM edges e JOIN {prev} p ON e.src = p.doc_id
            GROUP BY e.dst) c
        ON nd.doc_id = c.doc_id)"""
        )
        prev = f"p{i}"
    chain = ",\n    ".join(iters)
    return f"""
    WITH nn AS (SELECT count(*) AS n FROM documents),
    nodes AS (SELECT doc_id FROM documents),
    edges AS (
        SELECT doc_id AS src, {_edges_sql('nn.n')} AS dst
        FROM documents, nn,
             (SELECT 1 AS j UNION ALL SELECT 2 UNION ALL SELECT 3) j),
    p0 AS (SELECT doc_id, CAST({UNIT} AS BIGINT) AS rank FROM nodes),
    {chain}
    SELECT doc_id, rank AS pagerank_micro FROM p{N_ITER}
    """


@register("graph_pagerank_fixedpoint", oracle=_oracle())
def graph_pagerank_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight damped PageRank iterations in exact int64 fixed point over
    the derived 3-out-regular doc graph. rank₀ = 1e6 micro-units; each
    step: inflow = Σ (rank_src div 3) over in-edges, then
    rank' = 150000 + (85·inflow) div 100 (d = 0.85 damping, floored).

    Scale: the dst endpoints are a deterministic arithmetic function of
    src (the synthetic-graph contract), so each iteration inlines them as
    THREE projected columns on the rank vector and explodes — no edges
    table and no edges ⋈ ranks equi-join at all (r11: the join paid a
    shuffle of both sides per iteration; a general graph would reinstate
    the edge join, bucketed on the node key). Per iteration the plan is:
    narrow explode → partial-aggregated groupBy(dst) (ONE exchange of
    |nodes| 16-byte rows) → left join back to the node list (broadcast
    at bench scale; co-partitioned on the node key at 100 TB, where
    ReuseExchange shares the single node-scan exchange across all eight
    iterations). The whole 8-iteration chain stays LAZY — one adaptive
    query, stages pipelined by the scheduler — instead of the r10
    per-iteration localCheckpoint: even with eager=False, checkpointing
    calls toRdd and AQE materializes every shuffle stage serially at
    BUILD time (measured 36 sequential jobs, 2.8-3.6 s; the lazy chain
    runs 1.1-1.2 s with bit-identical output). Disjoint names (rid/dst)
    keep the shared-lineage self-joins unambiguous without RDD barriers.
    Integer arithmetic makes every iteration's result
    partition-order-free — the property that lets the gate hash-match a
    distributed run against a single-threaded oracle.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    s = F.col("rid") % n
    dsts = F.array(
        *[
            (((s * s) % n) * _EDGE_A + F.lit(j)) % n
            for j in range(1, OUTDEG + 1)
        ]
    )
    ranks = docs.select(
        F.col("doc_id").alias("rid"), F.lit(UNIT).cast("bigint").alias("rank")
    )
    for _ in range(N_ITER):
        inflow = (
            ranks.select(
                F.explode(dsts).alias("dst"),
                F.expr(f"rank div {OUTDEG}").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = docs.join(inflow, docs.doc_id == inflow.dst, "left").select(
            docs.doc_id.alias("rid"),
            (
                F.lit(150000)
                + F.expr("85 * coalesce(s, CAST(0 AS BIGINT)) div 100")
            )
            .cast("bigint")
            .alias("rank"),
        )
    return ranks.select(
        F.col("rid").alias("doc_id"), F.col("rank").alias("pagerank_micro")
    )
