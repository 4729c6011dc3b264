"""Law gates for the fixed-point PageRank iterate (operators/graph.py).

Oracle equality (bit-exact int64 ranks vs DuckDB's unrolled CTE chain) is
covered by the slow registry sweep / driver_sim; these pin the invariants
that localize a broken iterate."""

from __future__ import annotations

from lakehouse_variance_spark.operators.graph import (
    N_ITER,
    UNIT,
    graph_pagerank_fixedpoint,
)
from lakehouse_variance_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_mass_conservation_and_floor(spark):
    pdf = graph_pagerank_fixedpoint(spark, SF_DIR).toPandas()
    n = load_table(spark, SF_DIR, "documents").count()
    assert len(pdf) == n and pdf["doc_id"].is_unique
    # Every node keeps at least the teleport mass.
    assert (pdf["pagerank_micro"] >= 150_000).all()
    # Total mass stays at n·UNIT minus bounded floor losses: each of the
    # 8 iterations drops < (OUTDEG + 1) micro-units per node to floors.
    total = pdf["pagerank_micro"].sum()
    assert total <= n * UNIT
    assert total >= n * UNIT - n * 4 * N_ITER


def test_rank_differentiates_nodes(spark):
    # The derived graph is 3-out-regular but NOT in-regular, so ranks must
    # spread — a constant output means the iterate is a no-op.
    pdf = graph_pagerank_fixedpoint(spark, SF_DIR).toPandas()
    assert pdf["pagerank_micro"].nunique() > 1


def test_deterministic_across_runs(spark):
    a = graph_pagerank_fixedpoint(spark, SF_DIR).toPandas()
    b = graph_pagerank_fixedpoint(spark, SF_DIR).toPandas()
    key = ["doc_id", "pagerank_micro"]
    assert a.sort_values("doc_id")[key].values.tolist() == (
        b.sort_values("doc_id")[key].values.tolist()
    )
