"""Cross-engine equality of the synthetic TPC-DS schema generator.

Every tpcds_q* oracle comparison implicitly exercises the generator on
both engines, but a query only touches the columns it reads; these tests
pin FULL-table equality so a generator drift is caught at the table that
drifted, not as an opaque query mismatch."""

from __future__ import annotations

import duckdb
import pytest

from lakehouse_variance_spark.plans import tpcds_schema as T
from scripts.canon import canon_hash, register_views
from tests.conftest import SF_DIR, SF_DIR_MEDIUM


@pytest.fixture(scope="module")
def duck_main():
    # The real driver (and scripts/canon.register_views) put the base views
    # in DuckDB's default `main` schema, which the oracle prelude's
    # `main.<table>` qualifiers rely on; the shared `duck` fixture uses
    # per-sf schemas instead, so this module builds its own connection.
    con = duckdb.connect()
    register_views(con, SF_DIR)
    yield con
    con.close()


# Representative fast subset: a seq-built dimension, a base-derived
# dimension, a fact channel, and its dependent returns table.
FAST_TABLES = ["date_dim", "item", "store_sales", "store_returns"]


@pytest.mark.parametrize("name", FAST_TABLES)
def test_generated_table_matches_oracle(spark, duck_main, name):
    T.register_tpcds_views(spark, SF_DIR)
    sdf = spark.table(name).toPandas()
    odf = duck_main.sql(
        f"WITH {T.oracle_prelude()} SELECT * FROM {name}"
    ).df()
    assert len(sdf) == len(odf) and len(sdf) > 0
    assert canon_hash(sdf) == canon_hash(odf)


@pytest.mark.slow
def test_all_24_tables_match_oracle_sf001(spark):
    con = duckdb.connect()
    register_views(con, SF_DIR_MEDIUM)
    T.register_tpcds_views(spark, SF_DIR_MEDIUM)
    bad = []
    for name in T.TPCDS_DEFS:
        sdf = spark.table(name).toPandas()
        odf = con.sql(
            f"WITH {T.oracle_prelude()} SELECT * FROM {name}"
        ).df()
        if len(sdf) != len(odf) or canon_hash(sdf) != canon_hash(odf):
            bad.append(name)
    con.close()
    assert not bad, f"generator drift: {bad}"


def test_fact_channels_partition_the_line_items(spark):
    """The three channels split lineitem disjointly and completely."""
    from lakehouse_variance_spark.tables import load_table

    T.register_tpcds_views(spark, SF_DIR)
    n_lines = load_table(spark, SF_DIR, "lineitem").count()
    n = sum(
        spark.table(t).count()
        for t in ("store_sales", "catalog_sales", "web_sales")
    )
    assert n == n_lines


def test_returns_link_back_to_sales(spark):
    """Every store_returns row joins its sale on (item_sk, ticket) — the
    linkage q25/q29/q64-style sales↔returns joins rely on."""
    from pyspark.sql import functions as F

    T.register_tpcds_views(spark, SF_DIR)
    sr = spark.table("store_returns")
    ss = spark.table("store_sales")
    unlinked = (
        sr.join(
            ss,
            (sr.sr_item_sk == ss.ss_item_sk)
            & (sr.sr_ticket_number == ss.ss_ticket_number),
            "left_anti",
        ).count()
    )
    assert unlinked == 0
    assert sr.filter(F.col("sr_return_quantity") < 1).count() == 0
