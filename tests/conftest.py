"""Shared fixtures: one SparkSession per test run, DuckDB oracle helper."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from lakehouse_variance_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MEDIUM = "/root/testdata/sf0.01"
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="lvs-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf_dir in (SF_DIR, SF_DIR_MEDIUM):
        schema = sf_dir.rsplit("sf", 1)[-1].replace(".", "_")
        con.sql(f"CREATE SCHEMA IF NOT EXISTS sf_{schema}")
        for t in TABLES:
            con.sql(
                f"CREATE VIEW sf_{schema}.{t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    yield con
    con.close()


_MAIN_SF: dict[int, str] = {}


def oracle_frame(duck, sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL against the given scale factor's views.

    Unqualified table names resolve through USE <sf schema>; the
    synthetic-schema preludes (tpcds_schema / tpch_ext) additionally pin
    base tables as ``main.<t>`` — the driver's layout — so the main views
    are (re)pointed at the requested sf before running."""
    schema = "sf_" + sf_dir.rsplit("sf", 1)[-1].replace(".", "_")
    duck.sql(f"USE {schema}")
    if _MAIN_SF.get(id(duck)) != sf_dir:
        for t in TABLES:
            duck.sql(
                f"CREATE OR REPLACE VIEW main.{t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        _MAIN_SF[id(duck)] = sf_dir
    return duck.sql(sql).df()


def canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values — order-insensitive form,
    mirroring the driver's compare."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def assert_matches_oracle(spark_df, duck, sql: str, sf_dir: str) -> None:
    got = canonical(spark_df.toPandas())
    want = canonical(oracle_frame(duck, sql, sf_dir))
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    # The driver stringifies values, so bigint 5 vs DuckDB HUGEINT->float64
    # 5.0 hash-MISMATCH even when numerically equal. Catch that class here
    # rather than only at the driver: an int column on one side must not be
    # float on the other (both-float is fine — nullable ints arrive as
    # float64 from either engine).
    for col in got.columns:
        kinds = {got[col].dtype.kind, want[col].dtype.kind}
        assert kinds != {"i", "f"}, (
            f"{col}: int-vs-float dtype divergence (spark {got[col].dtype} vs "
            f"oracle {want[col].dtype}) — the driver's value hash rejects this; "
            f"CAST the oracle aggregate (DuckDB sum -> HUGEINT -> float64?)"
        )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6
    )
