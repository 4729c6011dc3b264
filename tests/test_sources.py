"""Sources: Trino-type schema parsing, CSV/NDJSON round trips, catalog ingest
(reference datasets/iceberg conversion/csv_to_iceberg.py, import_tables.py).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)

from lakehouse_variance_spark.sources import readers, schema


@pytest.mark.parametrize(
    ("trino", "expected"),
    [
        ("INTEGER", IntegerType()),
        ("smallint", IntegerType()),
        ("BIGINT", LongType()),
        ("VARCHAR", StringType()),
        ("VARCHAR(255)", StringType()),
        ("CHAR(2)", StringType()),
        ("REAL", DoubleType()),
        ("TIMESTAMP", TimestampType()),
        ("TIMESTAMP WITH TIME ZONE", TimestampType()),
        ("DECIMAL(12,2)", DecimalType(12, 2)),
        ("DECIMAL(99,2)", DecimalType(38, 2)),  # precision clamped
        ("DECIMAL(10, 40)", DecimalType(10, 10)),  # scale clamped to precision
        ("GEOMETRY", StringType()),  # unknown -> fallback
    ],
)
def test_parse_trino_type(trino, expected):
    assert schema.parse_trino_type(trino) == expected


@pytest.mark.parametrize(
    ("raw", "clean"),
    [
        ("Order Key", "order_key"),
        ("l_orderkey", "l_orderkey"),
        ("price($)", "price_"),
        ("a\tb", "a_b"),
        ("1column", "col_1column"),
        ("A__B", "a_b"),
    ],
)
def test_sanitize_column_name(raw, clean):
    assert schema.sanitize_column_name(raw) == clean


def test_csv_roundtrip_with_trino_schema(spark, tmp_path):
    (tmp_path / "t.csv").write_text("1|x|2.5\n2|y|\n")  # trailing null
    st = schema.build_struct_type(
        {"ID": "INTEGER", "Name": "VARCHAR", "Amount": "DOUBLE"}
    )
    df = readers.read_csv_table(spark, str(tmp_path / "t.csv"), st)
    assert df.columns == ["id", "name", "amount"]
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["amount"] == 2.5 and rows[2]["amount"] is None


def test_ndjson_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    out = str(tmp_path / "out")
    readers.write_ndjson(df, out)
    back = readers.read_ndjson(spark, out)
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC sink/source round-trips the relational schema (timestamps
    included) and the reader pushes filters into the ORC scan."""
    from lakehouse_variance_spark.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    out = str(tmp_path / "orders_orc")
    readers.write_orc(orders, out)
    back = readers.read_orc(spark, out)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    # exact content parity via an order-insensitive aggregate
    a = orders.agg({"o_totalprice": "sum", "o_orderkey": "max"}).collect()[0]
    b = back.agg({"o_totalprice": "sum", "o_orderkey": "max"}).collect()[0]
    assert a == b
    plan = (
        back.filter("o_orderstatus = 'F'")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]


def test_nested_json_dot_access(spark, tmp_path):
    doc = {"queryStats": {"elapsedTime": "1.2m", "state": "FINISHED"}, "id": "q1"}
    (tmp_path / "q1.json").write_text(json.dumps(doc, indent=2))
    df = readers.read_nested_json(spark, str(tmp_path / "q1.json"))
    row = df.select("id", "queryStats.elapsedTime").collect()[0]
    assert (row["id"], row["elapsedTime"]) == ("q1", "1.2m")


def test_ingest_csv_dir_creates_tables(spark, tmp_path):
    (tmp_path / "alpha.csv").write_text("1|a\n2|b\n")
    (tmp_path / "beta.csv").write_text("9|z\n")
    (tmp_path / "ignored.txt").write_text("nope")
    schema_json = {
        "alpha": {"k": "BIGINT", "v": "VARCHAR"},
        "beta": {"k": "BIGINT", "v": "VARCHAR"},
    }
    written = readers.ingest_csv_dir(spark, "ingest_test", tmp_path, schema_json)
    try:
        assert written == ["ingest_test.alpha", "ingest_test.beta"]
        assert spark.table("ingest_test.alpha").count() == 2
        # append mode adds rows
        readers.ingest_csv_dir(spark, "ingest_test", tmp_path, schema_json, mode="append")
        assert spark.table("ingest_test.alpha").count() == 4
        desc = readers.describe_table(spark, "ingest_test.beta")
        assert {r["col_name"] for r in desc.collect()} >= {"k", "v"}
    finally:
        spark.sql("DROP TABLE IF EXISTS ingest_test.alpha")
        spark.sql("DROP TABLE IF EXISTS ingest_test.beta")
        spark.sql("DROP NAMESPACE IF EXISTS ingest_test")


def test_scrub_trace_json(spark):
    from lakehouse_variance_spark.sources.scrub import scrub_trace_json

    doc = json.dumps(
        {
            "splitInfo": {"path": "s3://secret/file.parquet", "n": 3},
            "tableLocation": "s3://secret/warehouse/t1",
            "remoteUserAddress": "10.1.2.3",
            "self": "http://coordinator:8080/v1/query/42",
            "createTime": "2024-05-01T10:20:30.123Z",
            "state": "FINISHED",
        }
    )
    df = spark.createDataFrame([(doc,)], "doc string")
    out = df.select(scrub_trace_json("doc").alias("doc")).collect()[0]["doc"]
    assert "secret" not in out
    assert "10.1.2.3" not in out
    assert "2024-05-01" not in out
    assert "<REDACTED_SPLIT_PATH>" in out and "<REDACTED_TABLE_LOCATION>" in out
    assert "FINISHED" in out  # untouched members survive
    assert json.loads(out)  # still valid JSON


def test_load_table_memo_reuses_handle_and_invalidates_on_rewrite(
    spark, tmp_path
):
    """load_table memoizes the lazy table handle per (session, path, mtime)
    — the per-query metadata constant (re-listing + footer schema read)
    disappears — but a rewritten path must yield a FRESH handle: the
    cached InMemoryFileIndex pins the old file list, so reusing it across
    a rewrite would silently read deleted files."""
    import os
    import time

    from lakehouse_variance_spark.tables import load_table
    from tests.conftest import SF_DIR

    a = load_table(spark, SF_DIR, "orders")
    b = load_table(spark, SF_DIR, "orders")
    assert a is b  # same lazy handle, no re-listing

    path = str(tmp_path / "events.parquet")
    src = load_table(spark, SF_DIR, "events").limit(10)
    src.write.parquet(path)
    first = load_table(spark, str(tmp_path), "events")
    assert first.count() == 10
    # nanos->timestamp normalization must survive the memo
    assert dict(first.dtypes)["ts"] != "bigint"
    time.sleep(0.01)
    src.limit(5).write.mode("overwrite").parquet(path)
    os.utime(path)
    second = load_table(spark, str(tmp_path), "events")
    assert second is not first
    assert second.count() == 5
