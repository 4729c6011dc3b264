"""Real Iceberg-format integration, environment-gated on the runtime jar.

The reference writes Iceberg through DataFrameWriterV2
(`datasets/iceberg conversion/csv_to_iceberg.py:180-194`) and registers
pre-built tables by metadata file
(`docker/trino-client/src/import_tables.py:13-20`).  This container does
not ship the Iceberg runtime jar, so the test skips cleanly here; on a
cluster with `iceberg-spark-runtime` on the classpath it exercises the
exact reference path end-to-end: writeTo(...).using("iceberg") with the
target-file-size property, read-back, and CALL
<catalog>.system.register_table into a second namespace.
"""

from __future__ import annotations

import pytest

from lakehouse_variance_spark.sources.readers import register_iceberg_table
from lakehouse_variance_spark.tables import load_table
from tests.conftest import SF_DIR


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_writeto_and_register_table_roundtrip(spark, tmp_path):
    if not _iceberg_on_classpath(spark):
        pytest.skip(
            "Iceberg runtime jar not on the classpath "
            "(env re-verified r11: find / empty, maven.org unresolvable)"
        )
    wh = tmp_path / "wh"
    # Hadoop catalogs are instantiated lazily, so catalog conf can be set
    # on the live session (the SQL-extension parser is only needed for
    # the CALL statement, which register_iceberg_table issues — if the
    # jar is present its extension is normally configured too).
    spark.conf.set(
        "spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(wh))

    orders = load_table(spark, SF_DIR, "orders").limit(100)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.db")
    (
        orders.writeTo("ice.db.orders")
        .tableProperty("write.target-file-size-bytes", str(512 * 1024 * 1024))
        .using("iceberg")
        .createOrReplace()
    )
    assert spark.table("ice.db.orders").count() == 100

    # append path (csv_to_iceberg.py mode="append")
    orders.limit(10).writeTo("ice.db.orders").append()
    assert spark.table("ice.db.orders").count() == 110

    # register the physical table under a second name by metadata file
    loc = wh / "db" / "orders"
    metas = sorted((loc / "metadata").glob("v*.metadata.json"))
    assert metas, "hadoop-catalog table should have versioned metadata"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.db2")
    register_iceberg_table(
        spark, "ice", "db2", "orders", str(loc), metadata_file=metas[-1].name
    )
    assert spark.table("ice.db2.orders").count() == 110
