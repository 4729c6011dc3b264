"""Source readers and sinks (SURVEY.md §2A scans/sources/sinks).

Covers the reference's ingest surface Spark-first:

* schema-ful delimited CSV (``csv_to_iceberg.py:158-166,207-211``: ``|``
  delimiter, no header, quote disabled via NUL, backslash escape)
* NDJSON logs (``helpers.py:133``), nested query-info JSON documents
  (``make_lakehouse_workload_logs.sh:117-139``)
* NDJSON sink — one JSON object per line, any Hadoop filesystem
  (s3a/abfs/gs), the distributed form of ``run_workload.py:73-80``'s
  fsspec upload
* catalog table write/create/append + namespace + Iceberg ``register_table``
  (``csv_to_iceberg.py:180-194``, ``import_tables.py:12-26``) — format
  defaults to the session catalog's parquet provider and switches to
  ``iceberg`` wherever the Iceberg runtime jar is on the classpath.

Readers always take explicit StructTypes for determinism (SURVEY §1.3);
``infer=True`` is an opt-in for exploratory loads only.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from lakehouse_variance_spark.sources.schema import (
    build_struct_type,
    load_schema_json,
    sanitize_column_name,
)

CSV_DEFAULTS = {
    "delimiter": "|",
    "header": "false",
    "quote": "\u0000",  # NUL disables quoting (reference csv_to_iceberg.py:233)
    "escape": "\\",
}


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options: str,
) -> DataFrame:
    """Schema-ful delimited CSV scan (reference ``csv_to_iceberg.py:158-171``).
    Column names are sanitized after read, exactly like the reference, so the
    schema's declared names survive even if the raw header disagrees."""
    opts = {**CSV_DEFAULTS, **{k: str(v) for k, v in options.items()}}
    df = spark.read.options(**opts).schema(schema).csv(path)
    return df.toDF(*[sanitize_column_name(c) for c in df.columns])


def read_ndjson(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Line-delimited JSON scan (reference ``helpers.py:133``)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_nested_json(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Whole-document (multi-line) JSON scan for per-query info documents
    (reference ``run_workload.py:49-56`` output, consumed at
    ``make_lakehouse_workload_logs.sh:117-139``). Nested objects become
    nested StructType columns addressable with dot paths."""
    reader = spark.read.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """NDJSON sink: one JSON object per line (reference ``run_workload.py:73-80``).
    Hadoop's FileSystem handles s3a://, abfs://, gs:// the way the
    reference's fsspec upload did — but distributed, one file per partition."""
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan (vectorized reader, predicate pushdown into ORC
    stripe/row-group statistics — same pruning contract as the parquet
    path). The reference's lakehouse is format-pluggable at the Iceberg
    layer (``csv_to_iceberg.py:180-194`` writes whatever
    ``write.format.default`` says); ORC is the other columnar format
    that layer supports."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink with zlib compression (Spark default) — columnar,
    splittable, stats-bearing, interchangeable with the parquet sink."""
    df.write.mode(mode).orc(path)


def ingest_csv_dir(
    spark: SparkSession,
    db_name: str,
    csv_dir: str | Path,
    schema_json: dict[str, dict[str, str]] | str | Path,
    *,
    mode: str = "create_or_replace",
    fmt: str | None = None,
    target_file_size_bytes: int = 512 * 1024 * 1024,
    **csv_options: str,
) -> list[str]:
    """Directory-of-CSVs → catalog tables (reference
    ``csv_to_iceberg.py:113-196``): one table per ``<name>.csv`` that has an
    entry in the schema JSON, written via DataFrameWriterV2. Returns the
    written identifiers. Files iterate in sorted order (determinism
    convention, ``csv_to_iceberg.py:146``)."""
    if not isinstance(schema_json, dict):
        schema_json = load_schema_json(schema_json)
    csv_dir = Path(csv_dir)
    if not csv_dir.exists():
        raise FileNotFoundError(f"CSV directory not found: {csv_dir}")

    create_namespace(spark, db_name)
    written: list[str] = []
    for csv_file in sorted(csv_dir.iterdir()):
        if not csv_file.is_file() or csv_file.suffix.lower() != ".csv":
            continue
        table = csv_file.stem
        if table not in schema_json:
            continue
        df = read_csv_table(
            spark, str(csv_file), build_struct_type(schema_json[table]), **csv_options
        )
        ident = f"{db_name}.{table}"
        if fmt:
            # DSv2 path (e.g. "iceberg" when the runtime jar is present):
            # createOrReplace/append with the Iceberg target-file-size property
            # (reference csv_to_iceberg.py:180-194,213).
            writer = df.writeTo(ident).tableProperty(
                "write.target-file-size-bytes", str(target_file_size_bytes)
            ).using(fmt)
            if mode == "create_or_replace":
                writer.createOrReplace()
            elif mode == "create":
                writer.create()
            elif mode == "append":
                writer.append()
            else:
                raise ValueError(f"Unknown mode: {mode}")
        else:
            # Session-catalog (v1) path: the built-in catalog has no REPLACE
            # TABLE AS SELECT, so map the modes onto saveAsTable.
            v1_mode = {
                "create_or_replace": "overwrite",
                "create": "errorifexists",
                "append": "append",
            }.get(mode)
            if v1_mode is None:
                raise ValueError(f"Unknown mode: {mode}")
            df.write.mode(v1_mode).saveAsTable(ident)
        written.append(ident)
    return written


def create_namespace(spark: SparkSession, name: str) -> None:
    """CREATE NAMESPACE IF NOT EXISTS (reference ``csv_to_iceberg.py:139``,
    ``import_tables.py:9-10``)."""
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {name}")


def register_iceberg_table(
    spark: SparkSession,
    catalog: str,
    schema_name: str,
    table_name: str,
    table_location: str,
    metadata_file: str = "v1.metadata.json",
) -> None:
    """Register a pre-built Iceberg table by metadata file (reference
    ``import_tables.py:12-26``), via Iceberg's Spark procedure. Requires an
    Iceberg SparkCatalog named ``catalog`` on the session."""
    spark.sql(
        f"""
        CALL {catalog}.system.register_table(
            table => '{schema_name}.{table_name}',
            metadata_file => '{table_location.rstrip("/")}/metadata/{metadata_file}'
        )
        """
    )


def describe_table(spark: SparkSession, ident: str) -> DataFrame:
    """Table metadata op: DESCRIBE TABLE as a DataFrame."""
    return spark.sql(f"DESCRIBE TABLE {ident}")
