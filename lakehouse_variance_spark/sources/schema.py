"""Trino-type-string schema registry.

The reference declares benchmark table schemas as JSON ``{table -> {column ->
Trino type string}}`` and maps them to Spark types at ingestion
(``datasets/iceberg conversion/csv_to_iceberg.py:23-74``). This module
re-implements that contract: the same type vocabulary, the same DECIMAL
clamping (p ≤ 38, s ≤ p), the same column-name sanitization (whitespace and
non-word chars → ``_``, collapsed; digit-prefixed names get ``col_``;
lowercase), the same StringType fallback for unknown types.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_DECIMAL_RE = re.compile(r"DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)")

_TRINO_TO_SPARK: dict[str, DataType] = {
    "INTEGER": IntegerType(),
    "INT": IntegerType(),
    "SMALLINT": IntegerType(),
    "BIGINT": LongType(),
    "VARCHAR": StringType(),
    "CHAR": StringType(),
    "BOOLEAN": BooleanType(),
    "DOUBLE": DoubleType(),
    "REAL": DoubleType(),
    "FLOAT": DoubleType(),
    "DATE": DateType(),
    "TIMESTAMP": TimestampType(),
    "TIMESTAMP WITH TIME ZONE": TimestampType(),
}


def sanitize_column_name(name: str) -> str:
    """Normalize a raw column name to a safe lowercase identifier
    (reference ``csv_to_iceberg.py:23-29``)."""
    name = name.replace("\t", "_").replace(" ", "_")
    name = re.sub(r"[^\w]", "_", name)
    name = re.sub(r"__+", "_", name)
    if re.match(r"^\d", name):
        name = f"col_{name}"
    return name.lower()


def parse_trino_type(trino_type: str) -> DataType:
    """Trino type string → Spark type (reference ``csv_to_iceberg.py:32-66``).

    DECIMAL(p,s) clamps p to 38 (Spark's max) and s to p; parameterized
    strings fall back to their base type (VARCHAR(255) → StringType);
    anything unknown becomes StringType.
    """
    t = trino_type.strip().upper()
    m = _DECIMAL_RE.match(t)
    if m:
        precision = min(int(m.group(1)), 38)
        scale = min(int(m.group(2)), precision)
        return DecimalType(precision=precision, scale=scale)
    base = t.split("(")[0].strip()
    return _TRINO_TO_SPARK.get(base, StringType())


def build_struct_type(columns: dict[str, str]) -> StructType:
    """{column -> Trino type} → nullable StructType with sanitized names
    (reference ``csv_to_iceberg.py:69-74``)."""
    return StructType(
        [
            StructField(sanitize_column_name(col), parse_trino_type(t), True)
            for col, t in columns.items()
        ]
    )


def load_schema_json(path: str | Path) -> dict[str, dict[str, str]]:
    """Load and validate a ``{table -> {column -> type}}`` schema file
    (reference ``csv_to_iceberg.py:93-110``)."""
    with Path(path).open("r", encoding="utf-8") as f:
        obj = json.load(f)
    if not isinstance(obj, dict):
        raise ValueError("Schema JSON must map table_name -> {column -> type}")
    for table, cols in obj.items():
        if not isinstance(cols, dict):
            raise ValueError(f"Schema for table '{table}' must map column -> type")
    return obj
