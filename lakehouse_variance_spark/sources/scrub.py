"""Trace-document scrubbing: the reference's jq redactions as column exprs.

The reference scrubs nested Trino query-info JSON before publishing traces
(``traces/tools/scrub.jq:1-44``): redact filesystem split paths and Iceberg
table locations, delete remote-user IPs and self URIs, and drop every
ISO-8601 timestamp field. Here the same redactions run as ``regexp_replace``
expressions over the serialized JSON text — one narrow JVM-side map over the
document column, no Python, no shuffle — so scrubbing a 100 TB trace archive
is a single scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table

# "key": "value" with the value replaced. Keys mirror scrub.jq rules 1-2.
_REDACT_VALUE_KEYS = {
    "path": "<REDACTED_SPLIT_PATH>",
    "tableLocation": "<REDACTED_TABLE_LOCATION>",
}

# Whole "key": value pairs removed (scrub.jq rules 3-4).
_DELETE_KEYS = ("remoteUserAddress", "self")

# ISO-8601 timestamp string values (scrub.jq rule 5): the whole "key": "ts"
# member is deleted. Pattern mirrors the jq regex, including optional
# fractional seconds and Z / ±hh:mm offsets.
_ISO_TS = (
    r"[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}"
    r"(\.[0-9]+)?(Z|[+-][0-9]{2}:[0-9]{2})?"
)


def scrub_trace_json(col: Column | str) -> Column:
    """Apply all five scrub rules to a JSON-text column."""
    out = F.col(col) if isinstance(col, str) else col
    for key, replacement in _REDACT_VALUE_KEYS.items():
        out = F.regexp_replace(
            out,
            f'"{key}"\\s*:\\s*"[^"]*"',
            f'"{key}": "{replacement}"',
        )
    for key in _DELETE_KEYS:
        # Remove the member plus one adjacent comma (before or after).
        out = F.regexp_replace(out, f',\\s*"{key}"\\s*:\\s*"[^"]*"', "")
        out = F.regexp_replace(out, f'"{key}"\\s*:\\s*"[^"]*"\\s*,?\\s*', "")
    out = F.regexp_replace(out, f',\\s*"[^"]+"\\s*:\\s*"{_ISO_TS}"', "")
    out = F.regexp_replace(out, f'"[^"]+"\\s*:\\s*"{_ISO_TS}"\\s*,?\\s*', "")
    return out


@register(
    "scrub_trace_redaction",
    oracle=r"""
    WITH docs AS (
        SELECT event_id,
               '{"queryId": "q' || CAST(event_id AS VARCHAR) ||
               '", "tableLocation": "s3://bucket/warehouse/t' ||
               CAST(user_id AS VARCHAR) ||
               '", "createTime": "' ||
               strftime(ts, '%Y-%m-%dT%H:%M:%S') ||
               'Z", "remoteUserAddress": "10.0.0.' ||
               CAST(user_id % 255 AS VARCHAR) ||
               '", "state": "' || event_type || '"}' AS doc
        FROM events
    )
    SELECT event_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(doc,
                 '"tableLocation"\s*:\s*"[^"]*"',
                 '"tableLocation": "<REDACTED_TABLE_LOCATION>"', 'g'),
               ',\s*"remoteUserAddress"\s*:\s*"[^"]*"', '', 'g'),
             ',\s*"[^"]+"\s*:\s*"[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?(Z|[+-][0-9]{2}:[0-9]{2})?"',
             '', 'g') AS doc
    FROM docs
    """,
)
def scrub_trace_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub pipeline demo (reference ``scrub.jq:1-44``): build a query-info
    style JSON document per event, then redact table locations and delete
    IP + ISO-timestamp members — pure regexp_replace, fully vectorized."""
    ev = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"queryId": "q'),
        F.col("event_id").cast("string"),
        F.lit('", "tableLocation": "s3://bucket/warehouse/t'),
        F.col("user_id").cast("string"),
        F.lit('", "createTime": "'),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit('Z", "remoteUserAddress": "10.0.0.'),
        (F.col("user_id") % 255).cast("string"),
        F.lit('", "state": "'),
        F.col("event_type"),
        F.lit('"}'),
    )
    docs = ev.select("event_id", doc.alias("doc"))
    return docs.select("event_id", scrub_trace_json("doc").alias("doc"))
