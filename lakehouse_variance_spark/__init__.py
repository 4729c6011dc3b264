"""lakehouse_variance_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``Anonymous-Researcher123457/lakehouse-variance`` (an empirical
study of lakehouse query-runtime variance), re-expressed Spark-first:

* ``session``    — SparkSession factory tuned for analytical workloads.
* ``schema``     — Trino-type-string schema registry (reference
                   ``datasets/iceberg conversion/csv_to_iceberg.py:32-74``).
* ``sources``    — CSV / NDJSON / nested-JSON / parquet readers and sinks.
* ``operators``  — the relational query surface (SURVEY.md §2A) plus the
                   LLM-data-pipeline operators (dedup, similarity search,
                   text analysis, multimodal columns).
* ``functions``  — scalar/aggregate helpers (Trino duration strings, QError).
* ``plans``      — query runner with phase timing + plan feature extraction.
* ``analytics``  — workload-trace analytics (reference ``traces/tools``).
* ``scheduling`` — carbon-aware scheduling simulator (reference
                   ``low-carbon-scheduling/src``).
* ``ml``         — runtime-prediction pipeline (reference ``models/RF``).
* ``streaming``  — Structured-Streaming variants of the log analytics.

Everything is DataFrame/SQL-first: logical plans are declared via the
DataFrame API and Catalyst/Tungsten pick the physical strategy. Python UDFs
appear only where built-ins genuinely cannot express the semantics, and then
always as Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
