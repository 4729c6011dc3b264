"""Shared canonicalization for the three gate-simulation scripts.

One definition of "rows match" so driver_sim, hostile_sweep, and
oracle_sweep cannot drift apart (they had: three hand-rolled variants
with different precision and dtype behavior).

Semantics mirror the real driver's comparator:

* columns sorted by name, rows sorted stably by all columns;
* cell stringification PRESERVES the int-vs-float distinction at full
  precision — ``itertuples`` (not ``iterrows``) is load-bearing here:
  iterrows materializes each row as a Series whose dtype is the COMMON
  upcast, so a bigint 5 next to a double column becomes 5.0 and hashes
  equal to DuckDB's float 5.0, silently passing the exact type-divergence
  class the gate exists to catch;
* non-scalar cells (lists/dicts/arrays) raise TypeError, like the
  driver's canonicalizer — a rows-only query returning an array column
  must fail HERE, not at submission.
"""

from __future__ import annotations

import hashlib

import numpy as np

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_views(con, sf_dir: str) -> None:
    """CREATE VIEW <t> over each table's parquet, like the driver does."""
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )


def canon_hash(pdf) -> str:
    """Order-insensitive value hash of a pandas frame (see module doc)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if (
            pdf[c]
            .map(lambda v: isinstance(v, (list, dict, set, np.ndarray)))
            .any()
        ):
            raise TypeError(f"unhashable cell type in column {c!r}")
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    recs = [
        "|".join(str(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return hashlib.md5("\n".join(recs).encode()).hexdigest()
