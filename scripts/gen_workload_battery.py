"""Select + validate a battery of the reference's generated workload texts.

Reads a `models/Queries/Baseline_*/*.ndjson` workload file, normalizes
each SQL text (`synth_common.normalize_workload_sql`), cross-checks it
on Spark and DuckDB over the derived synthetic schema, and emits a
Python module embedding the selected texts so the repo stays standalone
(no runtime dependency on the reference checkout).

Selection: all texts that hash-match AND parse on both engines, ranked
to maximize template diversity (table-set, join arity, predicate
features), preferring non-empty results, capped at --count.

Usage:
    python scripts/gen_workload_battery.py ssb --count 25
    python scripts/gen_workload_battery.py imdb --count 30
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from lakehouse_variance_spark.plans import synth_common as synth  # noqa: E402
from lakehouse_variance_spark.session import build_session  # noqa: E402
from scripts.canon import canon_hash, register_views  # noqa: E402

SUITES = {
    "ssb": {
        "ndjson": "/root/reference/models/Queries/Baseline_SSB/"
                  "ssb_Baseline_test.ndjson",
        "tables": ["lineorder", "customer", "supplier", "part", "dim_date"],
        "module": "lakehouse_variance_spark/plans/ssb_workload_texts.py",
        "prefix": "ssb_wl_",
    },
    "imdb": {
        "ndjson": "/root/reference/models/Queries/Baseline_IMDB/"
                  "imdb_Baseline_train.ndjson",
        "tables": None,  # filled from job_schema
        "module": "lakehouse_variance_spark/plans/job_workload_texts.py",
        "prefix": "imdb_wl_",
    },
    "tpcds": {
        "ndjson": "/root/reference/models/Queries/Baseline_TPCDS/"
                  "tpcds_Baseline_train.ndjson",
        "tables": None,  # filled from tpcds_schema
        "module": "lakehouse_variance_spark/plans/tpcds_workload_texts.py",
        "prefix": "tpcds_wl_",
    },
    # The reference's "Local" generation configs (same schemas, different
    # query-generator settings) — embedded under distinct prefixes so both
    # published configs are represented in the registry, not only swept.
    "ssb_local": {
        "ndjson": "/root/reference/models/Queries/Local_SSB/"
                  "ssb_Local_test.ndjson",
        "tables": ["lineorder", "customer", "supplier", "part", "dim_date"],
        "module": "lakehouse_variance_spark/plans/ssb_local_texts.py",
        "prefix": "ssb_lwl_",
    },
    "imdb_local": {
        "ndjson": "/root/reference/models/Queries/Local_IMDB/"
                  "imdb_Local_test.ndjson",
        "tables": None,  # filled from job_schema
        "module": "lakehouse_variance_spark/plans/job_local_texts.py",
        "prefix": "imdb_lwl_",
    },
}


def features(sql: str, tables: list[str]) -> tuple:
    tabs = frozenset(t for t in tables if f'"{t}"' in sql)
    feats = frozenset(
        kw
        for kw in ("LEFT OUTER JOIN", "NOT LIKE", "LIKE", "BETWEEN",
                   " IN (", "OR ", "IS NOT NULL", "IS NULL", "GROUP BY")
        if kw in sql
    )
    return (tabs, feats)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suite", choices=list(SUITES))
    ap.add_argument("--count", type=int, default=25)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--probe", type=int, default=120,
                    help="how many candidate texts to cross-check")
    args = ap.parse_args()
    cfg = SUITES[args.suite]

    base = args.suite.removesuffix("_local")
    if base == "ssb":
        from lakehouse_variance_spark.plans.ssb_schema import (
            oracle_sql_for_ssb as oracle_for,
            register_ssb_views as register_schema,
        )
        tables = cfg["tables"]
    elif base == "tpcds":
        from lakehouse_variance_spark.plans.tpcds_schema import (
            TPCDS_DEFS,
            oracle_sql_for as oracle_for,
            register_tpcds_views as register_schema,
        )
        tables = list(TPCDS_DEFS)
    else:
        from lakehouse_variance_spark.plans.job_schema import (
            JOB_DEFS,
            oracle_sql_for_job as oracle_for,
            register_job_views as register_schema,
        )
        tables = list(JOB_DEFS)

    spark = build_session(app_name=f"gen-{args.suite}", shuffle_partitions=8)
    register_schema(spark, args.sf)
    con = duckdb.connect()
    register_views(con, args.sf)

    rows = [json.loads(line) for line in open(cfg["ndjson"])]
    # spread probes across the whole file so late templates are seen too
    step = max(1, len(rows) // args.probe)
    candidates = rows[::step][: args.probe]

    good = []
    for q in candidates:
        text = synth.normalize_workload_sql(q["SQL"])
        try:
            o = con.sql(oracle_for(text)).df()
        except Exception as ex:
            print(f"  skip {q['query_id']}: duckdb {str(ex)[:90]}")
            continue
        try:
            s = synth.sql_quoted_idents(spark, text).toPandas()
        except Exception as ex:
            print(f"  skip {q['query_id']}: spark {str(ex)[:90]}")
            continue
        try:
            match = canon_hash(s) == canon_hash(o) and len(s) == len(o)
        except ValueError:
            # duplicate projection names — sweepable (positional hash in
            # workload_oracle_sweep.py) but not embeddable as a driver
            # oracle, whose canonicalizer sorts by column name
            print(f"  skip {q['query_id']}: duplicate projection names")
            continue
        if not match:
            print(f"  !! MISMATCH {q['query_id']}: {len(s)} vs {len(o)} rows")
            continue
        good.append(
            {
                "qid": q["query_id"],
                "sql": text,
                "runtime_ref_s": q.get("Runtime (s)"),
                "rows": len(s),
                "feat": features(text, tables),
            }
        )
        print(f"  ok {q['query_id']}: {len(s)} rows")

    # greedy diversity pick: new (tables, feats) combos first, non-empty
    # preferred, then largest coverage of individual features
    picked, seen = [], set()
    for nonempty_pass in (True, False):
        for g in sorted(good, key=lambda g: -g["rows"]):
            if len(picked) >= args.count:
                break
            if (g["rows"] > 0) != nonempty_pass:
                continue
            key = g["feat"]
            if key in seen and nonempty_pass:
                continue
            seen.add(key)
            picked.append(g)
    # fill remaining slots with any matches not yet picked
    for g in good:
        if len(picked) >= args.count:
            break
        if g not in picked:
            picked.append(g)
    picked.sort(key=lambda g: int(g["qid"].lstrip("q")))

    reg_mod = {"ssb": "ssb_schema", "imdb": "job_schema",
               "tpcds": "tpcds_schema"}[base]
    reg_fn = {"ssb": "register_ssb_views", "imdb": "register_job_views",
              "tpcds": "register_tpcds_views"}[base]
    orc_fn = {"ssb": "oracle_sql_for_ssb", "imdb": "oracle_sql_for_job",
              "tpcds": "oracle_sql_for"}[base]
    name_of = lambda g: cfg["prefix"] + g["qid"].lstrip("q")  # noqa: E731

    lines = [
        '"""Verbatim-modulo-normalization workload texts from the reference\'s',
        f"generated {args.suite.upper()} battery "
        f"(`{cfg['ndjson'].split('/root/reference/')[1]}`).",
        "",
        "AUTO-SELECTED by scripts/gen_workload_battery.py: each text is the",
        "reference's published SQL normalized once by",
        "`synth_common.normalize_workload_sql` (bare-varchar cast + BIGINT",
        "sum pinning — see its docstring), then executed as the SAME string",
        "by `spark.sql` (double-quoted-identifier parse mode) and the DuckDB",
        "oracle over the derived synthetic schema.  `runtime_ref_s` carries",
        "the reference's published Trino runtime label for the workload-",
        "runner parity artifacts; it plays no part in correctness.",
        '"""',
        "",
        "from __future__ import annotations",
        "",
        "from pyspark.sql import DataFrame, SparkSession",
        "",
        "from lakehouse_variance_spark.plans import synth_common as synth",
        f"from lakehouse_variance_spark.plans.{reg_mod} import (",
        f"    {orc_fn},",
        f"    {reg_fn},",
        ")",
        "from lakehouse_variance_spark.registry import register",
        "",
        "TEXTS: dict[str, str] = {",
    ]
    for g in picked:
        lines.append(f"    {name_of(g)!r}: r'''{g['sql']}''',")
    lines.append("}")
    lines.append("")
    lines.append("REF_RUNTIME_S: dict[str, float] = {")
    for g in picked:
        lines.append(f"    {name_of(g)!r}: {g['runtime_ref_s']!r},")
    lines.append("}")
    lines.append("")
    lines.extend([
        "",
        "def _register() -> None:",
        "    for name, text in TEXTS.items():",
        "",
        "        def run(spark: SparkSession, sf_dir: str, _text=text"
        ") -> DataFrame:",
        f"            {reg_fn}(spark, sf_dir)",
        "            return synth.sql_quoted_idents(spark, _text)",
        "",
        "        run.__name__ = name",
        "        run.__doc__ = (",
        f"            'Reference-generated {args.suite.upper()} workload "
        "text ' + name + ' — '",
        "            'identical normalized string on both engines.'",
        "        )",
        f"        register(name, oracle={orc_fn}(text))(run)",
        "",
        "",
        "_register()",
    ])
    with open(cfg["module"], "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"picked {len(picked)}/{len(good)} matches -> {cfg['module']}")


if __name__ == "__main__":
    main()
