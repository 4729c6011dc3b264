"""Compare our bulk-run workload runtimes against the reference's
published per-query Trino runtime labels.

The reference's generated workload files
(`models/Queries/Baseline_*/*.ndjson`) carry a `Runtime (s)` label per
query — the Trino wall-clock its runtime-prediction models train on.
This script reads OUR run log (written by `scripts/run_workload.py
--workload-ndjson`) and reports side-by-side totals and the ratio
distribution.  DATA SCALES DIFFER (the reference ran its clusters over
the full Iceberg warehouses; our log comes from local[32] over the
derived synthetic schema) — this anchors absolute wall-clock the way
BASELINE_COMPARE.md does for TPC-DS, with the scaling argument living
in SCALE.md.

Usage:
    python scripts/run_workload.py --workload-ndjson <file> \
        --workload-schema ssb --sf-dir /root/testdata/sf0.1 --log-dir L
    python scripts/compare_workload_runtimes.py --ours L --suite ssb \
        --out WORKLOAD_COMPARE_ssb.md
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys

SUITE_FILES = {
    "ssb": "/root/reference/models/Queries/Baseline_SSB/"
           "ssb_Baseline_test.ndjson",
    "imdb": "/root/reference/models/Queries/Baseline_IMDB/"
            "imdb_Baseline_test.ndjson",
    "imdb_train": "/root/reference/models/Queries/Baseline_IMDB/"
                  "imdb_Baseline_train.ndjson",
    "tpcds": "/root/reference/models/Queries/Baseline_TPCDS/"
             "tpcds_Baseline_test.ndjson",
    "tpcds_train": "/root/reference/models/Queries/Baseline_TPCDS/"
                   "tpcds_Baseline_train.ndjson",
    "ssb_local": "/root/reference/models/Queries/Local_SSB/"
                 "ssb_Local_test.ndjson",
    "imdb_local": "/root/reference/models/Queries/Local_IMDB/"
                  "imdb_Local_test.ndjson",
    "tpcds_local": "/root/reference/models/Queries/Local_TPCDS/"
                   "tpcds_Local_test.ndjson",
    "imdb_local_train": "/root/reference/models/Queries/Local_IMDB/"
                        "imdb_Local_train.ndjson",
    "tpcds_local_train": "/root/reference/models/Queries/Local_TPCDS/"
                         "tpcds_Local_train.ndjson",
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ours", required=True)
    ap.add_argument("--suite", choices=list(SUITE_FILES), required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    ref = {}
    for line in open(SUITE_FILES[args.suite], encoding="utf-8"):
        rec = json.loads(line)
        rt = rec.get("Runtime (s)")
        if isinstance(rt, (int, float)):
            ref[rec["query_id"]] = float(rt)

    ours: dict[str, list[float]] = {}
    for path in sorted(
        glob.glob(os.path.join(args.ours, "Workload_log_BASE_*.ndjson"))
    ):
        for line in open(path, encoding="utf-8"):
            rec = json.loads(line)
            rt = rec.get("Runtime (s)")
            if rt is not None and rt >= 0:
                ours.setdefault(rec["query_id"], []).append(float(rt))
    ours_mean = {q: statistics.mean(v) for q, v in ours.items()}

    common = sorted(
        set(ref) & set(ours_mean), key=lambda q: int(q.lstrip("q"))
    )
    if not common:
        raise SystemExit("no common query ids")
    our_total = sum(ours_mean[q] for q in common)
    ref_total = sum(ref[q] for q in common)
    ratios = sorted(ours_mean[q] / ref[q] for q in common if ref[q] > 0)
    med = ratios[len(ratios) // 2]
    faster = sum(1 for q in common if ours_mean[q] < ref[q])

    summary = {
        "metric": f"{args.suite}_workload_total_runtime",
        "queries": len(common),
        "ours_total_s": round(our_total, 2),
        "ref_total_s": round(ref_total, 2),
        "ours_per_query_s": round(our_total / len(common), 4),
        "ref_per_query_s": round(ref_total / len(common), 4),
        "median_ratio": round(med, 4),
        "queries_faster_than_ref": faster,
    }

    if args.out:
        lines = [
            f"# {args.suite.upper()} workload runtimes vs the reference's "
            "published labels",
            "",
            "Ours: local[32] over the derived synthetic schema "
            "(`scripts/run_workload.py --workload-ndjson`).  Reference: "
            "the `Runtime (s)` labels its runtime-prediction models train "
            "on (Trino over the full warehouse).  DATA SCALES DIFFER — "
            "absolute anchor only; SCALE.md carries the scaling argument.",
            "",
            "| query | ours (s) | ref label (s) |",
            "|---|---|---|",
        ]
        for q in common:
            lines.append(
                f"| {q} | {ours_mean[q]:.3f} | {ref[q]:.3f} |"
            )
        lines.append(
            f"| **total ({len(common)}q)** | **{our_total:.1f}** | "
            f"**{ref_total:.1f}** |"
        )
        lines.append("")
        lines.append("```json\n" + json.dumps(summary) + "\n```")
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"# wrote {args.out}", file=sys.stderr)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
