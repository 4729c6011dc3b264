"""Compare this engine's per-query TPC-DS runtimes against the reference's
published workload logs (`traces/study_1/<cloud>/<SF>/`).

Both sides are the same 99 query TEXTS; the data scales differ (the
reference ran Trino on 4-node clusters over SF_10/100/1000 Iceberg
warehouses; our logs come from local[32] over the synthetic derived
schema), so the output reports per-query wall-clock side by side with
the scale caveat stated, not a pretend like-for-like. The scaling
argument lives in SCALE.md's 10x probe; this artifact anchors the
absolute numbers the way BASELINE.md does.

Usage:
    python scripts/run_workload.py --battery tpcds --attempts 5 --log-dir L
    python scripts/compare_baseline.py --ours L [--sf SF_10] [--out BASELINE_COMPARE.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys

CLOUDS = ("AWS", "GCP", "Azure", "Self_Hosted")
REF_STUDY1 = "/root/reference/traces/study_1"


def _mean_runtimes(log_glob: str) -> dict[str, float]:
    """query_id -> mean 'Runtime (s)' over runs, failures (<0) dropped."""
    per_query: dict[str, list[float]] = {}
    for path in sorted(glob.glob(log_glob)):
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                rt = rec.get("Runtime (s)")
                if rt is not None and rt >= 0:
                    qid = str(rec["query_id"]).removeprefix("tpcds_")
                    per_query.setdefault(qid, []).append(float(rt))
    return {q: statistics.mean(v) for q, v in per_query.items()}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ours", required=True, help="log dir from run_workload.py")
    ap.add_argument("--sf", default="SF_10", help="reference scale dir name")
    ap.add_argument("--out", default="BASELINE_COMPARE.md")
    args = ap.parse_args()

    ours = _mean_runtimes(os.path.join(args.ours, "Workload_log_BASE_*.ndjson"))
    if not ours:
        raise SystemExit(f"no records under {args.ours}")

    ref: dict[str, dict[str, float]] = {}
    for cloud in CLOUDS:
        d = os.path.join(REF_STUDY1, cloud, args.sf)
        m = _mean_runtimes(os.path.join(d, "Workload_log_BASE_*.ndjson"))
        if m:
            ref[cloud] = m
    if not ref:
        raise SystemExit(f"no reference logs under {REF_STUDY1}/*/{args.sf}")

    qids = sorted(ours, key=lambda q: int(q.lstrip("q")))
    lines = [
        "# Per-query runtimes vs the reference's published logs",
        "",
        f"Ours: verbatim TPC-DS texts on local[32] over the synthetic derived",
        f"schema (see TESTDATA.md scale). Reference: Trino, 4-node cloud",
        f"clusters, {args.sf} Iceberg warehouse — mean over its published runs",
        f"(`traces/study_1/<cloud>/{args.sf}`). DATA SCALES DIFFER; this table",
        "anchors absolute per-query wall-clock, the 10x probe in SCALE.md",
        "carries the scaling argument.",
        "",
        "| query | ours (s) | " + " | ".join(f"{c} (s)" for c in ref) + " |",
        "|---|---|" + "|".join("---" for _ in ref) + "|",
    ]
    # Totals are computed over the INTERSECTION of query ids per reference
    # cloud (a cloud's logs can miss queries), and each total row states
    # its covered-query count, so the headline compares like-for-like
    # sets instead of silently summing different query subsets.
    totals = {c: 0.0 for c in ref}
    ours_vs = {c: 0.0 for c in ref}
    covered = {c: 0 for c in ref}
    our_total = 0.0
    for q in qids:
        our_total += ours[q]
        cells = []
        for c in ref:
            v = ref[c].get(q)
            cells.append(f"{v:.2f}" if v is not None else "—")
            if v is not None:
                totals[c] += v
                ours_vs[c] += ours[q]
                covered[c] += 1
        lines.append(f"| {q} | {ours[q]:.2f} | " + " | ".join(cells) + " |")
    lines.append(
        f"| **total ({len(qids)}q)** | **{our_total:.1f}** | "
        + " | ".join(
            f"**{totals[c]:.1f}** ({covered[c]}q; ours {ours_vs[c]:.1f})"
            for c in ref
        )
        + " |"
    )
    lines.append("")
    summary = {
        "metric": "tpcds_battery_total_runtime",
        "ours_total_s": round(our_total, 2),
        "ours_per_query_s": round(our_total / len(qids), 3),
        "reference_totals_s": {c: round(t, 1) for c, t in totals.items()},
        "reference_covered_queries": dict(covered),
        "ours_total_on_covered_s": {
            c: round(t, 2) for c, t in ours_vs.items()
        },
        "queries": len(qids),
        "reference_sf": args.sf,
    }
    lines.append("```json\n" + json.dumps(summary) + "\n```")
    with open(args.out, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps(summary))
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
