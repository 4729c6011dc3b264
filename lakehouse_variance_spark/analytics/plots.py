"""Plot layer for the scheduling experiment panels (reference
``low-carbon-scheduling/src/plot.py``), split Spark-first:

* the PANEL DATA — bar geometry, method ordering, value labels, y-limits,
  overhead annotations — is computed as plain data structures from the
  ``scheduler_experiment_summary`` rows (the part with testable logic:
  reference ``plot.py:11-176`` bar layout, ``plot.py:299-407`` overhead
  panel);
* the matplotlib RENDERING is an import-gated thin loop over that data
  (``render_qpp_panel_png``): matplotlib is not installed in this
  container, so rendering raises a clear error here and works unchanged
  on a workstation that has it. All heavy computation stays in Spark —
  the plot layer only ever touches the handful of summary rows.

Geometry constants mirror the reference's (bar width 0.25, intra-group
gap 0.04, inner scheduler gap 0.3, group gap 1.1; method order
FIFO < GNN < RF < Oracle — ``plot.py:41,64-83``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass

BAR_WIDTH = 0.25
BAR_GAP = 0.04
INNER_GAP = 0.3
GROUP_GAP = 1.1
METHOD_ORDER = ("FIFO", "GNN", "RF", "Oracle")


@dataclass(frozen=True)
class Bar:
    scheduler: str
    method: str
    x: float
    height: float
    value_label: str


def _label_for(row: Mapping) -> str:
    """summary rows carry (scheduler, oracle); the reference's figure
    labels FIFO bars 'FIFO' and model bars by predictor name — this
    repo's predictor is the RF pipeline, oracle rows are 'Oracle'."""
    if row["scheduler"] == "fifo":
        return "FIFO"
    return "Oracle" if row["oracle"] else "RF"


def qpp_vs_oracle_panel_data(
    rows: Sequence[Mapping], *, metric: str = "carbon_total_gco2"
) -> dict:
    """Bar chart data for the QPP-vs-oracle panel (plot.py:11-176): one
    scheduler group per distinct scheduler, one bar per method present,
    reference geometry and value labels; returns bars, per-group tick
    positions, and the padded y-limits."""
    if not rows:
        raise ValueError("no summary rows provided")
    schedulers: list[str] = []
    for r in rows:
        if r["scheduler"] not in schedulers:
            schedulers.append(r["scheduler"])

    by_sched: dict[str, list[Mapping]] = {s: [] for s in schedulers}
    for r in rows:
        by_sched[r["scheduler"]].append(r)

    labels_per = {
        s: [m for m in METHOD_ORDER
            if any(_label_for(r) == m for r in by_sched[s])]
        for s in schedulers
    }
    max_n = max(len(v) for v in labels_per.values())

    # group x positions: consecutive same-kind schedulers sit INNER_GAP
    # apart, kind changes jump GROUP_GAP (plot.py:73-83; "kind" there is
    # local-vs-cluster, here fifo-vs-model schedulers)
    xs: dict[str, float] = {}
    cur = 0.0
    prev_kind = None
    for s in schedulers:
        kind = s == "fifo"
        if prev_kind is not None:
            cur += INNER_GAP if kind == prev_kind else GROUP_GAP
        xs[s] = cur
        prev_kind = kind

    bars: list[Bar] = []
    for s in schedulers:
        labels = labels_per[s]
        total_width = BAR_WIDTH * max_n + BAR_GAP * (max_n - 1)
        start = xs[s] - total_width / 2 + BAR_WIDTH / 2
        for j, method in enumerate(labels):
            row = next(r for r in by_sched[s] if _label_for(r) == method)
            val = float(row[metric])
            bars.append(
                Bar(s, method, start + j * (BAR_WIDTH + BAR_GAP), val,
                    f"{val:.2f}")
            )

    heights = [b.height for b in bars]
    span = max(heights) - min(heights)
    pad = 0.1 * span if span > 0 else (
        0.1 * max(heights) if max(heights) > 0 else 1.0
    )
    return {
        "bars": bars,
        "ticks": xs,
        "ylim": (max(0.0, min(heights) - pad), max(heights) + pad),
        "metric": metric,
    }


def overhead_panel_data(rows: Sequence[Mapping]) -> list[dict]:
    """Overhead-vs-oracle panel rows (plot.py:299-407): one entry per
    non-oracle model run, annotated with the relative overhead as a
    percentage string (the figure's bar text)."""
    out = []
    for r in rows:
        if r["oracle"]:
            continue
        ov = float(r["overhead_vs_oracle"])
        out.append(
            {
                "scheduler": r["scheduler"],
                "method": _label_for(r),
                "overhead": ov,
                "annotation": f"{100 * ov:+.1f}%",
            }
        )
    return out


def ci_over_slots_series(
    profile_rows: Sequence[Mapping], max_slots: int | None = None
) -> tuple[list[int], list[float]]:
    """CI-over-slots line series (plot.py:178-195)."""
    rows = sorted(profile_rows, key=lambda r: r["slot"])
    if max_slots is not None:
        rows = rows[:max_slots]
    return [int(r["slot"]) for r in rows], [float(r["ci"]) for r in rows]


def render_qpp_panel_png(panel: dict, path: str) -> None:
    """Render a panel-data dict to a PNG. Import-gated: matplotlib is not
    shipped in this container; on an environment that has it this is the
    reference figure's draw loop."""
    try:
        import matplotlib
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise ImportError(
            "matplotlib is not installed; qpp_vs_oracle_panel_data() "
            "already holds everything the figure needs — render on a "
            "workstation with matplotlib available"
        ) from exc
    matplotlib.use("Agg")  # pragma: no cover
    import matplotlib.pyplot as plt  # pragma: no cover

    fig, ax = plt.subplots()  # pragma: no cover
    for b in panel["bars"]:  # pragma: no cover
        ax.bar(b.x, b.height, width=BAR_WIDTH)
        ax.text(b.x, b.height, b.value_label, ha="center", va="bottom")
    ax.set_ylim(*panel["ylim"])  # pragma: no cover
    ax.set_xticks(list(panel["ticks"].values()))  # pragma: no cover
    ax.set_xticklabels(list(panel["ticks"]))  # pragma: no cover
    fig.savefig(path)  # pragma: no cover
    plt.close(fig)  # pragma: no cover
