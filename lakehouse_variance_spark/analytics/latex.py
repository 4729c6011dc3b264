"""LaTeX row rendering for the paper's variance tables.

The last stage of the reference's trace pipeline renders its summary rows as
LaTeX table lines (``traces/tools/helpers.py:171-195`` Table-1 rows,
``helpers.py:230-320`` Table-2 baseline/delta rows). It is driver-side
string formatting by nature — the input is always a single-row summary
DataFrame — so this module collects the one row and formats; all data-scale
work happened upstream in ``summarize_single_config`` /
``compare_config_deltas``.

Formatting contract mirrored from the reference output:
* missing values render as ``-``
* delta columns render signed math mode ``$+~1.234$`` / ``$-~1.234$``,
  with exact-zero (below the rounding step) as ``$0$``
* Table-1 rows prefix the first value with ``\\hspace{5pt}``; Table-2
  baseline rows carry the gray ``(Baseline)`` header cell, delta rows the
  ``\\textbullet`` factor label.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

_TABLE1_COLS = (
    "mean_runtime_avg_s",
    "mean_runtime_std_s",
    "std_avg_s",
    "std_p50_s",
    "std_p99_s",
    "cv_avg_pct",
    "cv_p50_pct",
    "cv_p99_pct",
)


def _one_row(summary: DataFrame) -> dict:
    rows = summary.limit(2).collect()
    if len(rows) != 1:
        raise ValueError("summary must be a single-row DataFrame")
    return rows[0].asDict()


def _is_missing(x) -> bool:
    if x is None:
        return True
    try:
        return math.isnan(float(x))
    except (TypeError, ValueError):
        return False


def _fmt(x, dp: int) -> str:
    return "-" if _is_missing(x) else f"{float(x):.{dp}f}"


def _fmt_delta(x, dp: int) -> str:
    if _is_missing(x):
        return "-"
    x = float(x)
    if abs(x) < 10 ** (-dp):
        return "$0$"
    sign = "+" if x > 0 else "-"
    return f"${sign}~{abs(x):.{dp}f}$"


def table1_latex_row(summary: DataFrame, platform: str, dp: int = 3) -> str:
    """Study-1 row: platform label + the eight Table-1 stats
    (mean-runtime avg/std, per-query std avg/p50/p99, CV avg/p50/p99)."""
    row = _one_row(summary)
    values = [_fmt(row.get(c), dp) for c in _TABLE1_COLS]
    values[0] = "\\hspace{5pt} " + values[0]
    return f"{platform} &&& " + " & ".join(values) + " \\\\"


def table2_baseline_latex_row(summary: DataFrame, dp: int = 3) -> str:
    """Study-2 gray baseline row: mean runtime + CV stats, delta cells
    dashed out."""
    row = _one_row(summary)
    return (
        "\\multicolumn{5}{c}{\\rowcolor{gray!25} (Baseline)} & "
        f"{_fmt(row.get('mean_runtime_avg_s'), dp)} & "
        "\\multicolumn{1}{c}{\\textbf{---}} & "
        f"{_fmt(row.get('cv_avg_pct'), dp)} & "
        f"{_fmt(row.get('cv_p50_pct'), dp)} & "
        f"{_fmt(row.get('cv_p99_pct'), dp)} & "
        "\\textbf{---} & \\textbf{---} & \\textbf{---} \\\\"
    )


def table2_delta_latex_row(
    deltas: DataFrame, factor_name: str, dp: int = 3
) -> str:
    """Study-2 factor row: absolute stats plus signed percentage deltas
    (input = ``compare_config_deltas`` output)."""
    row = _one_row(deltas)
    return (
        f"& \\textbullet {factor_name} & "
        f"{_fmt(row.get('mean_runtime_avg_s'), dp)} & "
        f"{_fmt_delta(row.get('delta_mean_runtime_pct'), dp)} & "
        f"{_fmt(row.get('cv_avg_pct'), dp)} & "
        f"{_fmt(row.get('cv_p50_pct'), dp)} & "
        f"{_fmt(row.get('cv_p99_pct'), dp)} & "
        f"{_fmt_delta(row.get('delta_cv_avg_pct'), dp)} & "
        f"{_fmt_delta(row.get('delta_cv_p50_pct'), dp)} & "
        f"{_fmt_delta(row.get('delta_cv_p99_pct'), dp)} \\\\"
    )
