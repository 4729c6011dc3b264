"""Unit tests for trace analytics + duration parsing against hand-computed
reference semantics (traces/tools/helpers.py, make_lakehouse_workload_logs.sh).
"""

from __future__ import annotations

import json
import os
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_variance_spark.analytics.traces import (
    compare_config_deltas,
    load_workload_logs,
    summarize_single_config,
)
from lakehouse_variance_spark.functions.durations import duration_to_seconds

# 2 runs x 3 queries + one query with only 1 sample (std must be excluded),
# plus a NULL runtime row (dropped before all stats).
LOG_ROWS = [
    ("Run 1", 1, 10.0),
    ("Run 1", 2, 20.0),
    ("Run 1", 3, 5.0),
    ("Run 2", 1, 12.0),
    ("Run 2", 2, 24.0),
    ("Run 2", 3, 7.0),
    ("Run 1", 4, 99.0),  # only one sample -> no std
    ("Run 2", 5, None),  # null runtime -> dropped
]


def _log_df(spark):
    return spark.createDataFrame(LOG_ROWS, "run string, query_id int, runtime_s double")


def test_summarize_single_config_matches_numpy(spark):
    row = (
        summarize_single_config(_log_df(spark), required_samples=2)
        .collect()[0]
        .asDict()
    )
    run_means = np.array([(10 + 20 + 5 + 99) / 4, (12 + 24 + 7) / 3])
    assert row["mean_runtime_avg_s"] == pytest.approx(run_means.mean())
    assert row["mean_runtime_std_s"] == pytest.approx(run_means.std(ddof=1))
    assert row["mean_runtime_p50_s"] == pytest.approx(np.percentile(run_means, 50))
    assert row["mean_runtime_p99_s"] == pytest.approx(np.percentile(run_means, 99))
    assert row["runs"] == 2

    # Per-query stats: only q1..q3 have exactly 2 samples.
    q_means = np.array([11.0, 22.0, 6.0])
    q_stds = np.array(
        [np.std([10, 12], ddof=1), np.std([20, 24], ddof=1), np.std([5, 7], ddof=1)]
    )
    q_cvs = 100.0 * q_stds / q_means
    assert row["queries"] == 3
    assert row["std_avg_s"] == pytest.approx(q_stds.mean())
    assert row["std_p99_s"] == pytest.approx(np.percentile(q_stds, 99))
    assert row["cv_avg_pct"] == pytest.approx(q_cvs.mean())
    assert row["cv_p50_pct"] == pytest.approx(np.percentile(q_cvs, 50))


def test_compare_config_deltas(spark):
    log = _log_df(spark)
    base = summarize_single_config(log, required_samples=2)
    # Variant = baseline with doubled runtimes: mean doubles (+100%), CV equal.
    variant = summarize_single_config(
        log.withColumn("runtime_s", F.col("runtime_s") * 2), required_samples=2
    )
    row = compare_config_deltas(base, variant).collect()[0].asDict()
    assert row["delta_mean_runtime_pct"] == pytest.approx(100.0)
    assert row["delta_cv_avg_pct"] == pytest.approx(0.0, abs=1e-9)
    assert row["delta_cv_p99_pct"] == pytest.approx(0.0, abs=1e-9)


DURATION_CASES = [
    ("42", 42.0),
    ("1.5s", 1.5),
    ("340ms", 0.34),
    ("17us", 17e-6),
    ("17µs", 17e-6),
    ("8ns", 8e-9),
    ("1.2m", 72.0),
    ("2.5h", 9000.0),
    ("  2.5h ", 9000.0),  # trimmed
    ("-3s", None),  # jq regexes are ^[0-9] anchored
    ("3 s", None),
    ("fast", None),
    ("1.2.3s", None),
    (None, None),
]


def test_duration_to_seconds(spark):
    df = spark.createDataFrame(
        [(s,) for s, _ in DURATION_CASES], "dur string"
    ).withColumn("sec", duration_to_seconds("dur"))
    got = {r["dur"]: r["sec"] for r in df.collect()}
    for s, want in DURATION_CASES:
        if want is None:
            assert got[s] is None, f"{s!r} should not parse"
        else:
            assert got[s] == pytest.approx(want, rel=1e-12), s


def test_load_workload_logs(spark, tmp_path):
    for run in (1, 2):
        rows = [
            {"query_id": f"q{q}", "Runtime (s)": float(q * run), "elapsed_s": q * run}
            for q in (1, 2)
        ]
        rows.append({"query_id": "q3", "Runtime (s)": -1.0, "elapsed_s": -1.0})
        path = tmp_path / f"Workload_log_BASE_{run}.ndjson"
        path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    df = load_workload_logs(spark, str(tmp_path))
    rows = {(r["run"], r["query_id"]): r for r in df.collect()}
    assert rows[("Run 2", "2")]["runtime_s"] == 4.0
    # failure sentinel -1 -> NULL, not dropped
    assert rows[("Run 1", "3")]["runtime_s"] is None
    assert rows[("Run 1", "3")]["elapsed_s"] is None
    assert len(rows) == 6


def test_load_workload_logs_multinumber_ids_stay_distinct(spark, tmp_path):
    """Battery names with more than one number (ssb_q1_1 vs ssb_q2_1)
    must NOT merge into one key — the old trailing-digits int extraction
    collapsed both to 1, silently pooling their statistics."""
    rows = [
        {"query_id": "ssb_q1_1", "Runtime (s)": 1.0, "elapsed_s": 1.0},
        {"query_id": "ssb_q2_1", "Runtime (s)": 2.0, "elapsed_s": 2.0},
        {"query_id": "ssb_q4_3", "Runtime (s)": 3.0, "elapsed_s": 3.0},
        {"query_id": "q96", "Runtime (s)": 4.0, "elapsed_s": 4.0},
        {"query_id": 96, "Runtime (s)": 5.0, "elapsed_s": 5.0},
        {"query_id": "tpcds_q96", "Runtime (s)": 6.0, "elapsed_s": 6.0},
    ]
    path = tmp_path / "Workload_log_BASE_1.ndjson"
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    df = load_workload_logs(spark, str(tmp_path))
    got = sorted(r["query_id"] for r in df.collect())
    # ssb ids stay verbatim+distinct; "q96" and 96 normalize to "96"
    # (reference helpers.py compat); battery names stay verbatim.
    assert got == ["96", "96", "ssb_q1_1", "ssb_q2_1", "ssb_q4_3",
                   "tpcds_q96"]


# ---------------------------------------------------------------------------
# LaTeX row rendering (reference helpers.py:171-195, 230-320)
# ---------------------------------------------------------------------------


def test_table1_latex_row(spark):
    from lakehouse_variance_spark.analytics.latex import table1_latex_row

    summary = summarize_single_config(_log_df(spark), required_samples=2)
    line = table1_latex_row(summary, "AWS", dp=3)
    assert line.startswith("AWS &&& \\hspace{5pt} ")
    assert line.endswith(" \\\\")
    # 8 stat cells -> 7 " & " joins (the platform prefix joins with "&&&")
    assert line.count(" & ") == 7


def test_table2_rows_and_delta_formatting(spark):
    from lakehouse_variance_spark.analytics.latex import (
        table2_baseline_latex_row,
        table2_delta_latex_row,
    )

    base = summarize_single_config(_log_df(spark), required_samples=2)
    # variant = same log with runtimes doubled -> +100% mean runtime,
    # CV stats unchanged (std and mean scale together) -> delta $0$.
    doubled = _log_df(spark).withColumn(
        "runtime_s", F.col("runtime_s") * 2
    )
    variant = summarize_single_config(doubled, required_samples=2)
    deltas = compare_config_deltas(base, variant)

    baseline_line = table2_baseline_latex_row(base)
    assert "(Baseline)" in baseline_line and baseline_line.endswith(" \\\\")

    delta_line = table2_delta_latex_row(deltas, "Warm cache", dp=3)
    assert delta_line.startswith("& \\textbullet Warm cache & ")
    assert "$+~100.000$" in delta_line  # mean runtime doubled
    assert "$0$" in delta_line  # CV unchanged


def test_latex_row_rejects_multirow(spark):
    import pytest as _pytest

    from lakehouse_variance_spark.analytics.latex import table1_latex_row

    two = _log_df(spark).select("run").distinct()
    with _pytest.raises(ValueError):
        table1_latex_row(two, "AWS")


REF_TRACES = "/root/reference/traces/study_1"


@pytest.mark.skipif(
    not os.path.isdir(REF_TRACES),
    reason="reference trace artifacts not present",
)
@pytest.mark.parametrize(
    "cfg_dir",
    ["AWS/SF_100", "GCP/SF_100", "Azure/SF_100", "Self_Hosted/SF_100"],
)
def test_summary_on_reference_real_traces(spark, cfg_dir):
    """Parity on the reference's OWN published workload logs: the engine's
    distributed summary over traces/study_1/<cloud>/SF_100 must equal a
    pandas re-derivation of helpers.py:10-90's semantics (per-run means,
    per-query std under the exactly-required_samples Bessel rule, linear-
    interpolation percentiles) to float precision."""
    import glob
    import json as _json

    import numpy as np
    import pandas as pd

    from lakehouse_variance_spark.analytics.traces import (
        load_workload_logs,
        summarize_single_config,
    )

    path = os.path.join(REF_TRACES, cfg_dir)
    if not glob.glob(os.path.join(path, "Workload_log_BASE_*.ndjson")):
        pytest.skip(f"no logs under {path}")

    got = summarize_single_config(
        load_workload_logs(spark, path)
    ).toPandas().iloc[0]

    frames = []
    for f in sorted(glob.glob(os.path.join(path, "Workload_log_BASE_*.ndjson"))):
        run = f.rsplit("_", 1)[-1].split(".")[0]
        rows = [_json.loads(line) for line in open(f) if line.strip()]
        df = pd.DataFrame(rows)
        df["run"] = f"Run {run}"
        frames.append(df)
    log = pd.concat(frames, ignore_index=True)
    rt = pd.to_numeric(log["Runtime (s)"], errors="coerce")
    log["runtime_s"] = rt.where(rt >= 0)
    sub = log[log["runtime_s"].notna()]

    run_means = sub.groupby("run")["runtime_s"].mean()
    assert got["runs"] == len(run_means)
    np.testing.assert_allclose(got["mean_runtime_avg_s"], run_means.mean(), rtol=1e-9)
    np.testing.assert_allclose(
        got["mean_runtime_std_s"], run_means.std(ddof=1), rtol=1e-9
    )
    np.testing.assert_allclose(
        got["mean_runtime_p50_s"], np.percentile(run_means, 50), rtol=1e-9
    )
    np.testing.assert_allclose(
        got["mean_runtime_p99_s"], np.percentile(run_means, 99), rtol=1e-9
    )

    g = sub.groupby("query_id")["runtime_s"]
    per_q = pd.DataFrame({"q_mean": g.mean(), "q_std": g.std(ddof=1), "n": g.count()})
    per_q = per_q[per_q["n"] == 5]
    per_q["q_cv"] = 100.0 * per_q["q_std"] / per_q["q_mean"]
    assert got["queries"] == len(per_q)
    np.testing.assert_allclose(got["std_avg_s"], per_q["q_std"].mean(), rtol=1e-9)
    np.testing.assert_allclose(
        got["std_p50_s"], np.percentile(per_q["q_std"], 50), rtol=1e-9
    )
    np.testing.assert_allclose(
        got["cv_avg_pct"], per_q["q_cv"].mean(), rtol=1e-9
    )
    np.testing.assert_allclose(
        got["cv_p99_pct"], np.percentile(per_q["q_cv"], 99), rtol=1e-9
    )


REF_STUDY2 = "/root/reference/traces/study_2"


@pytest.mark.skipif(
    not os.path.isdir(REF_STUDY2),
    reason="reference study_2 artifacts not present",
)
def test_summary_on_reference_study2_tagged_logs(spark):
    """study_2's per-config tags (Workload_log_LOAD_<n>.ndjson etc.) load
    via the parameterized tag — artifacts the reference's own helper
    (hardcoded to BASE, helpers.py:93) cannot read — and the summary
    matches the pandas re-derivation."""
    import glob
    import json as _json

    import numpy as np
    import pandas as pd

    from lakehouse_variance_spark.analytics.traces import (
        load_workload_logs,
        summarize_single_config,
    )

    path = os.path.join(REF_STUDY2, "Self_Hosted", "Lower_Load")
    files = sorted(glob.glob(os.path.join(path, "Workload_log_LOAD_*.ndjson")))
    if not files:
        pytest.skip("no LOAD logs present")

    got = summarize_single_config(
        load_workload_logs(spark, path, tag="LOAD")
    ).toPandas().iloc[0]

    frames = []
    for f in files:
        run = f.rsplit("_", 1)[-1].split(".")[0]
        df = pd.DataFrame([_json.loads(l) for l in open(f) if l.strip()])
        df["run"] = f"Run {run}"
        frames.append(df)
    log = pd.concat(frames, ignore_index=True)
    rt = pd.to_numeric(log["Runtime (s)"], errors="coerce")
    sub = log[rt.where(rt >= 0).notna()].assign(runtime_s=rt)

    run_means = sub.groupby("run")["runtime_s"].mean()
    assert got["runs"] == len(run_means) == len(files)
    np.testing.assert_allclose(got["mean_runtime_avg_s"], run_means.mean(), rtol=1e-9)
    g = sub.groupby("query_id")["runtime_s"]
    per_q_std = g.std(ddof=1)[g.count() == 5]
    assert got["queries"] == len(per_q_std)
    np.testing.assert_allclose(got["std_p50_s"], np.percentile(per_q_std, 50), rtol=1e-9)


def test_config_delta_end_to_end_vs_pandas(spark):
    """The Table-2 pipeline (CONFIG_DELTAS.md): baseline SF_1000 vs the
    Lower_Load variant through load->summarize->compare_config_deltas
    matches an independent pandas re-derivation of the delta percents."""
    import glob
    import json as _json

    import numpy as np
    import pandas as pd

    from lakehouse_variance_spark.analytics.traces import (
        compare_config_deltas,
        load_workload_logs,
        summarize_single_config,
    )

    base_dir = os.path.join(REF_TRACES, "Self_Hosted", "SF_1000")
    var_dir = os.path.join(REF_STUDY2, "Self_Hosted", "Lower_Load")
    if not (
        glob.glob(os.path.join(base_dir, "Workload_log_BASE_*"))
        and glob.glob(os.path.join(var_dir, "Workload_log_LOAD_*"))
    ):
        pytest.skip("study logs absent")

    base = summarize_single_config(load_workload_logs(spark, base_dir))
    variant = summarize_single_config(
        load_workload_logs(spark, var_dir, tag="LOAD")
    )
    got = compare_config_deltas(base, variant).toPandas().iloc[0]

    def mean_runtime(path, pat):
        frames = []
        for f in sorted(glob.glob(os.path.join(path, pat))):
            df = pd.DataFrame(
                [_json.loads(l) for l in open(f) if l.strip()]
            )
            df["run"] = f
            frames.append(df)
        log = pd.concat(frames, ignore_index=True)
        rt = pd.to_numeric(log["Runtime (s)"], errors="coerce")
        sub = log[rt.where(rt >= 0).notna()].assign(runtime_s=rt)
        return sub.groupby("run")["runtime_s"].mean().mean()

    b = mean_runtime(base_dir, "Workload_log_BASE_*.ndjson")
    v = mean_runtime(var_dir, "Workload_log_LOAD_*.ndjson")
    np.testing.assert_allclose(
        got["delta_mean_runtime_pct"], 100.0 * (v - b) / b, rtol=1e-9
    )
