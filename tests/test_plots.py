"""Panel-data logic of the plot layer (reference plot.py geometry)."""

from __future__ import annotations

import pytest

from lakehouse_variance_spark.analytics import plots


ROWS = [
    {"scheduler": "fifo", "oracle": False, "carbon_total_gco2": 10.0,
     "overhead_vs_oracle": 0.25},
    {"scheduler": "fifo", "oracle": True, "carbon_total_gco2": 8.0,
     "overhead_vs_oracle": 0.0},
    {"scheduler": "greedy", "oracle": False, "carbon_total_gco2": 6.0,
     "overhead_vs_oracle": 0.2},
    {"scheduler": "greedy", "oracle": True, "carbon_total_gco2": 5.0,
     "overhead_vs_oracle": 0.0},
]


def test_qpp_panel_geometry_and_labels():
    panel = plots.qpp_vs_oracle_panel_data(ROWS)
    bars = panel["bars"]
    # methods ordered FIFO < RF < Oracle within each group, ref order
    greedy = [b for b in bars if b.scheduler == "greedy"]
    assert [b.method for b in greedy] == ["RF", "Oracle"]
    assert greedy[0].x < greedy[1].x
    # adjacent bars sit exactly width+gap apart (plot.py:110)
    assert greedy[1].x - greedy[0].x == pytest.approx(
        plots.BAR_WIDTH + plots.BAR_GAP
    )
    # fifo group: both oracle and predicted rows label as FIFO, one bar
    fifo = [b for b in bars if b.scheduler == "fifo"]
    assert fifo[0].method == "FIFO"
    # value labels are the reference's 2-decimal format
    assert greedy[1].value_label == "5.00"
    # kind change between fifo and greedy groups uses the GROUP gap
    assert panel["ticks"]["greedy"] - panel["ticks"]["fifo"] == pytest.approx(
        plots.GROUP_GAP
    )
    lo, hi = panel["ylim"]
    assert lo < min(b.height for b in bars) <= max(b.height for b in bars) < hi


def test_overhead_panel_annotations():
    out = plots.overhead_panel_data(ROWS)
    assert {(o["scheduler"], o["method"]) for o in out} == {
        ("fifo", "FIFO"), ("greedy", "RF")
    }
    ann = {o["scheduler"]: o["annotation"] for o in out}
    assert ann["fifo"] == "+25.0%" and ann["greedy"] == "+20.0%"


def test_ci_series_ordering_and_truncation():
    prof = [{"slot": 2, "ci": 3.0}, {"slot": 0, "ci": 1.0},
            {"slot": 1, "ci": 2.0}]
    slots, cis = plots.ci_over_slots_series(prof, max_slots=2)
    assert slots == [0, 1] and cis == [1.0, 2.0]


def test_render_raises_cleanly_without_matplotlib():
    try:
        import matplotlib  # noqa: F401
        pytest.skip("matplotlib installed here; render path exercised")
    except ImportError:
        pass
    panel = plots.qpp_vs_oracle_panel_data(ROWS)
    with pytest.raises(ImportError, match="matplotlib is not installed"):
        plots.render_qpp_panel_png(panel, "/tmp/never-written.png")
