"""Report renderers (frames_spark/report.py): plot-demo parity.

The contract under test: reductions happen in the PLAN (the driver
only ever sees the aggregated relation), layout is deterministic
text, and fact-scale inputs are refused instead of collected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_spark import report


def test_show_frame_is_aligned_table(spark):
    df = spark.createDataFrame(
        [("a", 1), ("bb", 22)], ["name", "n"]
    )
    out = report.show_frame(df)
    assert "name" in out and "bb" in out
    # the grid renders with column separators and a header rule
    assert out.count("+") >= 4 and "|" in out


def test_bar_chart_scales_and_orders(spark):
    df = spark.createDataFrame(
        [("x", 10), ("y", 40), ("z", 20)], ["k", "v"]
    )
    out = report.bar_chart(df, "k", "v", width=10)
    lines = out.splitlines()
    # ordered by value descending
    assert [ln[0] for ln in lines] == ["y", "z", "x"]
    # max value fills the width, others proportional
    assert lines[0].count("█") == 10
    assert lines[1].count("█") == 5
    assert lines[0].rstrip().endswith("40")


def test_histogram_bins_in_plan(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = report.histogram(o, "o_totalprice", bins=10)
    lines = out.splitlines()
    assert len(lines) == 10
    # total count across bins equals the table row count
    total = sum(int(ln.rsplit(None, 1)[-1]) for ln in lines)
    assert total == o.count()


def test_sparkline_trend(spark):
    df = spark.createDataFrame(
        [(i, float(i * i)) for i in range(9)], ["x", "y"]
    )
    s = report.sparkline(df, "x", "y")
    assert len(s) == 9
    # monotone input renders a non-decreasing ramp ending at max tick
    assert s[0] == "▁" and s[-1] == "█"
    assert list(s) == sorted(s)


def test_sparkline_refuses_fact_scale(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(ValueError, match="aggregate coarser"):
        report.sparkline(li, "l_orderkey", "l_quantity", limit=50)


def test_report_sections_compose(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    out = report.report(
        {"Counts": report.bar_chart(df, "k", "v", width=4)}
    )
    assert out.startswith("Counts\n------\n")


def test_daily_revenue_report_end_to_end(spark, sf_dir):
    """The Plot.hs use case: chart a query result. The day-grain
    reduction is a plan; only ~2400 day rows reach the renderer."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.sum("o_totalprice").alias("rev"))
    s = report.sparkline(monthly, "m", "rev")
    assert 12 <= len(s) <= 200
    assert set(s) <= set("▁▂▃▄▅▆▇█")


def test_heatmap_renders_grid(spark, sf_dir):
    from frames_spark.queries import QUERIES

    grid = QUERIES["q_calendar_heatmap"](spark, sf_dir)
    out = report.heatmap(grid, "week_idx", "dow", "n_events")
    lines = out.splitlines()
    assert len(lines) == grid.select("week_idx").distinct().count()
    assert all(set(ln.split(None, 1)[1]) <= set(" ░▒▓█") for ln in lines if " " in ln)


def test_heatmap_refuses_fact_scale(spark, sf_dir):
    import pytest as _pytest

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with _pytest.raises(ValueError, match="aggregate coarser"):
        report.heatmap(li, "l_orderkey", "l_linenumber", "l_quantity", limit=50)
