"""Terminal report rendering — the Spark-side answer to the
reference's charting demos (demo/Plot.hs, demo/Plot2.hs render query
results with Chart; Exploration.hs:129 showFrame pretty-prints rows).

A distributed engine must keep the DIVISION OF LABOR straight: every
reduction (binning, counting, topping-k) runs as a DataFrame plan on
the cluster; only the final aggregated relation — bins, groups, day
points, never the fact table — crosses to the driver for layout. Each
renderer here therefore either takes an already-tiny DataFrame or
builds the reduction itself, and caps driver transfer with an explicit
row limit instead of trusting the caller.

Output is plain text (bars, sparklines, aligned tables): dependency-
free, diffable in tests, and pasteable into logs/PR descriptions —
the moral equivalent of the reference's PNG charts for an engine whose
"terminal" is a driver log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BAR = "█"
_TICKS = "▁▂▃▄▅▆▇█"
MAX_REPORT_ROWS = 1000  # driver-side safety cap for any renderer


def _check_small(rows: list, what: str) -> list:
    if len(rows) > MAX_REPORT_ROWS:
        raise ValueError(
            f"{what} would render {len(rows)} rows; aggregate below "
            f"{MAX_REPORT_ROWS} first — report renderers are for "
            "reduced relations, not fact tables"
        )
    return rows


def show_frame(df: DataFrame, n: int = 20) -> str:
    """Aligned text table of the first ``n`` rows (showFrame parity).

    Uses take(n) under the hood — a LIMIT in the plan, so only n rows
    ever reach the driver regardless of table size.
    """
    return df._show_string(n, 0, False)


def bar_chart(
    df: DataFrame,
    label_col: str,
    value_col: str,
    width: int = 40,
    limit: int = 50,
) -> str:
    """Horizontal bar chart of an aggregated (label, value) relation.

    The input must already be reduced (a groupBy result, a share
    table); the renderer orders by value descending, takes ``limit``
    rows via a plan-side LIMIT, and scales bars to the max.
    """
    rows = df.select(label_col, value_col).orderBy(
        F.desc(value_col), F.asc(label_col)
    ).take(limit)
    rows = _check_small(rows, "bar_chart")
    if not rows:
        return "(empty)"
    top = max(float(r[1]) for r in rows)
    top = top if top > 0 else 1.0
    label_w = max(len(str(r[0])) for r in rows)
    out = []
    for label, value in rows:
        filled = int(round(width * float(value) / top))
        out.append(
            f"{str(label):<{label_w}}  {_BAR * filled:<{width}}  {value}"
        )
    return "\n".join(out)


def histogram(
    df: DataFrame, col: str, bins: int = 20, width: int = 40
) -> str:
    """Equi-width histogram of a numeric column, rendered as bars.

    The binning is a DISTRIBUTED plan: one min/max aggregate, then a
    width_bucket-style groupBy — the driver sees exactly ``bins``
    rows. Mirrors the binning idiom of q_histogram.
    """
    lo_hi = df.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).collect()[0]
    lo, hi = lo_hi["lo"], lo_hi["hi"]
    if lo is None:
        return "(empty)"
    span = (hi - lo) or 1.0
    bin_id = F.least(
        F.lit(bins - 1),
        F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(span) * bins),
    ).cast("int")
    counts = {
        r["bin"]: r["cnt"]
        for r in df.groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    top = max(counts.values()) if counts else 1
    out = []
    for b in range(bins):
        c = counts.get(b, 0)
        edge = lo + span * b / bins
        filled = int(round(width * c / top))
        out.append(f"{edge:>14.4f}  {_BAR * filled:<{width}}  {c}")
    return "\n".join(out)


def sparkline(
    df: DataFrame, order_col: str, value_col: str, limit: int = 200
) -> str:
    """One-line unicode trend of an ordered (x, y) relation — the
    at-a-glance version of the reference's line charts. Input must be
    pre-aggregated (daily revenue, per-bucket counts)."""
    rows = df.select(order_col, value_col).orderBy(order_col).take(limit + 1)
    rows = _check_small(rows, "sparkline")
    if len(rows) > limit:
        raise ValueError(
            f"sparkline input exceeds {limit} points; aggregate coarser"
        )
    vals = [float(r[1]) for r in rows]
    if not vals:
        return "(empty)"
    lo, hi = min(vals), max(vals)
    span = (hi - lo) or 1.0
    return "".join(
        _TICKS[min(len(_TICKS) - 1, int((v - lo) / span * len(_TICKS)))]
        for v in vals
    )


def report(sections: dict[str, str]) -> str:
    """Join titled sections into one pasteable report block."""
    parts = []
    for title, body in sections.items():
        parts.append(title)
        parts.append("-" * len(title))
        parts.append(body)
        parts.append("")
    return "\n".join(parts).rstrip() + "\n"


def heatmap(
    df: DataFrame,
    row_col: str,
    col_col: str,
    value_col: str,
    limit: int = 400,
) -> str:
    """Text heatmap of an aggregated (row, col, value) grid — the
    calendar/activity-matrix renderer (pairs with q_calendar_heatmap).
    Input must already be reduced; cells shade by value quartile."""
    shades = " ░▒▓█"
    rows = df.select(row_col, col_col, value_col).take(limit + 1)
    rows = _check_small(rows, "heatmap")
    if len(rows) > limit:
        raise ValueError(f"heatmap input exceeds {limit} cells; aggregate coarser")
    if not rows:
        return "(empty)"
    vals = sorted(float(r[2]) for r in rows)
    lo, hi = vals[0], vals[-1]
    span = (hi - lo) or 1.0
    grid: dict = {}
    for r, c, v in rows:
        grid[(r, c)] = float(v)
    rkeys = sorted({r for r, _ in grid})
    ckeys = sorted({c for _, c in grid})
    label_w = max(len(str(r)) for r in rkeys)
    out = []
    for r in rkeys:
        cells = "".join(
            shades[
                min(
                    len(shades) - 1,
                    1 + int((grid[(r, c)] - lo) / span * (len(shades) - 2)),
                )
            ]
            if (r, c) in grid
            else " "
            for c in ckeys
        )
        out.append(f"{str(r):<{label_w}}  {cells}")
    return "\n".join(out)
