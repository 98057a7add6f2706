"""Mergeable distinct-count sketches (HyperLogLog++).

THE 100 TB distinct-counting pattern: you never re-scan history to
answer "distinct users this quarter". Each ingest window materializes
a tiny HLL sketch row (binary column, ~KB); any time range is
answered by UNIONING the stored sketches — mergeability is the whole
point, and it is exactly what `approx_count_distinct` (a one-shot
scalar) cannot do. Spark 4 exposes the Datasketches HLL family:
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``.

Pairs with the rollup sink (sources/sink.py): append one sketch row
per ingest batch, merge O(windows) rows at read — never O(events).

Sketch bytes are engine-specific, so registered queries over these
are rows-only; exactness bounds are pinned by tests
(tests/test_sketches.py) against exact distinct counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_parts(
    df: DataFrame,
    part_cols: Sequence[str],
    key_col: str,
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch row per partition value — the storable form.
    lgk=12 -> ~2.5 KB per sketch, ~1.6% relative standard error."""
    return df.groupBy(*part_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias(sketch_col)
    )


def merge_sketches(
    parts: DataFrame,
    group_cols: Sequence[str] = (),
    sketch_col: str = "sketch",
    estimate_col: str = "n_distinct_est",
) -> DataFrame:
    """Union stored sketches (optionally re-grouped coarser) and
    estimate. Input is the tiny parts table, never the raw events."""
    grouped = (
        parts.groupBy(*group_cols) if group_cols else parts.groupBy()
    )
    merged = grouped.agg(F.hll_union_agg(F.col(sketch_col)).alias(sketch_col))
    return merged.select(
        *group_cols,
        F.hll_sketch_estimate(F.col(sketch_col)).alias(estimate_col),
    )
