"""Table diff — dataset regression testing.

`table_diff` classifies rows between two snapshots of a keyed table:
added (key only in b), removed (key only in a), changed (key in
both, any non-key column differs). The compare is ONE full-outer
join on the keys with md5 row-hashes computed per side at scan time
— payload columns never cross the shuffle twice, and the hash is
null-safe (null and '' hash differently) so schema-compatible
snapshots diff exactly.

The everyday uses at scale: CI for pipeline changes (diff old/new
output), CDC validation (diff replica vs source export), migration
sign-off. For table-format time travel the snapshots are two
versions of the same table; here they are any two DataFrames.

`schema_diff` (driver-side) reports column-level drift first — a
changed column set makes row diffs meaningless.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(df: DataFrame, exclude: Sequence[str]) -> F.Column:
    cols = [c for c in df.columns if c not in exclude]
    # null-safe: tag each value with its null-ness before hashing so
    # (null, 'x') and ('x', null) cannot collide with ('x', 'x')
    parts = [
        F.concat_ws(
            ":", F.lit(c), F.col(c).isNull().cast("string"),
            F.coalesce(F.col(c).cast("string"), F.lit("")),
        )
        for c in sorted(cols)
    ]
    return F.md5(F.concat_ws("|", *parts))


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """(keys..., change) with change in {'added', 'removed',
    'changed'}; unchanged rows are not emitted."""
    ah = a.select(*keys, _row_hash(a, keys).alias("__ha"))
    bh = b.select(*keys, _row_hash(b, keys).alias("__hb"))
    joined = ah.join(bh, list(keys), "full_outer")
    change = (
        F.when(F.col("__ha").isNull(), F.lit("added"))
        .when(F.col("__hb").isNull(), F.lit("removed"))
        .when(F.col("__ha") != F.col("__hb"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )


def schema_diff(a: DataFrame, b: DataFrame) -> dict[str, list[str]]:
    """Column-level drift: {'added': [...], 'removed': [...],
    'retyped': [...]} — check BEFORE row-diffing."""
    at = {f.name: f.dataType.simpleString() for f in a.schema}
    bt = {f.name: f.dataType.simpleString() for f in b.schema}
    return {
        "added": sorted(set(bt) - set(at)),
        "removed": sorted(set(at) - set(bt)),
        "retyped": sorted(c for c in set(at) & set(bt) if at[c] != bt[c]),
    }
