"""Skew mitigation: salted aggregation and salted join.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime, but two cases still need an explicit rewrite at 100 TB:

- a groupBy where one key holds a large fraction of all rows (AQE
  cannot split a hash-aggregate group): pre-aggregate on
  (key, salt) so the hot key's rows spread over ``salt`` reducers,
  then combine the partials — two small shuffles instead of one
  stalled reducer;
- a join against a dimension with a handful of pathologically hot
  keys where broadcast is impossible: replicate the small side
  ``salt``-fold and scatter the big side, turning one hot partition
  into ``salt`` even ones.

Salt assignment is content-hashed (xxhash64 of the row), so it is
deterministic for a given input — reruns produce identical plans and
results. The salt column never survives into the output.

Reference scope note: Frames executes single-node (no shuffle), so
skew has no analog there; this is part of the engine's scale surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def _salt_col(df: DataFrame, salt: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    salt: int = 16,
) -> DataFrame:
    """Per-key SUM(col) for each value col plus COUNT(*) ``n``,
    computed as partial aggregates over (keys, salt) then combined.

    Equivalent to ``df.groupBy(keys).agg(sum..., count...)`` —
    sum/count are algebraic, so partial+combine is exact. Averages
    are derivable as sum/n by the caller.
    """
    partial = (
        df.withColumn(_SALT, _salt_col(df, salt))
        .groupBy(*keys, _SALT)
        .agg(
            *[F.sum(c).alias(f"_s_{c}") for c in value_cols],
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in value_cols],
        F.sum("_n").alias("n"),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the ``large`` side: the small
    side is replicated ``salt``-fold, the large side scattered by a
    content hash, and the join runs on (key, salt).

    Output columns = large's then small's non-key columns, exactly as
    ``large.join(small, key, how)``. Supports inner and left joins
    (the replicated small side makes right/full semantics ambiguous).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    lhs = large.withColumn(_SALT, _salt_col(large, salt))
    rhs = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lhs.join(rhs, on=[key, _SALT], how=how)
    return out.drop(_SALT)
