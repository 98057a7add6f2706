"""Joins with Frames/pandas USING semantics.

Reference: src/Frames/Joins.hs — ``innerJoin:56``, ``outerJoin:112``,
``rightJoin:169``, ``leftJoin:223`` on 1..n key columns. Key columns
are merged into one (``mergeRec:29``); non-key columns from the
null-extendable side become ``Maybe`` (``justsFromRec:84``) — i.e.
nullable, which Spark gives us for free.

Spark-first: declare the equi-join and let Catalyst pick
broadcast-hash vs sort-merge; callers pass ``broadcast_right=True``
for dimension tables. Full outer joins coalesce the key columns so
the merged-key contract holds on both-null sides.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prep(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | Sequence[tuple[str, str]],
) -> tuple[DataFrame, list[str]]:
    """Normalize ``on`` to shared column names (rename right side)."""
    if on and isinstance(on[0], tuple):
        right = right.withColumnsRenamed({r: l for l, r in on})
        keys = [l for l, _ in on]
    else:
        keys = list(on)
    return right, keys


def join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | Sequence[tuple[str, str]],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """USING-style join; ``on`` is shared names or (left, right) pairs.

    With list-of-names ``on``, Spark already merges key columns
    (single output column per key) — matching Joins.hs mergeRec. For
    full outer, Spark's USING join coalesces keys itself.
    """
    right, keys = _prep(left, right, on)
    if broadcast_right:
        right = F.broadcast(right)
    return left.join(right, keys, how)


def inner_join(left, right, on, broadcast_right=False):
    return join(left, right, on, "inner", broadcast_right)


def left_join(left, right, on, broadcast_right=False):
    return join(left, right, on, "left", broadcast_right)


def right_join(left, right, on, broadcast_right=False):
    return join(left, right, on, "right", broadcast_right)


def outer_join(left, right, on):
    return join(left, right, on, "full")


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    bounded: bool = False,
) -> DataFrame:
    """Fact-to-dimension join with a 100 TB-safe broadcast stance.

    A forced ``F.broadcast()`` hint bypasses Spark's size check: the
    plan attempts the broadcast at ANY size and OOMs rather than
    demoting to a shuffle join. That is fine for relations whose row
    count is bounded by SCHEMA (region=5, nation=25, post-aggregation
    survivor sets, 1-row scalar stats) and fatal for dimensions that
    grow with the corpus (customer/part/supplier under TPC-H
    semantics are ~TBs at the 100 TB target).

    - ``bounded=False`` (default, for SF-scaled dims): NO hint. AQE
      broadcasts when the dim's runtime size fits
      ``spark.sql.autoBroadcastJoinThreshold`` and falls back to a
      shuffle join when it doesn't — same plan as a hint at test SF,
      graceful degradation at cluster SF.
    - ``bounded=True`` (schema-bounded relations only): forced hint,
      saving AQE the size estimation.

    ``on`` is a join Column expression or USING-style name list, as
    in ``DataFrame.join``. Enforced repo-wide by the plan advisor's
    BROADCAST_SCALED rule (plans/advisor.py).
    """
    return fact.join(F.broadcast(dim) if bounded else dim, on, how)


def semi_join(left, right, on):
    """Membership filter — ships only keys, never right payload."""
    right, keys = _prep(left, right, on)
    return left.join(right, keys, "left_semi")


def anti_join(left, right, on):
    right, keys = _prep(left, right, on)
    return left.join(right, keys, "left_anti")
