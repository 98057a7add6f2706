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


def semi_join(left, right, on):
    """Membership filter — ships only keys, never right payload."""
    right, keys = _prep(left, right, on)
    return left.join(right, keys, "left_semi")


def anti_join(left, right, on):
    right, keys = _prep(left, right, on)
    return left.join(right, keys, "left_anti")
