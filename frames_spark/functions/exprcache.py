"""Memoized Column-expression builders (driver-side py4j relief).

Several shared builders (the Gopher Table A1 battery, the langid
stopword fold, the LSH sign arrays) assemble hundreds-to-thousands of
Column nodes in Python loops. Every node is one py4j round-trip
(~0.3-1 ms on a loaded box), so building such an expression costs
whole SECONDS of driver time per query construction — measured r14:
q_gopher_full spent 1.9 s of its 2.3 s build inside
repetition_signals, 9.9k round-trips (guide §1.2: per-task work only
after the algorithm; this is per-QUERY driver work, the same class as
the r11 const_int_matrix fix).

Column objects are immutable, unresolved expression trees: the same
tree can appear in any number of plans, so rebuilding one from
identical inputs is pure overhead. ``memo_col`` caches built
fragments keyed by the builder tag, the canonical string of each
input Column (``str(col)`` — one round-trip, vs thousands to
rebuild), the scalar params, and the identity of the live py4j
gateway: a genuinely new JVM invalidates every cached reference, and
keying on the gateway makes that automatic.

This memoizes plan FRAGMENTS, never data or results: every action
still computes from the parquet inputs.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column

__all__ = ["memo_col"]

_CACHE: dict[tuple, Any] = {}


def _gateway_key() -> int:
    from pyspark import SparkContext

    gw = SparkContext._gateway  # noqa: SLF001 — documented py4j handle
    return id(gw) if gw is not None else 0


def _canon(part: Any) -> Any:
    if isinstance(part, Column):
        return str(part)
    return part


def memo_col(tag: str, key_parts: tuple, build: Callable[[], Any]) -> Any:
    """Return ``build()`` memoized on ``(tag, gateway, *key_parts)``.

    ``key_parts`` may contain Columns (canonicalized via ``str``) and
    hashable scalars. The built value may be a Column or any
    container of Columns (dict/list) — callers must treat it as
    immutable (they already do: Column has no mutating API)."""
    key = (tag, _gateway_key(), *(map(_canon, key_parts)))
    try:
        return _CACHE[key]
    except KeyError:
        val = build()
        _CACHE[key] = val
        return val
