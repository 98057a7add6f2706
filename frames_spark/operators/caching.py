"""Scoped persist: tie an intermediate cache's lifetime to a result.

Several builders persist an intermediate relation that feeds two or
more legs of the RETURNED lazy DataFrame (one tokenize scan feeding a
model and the scoring pass, one cluster gather feeding membership and
pair expansion). The function cannot unpersist before returning — the
caller has not materialized anything yet — and callers that hold the
result never trigger Spark's own cleanup, so repeated calls in a
long-lived session accumulate cached relations (r7 advice,
pipelines/dsir.py et al.).

``tie_cache`` fixes the lifetime instead of documenting it away: a
``weakref.finalize`` on the RESULT unpersists the intermediate when
the caller drops the result. While the result is live its cache stays
valid (re-running an action on a held result still hits the cache);
once it is garbage-collected the executor storage is released without
any caller discipline. Functions that materialize internally should
keep calling ``unpersist()`` explicitly (the kcenter_select pattern).
"""

from __future__ import annotations

import contextlib
import weakref
from collections.abc import Iterator

from pyspark.sql import DataFrame

__all__ = ["cache_scope", "retie", "tie_cache"]


@contextlib.contextmanager
def cache_scope(*frames: DataFrame) -> Iterator[tuple[DataFrame, ...]]:
    """Persist ``frames`` for the duration of the ``with`` block and
    unpersist DETERMINISTICALLY on exit (success or error).

    This is the documented API whenever every action that reads the
    cached relation happens inside a known scope — iterative drivers
    (pagerank rounds, k-center rounds), fit-then-score builders that
    collect a model eagerly, tests. Unlike ``tie_cache`` the release
    point is explicit in the source, independent of GC timing, so
    plans built after the block NEVER see a stale InMemoryRelation
    substituted for a subtree (the r8 advisor-sweep GC dependence).

    Use ``tie_cache`` only for the genuinely lazy case: the returned
    DataFrame still needs the cache and the caller decides when it
    dies."""
    for df in frames:
        df.persist()
    try:
        yield frames
    finally:
        for df in frames:
            try:
                df.unpersist()
            except Exception:  # session already stopped — nothing to free
                pass


def tie_cache(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist each ``cached`` relation when ``result`` is GC'd.

    CHAINING CAVEAT (r9 advice): the finalizer is tied to THIS
    ``result`` object. A caller that immediately derives from it —
    ``tie_cache(df, c).filter(...).count()`` — drops the only
    reference to ``result`` before the action runs, so the cache can
    be released BEFORE materialization and the action silently
    recomputes ``cached`` (correct, just slow). Hold the returned
    object in a variable for as long as the cache should live, or use
    ``cache_scope`` when the consuming actions happen inside one
    scope."""

    def _release(frames=cached):
        for df in frames:
            try:
                df.unpersist()
            except Exception:  # session already stopped — nothing to free
                pass

    weakref.finalize(result, _release)
    return result


def retie(derived: DataFrame, *inner: DataFrame) -> DataFrame:
    """Transfer cache liveness across a derivation.

    The chaining caveat above is not hypothetical: any call site that
    derives from a tie_cache result and drops the original —
    ``tie_cache_result.withColumnRenamed(...)``, ``p1.union(p2)`` —
    releases the caches the moment the original's refcount hits zero
    (CPython finalizes synchronously), i.e. BEFORE the caller's
    action, and the action silently recomputes every cached stage
    (found r11: q_triplet_mining/q_hard_negatives/q_incremental_dedup
    all materialized with ZERO InMemoryRelation in their executed
    plans). ``retie(derived, inner...)`` keeps each ``inner`` frame
    strongly referenced from ``derived``'s finalizer, so the inner
    finalizers — and with them the caches — live exactly as long as
    the outermost frame. Unpersist on a never-persisted ``inner`` is
    a no-op; the value of the call is the reference chain.
    tests/test_caching.py pins the registered-query class."""
    return tie_cache(derived, *inner)
