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

import weakref

from pyspark.sql import DataFrame

__all__ = ["tie_cache"]


def tie_cache(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist each ``cached`` relation when ``result`` is GC'd."""

    def _release(frames=cached):
        for df in frames:
            try:
                df.unpersist()
            except Exception:  # session already stopped — nothing to free
                pass

    weakref.finalize(result, _release)
    return result
