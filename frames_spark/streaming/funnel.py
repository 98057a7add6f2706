"""Incremental streaming funnel — a per-key state machine over
``applyInPandasWithState``.

The batch funnel (operators/funnel.py) recomputes stage times from
the full history; this streams the same first-touch semantics
incrementally: per user, state holds (t0, t1, t2) partial stage
times, each micro-batch advances the machine over its events in
event-time order, and a row is emitted exactly once — when the user
first completes the final stage. State is three longs per ACTIVE
user; completed users collapse to a tombstone so re-deliveries don't
re-emit.

Equivalence: the sequential greedy scan (first view; first click
after it; first purchase after that) computes exactly
funnel_stages' min-after-previous fixpoint, proven in
tests/test_streaming_funnel.py against the batch operator.

Caveat (documented, deliberate): events must arrive in event-time
order ACROSS micro-batches per user (within a batch they are
sorted here). Out-of-order arrival needs a watermark-buffered
variant — at that point prefer re-running the batch funnel over the
bronze table; the streaming value is the incremental common case.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step_0_us", T.LongType()),
        T.StructField("step_1_us", T.LongType()),
        T.StructField("step_2_us", T.LongType()),
    ]
)

# t_k = 0 means "stage k not reached"; done = completion emitted
STATE_SCHEMA = T.StructType(
    [
        T.StructField("t0", T.LongType()),
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
        T.StructField("done", T.LongType()),
    ]
)


def _make_update(steps: tuple[str, str, str]):
    s0, s1, s2 = steps

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        t0, t1, t2, done = state.get if state.exists else (0, 0, 0, 0)
        if done:
            return
        for pdf in pdfs:
            pdf = pdf.sort_values("ts", kind="mergesort")
            ts_us = pdf["ts"].astype("int64") // 1000
            for t, typ in zip(ts_us, pdf["event_type"]):
                t = int(t)
                if typ == s0 and t0 == 0:
                    t0 = t
                elif typ == s1 and t0 != 0 and t1 == 0 and t > t0:
                    t1 = t
                elif typ == s2 and t1 != 0 and t2 == 0 and t > t1:
                    t2 = t
                    break
            if t2:
                break
        if t2 and not done:
            state.update((t0, t1, t2, 1))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "step_0_us": [t0],
                    "step_1_us": [t1],
                    "step_2_us": [t2],
                }
            )
        else:
            state.update((t0, t1, t2, 0))

    return update


def streaming_funnel(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """One row per user at the moment their funnel completes."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(steps),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
