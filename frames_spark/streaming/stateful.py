"""Custom stateful streaming: applyInPandasWithState operators.

Windowed/session aggregates (streaming/events.py) cover what
Structured Streaming expresses declaratively; anything with custom
per-key state machines needs applyInPandasWithState — Arrow-batched
per-key state with explicit timeout-driven eviction, the PySpark
analog of flatMapGroupsWithState.

``running_user_stats`` keeps one tiny fixed-size state record per
user (count, sum, max ts) and emits the updated running totals each
micro-batch — state size is O(distinct active users), independent of
stream length; with an idle timeout configured, evicted keys bound
even that at 100 TB event volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    pass

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),  # epoch micros
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        ts_us = (pdf["ts"].astype("int64") // 1000).max()
        last_us = max(last_us, int(ts_us))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last event time), one emitted row
    per user per micro-batch that touched that user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4): the successor API to
# applyInPandasWithState — named state variables managed by the
# processor handle, explicit lifecycle (init/handleInputRows/close),
# and (in richer processors) typed timers and multiple state vars.
# Same operator semantics as running_user_stats above, so tests can
# hold both APIs to the same batch oracle.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import surface depends on PySpark build
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningUserStatsProcessor(StatefulProcessor):
        """One ValueState record per user: (n, total, last_ts_us)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            n, total, last_us = (
                self._agg.get() if self._agg.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
                ts_us = (pdf["ts"].astype("int64") // 1000).max()
                last_us = max(last_us, int(ts_us))
            self._agg.update((n, total, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )

        def close(self) -> None:
            pass

    def running_user_stats_tws(events: DataFrame) -> DataFrame:
        """``running_user_stats`` on the transformWithState API."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningUserStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover
    running_user_stats_tws = None  # type: ignore[assignment]


# ---------------------------------------------------------------------------
# First-seen classifier: the streaming twin of q_new_vs_returning.
# ---------------------------------------------------------------------------

FIRST_SEEN_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("day", T.TimestampType()),
        T.StructField("is_new", T.BooleanType()),
    ]
)

FIRST_SEEN_STATE = T.StructType(
    [
        T.StructField("first_day_us", T.LongType()),
        T.StructField("seen_days_us", T.ArrayType(T.LongType())),
    ]
)


def _update_first_seen(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    first_us: int | None = None
    seen: set[int] = set()
    if state.exists:
        first_us, seen_list = state.get
        seen = set(seen_list or [])
    days: set[int] = set()
    for pdf in pdfs:
        day_us = (pdf["ts"].dt.floor("D").astype("int64") // 1000).astype(
            "int64"
        )
        days.update(int(d) for d in day_us)
    fresh = sorted(days - seen)
    if fresh:
        batch_min = fresh[0]
        if first_us is None or batch_min < first_us:
            first_us = batch_min
        state.update((first_us, sorted(seen | days)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(fresh),
                "day": [pd.Timestamp(d, unit="us") for d in fresh],
                "is_new": [d == first_us for d in fresh],
            }
        )


def first_seen_days(events: DataFrame) -> DataFrame:
    """Per (user, day) exactly one emitted row flagging whether that
    day is the user's FIRST ever — the streaming twin of the batch
    q_new_vs_returning split (aggregate is_new counts per day
    downstream; the emitted relation is user-days, already the big
    cardinality drop).

    State per user is (first day, set of seen days): O(active users x
    retention horizon) and exactly-once per user-day under
    redelivery — a redelivered day is in the seen set and emits
    nothing. CONTRACT: each user's first appearance must not arrive
    after a later day was already classified (guaranteed when files
    land in event-time order, the same contract the streaming funnel
    documents); in production an idle timeout evicts cold users.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_first_seen,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=FIRST_SEEN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
