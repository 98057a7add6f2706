"""Deterministic synthetic event-stream source (Spark 4 Python
DataSource streaming API).

The local-test / load-test twin of a kafka source: emits the SAME
event schema as the events table, generated from a content-hash of
the event id — fully deterministic, so a streaming pipeline can be
driven end-to-end (and replayed after checkpoint recovery) without
external infrastructure. Offsets are just event-id watermarks:
``initialOffset`` -> {"id": 0}, each ``read`` advances by
``batch_rows``; replaying [start, end) regenerates identical rows,
which is exactly the contract exactly-once sinks need from a source.

This is generation, not IO, so the simple (non-partitioned) stream
reader is the right shape: the driver materializes only one batch of
tuples per trigger; per-partition generation belongs to a full
DataSourceStreamReader if batch sizes ever warrant it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

EVENT_TYPES = ("view", "click", "purchase")


def _h(i: int, salt: str) -> int:
    return int.from_bytes(
        hashlib.md5(f"synth#{salt}#{i}".encode()).digest()[:8], "big"
    )


def synth_event(i: int, n_users: int = 100) -> tuple:
    """Deterministic event i — same tuple every call, every process."""
    ts_us = 1_700_000_000_000_000 + i * 1_000_000  # 1s cadence
    return (
        i,
        ts_us,
        _h(i, "user") % n_users,
        EVENT_TYPES[_h(i, "type") % len(EVENT_TYPES)],
        round((_h(i, "value") % 100_000) / 100.0, 2),
        '{"k": %d}' % (_h(i, "k") % 100),
    )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", "100"))
        self.n_users = int(options.get("n_users", "100"))
        self.max_rows = int(options.get("max_rows", "0"))  # 0 = unbounded

    def initialOffset(self) -> dict:
        return {"id": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["id"]
        hi = lo + self.batch_rows
        if self.max_rows:
            hi = min(hi, self.max_rows)
        # list ITERATOR, not a generator: the runner both next()s the
        # handle (empty-batch detection) and pickles it (prefetch
        # cache) — list iterators satisfy both, generators neither
        rows = [synth_event(i, self.n_users) for i in range(lo, hi)]
        return iter(rows), {"id": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # checkpoint replay: regenerate [start, end) identically
        return iter(
            [synth_event(i, self.n_users) for i in range(start["id"], end["id"])]
        )


class SyntheticEventsDataSource(DataSource):
    """spark.readStream.format("synthetic_events") — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self):
        return T.StructType(
            [
                T.StructField("event_id", T.LongType(), False),
                T.StructField("ts_us", T.LongType(), False),
                T.StructField("user_id", T.LongType(), False),
                T.StructField("event_type", T.StringType(), False),
                T.StructField("value", T.DoubleType(), False),
                T.StructField("props", T.StringType(), False),
            ]
        )

    def simpleStreamReader(self, schema: T.StructType):
        return SyntheticEventsStreamReader(self.options)
