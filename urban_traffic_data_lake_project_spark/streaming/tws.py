"""Arbitrary stateful streaming via ``transformWithStateInPandas`` — the
state-v2 API (SURVEY.md §2.9 net-new surface; successor to the
``applyInPandasWithState`` operator in streaming/stateful.py).

Where GroupState hands the user ONE opaque tuple per key, the
StatefulProcessor handle exposes typed composable state primitives
(ValueState / ListState / MapState, optional TTL, timers). The operator
here maintains a BOUNDED per-user replay buffer — the most recent N
events by (ts, event_id) — in a ListState, the canonical online-feature
shape ("stats over the last N interactions") that windowed aggregation
cannot express (the frame is count-bounded, not time-bounded) and plain
running state cannot either (old events must fall out).

State size is O(keys x N x row): bounded by construction, no watermark
needed. Requires the RocksDB state store provider (state v2);
``recent_events_stats`` pins it on the session before building the plan.

DEPENDENCY GATE: the state-v2 Python<->JVM state-server protocol rides on
``google.protobuf``, which is not installed in this container (and the
environment forbids installing packages). Plan CONSTRUCTION works without
it; stream START crashes in the driver-side schema worker. ``is_available()``
reports whether the runtime dependency is importable; the query registry
therefore runs the semantically identical GroupState implementation
(streaming/stateful.py::bounded_recent_stats), and
tests/test_stateful_streaming.py executes this variant whenever protobuf
is present.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

def is_available() -> bool:
    """True when the transformWithState runtime dependency (protobuf)
    is importable — stream start requires it; plan construction does not."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


OUTPUT_SCHEMA = (
    "user_id LONG, n_recent LONG, avg_recent_value DOUBLE, "
    "last_ts TIMESTAMP, span_us LONG"
)

_BUF_SCHEMA = "ts_us LONG, event_id LONG, value DOUBLE"


class RecentEventsProcessor(StatefulProcessor):
    """Keeps the ``keep`` most recent events per key in a ListState and
    emits (count, mean value, last timestamp, time span) over that buffer
    after every micro-batch that touches the key. Recency order is
    (ts, event_id) descending — event_id breaks exact-timestamp ties so
    replays are deterministic."""

    def __init__(self, keep: int = 5):
        self.keep = keep

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.recent = handle.getListState("recent", _BUF_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        buf = list(self.recent.get()) if self.recent.exists() else []
        for pdf in rows:
            for ts, eid, val in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
                buf.append(
                    (int(pd.Timestamp(ts).value // 1_000), int(eid), float(val))
                )
        buf.sort(key=lambda t: (-t[0], -t[1]))
        buf = buf[: self.keep]
        self.recent.put(buf)
        vals = [t[2] for t in buf]
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_recent": [len(buf)],
                "avg_recent_value": [sum(vals) / len(vals) if vals else None],
                "last_ts": [pd.Timestamp(buf[0][0] * 1_000) if buf else None],
                "span_us": [buf[0][0] - buf[-1][0] if buf else None],
            }
        )

    def close(self) -> None:
        pass


def recent_events_stats(stream: DataFrame, keep: int = 5) -> DataFrame:
    """Per-user stats over the ``keep`` most recent events, maintained in
    a ListState replay buffer across micro-batches."""
    stream.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        stream.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RecentEventsProcessor(keep),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
