"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.9 net-new surface; the brief's "custom stateful operators"
slot).

``running_user_stats`` maintains per-user state across micro-batches:
cumulative event count, cumulative value sum, and last-seen timestamp.
Unlike windowed aggregation this state never expires on its own — the
operator demonstrates arbitrary user-managed state (the GroupState API),
which is what session-izers, CDC mergers, and online feature stores
build on. State is one tiny tuple per key: memory is O(active users).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            batch_max = pdf["ts"].max()
            last_us = max(last_us, int(batch_max.value // 1_000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1_000)],
        }
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last-seen) maintained in group state;
    emits the updated row for each user touched by each micro-batch."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
