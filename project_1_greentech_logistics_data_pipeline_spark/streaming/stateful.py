"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.8 / north-star "custom stateful operators").

track_anomaly_streaks: per-truck running anomaly accounting across
micro-batches — cumulative anomaly count and the longest consecutive-anomaly
streak, state kept in the streaming state store (checkpointed, survives
restarts). This is the class of operator that has no batch-SQL equivalent:
the result depends on arrival order across micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("truck_id", T.StringType()),
        T.StructField("batch_events", T.LongType()),
        T.StructField("batch_anomalies", T.LongType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("total_anomalies", T.LongType()),
        T.StructField("longest_streak", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_events", T.LongType()),
        T.StructField("total_anomalies", T.LongType()),
        T.StructField("longest_streak", T.LongType()),
        T.StructField("current_streak", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (truck_id,) = key
    if state.exists:
        total_events, total_anomalies, longest, current = state.get
    else:
        total_events = total_anomalies = longest = current = 0

    batch_events = 0
    batch_anomalies = 0
    for pdf in pdfs:
        # rows arrive ordered within the batch by the caller's sort column
        pdf = pdf.sort_values("timestamp")
        for is_anom in pdf["is_anomaly"]:
            batch_events += 1
            if bool(is_anom):
                batch_anomalies += 1
                current += 1
                longest = max(longest, current)
            else:
                current = 0

    total_events += batch_events
    total_anomalies += batch_anomalies
    state.update((total_events, total_anomalies, longest, current))
    yield pd.DataFrame(
        {
            "truck_id": [truck_id],
            "batch_events": [batch_events],
            "batch_anomalies": [batch_anomalies],
            "total_events": [total_events],
            "total_anomalies": [total_anomalies],
            "longest_streak": [longest],
        }
    )


def track_anomaly_streaks(validated: DataFrame) -> DataFrame:
    """Input: a STREAMING DataFrame with (truck_id, timestamp, is_anomaly).
    Output: per truck per micro-batch, running totals + longest streak.
    State (4 longs per truck) lives in the state store; update mode."""
    return validated.groupBy("truck_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
