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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x processor API)
# ---------------------------------------------------------------------------

FLEET_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("truck_id", T.StringType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("status_histogram", T.StringType()),
    ]
)


def track_fleet_status(events: DataFrame) -> DataFrame:
    """Per-truck running totals + delivery-status histogram via Spark 4's
    `transformWithStateInPandas` StatefulProcessor API — the successor to
    applyInPandasWithState with *typed, named* state variables instead of a
    single opaque tuple: a ValueState for the (count, sum) totals and a
    MapState keyed by delivery_status for the histogram. State lives in the
    RocksDB state store (required by transformWithState), so per-key state
    scales beyond executor heap — the 100 TB-stream answer to unbounded key
    cardinality. Input: streaming DataFrame with
    (truck_id string, delivery_status string, value double).

    Emits one row per truck per micro-batch; the histogram is serialized as
    a key-sorted JSON string so output comparison is deterministic.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    totals_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
        ]
    )
    count_schema = T.StructType([T.StructField("c", T.LongType())])
    status_key_schema = T.StructType([T.StructField("status", T.StringType())])

    class FleetStatusProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", totals_schema)
            self._by_status = handle.getMapState(
                "by_status", status_key_schema, count_schema
            )

        def handleInputRows(self, key, rows, timerValues):
            import json as _json

            n, s = (self._totals.get() or (0, 0.0)) if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                for status, cnt in pdf["delivery_status"].value_counts().items():
                    prev = (
                        self._by_status.getValue((status,))[0]
                        if self._by_status.containsKey((status,))
                        else 0
                    )
                    self._by_status.updateValue((status,), (prev + int(cnt),))
            self._totals.update((n, s))
            hist = {
                k[0]: self._by_status.getValue(k)[0] for k in self._by_status.keys()
            }
            yield pd.DataFrame(
                {
                    "truck_id": [key[0]],
                    "total_events": [n],
                    "total_value": [s],
                    "status_histogram": [_json.dumps(dict(sorted(hist.items())))],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.groupBy("truck_id")
        .transformWithStateInPandas(
            statefulProcessor=FleetStatusProcessor(),
            outputStructType=FLEET_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
