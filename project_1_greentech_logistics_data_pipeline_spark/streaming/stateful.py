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


# ---------------------------------------------------------------------------
# Streaming TWAP (time-weighted average) with carry-over state
# ---------------------------------------------------------------------------

TWAP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("acc_weighted_us", T.DoubleType()),
        T.StructField("acc_dur_us", T.LongType()),
        T.StructField("running_twap", T.DoubleType()),
    ]
)

TWAP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
        T.StructField("acc_weighted_us", T.DoubleType()),
        T.StructField("acc_dur_us", T.LongType()),
    ]
)


def _twap_update(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: "GroupState"
) -> "Iterator[pd.DataFrame]":
    (event_type,) = key
    if state.exists:
        last_ts, last_value, acc_w, acc_d = state.get
    else:
        last_ts, last_value, acc_w, acc_d = None, None, 0.0, 0
    # A group's micro-batch rows arrive as MULTIPLE Arrow chunks in
    # arbitrary order (~10k rows/chunk); sorting each chunk independently
    # would fold out-of-order timestamps into negative segment durations.
    # Concatenate the whole group's batch, then sort once.
    chunks = list(pdfs)
    batch = pd.concat(chunks) if chunks else pd.DataFrame()
    if len(batch):
        batch = batch.sort_values(["ts_us", "event_id"])
        for ts_us, value in zip(batch["ts_us"], batch["value"]):
            ts_us = int(ts_us)
            if last_ts is not None and ts_us < last_ts:
                # Late data older than checkpointed state (no watermark
                # guards this path): a negative-duration segment would
                # corrupt the accumulators — drop the stale row instead.
                continue
            if last_ts is not None:
                dur = ts_us - last_ts
                acc_w += last_value * dur
                acc_d += dur
            last_ts, last_value = ts_us, float(value)
    state.update((last_ts, last_value, acc_w, acc_d))
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "acc_weighted_us": [acc_w],
            "acc_dur_us": [acc_d],
            "running_twap": [acc_w / acc_d if acc_d else None],
        }
    )


def track_time_weighted_average(events: DataFrame) -> DataFrame:
    """Streaming twin of q138 (batch TWAP): the cross-micro-batch segment
    (a reading 'holds' until the NEXT one, which may arrive in a later
    batch) is exactly the part batch windows can't see incrementally —
    the per-key (last_ts, last_value) carry-over lives in the state
    store. Input: streaming (event_type, ts_us, event_id, value); output
    per key per micro-batch: running weighted sums + TWAP. State is 4
    scalars per key, checkpointed; update mode."""
    return events.groupBy("event_type").applyInPandasWithState(
        _twap_update,
        outputStructType=TWAP_OUTPUT_SCHEMA,
        stateStructType=TWAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
