"""Streaming state-store observability.

The reference's only observability surface is the batch lineage table it
appends per run (`Glue/Glue_job.py:131-142` — layer/record_count/run ts).
A streaming engine needs the same accounting for its STATE: every stateful
operator (windowed agg, session window, stream-stream join, dedup,
applyInPandasWithState) carries a state store whose row count and memory
footprint are the capacity-planning signal at scale — state that grows
without bound is the streaming equivalent of an unbounded shuffle.

Spark already measures all of it per micro-batch (`StreamingQueryProgress.
stateOperators`); this module turns those JSON blobs into typed DataFrames
so they can be stored, joined, and alerted on like any other table:

- ``state_operator_metrics(spark, query)``: one row per (batch, state operator)
  from the query's retained progress history — row counts, rows updated /
  removed / dropped-by-watermark, memory used, commit time.
- ``batch_progress(spark, query)``: one row per micro-batch — input/processed
  rows per second, batch duration, watermark.
- ``StateMetricsListener``: a ``StreamingQueryListener`` that accumulates
  the same rows engine-wide (bounded deque) for sessions with many
  queries; ``.frame(spark)`` snapshots it as a DataFrame.

All driver-side data here is bounded: progress objects are a fixed-size
ring (Spark retains ~100; the listener keeps ``maxlen``), each a few KB of
counters — no per-row data ever reaches the driver.
"""

from __future__ import annotations

import json
from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

STATE_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("operator_name", T.StringType()),
        T.StructField("num_rows_total", T.LongType()),
        T.StructField("num_rows_updated", T.LongType()),
        T.StructField("num_rows_removed", T.LongType()),
        T.StructField("num_rows_dropped_by_watermark", T.LongType()),
        T.StructField("memory_used_bytes", T.LongType()),
        T.StructField("commit_time_ms", T.LongType()),
    ]
)

BATCH_PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_second", T.DoubleType()),
        T.StructField("processed_rows_per_second", T.DoubleType()),
        T.StructField("batch_duration_ms", T.LongType()),
        T.StructField("watermark", T.StringType()),
    ]
)


def _progress_dicts(query) -> list[dict]:
    """recentProgress as plain dicts (py4j returns JSON strings)."""
    out = []
    for p in query.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        elif not isinstance(p, dict):
            p = json.loads(p.json)
        out.append(p)
    return out


def _state_rows(progress: dict) -> list[tuple]:
    rows = []
    qid = str(progress.get("id", ""))
    bid = int(progress.get("batchId", -1))
    for op in progress.get("stateOperators", []) or []:
        custom = op.get("customMetrics", {}) or {}
        rows.append(
            (
                qid,
                bid,
                op.get("operatorName"),
                int(op.get("numRowsTotal", 0)),
                int(op.get("numRowsUpdated", 0)),
                int(op.get("numRowsRemoved", 0)),
                int(op.get("numRowsDroppedByWatermark", 0)),
                int(op.get("memoryUsedBytes", 0)),
                int(op.get("commitTimeMs", custom.get("commitTimeMs", 0) or 0)),
            )
        )
    return rows


def _batch_row(progress: dict) -> tuple:
    dur = progress.get("durationMs", {}) or {}
    event_time = progress.get("eventTime", {}) or {}
    return (
        str(progress.get("id", "")),
        int(progress.get("batchId", -1)),
        progress.get("timestamp"),
        int(progress.get("numInputRows", 0)),
        float(progress.get("inputRowsPerSecond", 0.0) or 0.0),
        float(progress.get("processedRowsPerSecond", 0.0) or 0.0),
        int(dur.get("triggerExecution", 0) or 0),
        event_time.get("watermark"),
    )


def state_operator_metrics(spark: SparkSession, query) -> DataFrame:
    """One row per (micro-batch, stateful operator) over the query's
    retained progress history. Empty (not an error) for stateless queries."""
    rows = [r for p in _progress_dicts(query) for r in _state_rows(p)]
    return spark.createDataFrame(rows, STATE_METRICS_SCHEMA)


def batch_progress(spark: SparkSession, query) -> DataFrame:
    """One row per retained micro-batch: throughput + latency + watermark."""
    rows = [_batch_row(p) for p in _progress_dicts(query)]
    return spark.createDataFrame(rows, BATCH_PROGRESS_SCHEMA)


class StateMetricsListener:
    """Engine-wide accumulator of state metrics across ALL streaming queries
    in a session, as a ``StreamingQueryListener``. Driver state is a bounded
    ring of counter tuples (``maxlen`` batches), never row data.

    Usage::

        lis = StateMetricsListener.install(spark)
        ... run streams ...
        lis.frame(spark).groupBy("operator_name").agg(...)
    """

    def __init__(self, maxlen: int = 1024):
        self._rows: deque = deque(maxlen=maxlen)

    # --- StreamingQueryListener interface (duck-typed via subclassing at
    # install time: pyspark's listener base requires the JVM bridge, which
    # we only touch when a session is present) ---
    def _on_progress_json(self, progress: dict) -> None:
        for r in _state_rows(progress):
            self._rows.append(r)

    def frame(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(list(self._rows), STATE_METRICS_SCHEMA)

    @classmethod
    def install(cls, spark: SparkSession, maxlen: int = 1024):
        """Register on the session's stream manager; returns the instance."""
        from pyspark.sql.streaming import StreamingQueryListener

        acc = cls(maxlen=maxlen)

        class _Bridge(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                try:
                    p = event.progress
                    d = json.loads(p.json) if hasattr(p, "json") else dict(p)
                    acc._on_progress_json(d)
                except Exception:
                    # observability must never fail the query
                    pass

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        bridge = _Bridge()
        spark.streams.addListener(bridge)
        acc._bridge = bridge
        return acc

    def uninstall(self, spark: SparkSession) -> None:
        bridge = getattr(self, "_bridge", None)
        if bridge is not None:
            spark.streams.removeListener(bridge)
            self._bridge = None
