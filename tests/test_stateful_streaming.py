"""applyInPandasWithState: state must accumulate across micro-batches and
match an order-aware pure-Python oracle.
"""

from __future__ import annotations

import json

from project_1_greentech_logistics_data_pipeline_spark.streaming.stateful import (
    track_anomaly_streaks,
)


def _mk_events(specs):
    """specs: list of (truck, ts_suffix, is_anomaly)."""
    return [
        {"truck_id": t, "timestamp": f"2026-01-01T00:{i:02d}:00", "is_anomaly": a}
        for i, (t, a) in enumerate(specs)
    ]


def test_anomaly_streaks_across_batches(spark, tmp_path):
    # batch files processed one per trigger (maxFilesPerTrigger=1) so state
    # must carry across micro-batches: T1 has a streak of 3 spanning files
    f1 = _mk_events([("T1", False), ("T1", True), ("T1", True), ("T2", False)])
    f2 = _mk_events([("T1", True), ("T1", False), ("T2", True), ("T2", False)])
    d = tmp_path / "in"
    d.mkdir()
    # the file source orders by MODIFICATION TIME -> pin distinct mtimes
    import os
    import time

    (d / "a_batch1.json").write_text("\n".join(json.dumps(r) for r in f1))
    (d / "b_batch2.json").write_text("\n".join(json.dumps(r) for r in f2))
    now = time.time()
    os.utime(d / "a_batch1.json", (now - 60, now - 60))
    os.utime(d / "b_batch2.json", (now, now))

    stream = (
        spark.readStream.schema("truck_id string, timestamp string, is_anomaly boolean")
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    q = (
        track_anomaly_streaks(stream)
        .writeStream.format("memory")
        .queryName("streaks")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT * FROM streaks ORDER BY total_events"
    ).collect()
    # last emitted row per truck has the final totals
    final = {}
    for r in rows:
        final[r["truck_id"]] = r
    t1, t2 = final["T1"], final["T2"]
    assert t1["total_events"] == 5
    assert t1["total_anomalies"] == 3
    assert t1["longest_streak"] == 3  # spans the file boundary -> state worked
    assert t2["total_events"] == 3
    assert t2["total_anomalies"] == 1
    assert t2["longest_streak"] == 1


def test_fleet_status_transform_with_state(spark, tmp_path):
    """transformWithStateInPandas: typed ValueState + MapState accumulate
    across micro-batches in the RocksDB state store.

    Requires google.protobuf (the TWS state-protocol dependency), which this
    build environment lacks — the operator is still exercised for plan
    construction below; execution is skipped when protobuf is missing.
    """
    import pytest

    from project_1_greentech_logistics_data_pipeline_spark.streaming.stateful import (
        track_fleet_status,
    )

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        # still verify the operator builds a valid streaming plan
        stream = (
            spark.readStream.schema(
                "truck_id string, delivery_status string, value double"
            )
            .json(str(tmp_path))
        )
        df = track_fleet_status(stream)
        assert df.isStreaming
        assert set(df.columns) == {
            "truck_id",
            "total_events",
            "total_value",
            "status_histogram",
        }
        pytest.skip("google.protobuf not installed (transformWithState protocol)")

    f1 = [
        {"truck_id": "T1", "delivery_status": "in_transit", "value": 1.0},
        {"truck_id": "T1", "delivery_status": "delivered", "value": 2.0},
        {"truck_id": "T2", "delivery_status": "delayed", "value": 5.0},
    ]
    f2 = [
        {"truck_id": "T1", "delivery_status": "in_transit", "value": 3.0},
        {"truck_id": "T2", "delivery_status": "delayed", "value": 7.0},
    ]
    d = tmp_path / "in"
    d.mkdir()
    import os
    import time

    (d / "a_b1.json").write_text("\n".join(json.dumps(r) for r in f1))
    (d / "b_b2.json").write_text("\n".join(json.dumps(r) for r in f2))
    now = time.time()
    os.utime(d / "a_b1.json", (now - 60, now - 60))
    os.utime(d / "b_b2.json", (now, now))

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(
                "truck_id string, delivery_status string, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .json(str(d))
        )
        q = (
            track_fleet_status(stream)
            .writeStream.format("memory")
            .queryName("fleet")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    rows = spark.sql("SELECT * FROM fleet ORDER BY total_events").collect()
    final = {r["truck_id"]: r for r in rows}
    t1, t2 = final["T1"], final["T2"]
    assert t1["total_events"] == 3
    assert t1["total_value"] == 6.0
    assert json.loads(t1["status_histogram"]) == {"delivered": 1, "in_transit": 2}
    assert t2["total_events"] == 2
    assert t2["total_value"] == 12.0
    assert json.loads(t2["status_histogram"]) == {"delayed": 2}


def test_streaming_twap_matches_batch_twin(spark, tmp_path):
    """Streaming TWAP with state carry-over must equal the batch TWAP
    (q138 formula) over the same closed input, even though the
    cross-batch segment spans a micro-batch boundary."""
    import os
    import time

    from project_1_greentech_logistics_data_pipeline_spark.streaming.stateful import (
        track_time_weighted_average,
    )

    # two types; B's 10->30 segment spans the file boundary
    f1 = [
        {"event_type": "A", "ts_us": 0, "event_id": 1, "value": 10.0},
        {"event_type": "A", "ts_us": 1_000_000, "event_id": 2, "value": 20.0},
        {"event_type": "B", "ts_us": 0, "event_id": 3, "value": 5.0},
    ]
    f2 = [
        {"event_type": "A", "ts_us": 3_000_000, "event_id": 4, "value": 40.0},
        {"event_type": "B", "ts_us": 4_000_000, "event_id": 5, "value": 15.0},
    ]
    d = tmp_path / "in"
    d.mkdir()
    (d / "a1.json").write_text("\n".join(json.dumps(r) for r in f1))
    (d / "b2.json").write_text("\n".join(json.dumps(r) for r in f2))
    now = time.time()
    os.utime(d / "a1.json", (now - 60, now - 60))
    os.utime(d / "b2.json", (now, now))

    stream = (
        spark.readStream.schema(
            "event_type string, ts_us long, event_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    q = (
        track_time_weighted_average(stream)
        .writeStream.format("memory")
        .queryName("twap")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM twap ORDER BY acc_dur_us").collect()
    final = {r.event_type: r for r in rows}
    # batch-twin expectations: A: 10*1s + 20*2s over 3s; B: 5*4s over 4s
    assert final["A"].acc_dur_us == 3_000_000
    assert abs(final["A"].running_twap - (10 * 1 + 20 * 2) / 3) < 1e-9
    assert final["B"].acc_dur_us == 4_000_000
    assert abs(final["B"].running_twap - 5.0) < 1e-9


class _FakeState:
    """Minimal GroupState stand-in for unit-testing update functions."""

    def __init__(self, value=None):
        self._value = value

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v


def test_twap_update_folds_across_unordered_arrow_chunks():
    """applyInPandasWithState delivers a group's micro-batch as MULTIPLE
    Arrow chunks in arbitrary order. The fold must sort the concatenated
    batch once — sorting chunks independently yields negative segment
    durations when a later chunk holds earlier timestamps (ADVICE r2)."""
    import pandas as pd

    from project_1_greentech_logistics_data_pipeline_spark.streaming.stateful import (
        _twap_update,
    )

    # chunk1 has the LATER rows, chunk2 the earlier ones
    c1 = pd.DataFrame({"ts_us": [3_000_000, 4_000_000], "event_id": [3, 4],
                       "value": [30.0, 40.0]})
    c2 = pd.DataFrame({"ts_us": [1_000_000, 2_000_000], "event_id": [1, 2],
                       "value": [10.0, 20.0]})
    state = _FakeState()
    (out,) = list(_twap_update(("A",), iter([c1, c2]), state))
    # correct fold over ts order 1,2,3,4: 10*1s + 20*1s + 30*1s over 3s
    assert out["acc_dur_us"][0] == 3_000_000
    assert abs(out["running_twap"][0] - (10 + 20 + 30) / 3) < 1e-9
    assert state.get == (4_000_000, 40.0, 60_000_000.0, 3_000_000)


def test_twap_update_drops_rows_older_than_checkpointed_state():
    """No watermark guards this operator: a row older than the
    checkpointed last_ts must be dropped, not folded as a negative
    segment."""
    import pandas as pd

    from project_1_greentech_logistics_data_pipeline_spark.streaming.stateful import (
        _twap_update,
    )

    state = _FakeState((5_000_000, 50.0, 0.0, 0))
    late = pd.DataFrame({"ts_us": [1_000_000, 6_000_000], "event_id": [1, 2],
                         "value": [999.0, 60.0]})
    (out,) = list(_twap_update(("A",), iter([late]), state))
    # only the 5s->6s segment counts; the 1s row is stale and skipped
    assert out["acc_dur_us"][0] == 1_000_000
    assert abs(out["running_twap"][0] - 50.0) < 1e-9
