"""Kafka adapter tests without a broker: the value-parsing projection is
exercised on a DataFrame shaped like Kafka's wire schema (the downstream
pipeline itself is covered by the file-source streaming tests).
"""

from __future__ import annotations

import datetime
import json

from project_1_greentech_logistics_data_pipeline_spark import testing
from project_1_greentech_logistics_data_pipeline_spark.sources.kafka import (
    parse_kafka_telemetry,
)


def test_parse_kafka_wire_format(spark):
    events = testing.edge_rows()
    now = datetime.datetime(2026, 1, 1)
    wire = [
        (e["truck_id"], json.dumps(e).encode(), now, 0, i)
        for i, e in enumerate(events)
    ] + [("junk", b"{not json", now, 0, 999)]
    raw = spark.createDataFrame(
        wire, "key string, value binary, timestamp timestamp, partition int, offset long"
    )
    parsed = parse_kafka_telemetry(raw)
    rows = parsed.collect()
    assert len(rows) == len(events) + 1
    by_offset = {r["_kafka_offset"]: r for r in rows}
    assert by_offset[999]["_corrupt_record"] == "{not json"
    assert by_offset[999]["truck_id"] is None
    assert by_offset[0]["truck_id"] == "TRUCK_001"
    assert by_offset[0]["_corrupt_record"] is None
    # kafka metadata columns survive for offset-based audits
    assert {"_kafka_timestamp", "_kafka_partition", "_kafka_offset"} <= set(parsed.columns)
