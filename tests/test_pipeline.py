"""Golden + property tests for the reference-parity telemetry pipeline.

The expected values come from a pure-Python oracle (testing.classify) over a
deterministic fixture — the same strategy the reference uses implicitly with
its producer-side fault injection (Producer.py:72-88), but reproducible.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from project_1_greentech_logistics_data_pipeline_spark import testing
from project_1_greentech_logistics_data_pipeline_spark.pipeline import (
    apply_gate_policy,
    normalize,
    quality_gate,
    run_batch,
    split,
    validate,
    warehouse_projection,
)
from project_1_greentech_logistics_data_pipeline_spark.sources.readers import (
    read_raw_telemetry,
)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    expected = testing.write_raw_batches(d, n_events=200, n_files=4, seed=42)
    return str(d), expected


@pytest.fixture(scope="module")
def validated(spark, raw_dir):
    d, _ = raw_dir
    return validate(normalize(read_raw_telemetry(spark, d))).cache()


def test_parse_counts(spark, raw_dir, validated):
    d, exp = raw_dir
    # corrupt line yields exactly one all-NULL row with _corrupt_record set
    n_corrupt = validated.filter(F.col("_corrupt_record").isNotNull()).count()
    assert n_corrupt == exp["n_corrupt_lines"]
    assert validated.count() == exp["n_events"] + exp["n_corrupt_lines"]


def test_split_is_true_partition(spark, raw_dir, validated):
    """Correction 1: curated + rejected == input, even for 3VL-NULL rows the
    reference silently drops (SURVEY App. A.3)."""
    d, exp = raw_dir
    curated, rejected = split(validated)
    n_cur, n_rej = curated.count(), rejected.count()
    assert n_cur == exp["curated"]
    assert n_rej == exp["rejected"] + exp["n_corrupt_lines"]
    assert n_cur + n_rej == validated.count()


def test_rejection_reasons_populated(spark, raw_dir, validated):
    """Correction 2: reasons are non-null and correct per row (the
    reference's array_remove version is always NULL, SURVEY App. A.4)."""
    d, exp = raw_dir
    _, rejected = split(validated)
    rej = rejected.filter(F.col("_corrupt_record").isNull())
    assert rej.filter(F.col("rejection_reasons").isNull()).count() == 0
    assert rej.filter(F.size("rejection_reasons") == 0).count() == 0
    # per-reason histogram matches the pure-Python oracle
    hist = dict(
        rej.select(F.explode("rejection_reasons").alias("r"))
        .groupBy("r")
        .count()
        .collect()
    )
    assert hist == exp["reasons"]


def test_edge_rows_routing(spark, tmp_path):
    """FIXTURES.md §A1 edge-row table, row by row."""
    events = testing.edge_rows()
    (tmp_path / "batch.json").write_text(json.dumps(events))
    validated = validate(normalize(read_raw_telemetry(spark, str(tmp_path))))
    rows = {
        r["timestamp"]: r
        for r in validated.select("timestamp", "is_valid", "rejection_reasons").collect()
    }
    expected = {e["timestamp"]: testing.classify(e) for e in events}
    for ts, exp_reasons in expected.items():
        got = rows[ts]
        assert got["is_valid"] == (not exp_reasons), ts
        assert list(got["rejection_reasons"]) == exp_reasons, ts


def test_rejected_keeps_quality_flag(spark, raw_dir, validated):
    """Correction 3: the reference drops data_quality_flag from rejected."""
    _, rejected = split(validated)
    assert "data_quality_flag" in rejected.columns
    vals = {r[0] for r in rejected.select("data_quality_flag").distinct().collect()}
    assert vals == {"REJECTED"}


def test_quality_gate_full_data(spark, raw_dir, validated):
    curated, rejected = split(validated)
    report = quality_gate(curated)
    assert report.success  # curated rows already passed the same rules
    assert report.n_rows == curated.count()
    # gate failure policy: everything re-routes
    bad_report = quality_gate(rejected.drop("rejection_reasons"))
    assert not bad_report.success
    cur2, rej2 = apply_gate_policy(curated, rejected, bad_report)
    assert cur2.count() == 0
    assert rej2.count() == curated.count() + rejected.count()
    ge_failed = rej2.filter(F.col("data_quality_flag") == "REJECTED_GE")
    assert ge_failed.count() == curated.count()


def test_run_batch_end_to_end(spark, raw_dir, tmp_path):
    d, exp = raw_dir
    res = run_batch(spark, d, str(tmp_path / "lake"))
    assert res.curated_count == exp["curated"]
    assert res.rejected_count == exp["rejected"] + exp["n_corrupt_lines"]
    assert res.corrupt_count == exp["n_corrupt_lines"]
    # lake layout: partitioned curated, append rejected, lineage audit
    curated = spark.read.parquet(str(tmp_path / "lake" / "curated"))
    assert curated.count() == exp["curated"]
    assert "processing_date" in curated.columns
    lineage = spark.read.parquet(str(tmp_path / "lake" / "validated"))
    rows = {r["layer"]: r["record_count"] for r in lineage.collect()}
    assert rows["curated"] + rows["rejected"] == rows["raw"]
    # idempotent re-run: curated is overwrite (same count), rejected appends
    res2 = run_batch(spark, d, str(tmp_path / "lake"))
    assert spark.read.parquet(str(tmp_path / "lake" / "curated")).count() == exp["curated"]


def test_warehouse_projection_schema(spark, raw_dir, validated):
    curated, _ = split(validated)
    proj = warehouse_projection(curated)
    assert [f.name for f in proj.schema.fields] == [
        "truck_id", "event_timestamp", "lat", "lon", "fuel_level",
        "temperature", "delivery_status", "processed_at",
        "data_quality_flag", "ge_validation_status",
    ]
    assert proj.filter(F.col("event_timestamp").isNull()).count() == 0
