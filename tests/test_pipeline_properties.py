"""Property-based tests (hypothesis): pipeline invariants hold for arbitrary
input shapes, not just the seeded fixture.

Invariants (SURVEY §5):
- conservation: curated + rejected == parsed input, for every null pattern;
- reasons ⊆ declared reason set; reasons nonempty ⇔ rejected;
- routing agrees with the pure-Python oracle (testing.classify).
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from project_1_greentech_logistics_data_pipeline_spark import testing
from project_1_greentech_logistics_data_pipeline_spark.pipeline import (
    normalize,
    split,
    validate,
)
from project_1_greentech_logistics_data_pipeline_spark.sources.readers import (
    read_raw_telemetry,
)

DECLARED_REASONS = {
    "missing_truck_id",
    "fuel_level_out_of_range",
    "temperature_out_of_range",
    "invalid_delivery_status",
    "missing_lat",
    "missing_lon",
}

maybe_float = st.one_of(
    st.none(),
    st.just("NaN"),
    st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
)
location = st.one_of(
    st.none(),
    st.just("NaN"),
    st.fixed_dictionaries(
        {
            "lat": st.one_of(st.none(), st.floats(-999, 999, allow_nan=False, width=32)),
            "lon": st.one_of(st.none(), st.floats(-999, 999, allow_nan=False, width=32)),
        }
    ),
)
event = st.fixed_dictionaries(
    {
        "truck_id": st.one_of(st.none(), st.sampled_from(testing.TRUCKS)),
        "timestamp": st.integers(0, 10**6).map(
            lambda i: f"2026-01-01T00:00:{i % 60:02d}.{i:06d}"
        ),
        "location": location,
        "fuel_level": maybe_float,
        "temperature": maybe_float,
        "delivery_status": st.one_of(
            st.none(), st.sampled_from(list(testing.STATUSES) + ["unknown", "", "IN_TRANSIT"])
        ),
    }
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(st.lists(event, min_size=1, max_size=40))
def test_conservation_and_reasons(spark, tmp_path_factory, events):
    d = tmp_path_factory.mktemp("prop")
    (d / "batch.json").write_text(json.dumps(events))
    validated = validate(normalize(read_raw_telemetry(spark, str(d))))
    curated, rejected = split(validated)
    rows = validated.select("is_valid", "rejection_reasons").collect()
    assert len(rows) == len(events)

    n_cur, n_rej = curated.count(), rejected.count()
    assert n_cur + n_rej == len(events)  # conservation, all 3VL patterns

    for r in rows:
        reasons = list(r["rejection_reasons"])
        assert set(reasons) <= DECLARED_REASONS
        assert (len(reasons) > 0) == (not r["is_valid"])  # nonempty ⇔ rejected

    exp = testing.expected_routing(events)
    assert n_cur == exp["curated"]
    assert n_rej == exp["rejected"]
