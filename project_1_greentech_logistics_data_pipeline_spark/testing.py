"""Deterministic telemetry fixture generator (FIXTURES.md §A1).

Mirrors the reference producer's record shape and anomaly mix
(Kafka/Producer/Producer.py:72-88,125-151) with a seeded RNG and a set of
guaranteed edge rows, so golden tests are stable. Emits the reference's raw
physical format: files each containing ONE JSON ARRAY of event objects
(consumer_etl.py:63-67).
"""

from __future__ import annotations

import json
import math
import random
from datetime import datetime, timedelta
from pathlib import Path

TRUCKS = [f"TRUCK_{i:03d}" for i in range(1, 16)]
STATUSES = ["in_transit", "delivered", "delayed"]
_T0 = datetime(2026, 1, 1, 0, 0, 0)


def make_event(rng: random.Random, i: int) -> dict:
    return {
        "truck_id": rng.choice(TRUCKS),
        "timestamp": (_T0 + timedelta(seconds=i)).isoformat(),
        "location": {
            "lat": round(rng.uniform(17.38, 17.39), 6),
            "lon": round(rng.uniform(78.48, 78.49), 6),
        },
        "fuel_level": round(rng.uniform(50, 100), 2),
        "temperature": round(rng.uniform(15, 25), 1),
        "delivery_status": rng.choice(STATUSES),
    }


def inject_anomaly(rng: random.Random, event: dict) -> dict:
    """15%-style anomaly: {null, out_of_range, nan_str} x {fuel_level,
    temperature, location} (Producer.py:72-88)."""
    kind = rng.choice(["null", "out_of_range", "nan_str"])
    fld = rng.choice(["fuel_level", "temperature", "location"])
    if kind == "null":
        event[fld] = None
    elif kind == "nan_str":
        event[fld] = "NaN"
    else:
        if fld == "fuel_level":
            event[fld] = rng.choice([-10, 150, 9999])
        elif fld == "temperature":
            event[fld] = rng.choice([-50, 200, 999])
        else:
            event[fld] = {
                "lat": round(rng.uniform(-999, 999), 6),
                "lon": round(rng.uniform(-999, 999), 6),
            }
    return event


# FIXTURES.md §A1 "required edge rows" — each appears exactly once.
def edge_rows() -> list[dict]:
    base = lambda i: {  # noqa: E731
        "truck_id": "TRUCK_001",
        "timestamp": (_T0 + timedelta(hours=i)).isoformat(),
        "location": {"lat": 17.385, "lon": 78.486},
        "fuel_level": 75.5,
        "temperature": 20.0,
        "delivery_status": "in_transit",
    }
    rows = []
    r = base(0)
    rows.append(r)  # fully valid
    r = base(1); r["truck_id"] = None; rows.append(r)
    r = base(2); r["fuel_level"] = 150; rows.append(r)
    r = base(3); r["temperature"] = -50; rows.append(r)
    r = base(4); r["delivery_status"] = "unknown"; rows.append(r)
    r = base(5); r["location"] = None; rows.append(r)
    r = base(6); r["location"] = {"lat": None, "lon": 78.486}; rows.append(r)
    r = base(7); r["fuel_level"] = None; rows.append(r)
    r = base(8); r["fuel_level"] = "NaN"; rows.append(r)
    r = base(9); r["fuel_level"] = 9999; r["delivery_status"] = None; rows.append(r)
    return rows


def write_raw_batches(
    out_dir: str | Path,
    n_events: int = 200,
    n_files: int = 4,
    anomaly_rate: float = 0.15,
    seed: int = 42,
    include_edge_rows: bool = True,
    include_corrupt_line: bool = True,
) -> dict:
    """Write raw batch files (one JSON array per file) and return expected
    routing counts computed independently in pure Python."""
    rng = random.Random(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    events: list[dict] = []
    for i in range(n_events):
        e = make_event(rng, i)
        if rng.random() < anomaly_rate:
            e = inject_anomaly(rng, e)
        events.append(e)
    if include_edge_rows:
        events.extend(edge_rows())
    per = math.ceil(len(events) / n_files)
    for fi in range(n_files):
        chunk = events[fi * per : (fi + 1) * per]
        if chunk:
            (out / f"kafka_batch_{fi:04d}.json").write_text(json.dumps(chunk))
    if include_corrupt_line:
        (out / "kafka_batch_corrupt.json").write_text('{"not": "an array" oops')
    exp = expected_routing(events)
    exp["n_corrupt_lines"] = 1 if include_corrupt_line else 0
    return exp


def expected_routing(events: list[dict]) -> dict:
    """Pure-Python oracle for the corrected pipeline semantics."""
    curated = rejected = 0
    reasons_hist: dict[str, int] = {}
    for e in events:
        reasons = classify(e)
        if reasons:
            rejected += 1
            for r in reasons:
                reasons_hist[r] = reasons_hist.get(r, 0) + 1
        else:
            curated += 1
    return {
        "n_events": len(events),
        "curated": curated,
        "rejected": rejected,
        "reasons": reasons_hist,
    }


def classify(e: dict) -> list[str]:
    """Expected rejection reasons, in the pipeline's declared rule order."""
    reasons = []
    fuel, temp, loc = e.get("fuel_level"), e.get("temperature"), e.get("location")
    if isinstance(fuel, str):  # "NaN" string -> parsed NaN -> normalized NULL
        fuel = None
    if isinstance(temp, str):
        temp = None
    if isinstance(loc, str):  # "NaN" under struct schema -> NULL struct
        loc = None
    if e.get("truck_id") is None:
        reasons.append("missing_truck_id")
    if fuel is None or not (0 <= fuel <= 100):
        reasons.append("fuel_level_out_of_range")
    if temp is None or not (-10 <= temp <= 60):
        reasons.append("temperature_out_of_range")
    if e.get("delivery_status") not in ("in_transit", "delivered", "delayed"):
        reasons.append("invalid_delivery_status")
    if loc is None or loc.get("lat") is None:
        reasons.append("missing_lat")
    if loc is None or loc.get("lon") is None:
        reasons.append("missing_lon")
    return reasons
