"""Custom Python Data Source (Spark 4 API): distributed synthetic telemetry.

The reference's generator is a single-process Python loop producing ~1 msg/s
(Kafka/Producer/Producer.py:125-151, SLEEP_BETWEEN_MESSAGES at :39) with a
15% anomaly mix drawn from {null, out_of_range, nan_str} x {fuel_level,
temperature, location} (Producer.py:72-88, :138-139). This re-expresses that
generator as a first-class Spark *source*: `spark.read.format(
"telemetry_gen").option("rows", N)` plans one InputPartition per requested
partition and generates rows executor-side — embarrassingly parallel, so N
scales to cluster size instead of wall-clock seconds.

Determinism: each partition seeds its own RNG with (seed, partition index),
so the dataset is reproducible for any fixed (rows, partitions, seed) and
independent of task scheduling order.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

STATUSES = ["in_transit", "delivered", "delayed"]
ANOMALY_RATE = 0.15


class TelemetryGenDataSource(DataSource):
    """format("telemetry_gen") options: rows (total, default 1000),
    partitions (default 8), seed (default 42)."""

    @classmethod
    def name(cls) -> str:
        return "telemetry_gen"

    def schema(self) -> str:
        return (
            "truck_id string, timestamp string, lat double, lon double, "
            "fuel_level double, temperature double, delivery_status string, "
            "injected_anomaly string"
        )

    def reader(self, schema) -> "TelemetryGenReader":
        return TelemetryGenReader(self.options)


class TelemetryGenReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        import random

        idx = partition.value
        rng = random.Random(self.seed * 1_000_003 + idx)
        base = self.rows // self.num_partitions
        n = base + (1 if idx < self.rows % self.num_partitions else 0)
        for i in range(n):
            truck = f"TRUCK_{rng.randint(1, 15):03d}"
            ts = f"2026-01-01T{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}.{rng.randint(0, 999999):06d}"
            lat = round(rng.uniform(17.0, 18.0), 6)
            lon = round(rng.uniform(78.0, 79.0), 6)
            fuel = round(rng.uniform(50.0, 100.0), 2)
            temp = round(rng.uniform(15.0, 25.0), 1)
            status = rng.choice(STATUSES)
            anomaly = None
            if rng.random() < ANOMALY_RATE:
                kind = rng.choice(["null", "out_of_range", "nan"])
                field = rng.choice(["fuel_level", "temperature", "location"])
                anomaly = f"{kind}:{field}"
                if kind == "null":
                    if field == "fuel_level":
                        fuel = None
                    elif field == "temperature":
                        temp = None
                    else:
                        lat = lon = None
                elif kind == "out_of_range":
                    if field == "fuel_level":
                        fuel = rng.choice([-10.0, 150.0, 9999.0])
                    elif field == "temperature":
                        temp = rng.choice([-50.0, 200.0, 999.0])
                    else:
                        lat = round(rng.uniform(-999, 999), 6)
                        lon = round(rng.uniform(-999, 999), 6)
                else:  # the "NaN" string anomaly parses to float NaN (§1.2)
                    if field == "fuel_level":
                        fuel = float("nan")
                    elif field == "temperature":
                        temp = float("nan")
            yield (truck, ts, lat, lon, fuel, temp, status, anomaly)


def register(spark) -> None:
    spark.dataSource.register(TelemetryGenDataSource)
