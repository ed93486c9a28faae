"""Writers: parquet-first, Delta pluggable.

The reference writes Delta (Glue_job.py:125,128,142) with mergeSchema=true.
delta-spark is not installed in this environment, so the default format is
parquet; passing format="delta" works unchanged on a cluster where Delta is
on the classpath. Partitioning by a date column is the engine's default for
the curated layer — the reference writes unpartitioned (SURVEY §4), which at
100 TB forecloses partition pruning entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    merge_schema: bool = True,
) -> None:
    writer = df.write.mode(mode).format(fmt)
    if fmt == "delta" and merge_schema:
        writer = writer.option("mergeSchema", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
