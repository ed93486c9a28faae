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


def compact_table(
    spark,
    path: str,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact a table directory's small files into ~target_file_bytes files.

    Streaming sinks (foreachBatch appends, micro-batch file sources) emit
    one-file-per-task-per-batch; over days that degrades scans (driver file
    listing, per-file open cost, tiny rowgroups defeat parquet stats). This
    is the maintenance op Delta calls OPTIMIZE, expressed on plain files:
    size the output file count from the actual on-disk bytes, rewrite with
    coalesce (no shuffle — merging files does not need a repartition), and
    atomically swap via a staging directory. Returns the output file count.

    At real scale run this per partition directory (date=...) so the
    rewrite is bounded and partition pruning is preserved."""
    import glob as _glob
    import os
    import shutil

    data_files = [
        f
        for f in _glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]
    total = sum(os.path.getsize(f) for f in data_files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    staging = path.rstrip("/") + "__compact_staging"
    df = spark.read.format(fmt).load(path)
    df.coalesce(n_out).write.mode("overwrite").format(fmt).save(staging)
    backup = path.rstrip("/") + "__compact_backup"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return n_out
