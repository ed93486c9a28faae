"""Bucketed tables: pre-shuffled, co-located storage for repeated big joins.

The reference writes every layer unpartitioned and unbucketed
(Glue/Glue_job.py:125,128,142), so any downstream join pays a full shuffle of
the fact data per query. At 100 TB the dominant cost of a fact-fact join
(lineitem ⋈ orders on orderkey) is exactly that exchange, and it recurs for
every query that joins on the same key.

Bucketing amortizes it: write both sides hash-bucketed (and sorted) on the
join key once; every subsequent equi-join on that key is planned as a
SortMergeJoin with ZERO Exchange on either side — Spark trusts the stored
hash-partitioning (`HashPartitioning(key, n)` output partitioning of the
`FileSourceScanExec` when `spark.sql.sources.bucketing.enabled` is on, the
default). The bucket count is the knob that must be sized at the target
scale: buckets ≈ data_size / healthy-partition-size (128-256 MB), and both
sides must use the SAME count or Spark re-shuffles the smaller one.

Bucketed tables require the session catalog (saveAsTable), so callers pass a
warehouse-scoped table name, not a bare path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df hash-bucketed (and optionally sorted) on the join key.

    sort_cols lets the scan feed SortMergeJoin without a Sort node when each
    bucket lands in one file (write with a single task per bucket for that).
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; the scan reports the stored hash partitioning,
    which is what lets Catalyst elide the join exchange."""
    return spark.table(table)


def cobucket_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two tables bucketed on the same key with the same bucket
    count — plans with no Exchange on either side (asserted in
    tests/test_bucketing.py)."""
    return read_bucketed(spark, left_table).join(read_bucketed(spark, right_table), on, how)
