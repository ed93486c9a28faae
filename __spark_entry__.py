"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query (TPC-H-Q1-style pricing summary) on sf0.001.
queries(): every implemented operator from SURVEY.md §2 (+ §2.10 extensions).
oracle_sql(): DuckDB-runnable ANSI-SQL twin per query (omitted for
non-SQL-expressible ops, which get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from project_1_greentech_logistics_data_pipeline_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.relational import (
        q01_pricing_summary,
    )

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
