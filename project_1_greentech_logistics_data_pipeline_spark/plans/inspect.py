"""Plan-inspection helpers: capture explain() output as a string so tests
can assert physical-plan properties (pushdown reached the scan, dimension
joins broadcast, top-k avoided a global sort, narrow pipelines stayed
shuffle-free) instead of trusting that they did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession.sparkContext._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def plan_has(df: DataFrame, *needles: str, mode: str = "formatted") -> dict[str, bool]:
    text = explain_str(df, mode)
    return {n: (n in text) for n in needles}
