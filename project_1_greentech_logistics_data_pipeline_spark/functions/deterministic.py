"""Deterministic (order-independent) aggregates over double columns.

Floating-point SUM/AVG depend on accumulation order, which differs between
Spark partitions and the DuckDB oracle (and between runs as AQE re-splits).
Casting each element to decimal(38,6) before summing makes the aggregate
exact and order-independent; casting the exact decimal result back to double
is a single deterministic rounding. The testdata's numeric columns carry at
most 2 fractional digits, so scale 6 loses nothing.

Oracle-SQL twin of ``dsum(c)``:
    CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE)
and of ``davg(c)``:
    CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE) / COUNT(c)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)
