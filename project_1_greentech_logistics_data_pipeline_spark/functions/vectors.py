"""Vector expressions over array<float>/array<double> columns, JVM-side.

Built from higher-order functions (aggregate/zip_with/transform) so they run
inside whole-stage codegen — no Python in the hot path. These are the
primitives for similarity search and embedding-cosine dedup (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_expr(a: Column | str, b: Column | str) -> Column:
    a, b = _as_col(a), _as_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column | str) -> Column:
    a = _as_col(a)
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity_expr(a: Column | str, b: Column | str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def l2_normalize_expr(a: Column | str) -> Column:
    a = _as_col(a)
    n = norm_expr(a)
    return F.transform(a, lambda x: x.cast("double") / n)
