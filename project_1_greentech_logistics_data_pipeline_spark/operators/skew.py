"""Skew-mitigation helpers (SURVEY §4 shuffle-strategy row).

AQE's skew-join splitting handles most cases at runtime; salted_join is the
explicit fallback for pathological keys (one key owning a double-digit
percentage of rows) or for engines/paths where AQE can't re-plan (e.g.
streaming joins). Semantics-preserving: verified against the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted key: the (large, skewed) left side gets a
    random salt in [0, salt_buckets); the (smaller) right side is replicated
    once per salt value. The shuffle then spreads each hot key over
    salt_buckets partitions instead of one straggler.

    Cost model: right side is duplicated salt_buckets times — use when
    right is modest and left's key distribution is the problem. Column
    overlap rules match df.join(..., on=key): one key column in the output.
    """
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    salted_right = right.withColumn("_salt", salts)
    out = salted_left.join(salted_right, on=[key, "_salt"], how=how)
    return out.drop("_salt")
