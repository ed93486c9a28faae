"""Canonicalizer-safety contract: every oracle-backed query must emit
scalar-only top-level columns.

The driver's correctness harness canonicalizes results with
pandas.sort_values over ALL output columns before hashing; a top-level
array/map/struct cell arrives as a numpy ndarray / dict, which pandas
cannot factorize — the whole comparison dies with
"TypeError: unhashable type: 'numpy.ndarray'" before any values are
compared (round-3 stamps of q69/q96). Collection-valued results must be
serialized to strings (concat_ws/array_join on the Spark side,
array_to_string / ordered STRING_AGG in the oracle — the q10 pattern in
operators/relational.py) with the typed semantics pinned in a pytest
instead.

Building a DataFrame only analyzes the plan (no execution), so sweeping
the full surface is cheap; the handful of operators that run actions
eagerly inside their builder (iterative CC/PageRank etc.) execute at
sf0.001 where they are sub-second.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def test_oracle_backed_queries_emit_scalar_columns_only(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    offenders = []
    for name in oracles:
        fn = qs.get(name)
        assert fn is not None, f"oracle without query: {name}"
        schema = fn(spark, SF_DIR).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, (
        "non-scalar top-level output columns (driver canonicalizer will "
        "crash on these):\n" + "\n".join(offenders)
    )


def test_contract_checker_detects_collection_columns(spark):
    """Meta-check: the detection logic actually flags an array column."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.array(F.lit(1), F.lit(2)).alias("a"))
    flagged = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert flagged == ["a"]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
