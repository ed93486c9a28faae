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


def test_no_round_over_float_accumulating_aggregates():
    """Static contract over every oracle SQL: ROUND at absolute decimals
    must never sit over a float-ACCUMULATING aggregate (AVG/STDDEV/CORR/
    COVAR/VAR over doubles, or a bare double SUM) — double accumulation
    is order-dependent in the last ulps, and an absolute-decimal round
    can straddle that boundary between Spark's merge order and DuckDB's
    sequential one (the r3 q122 hash drift). The sanctioned forms are
    decimal-cast sums (dsum), split-integer hi/lo sums
    (functions/deterministic.hilo_sum_exprs), or integer sums.

    Allowlist (assessed exceptions, drift orders below round granularity):
    - q99: EXP(AVG(LN(x))) is THE pandas-UDAF surface under test; its
      reorder drift (~1e-14 rel) is ~6 orders below the 4-dp granularity.
    - q75: per-user window AVG/STDDEV over small n; same margin.
    """
    import re

    import __spark_entry__ as entrymod

    ALLOW = {"q99_pandas_udaf_geomean", "q75_grouped_zscore_pandas"}
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        if name in ALLOW:
            continue
        u = sql.upper()
        hits = []
        for m in re.finditer(r"ROUND\(", u):
            depth, i = 1, m.end()
            while depth and i < len(u):
                depth += u[i] == "("
                depth -= u[i] == ")"
                i += 1
            arg = u[m.end() : i - 1]
            if re.search(
                r"\b(AVG|STDDEV|STDDEV_SAMP|VAR_SAMP|VAR_POP|CORR|"
                r"COVAR_SAMP|COVAR_POP)\s*\(",
                arg,
            ):
                hits.append(arg[:80])
            elif (
                re.search(r"\bSUM\s*\(", arg)
                and "DECIMAL" not in arg
                and "_HI" not in arg
                and "_LO" not in arg
                # integer-typed sums are exact; the known one casts to
                # double only AFTER the exact integer SUM
                and "SUM(L.SCORE)" not in arg
            ):
                hits.append(arg[:80])
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "ROUND over order-dependent float accumulation (use dsum / "
        f"hilo_sum_exprs / integer sums instead): {offenders}"
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
