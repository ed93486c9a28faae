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


def test_oracle_backed_queries_emit_scalar_columns_only(spark, surface_cache):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    offenders = []
    for name in oracles:
        fn = qs.get(name)
        assert fn is not None, f"oracle without query: {name}"
        # schema via the session SurfaceCache — the DataFrame build alone
        # costs real Spark work for the construction-eager iterative
        # family, and the oracle suite needs the same build anyway
        _cols, schema, _rows = surface_cache.entry(SF_DIR, name)
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

    Allowlist: NAMED queries, each scoped to a regex over the ROUND
    ARGUMENT it justifies — an unrelated float-agg ROUND later added to
    the same query's SQL is still flagged (assessed exceptions, drift
    orders below round granularity):
    - q99: EXP(AVG(LN(x))) is THE pandas-UDAF surface under test; its
      reorder drift (~1e-14 rel) is ~6 orders below the 4-dp granularity.
    - q75: the per-user small-n window zscore specifically — anchored to
      the OVER-window context and the `value` column, so an unrelated
      float-agg ROUND later added to q75's SQL is still flagged.
    - q93: SUM(l.score) is a SUM over the INTEGER lexicon column (exact,
      order-independent); the ::DOUBLE cast happens only AFTER the exact
      integer SUM, so the ROUND argument carries no accumulation drift.
    """
    import re

    import __spark_entry__ as entrymod

    ALLOW = {
        "q99_pandas_udaf_geomean": r"EXP\(AVG\(LN\(",
        "q75_grouped_zscore_pandas": r"\b(AVG|STDDEV_SAMP)\(VALUE\) OVER W\b",
        "q93_lexicon_sentiment": r"SUM\(L\.SCORE\)",
    }
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        allow_re = ALLOW.get(name)
        u = sql.upper()
        hits = []
        for m in re.finditer(r"ROUND\(", u):
            depth, i = 1, m.end()
            while depth and i < len(u):
                depth += u[i] == "("
                depth -= u[i] == ")"
                i += 1
            arg = u[m.end() : i - 1]
            if allow_re and re.search(allow_re, arg):
                continue
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
            ):
                hits.append(arg[:80])
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "ROUND over order-dependent float accumulation (use dsum / "
        f"hilo_sum_exprs / integer sums instead): {offenders}"
    )


# The dedicated -0.0 sweep runs at the driver's sf0.01 ONLY: rounded-to-zero
# negatives are data-dependent, so the default-scale green does not imply
# sf0.01 green — but the default scale is already swept by compare()'s
# _negzero_cols check inside every test_oracle case, so re-collecting the
# whole surface here at SF_DIR would duplicate that work for zero new
# coverage (review finding r6).
_CONTRACT_SFS = ["/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", _CONTRACT_SFS, ids=os.path.basename)
def test_no_negative_zero_cells_on_either_engine(spark, surface_cache, sf_dir):
    """Surface-wide -0.0 sweep, BOTH engines: a -0.0 anywhere in an
    oracle-backed output is latent driver hash drift even when today's
    hashes agree (the q122 class — Spark BigDecimal ROUND emits +0.0
    where DuckDB's float ROUND emits -0.0 for the same tiny negative).
    compare() already sweeps whatever scale the oracle suite runs at;
    this test pins the driver's sf0.01 in-suite without needing
    ORACLE_SF_DIR. Value equality is NOT re-checked here — that is the
    oracle suite's job — so this stays ~rowcount-cheap on the DuckDB
    side and one collect per query on the Spark side."""
    import __spark_entry__ as entrymod

    from project_1_greentech_logistics_data_pipeline_spark.session import (
        release_session_state,
    )

    from .oracle_harness import _negzero_cols, duckdb_con

    offenders: dict = {}
    con = duckdb_con(sf_dir)
    try:
        for name, sql in entrymod.oracle_sql().items():
            # Spark side via the session SurfaceCache (full collect under
            # default config, block-release cadence inside); the DuckDB
            # side still executes per oracle here
            s_cols, _schema, s_rows = surface_cache.entry(sf_dir, name)
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
            nz = {
                side: cols
                for side, cols in (
                    ("spark", _negzero_cols(s_cols, s_rows)),
                    ("duckdb", _negzero_cols(d_cols, d_rows)),
                )
                if cols
            }
            if nz:
                offenders[name] = nz
    finally:
        con.close()
        release_session_state(spark)
    assert not offenders, (
        f"-0.0 cells at {sf_dir} (latent driver hash drift — normalize "
        f"the source with pos_zero / '+ 0.0'): {offenders}"
    )


def test_harness_distinguishes_negative_zero():
    """Regression for the q122 four-round driver-only red: Python ==
    treats -0.0 and +0.0 as equal, so every tolerance/equality check was
    green while the driver's serialized hash (which sees the sign bit)
    stayed red. The harness float normalization must be byte-faithful."""
    from .oracle_harness import _negzero_cols, _norm_cell

    assert _norm_cell(-0.0) != _norm_cell(0.0)
    assert _norm_cell(1.5) == _norm_cell(1.5)
    assert _norm_cell(-0.0) == _norm_cell(-0.0)
    # and the -0.0 sweep sees scalar and nested cells
    assert _negzero_cols(["a", "b"], [(0.0, -0.0)]) == {"b"}
    assert _negzero_cols(["a"], [([1.0, -0.0],)]) == {"a"}
    assert _negzero_cols(["a"], [(None,), (3,)]) == set()


def test_compare_rejects_cross_engine_signed_zero(spark):
    """End-to-end shape of yesterday's q122 failure: Spark's BigDecimal
    ROUND emits +0.0 where DuckDB's float ROUND emits -0.0 for the same
    tiny negative — equal under ==, different under the driver hash.
    compare() must raise. (A bare `SELECT -0.0` would NOT reproduce this:
    DuckDB parses it as DECIMAL and loses the sign bit — the oracle must
    run the actual float-ROUND mechanism.)"""
    from pyspark.sql import functions as F

    from .oracle_harness import compare

    def fn(spark, sf_dir):
        # Spark's ROUND of the same value: BigDecimal path, +0.0
        return spark.range(1).select(
            F.round(F.lit(-1e-9).cast("double"), 6).cast("double").alias("v")
        )

    with pytest.raises(AssertionError):
        compare(
            spark,
            SF_DIR,
            fn,
            "SELECT ROUND(CAST(-1e-9 AS DOUBLE), 6) AS v",
            name="signed-zero-probe",
        )


def test_compare_rejects_agreeing_negative_zero(spark):
    """Even when BOTH engines emit -0.0 (hash would agree today), the
    harness flags it: the agreement is engine-version luck, and the
    contract is that sources normalize with pos_zero."""
    from pyspark.sql import functions as F

    from .oracle_harness import compare

    # divide a negative by infinity to force an IEEE -0.0 through the
    # engine (a bare -0.0 literal risks being constant-folded away)
    def fn_neg(spark, sf_dir):
        return spark.range(1).select(
            (F.lit(-1.0) / F.lit(float("inf"))).alias("v")
        )

    with pytest.raises(AssertionError, match="-0.0 cells"):
        compare(spark, SF_DIR, fn_neg, "SELECT -1.0 / 1e308 / 1e308 AS v",
                name="agreeing-negzero-probe")


def test_pos_zero_normalizes_on_both_engines(spark):
    """pos_zero's contract: -0.0 -> +0.0, identity elsewhere, on BOTH
    engines (it ships inside shared oracle SQL)."""
    import struct

    import duckdb
    from pyspark.sql import functions as F

    from project_1_greentech_logistics_data_pipeline_spark.functions.deterministic import (
        pos_zero,
        pos_zero_col,
    )

    rows = spark.range(1).select(
        F.expr(pos_zero("-1.0 / CAST('Infinity' AS DOUBLE)")).alias("z"),
        pos_zero_col(F.lit(-1.0) / F.lit(float("inf"))).alias("zc"),
        pos_zero_col(F.lit(-2.5)).alias("neg"),
        pos_zero_col(F.lit(3.25)).alias("pos"),
    ).collect()[0]
    pz = struct.pack("<d", 0.0)
    assert struct.pack("<d", rows["z"]) == pz
    assert struct.pack("<d", rows["zc"]) == pz
    assert rows["neg"] == -2.5 and rows["pos"] == 3.25

    d = duckdb.connect().execute(
        f"SELECT {pos_zero('-1.0 / 1e308 / 1e308')} AS z"
    ).fetchone()[0]
    assert struct.pack("<d", d) == pz


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
