"""Unit semantics for MERGE INTO (operators/merge.py) and the salted
skew join (operators/skew.py) — clause precedence, conditional branches,
and salting's semantics-preservation vs the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_1_greentech_logistics_data_pipeline_spark.operators.merge import (
    merge_frames,
)
from project_1_greentech_logistics_data_pipeline_spark.operators.skew import (
    salted_join,
)


def _merge_fixture(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", -5.0), (4, "d", 40.0)],
        ["id", "name", "bal"],
    )
    source = spark.createDataFrame(
        [(1, 100.0), (2, 3.0), (5, 500.0), (6, 1.0)], ["sid", "amt"]
    )
    return target, source


def test_merge_all_clauses(spark):
    """UPDATE (amt>50), DELETE (matched, amt<=50), conditional INSERT
    (amt>100), NOT MATCHED BY SOURCE DELETE (bal<0):
      id=1 matched amt=100 -> update bal+=amt -> 110
      id=2 matched amt=3   -> update misses, delete fires -> gone
      id=3 target-only bal<0 -> NMBS delete -> gone
      id=4 target-only bal>=0 -> kept unchanged
      sid=5 amt=500 -> insert; sid=6 amt=1 -> insert cond misses."""
    target, source = _merge_fixture(spark)
    out = merge_frames(
        target,
        source,
        on=[("id", "sid")],
        matched_update={"bal": F.col("t.bal") + F.col("s.amt")},
        matched_update_cond=F.col("s.amt") > 50,
        matched_delete_cond=F.lit(True),
        insert_values={
            "id": F.col("s.sid"),
            "name": F.lit("new"),
            "bal": F.col("s.amt"),
        },
        insert_cond=F.col("s.amt") > 100,
        not_matched_by_source_delete_cond=F.col("t.bal") < 0,
    )
    rows = {r["id"]: (r["name"], r["bal"]) for r in out.collect()}
    assert rows == {1: ("a", 110.0), 4: ("d", 40.0), 5: ("new", 500.0)}


def test_merge_update_takes_precedence_over_delete(spark):
    """ANSI order: a matched row whose UPDATE condition fires must not be
    deleted even when the DELETE condition also holds."""
    target, source = _merge_fixture(spark)
    out = merge_frames(
        target,
        source,
        on=[("id", "sid")],
        matched_update={"bal": F.lit(0.0)},
        matched_update_cond=F.col("s.amt") > 0,  # fires for both matches
        matched_delete_cond=F.lit(True),
    )
    rows = {r["id"]: r["bal"] for r in out.collect()}
    assert rows == {1: 0.0, 2: 0.0, 3: -5.0, 4: 40.0}


def test_merge_no_clauses_is_identity(spark):
    target, source = _merge_fixture(spark)
    out = merge_frames(target, source, on=[("id", "sid")])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, target.collect()))


def test_merge_unconditional_insert_default_columns_null(spark):
    """INSERT values omitted for a column -> NULL, mirroring ANSI INSERT
    with an explicit column list."""
    target, source = _merge_fixture(spark)
    out = merge_frames(
        target,
        source,
        on=[("id", "sid")],
        insert_values={"id": F.col("s.sid")},
    )
    rows = {r["id"]: (r["name"], r["bal"]) for r in out.collect()}
    assert rows[5] == (None, None)
    assert rows[6] == (None, None)
    assert rows[1] == ("a", 10.0)  # matched rows untouched without clauses


def test_salted_join_matches_plain_join(spark):
    """salted_join is semantics-preserving: same multiset of rows as the
    plain equi-join, for inner and left joins, across bucket counts."""
    left = spark.createDataFrame(
        [(i, "hot" if i % 10 < 8 else f"k{i % 7}") for i in range(1000)],
        ["id", "key"],
    )
    right = spark.createDataFrame(
        [("hot", 1.5), ("k1", 2.0), ("k3", 3.0), ("cold", 9.9)], ["key", "w"]
    )
    for how in ("inner", "left"):
        for buckets in (1, 8):
            got = sorted(
                map(tuple, salted_join(left, right, "key", buckets, how).collect())
            )
            want = sorted(map(tuple, left.join(right, on="key", how=how).collect()))
            assert got == want, (how, buckets)
