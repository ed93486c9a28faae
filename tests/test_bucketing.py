"""Bucketed co-located joins: the repeated-big-join amortization path.

Asserts the property that matters at 100 TB: after a one-time bucketed write
of both join sides on the join key, the equi-join plans with NO Exchange on
either side — the per-query shuffle of the fact data is gone.
"""

from __future__ import annotations

import pytest

from project_1_greentech_logistics_data_pipeline_spark.plans import explain_str
from project_1_greentech_logistics_data_pipeline_spark.sources.bucketing import (
    cobucket_join,
    write_bucketed,
)
from project_1_greentech_logistics_data_pipeline_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    write_bucketed(li, "li_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    yield "li_b", "o_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the join exercises the SMJ path a fact-fact join
    # takes at scale (dims small enough to broadcast don't need bucketing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucket_join(spark, left, right, "l_orderkey")
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: stored bucketing reused
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_cobucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = cobucket_join(spark, left, right, "l_orderkey")
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    expected = li.join(o, "l_orderkey")
    assert joined.count() == expected.count()
    assert sorted(joined.columns) == sorted(expected.columns)
