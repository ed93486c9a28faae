"""Property tests for the custom dedup machinery: the bitmap token-set
representation must agree exactly with the sparse array form, and the
distributed connected-components must agree with a union-find reference.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from project_1_greentech_logistics_data_pipeline_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _jaccard_expr,
    _jaccard_mask_expr,
    bitmask_token_sets,
    connected_components,
    hashed_token_sets,
)

SF = "/root/testdata/sf0.001"


def test_bitmap_jaccard_equals_array_jaccard(spark):
    """For every same-lang doc pair (no size-band prefilter — the full
    quadratic at sf0.001), popcount-over-masks must equal
    array_intersect-over-hashed-sets exactly."""
    arr = hashed_token_sets(spark, SF).select("doc_id", "lang", "hset")
    msk = bitmask_token_sets(spark, SF).select(
        F.col("doc_id"), F.col("lang").alias("mlang"), "mask", "sz"
    )
    docs = arr.join(msk.drop("mlang"), "doc_id")
    a = docs.select(
        F.col("doc_id").alias("ida"), F.col("lang").alias("la"),
        F.col("hset").alias("ha"), F.col("mask").alias("ma"), F.col("sz").alias("sza"),
    )
    b = docs.select(
        F.col("doc_id").alias("idb"), F.col("lang").alias("lb"),
        F.col("hset").alias("hb"), F.col("mask").alias("mb"), F.col("sz").alias("szb"),
    )
    pairs = a.join(b, (F.col("la") == F.col("lb")) & (F.col("ida") < F.col("idb")))
    diff = pairs.select(
        (
            F.round(_jaccard_expr(F.col("ha"), F.col("hb")), 9)
            != F.round(
                _jaccard_mask_expr(F.col("ma"), F.col("mb"), F.col("sza"), F.col("szb")), 9
            )
        ).alias("mismatch")
    ).filter("mismatch")
    assert diff.count() == 0


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp = {}
    for node in {u for e in edges for u in e}:
        root = find(node)
        comp[node] = root
    # normalize: component id = min node in component
    groups = {}
    for node, root in comp.items():
        groups.setdefault(find(root), set()).add(node)
    out = {}
    for members in groups.values():
        m = min(members)
        for node in members:
            out[node] = m
    return out


def test_connected_components_matches_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(45)})
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r["node"]: r["comp"] for r in connected_components(df).collect()
        }
        expected = _uf_components(n, edges)
        assert got == expected, f"trial {trial}: {got} != {expected}"
