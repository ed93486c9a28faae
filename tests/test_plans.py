"""Physical-plan audits: the scale properties SURVEY §4 promises must be
visible in explain() output, not just assumed.
"""

from __future__ import annotations

from project_1_greentech_logistics_data_pipeline_spark.plans import explain_str

SF = "/root/testdata/sf0.001"


def test_q01_pushdown_and_pruning(spark):
    from project_1_greentech_logistics_data_pipeline_spark.operators.relational import (
        q01_pricing_summary,
    )

    df = q01_pricing_summary(spark, SF)
    plan = explain_str(df)
    # filter reached the parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
    # column pruning: unused columns are not read
    read_schema = plan.split("ReadSchema", 1)[1][:400]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    # two-phase hash aggregate (partial map-side + final)
    assert plan.count("HashAggregate") >= 2
    # codegen only shows in the FINAL adaptive plan -> execute, then check
    # (formatted mode marks codegen'd operators with a '*' prefix)
    df.collect()
    final = explain_str(df)
    assert "isFinalPlan=true" in final
    assert "* HashAggregate" in final  # agg runs inside whole-stage codegen


def test_q02_filter_pushdown(spark):
    from project_1_greentech_logistics_data_pipeline_spark.operators.relational import (
        q02_filter_project,
    )

    plan = explain_str(q02_filter_project(spark, SF))
    pushed = plan.split("PushedFilters", 1)[1][:300]
    assert "l_discount" in pushed and "l_shipdate" in pushed


def test_q04_broadcasts_dimensions(spark):
    from project_1_greentech_logistics_data_pipeline_spark.operators.relational import (
        q04_join_multiway_broadcast,
    )

    plan = explain_str(q04_join_multiway_broadcast(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "SortMergeJoin" not in plan  # the fact side never shuffles for the join


def test_q16_topk_avoids_global_sort(spark):
    from project_1_greentech_logistics_data_pipeline_spark.operators.relational import (
        q16_sort_limit_topk,
    )

    plan = explain_str(q16_sort_limit_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan  # per-partition top-k + k-row merge


def test_telemetry_parse_is_shuffle_free(spark, tmp_path):
    import json

    from project_1_greentech_logistics_data_pipeline_spark import testing
    from project_1_greentech_logistics_data_pipeline_spark.pipeline import (
        normalize,
        validate,
    )
    from project_1_greentech_logistics_data_pipeline_spark.sources.readers import (
        read_raw_telemetry,
    )

    (tmp_path / "b.json").write_text(json.dumps(testing.edge_rows()))
    df = validate(normalize(read_raw_telemetry(spark, str(tmp_path))))
    plan = explain_str(df)
    assert "Exchange" not in plan  # parse -> validate is narrow end to end


def test_q31_band_join_is_broadcast(spark):
    from project_1_greentech_logistics_data_pipeline_spark.operators.temporal import (
        q31_range_join_bands,
    )

    plan = explain_str(q31_range_join_bands(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan  # tiny band dim broadcast, fact streams


def test_q62_decorrelation_single_fact_chain(spark):
    """Q17 shape: the brand restriction must reach both the threshold agg and
    the probe via broadcast joins — no SortMergeJoin of lineitem against
    itself at full width."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.subqueries import (
        q62_correlated_scalar_subquery,
    )

    plan = explain_str(q62_correlated_scalar_subquery(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # brand-parts, thresholds
    assert "SortMergeJoin" not in plan


def test_q63_aggregate_first_then_broadcast_joinback(spark):
    """Q18 shape: the HAVING survivor set broadcasts; orders/customer are
    never shuffled for the join."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.subqueries import (
        q63_having_large_volume_orders,
    )

    plan = explain_str(q63_having_large_volume_orders(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_q67_exists_is_semi_join(spark):
    from project_1_greentech_logistics_data_pipeline_spark.operators.subqueries import (
        q67_exists_group_priority,
    )

    plan = explain_str(q67_exists_group_priority(spark, SF))
    assert "LeftSemi" in plan


def test_q65_notin_is_anti_join(spark):
    from project_1_greentech_logistics_data_pipeline_spark.operators.subqueries import (
        q65_notin_anti_subquery,
    )

    plan = explain_str(q65_notin_anti_subquery(spark, SF))
    assert "LeftAnti" in plan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A date-partitioned table scanned with a partition filter must show
    the filter in PartitionFilters (pruned at file-listing time, before any
    IO) — the 100 TB behavior the curated layer's date partitioning buys,
    and exactly what the reference's unpartitioned writes forfeit."""
    from pyspark.sql import functions as F

    from project_1_greentech_logistics_data_pipeline_spark.sources.readers import (
        load_table,
    )
    from project_1_greentech_logistics_data_pipeline_spark.sources.writers import (
        write_table,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_date")
    write_table(e, path, mode="overwrite", partition_by=["event_date"])

    df = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-03")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_date" in seg, f"partition filter not pushed: {seg!r}"
    # and the pruned read returns exactly the partition's rows
    expected = e.filter(F.col("event_date") == "2024-01-03").count()
    assert df.count() == expected > 0


def test_q82_q7_fact_never_shuffles_for_joins(spark):
    """Q7 shape: every join must be broadcast; the only shuffle is the final
    group-by (plus its AQE reads)."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.classics2 import (
        q82_tpch_q7_volume_shipping,
    )

    plan = explain_str(q82_tpch_q7_volume_shipping(spark, SF))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_q94_rollup_is_single_scan_expand(spark):
    """Multi-granularity rollup must compile to one scan + Expand, not a
    union of two aggregations re-scanning raw."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.temporal import (
        q94_hierarchical_time_rollup,
    )

    plan = explain_str(q94_hierarchical_time_rollup(spark, SF))
    assert "Expand" in plan
    # formatted mode: one numbered "Scan parquet" node in the tree section
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree
    assert "Union" not in plan


def test_q97_interval_join_avoids_bnlj(spark):
    """Binned interval join must never plan a nested-loop cartesian."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.temporal import (
        q97_binned_interval_join,
    )

    plan = explain_str(q97_binned_interval_join(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q86_q21_semi_and_anti_self_joins(spark):
    from project_1_greentech_logistics_data_pipeline_spark.operators.classics2 import (
        q86_tpch_q21_waiting_supplier,
    )

    plan = explain_str(q86_tpch_q21_waiting_supplier(spark, SF))
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q126_q6_all_predicates_pushed_no_join(spark):
    """TPC-H Q6 must be scan -> filter -> two-phase agg: every predicate in
    PushedFilters, 4-column ReadSchema, no join or wide shuffle at all."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.classics3 import (
        q126_tpch_q6_forecast_revenue,
    )

    plan = explain_str(q126_tpch_q6_forecast_revenue(spark, SF))
    pushed = plan.split("PushedFilters", 1)[1][:400]
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed, f"{c} not pushed"
    read_schema = plan.split("ReadSchema", 1)[1][:400]
    assert "l_orderkey" not in read_schema and "l_returnflag" not in read_schema
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_q129_q20_single_lineitem_scan(spark):
    """The Q20 shape computes the (part, supplier) aggregate and the
    correlated per-part total/max in one pass: exactly ONE lineitem scan
    (window form — no self-join to defeat exchange reuse), dimensions
    broadcast."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.classics3 import (
        q129_tpch_q20_dominant_supplier,
    )

    import re

    df = q129_tpch_q20_dominant_supplier(spark, SF)
    assert df.count() > 0  # non-vacuous at every sf (50%-threshold form was not)
    plan = explain_str(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 3  # li + part + supplier
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_q134_eval_side_broadcasts(spark):
    """Decontamination: the eval n-gram set must broadcast; the training
    side must never shuffle for the join."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.quality import (
        q134_ngram_decontamination,
    )

    plan = explain_str(q134_ngram_decontamination(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q141_single_window_no_self_join(spark):
    """Attribution must be one window pass — no join of events to events."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.analytics import (
        q141_conversion_attribution,
    )

    import re

    plan = explain_str(q141_conversion_attribution(spark, SF))
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_q142_collapses_before_window(spark):
    """Rolling distinct must aggregate to per-(type,day) sets BEFORE the
    range-frame window — the window input is the collapsed relation."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.analytics import (
        q142_rolling_distinct_users,
    )

    import re

    plan = explain_str(q142_rolling_distinct_users(spark, SF))
    assert "collect_set" in plan and "Window" in plan
    assert "Join" not in plan  # the collapse means no events self-join
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_runtime_bloom_filter_prunes_shuffle_join_probe(spark):
    """Runtime bloom-filter join pruning: when a selective filter sits on
    the build side of a SHUFFLE join, Spark injects might_contain() on the
    probe side so non-matching fact rows drop before the exchange — at
    100 TB this is the difference between shuffling the whole fact table
    and shuffling the ~matching fraction. Enabled by default (verified);
    the size thresholds are scaled down here because the local testdata is
    far below the 10 GB application-side default that gates injection in
    production."""
    from pyspark.sql import functions as F

    old_bjt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        assert (
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
            == "true"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        assert "might_contain" in explain_str(j).lower()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bjt)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thresh,
        )


def test_q160_zorder_layout_skips_row_groups(spark, tmp_path):
    """The z-order claim, executed: the same 2-D filter over the same rows
    materializes far fewer rows from a zkey-clustered parquet layout than
    from a 1-D-sorted one, because row-group min/max stats prune on BOTH
    dimensions (measured 4x at sf0.01 with 64 KB row groups, 20x at
    sf0.1). The scan node's numOutputRows is post-pushdown, so it IS the
    row-group-skipping signal."""
    from pyspark.sql import functions as F

    from project_1_greentech_logistics_data_pipeline_spark.operators.analytics import (
        q160_zorder_key,
    )
    from project_1_greentech_logistics_data_pipeline_spark.sources.readers import (
        load_table,
    )

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "events")
    z = q160_zorder_key(spark, sf).select("event_id", "zkey", "da", "db")
    joined = e.join(z, on="event_id")
    zs, us = str(tmp_path / "zsorted"), str(tmp_path / "unsorted")
    joined.orderBy("zkey").coalesce(2).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(zs)
    joined.orderBy("event_id").coalesce(2).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(us)

    def scan_rows(path: str) -> tuple[int, int]:
        df = spark.read.parquet(path).filter(
            F.col("da").between(10, 20) & F.col("db").between(10, 20)
        )
        matched = df.count()
        df.collect()
        ep = df._jdf.queryExecution().executedPlan()

        def leaves(node):
            if node.children().isEmpty():
                return [node]
            out = []
            it = node.children().iterator()
            while it.hasNext():
                out += leaves(it.next())
            return out

        total = 0
        for leaf in leaves(ep):
            it = leaf.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    total += kv._2().value()
        return matched, total

    z_matched, z_scanned = scan_rows(zs)
    u_matched, u_scanned = scan_rows(us)
    assert z_matched == u_matched > 0  # same answer
    assert z_scanned < 0.5 * u_scanned  # clustered layout skipped row groups


def test_q164_skyline_has_no_self_join(spark):
    """The Pareto frontier must plan as the O(n log n) window sweep —
    no self-join (the oracle's quadratic NOT-EXISTS shape)."""
    import re

    from project_1_greentech_logistics_data_pipeline_spark.operators.analytics import (
        q164_pareto_frontier,
    )

    plan = explain_str(q164_pareto_frontier(spark, SF))
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_q184_two_aggregates_one_shuffle_key(spark):
    """Feature-store build: both aggregate families key on user_id and
    the join must be on that same partitioning — no extra exchange after
    the aggregates (AQE may coalesce, but no SortMergeJoin on a foreign
    key and no broadcast of the big side)."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.analytics import (
        q184_user_feature_store,
    )

    plan = explain_str(q184_user_feature_store(spark, SF))
    assert plan.count("Exchange hashpartitioning(user_id") <= 2  # one per agg family


def test_q64_bnlj_rows_are_one_row_scalar_broadcasts(spark):
    """PLAN_AUDIT flags BroadcastNestedLoopJoin rows in q64 (1 in the
    final-plan census; the pre-AQE plan checked here may carry another);
    pin that every one is the benign kind — a broadcast of the 1-row global-threshold
    aggregate (grouping-free HashAggregate feeding BroadcastExchange),
    never a real O(n*m) nested loop between data relations (VERDICT r2
    item 6)."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.subqueries import (
        q64_scalar_subquery_threshold,
    )

    import re

    df = q64_scalar_subquery_threshold(spark, SF)
    plan = explain_str(df)
    tree_bnlj = re.findall(r"BroadcastNestedLoopJoin [^\n(]*", plan)
    assert len(tree_bnlj) >= 1  # the scalar-threshold crossJoin
    # every BNLJ tree row must carry a broadcast build side
    assert all("Build" in row for row in tree_bnlj), tree_bnlj
    # the broadcast feeding it is IdentityBroadcastMode (crossJoin of a
    # single-row aggregate), not a keyed HashedRelation of a real table
    assert "IdentityBroadcastMode" in plan
    # and the build side is an aggregate with NO grouping keys (1 row):
    # 'Keys: []' in the formatted HashAggregate details
    assert "Keys: []" in plan


def test_q204_q205_bnlj_rows_are_one_row_scalar_broadcasts(spark):
    """Same adjudication as q64 for the round-3 diagnostics: their BNLJ
    plan rows are all crossJoins of 1-row aggregates (IdentityBroadcastMode,
    grouping-free build side), never data-relation nested loops."""
    import re

    from project_1_greentech_logistics_data_pipeline_spark.operators.skew import (
        q204_key_skew_profile,
        q205_join_size_forecast,
    )

    for fn in (q204_key_skew_profile, q205_join_size_forecast):
        plan = explain_str(fn(spark, SF))
        tree_bnlj = re.findall(r"BroadcastNestedLoopJoin [^\n(]*", plan)
        assert tree_bnlj, fn.__name__  # the scalar crossJoins are expected
        assert all("Build" in row for row in tree_bnlj), (fn.__name__, tree_bnlj)
        assert "IdentityBroadcastMode" in plan, fn.__name__
        assert "Keys: []" in plan, fn.__name__


def _plan_details(plan: str) -> dict:
    """id -> details body for each `(N) Operator` block of a formatted plan."""
    import re

    out = {}
    for m in re.finditer(
        r"^\((\d+)\) [^\n]+\n((?:(?!^\(\d+\) )[^\n]*\n?)*)", plan, re.M
    ):
        out[int(m.group(1))] = m.group(2)
    return out


def _non_one_row_identity_broadcasts(plan: str) -> list:
    """Exchange ids of IdentityBroadcastMode broadcasts (the kind that feed
    BroadcastNestedLoopJoin) whose build SUBTREE is not provably <= 1 row.

    Anchored to the build side, not the whole plan string: walking down
    from each such BroadcastExchange in the tree section, skipping
    row-count-preserving wrappers (Filter/Project), the first real operator
    must be a HashAggregate with empty grouping keys (`Keys: []` in ITS
    details block). A plan-wide 'IdentityBroadcastMode in plan' or
    'Keys: [] in plan' check is vacuous — a BNLJ's own broadcast always
    uses IdentityBroadcastMode, and any unrelated scalar aggregate
    elsewhere in the plan contributes a 'Keys: []'."""
    import re

    det = _plan_details(plan)
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        mm = re.search(r"BroadcastExchange \((\d+)\)\s*$", line)
        if not mm:
            continue
        exch_id = int(mm.group(1))
        if "IdentityBroadcastMode" not in det.get(exch_id, ""):
            continue  # keyed HashedRelation (a BHJ build) — not BNLJ-bound
        indent = line.index("BroadcastExchange")
        ok = False
        j = i + 1
        while j < len(lines):
            cm = re.search(r"([A-Za-z]+(?: [A-Za-z]+)*) \((\d+)\)\s*$", lines[j])
            if not cm or lines[j].find(cm.group(1)) <= indent:
                break  # dedent: left the build subtree
            name = cm.group(1)
            if name in ("Filter", "Project"):
                j += 1
                continue
            ok = name == "HashAggregate" and "Keys: []" in det.get(
                int(cm.group(2)), ""
            )
            break
        if not ok:
            bad.append(exch_id)
    return bad


def test_every_bnlj_bearing_plan_is_a_one_row_scalar_broadcast(spark):
    """Surface-wide extension of the q64/q204/q205 adjudication (VERDICT r4
    item 4): walk EVERY declared query's physical plan and, wherever a
    BroadcastNestedLoopJoin appears (q167/q179/q186/q119/q161/q166/q87
    today), require the benign shape — the build subtree bounded to one
    row (grouping-free aggregate under the IdentityBroadcastMode
    exchange), never a data relation. A future plan regression that
    introduces a real nested loop anywhere on the surface fails here
    instead of hiding among the adjudicated rows."""
    import re

    import __spark_entry__ as entrymod

    # BNLJ carriers whose broadcast build is NOT a 1-row aggregate but is
    # bounded-small by construction (inspected by hand; the bound does not
    # grow with fact-table size, so the nested loop stays O(fact * O(1))):
    ADJUDICATED_BOUNDED_BUILD = {
        "q08b_join_cross": "deliberate cross join; build is the 5-row region dim",
        "q31_range_join_bands": "build is the literal price-band table (4 rows)",
        "q48_knn_bruteforce": "build is the constant N_QUERIES query set "
        "(non-equi != condition forces BNLJ; the corpus side streams)",
        "q166_hll_audience_overlap": "build is per-event-type HLL sketches "
        "(|event types| rows, pairwise overlap)",
    }
    offenders = {}
    bnlj_queries = []
    for name, fn in entrymod.queries().items():
        plan = explain_str(fn(spark, SF))
        if not re.search(r"BroadcastNestedLoopJoin ", plan):
            continue
        bnlj_queries.append(name)
        if name in ADJUDICATED_BOUNDED_BUILD:
            continue
        bad = _non_one_row_identity_broadcasts(plan)
        if bad:
            offenders[name] = (
                f"BNLJ build subtree(s) at exchange id(s) {bad} are not "
                "grouping-free 1-row aggregates — inspect the plan and "
                "either fix the join or add an adjudication entry with "
                "the boundedness argument"
            )
    assert not offenders, f"non-scalar BroadcastNestedLoopJoin plans: {offenders}"
    # the sweep must actually be exercising the known BNLJ carriers —
    # if this set goes empty the regex or the plans changed shape
    assert len(bnlj_queries) >= 5, bnlj_queries
    # and adjudication entries must not outlive their BNLJ (stale rows
    # would quietly whitelist a future, different nested loop)
    stale = set(ADJUDICATED_BOUNDED_BUILD) - set(bnlj_queries)
    assert not stale, f"adjudicated queries no longer carry a BNLJ: {stale}"


def test_bnlj_build_subtree_checker_detects_data_relation(spark):
    """Meta-check: the subtree walker actually reds on a genuine
    data-relation nested loop (a non-equi crossish join of two real
    tables), and greens on the benign 1-row scalar-broadcast shape."""
    from pyspark.sql import functions as F

    from project_1_greentech_logistics_data_pipeline_spark.sources.readers import (
        load_table,
    )

    n = load_table(spark, SF, "nation")
    c = load_table(spark, SF, "customer")
    # real data-relation BNLJ: non-equi-only condition, nation broadcast
    bad_plan = explain_str(
        c.join(F.broadcast(n), c.c_nationkey != n.n_nationkey).select("c_custkey")
    )
    assert "BroadcastNestedLoopJoin" in bad_plan
    assert _non_one_row_identity_broadcasts(bad_plan), (
        "walker missed a data-relation BNLJ build"
    )
    # benign: crossJoin of a 1-row aggregate
    ok_plan = explain_str(
        c.crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_total"))))
        .select("c_custkey", "n_total")
    )
    assert "BroadcastNestedLoopJoin" in ok_plan
    assert not _non_one_row_identity_broadcasts(ok_plan), (
        "walker flagged the benign scalar-broadcast shape"
    )


def test_strip_initial_plan_sections_handles_nested_cached_plans():
    """The census parser must drop every '== Initial Plan ==' BLOCK —
    including marker pairs nested inside an InMemoryTableScan's cached
    relation — while keeping all Final-Plan content (review-caught: a
    first-marker split truncated every cache-bearing query's census).
    Canned text mirrors the real simple-mode layout: section content is
    drawn AT the marker's indent."""
    from project_1_greentech_logistics_data_pipeline_spark.plans.inspect import (
        strip_initial_plan_sections,
    )

    plan = "\n".join(
        [
            "== Physical Plan ==",
            "AdaptiveSparkPlan isFinalPlan=true",
            "+- == Final Plan ==",
            "   *(3) BroadcastHashJoin [k], [k], Inner, BuildRight",
            "   :- InMemoryTableScan [k, s]",
            "   :     +- InMemoryRelation [k, s], StorageLevel(memory)",
            "   :           +- AdaptiveSparkPlan isFinalPlan=true",
            "   :              +- == Final Plan ==",
            "   :                 Exchange hashpartitioning(k, 8)",
            "   :                 +- *(1) Range (0, 1000, step=1)",
            "   :              +- == Initial Plan ==",
            "   :                 Exchange hashpartitioning(k, 8)  [nested-initial]",
            "   :                 +- Range (0, 1000, step=1)",
            "   +- BroadcastExchange HashedRelationBroadcastMode",
            "      +- Exchange hashpartitioning(k, 8)  [outer-final-after-nested]",
            "         +- *(2) Filter isnotnull(k)",
            "+- == Initial Plan ==",
            "   SortMergeJoin [k], [k], Inner  [outer-initial]",
            "   +- Exchange hashpartitioning(k, 8)  [outer-initial]",
        ]
    )
    kept = strip_initial_plan_sections(plan)
    # the whole outer final tree survives, including content AFTER the
    # nested cached plan's Initial block
    assert "outer-final-after-nested" in kept
    assert "BroadcastHashJoin" in kept and "*(2) Filter" in kept
    # nested cached FINAL content is kept (it ran at materialization)
    assert "*(1) Range" in kept
    # every Initial block is gone, nested and top-level
    assert "nested-initial" not in kept and "outer-initial" not in kept
    assert "SortMergeJoin" not in kept
    # net exchange census: nested final 1 + outer broadcast build 1
    assert kept.count("Exchange hashpartitioning") == 2


def test_strip_initial_plan_sections_survives_marker_reorder():
    """Belt-and-braces (advice-caught): the stripper must not silently
    depend on Final always printing before Initial. If a Final marker
    appears at the same indent AFTER an Initial block — a hypothetical
    future-Spark reorder — its content must be KEPT, not swallowed by
    the still-active skip."""
    from project_1_greentech_logistics_data_pipeline_spark.plans.inspect import (
        strip_initial_plan_sections,
    )

    plan = "\n".join(
        [
            "== Physical Plan ==",
            "AdaptiveSparkPlan isFinalPlan=true",
            "+- == Initial Plan ==",
            "   Exchange hashpartitioning(k, 8)  [initial-content]",
            "   +- Range (0, 1000, step=1)",
            "+- == Final Plan ==",
            "   *(1) HashAggregate(keys=[k])  [final-after-initial]",
            "   +- Exchange hashpartitioning(k, 8)",
        ]
    )
    kept = strip_initial_plan_sections(plan)
    assert "final-after-initial" in kept
    assert "initial-content" not in kept
    assert kept.count("Exchange hashpartitioning") == 1


def test_strip_initial_plan_sections_drops_nested_final_marker_in_skip():
    """Review-caught leak: a cached relation nested INSIDE a skipped
    Initial block prints its own deeper '== Final Plan ==' marker; that
    marker line belongs to the skipped block and must not be appended to
    the stripped output (the Final branch must only keep markers that
    actually terminate a skip at their own level or shallower)."""
    from project_1_greentech_logistics_data_pipeline_spark.plans.inspect import (
        strip_initial_plan_sections,
    )

    plan = "\n".join(
        [
            "== Physical Plan ==",
            "AdaptiveSparkPlan isFinalPlan=true",
            "+- == Final Plan ==",
            "   *(1) Project [k]  [outer-final]",
            "+- == Initial Plan ==",
            "   InMemoryTableScan [k]  [initial-content]",
            "      +- InMemoryRelation [k]",
            "            +- AdaptiveSparkPlan isFinalPlan=true",
            "               +- == Final Plan ==",
            "                  Exchange hashpartitioning(k, 8)  [nested-in-initial]",
            "               +- == Initial Plan ==",
            "                  Exchange hashpartitioning(k, 8)  [nested-initial]",
        ]
    )
    kept = strip_initial_plan_sections(plan)
    assert "outer-final" in kept
    assert "initial-content" not in kept
    assert "nested-in-initial" not in kept and "nested-initial" not in kept
    # exactly ONE Final marker survives — the outer one; the nested one
    # inside the skipped Initial block is dropped with its block
    assert kept.count("== Final Plan ==") == 1
    assert kept.count("Exchange hashpartitioning") == 0


def test_live_explain_prints_final_before_initial(spark):
    """Pin the layout assumption the census stripper's primary path rests
    on: on THIS Spark, an executed adaptive plan's simple-mode
    explainString prints '== Final Plan ==' before '== Initial Plan =='
    (the reorder fallback above covers a future version flipping it, but
    a flip should also fail loudly here so the census gets re-audited)."""
    from project_1_greentech_logistics_data_pipeline_spark.plans.inspect import (
        explain_str,
    )

    df = (
        spark.range(1000)
        .selectExpr("id % 7 AS k", "id AS v")
        .groupBy("k")
        .count()
    )
    df.collect()
    text = explain_str(df, mode="simple")
    f, i = text.find("== Final Plan =="), text.find("== Initial Plan ==")
    assert f != -1 and i != -1, "AQE sections missing from executed explain"
    assert f < i, "Spark changed Final/Initial ordering — re-audit the census"
