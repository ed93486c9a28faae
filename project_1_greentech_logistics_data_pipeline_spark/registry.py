"""Central query registry: name -> (spark_fn, oracle_sql | None).

Assembles the per-module QUERIES dicts into the driver contract surface
(__spark_entry__.py::queries/oracle_sql). Registry order is the display order
in CORRECTNESS reports, and the driver verifies the FIRST 50 oracle-backed
queries only — so ordering is rotated per round to get every oracle query a
driver-stamped row. Round 1 stamped the 50 names in _R01_STAMPED; round 2
puts every not-yet-stamped oracle query first (47 of them), then q22 (whose
round-1 row was a type-mismatch fail, now fixed), then the rest.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Names that already have a green driver CORRECTNESS row (round 1 stamped the
# first 50 oracle queries in the then-current import order; q22 was the one
# hash-mismatch and is re-queued near the front for a fresh row).
_R01_STAMPED = frozenset(
    {
        "q01_pricing_summary", "q02_filter_project", "q03_predicates",
        "q04_join_multiway_broadcast", "q05_join_left_outer", "q06_join_semi",
        "q07_join_anti", "q08_join_theta", "q08b_join_cross", "q09_agg_basic",
        "q10_agg_distinct", "q11_agg_rollup", "q12_agg_cube",
        "q13_window_topk_per_key", "q14_window_lag_lead_rank",
        "q15_window_running_frames", "q16_sort_limit_topk", "q17_set_ops",
        "q17b_union_distinct", "q18_grouping_sets", "q104_window_value_functions",
        "q105_mode_argmin", "q107_union_by_name_missing", "q108_null_safe_join",
        "q20_string_funcs", "q21_date_funcs", "q23_array_funcs",
        "q24_json_extract", "q25_conditional", "q26_map_funcs",
        "q76_decimal_money", "q77_json_construction", "q100_try_functions",
        "q101_map_transformations", "q113_parameterized_sql",
        "q114_lateral_alias_values", "q30_asof_join", "q31_range_join_bands",
        "q32_tumbling_window_agg", "q33_sessionize", "q34_latest_per_key",
        "q94_hierarchical_time_rollup", "q97_binned_interval_join",
        "q111_funnel_analysis", "q112_cohort_retention",
        "q60_tpch_q3_shipping_priority", "q61_tpch_q5_local_volume",
        "q27_explode_token_freq", "q19_percentiles_moments",
    }
)


def _priority(name: str, sql: str | None) -> int:
    """Driver-verification priority for the first-50 stamping window:
    q22 (round-1 fail, fixed) and the 47 round-1-unstamped oracles are
    guaranteed in (48 rows); oracles added in round 2+ fill the remaining
    slots and rotate into later rounds; already-stamped oracles next;
    rows-only queries last."""
    if sql is None:
        return 4
    if name == "q22_math_funcs":
        return 0
    if name in _R01_STAMPED:
        return 3
    return 1 if name in _R01_UNSTAMPED else 2


# Oracle queries that existed in round 1 but sat past the driver's 50-row
# window (no CORRECTNESS row yet) — must be stamped in round 2.
_R01_UNSTAMPED = frozenset(
    {
        "q35_pivot", "q36_unpivot", "q82_tpch_q7_volume_shipping",
        "q83_tpch_q8_market_share", "q88_tpch_q9_profit",
        "q84_tpch_q10_returned_items", "q85_tpch_q19_disjunctive",
        "q86_tpch_q21_waiting_supplier", "q87_tpch_q22_dormant_customers",
        "q89_variant_semistructured", "q90_udtf_leading_tokens",
        "q98_tpch_q13_custdist", "q99_pandas_udaf_geomean", "q106_yoy_growth",
        "q62_correlated_scalar_subquery", "q63_having_large_volume_orders",
        "q64_scalar_subquery_threshold", "q65_notin_anti_subquery",
        "q66_conditional_agg_promo_share", "q67_exists_group_priority",
        "q68_window_range_frame", "q69_collect_sorted_arrays",
        "q70_groupmin_joinback", "q71_sliding_window_agg",
        "q72_full_outer_join", "q80_join_right_outer",
        "q81_window_distribution", "q43_dedup_exact_docs",
        "q43b_dedup_exact_events", "q44_ngram_jaccard_neardup",
        "q47_embedding_cosine_neardup", "q73_neardup_clusters",
        "q78_training_data_prep", "q109_decontamination", "q48_knn_bruteforce",
        "q96_embedding_quantize_int8", "q40_text_stats", "q41_fingerprint",
        "q42_lang_id", "q91_bpe_token_count", "q92_rolling_hash_fingerprint",
        "q93_lexicon_sentiment", "q102_document_chunking",
        "q103_sequence_packing", "q110_fuzzy_entity_match",
        "q50_multimodal_meta", "q75_grouped_zscore_pandas",
    }
)


def _collect() -> dict[str, tuple[Callable, str | None]]:
    out: dict[str, tuple[Callable, str | None]] = {}
    from .operators import relational

    modules = [relational]
    for modname in ("scalar", "temporal", "classics", "classics2", "classics3", "quality", "subqueries", "dedup", "similarity", "text", "multimodal", "pipeline_queries", "merge", "skew", "analytics", "text2", "bpe", "graph"):
        try:
            mod = __import__(f"{__package__}.operators.{modname}", fromlist=[modname])
            modules.append(mod)
        except ImportError:
            continue
    for mod in modules:
        for name, pair in getattr(mod, "QUERIES", {}).items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = pair
    ranked = sorted(
        enumerate(out.items()), key=lambda t: (_priority(t[1][0], t[1][1][1]), t[0])
    )
    return {name: pair for _, (name, pair) in ranked}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _collect().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _collect().items() if sql is not None}
