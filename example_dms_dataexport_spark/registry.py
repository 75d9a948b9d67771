"""Shared query/oracle registry.

Query modules register via the ``query`` decorator; ``load_all()`` imports
every query module and returns the populated maps. The driver contract
(``__spark_entry__``) and local tools consume only this entry point.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str | None] = {}


def query(name: str, oracle: str | None):
    """Register a (spark, sf_dir) -> DataFrame callable with its DuckDB
    oracle SQL (None = driver records a weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness harness records only the FIRST 50 registered
# queries each round (CORRECTNESS_r{N}.json is a 50-row window over
# registration order). load_all() therefore emits the maps in an explicit
# priority order, rotated each round so every query accumulates a green
# driver row on record (README "Driver correctness window"). Round 6:
# the 20 queries that had never had a driver row through round 5, then
# the 16 whose last row predates round 5, then the queries whose oracle
# changed this round, then everything else in registration order.
PRIORITY = [
    # never driver-checked through r5
    "q49_incremental_rollup",
    "q53_range_join_windows",
    "q54_profile_orders",
    "q59_histogram_totalprice",
    "q60_pivot_lang_source",
    "q61_cube_flag_status",
    "q62_funnel_stages",
    "q63_intersect_except",
    "q64_resample_ffill",
    "q65_trailing_hour_avg",
    "q66_grouping_sets",
    "q68_quality_audit",
    "q69_skew_report",
    "q71_distinct_sketch_rollup",
    "q74_scd2_history",
    "q75_scd2_point_in_time",
    "q76_snapshot_diff",
    "q77_unpivot_metrics",
    "q79_event_debounce",
    "q80_bloom_semi_join",
    # last driver row predates round 5
    "q08_customers_without_orders",
    "q09_active_customers",
    "q10_top_orders_per_customer",
    "q11_latest_event_per_user",
    "q12_part_name_parsing",
    "q13_file_prefix_grouping",
    "q14_json_props",
    "q15_orders_by_month",
    "q16_hourly_event_windows",
    "q17_load_plan",
    "q18_cdc_merge",
    "q34_sessionize",
    "q35_length_percentiles",
    "q36_rollup_acctbal",
    "q39_asof_attribution",
    "q42_event_gaps",
    # oracle added/changed this round
    "q81_bpe_merges",
    "q87_sketch_accuracy",
    "q88_bigram_logprob",
    "q89_retention_cohorts",
    "q90_value_deciles",
    "q91_event_path_patterns",
    "q92_sketch_merge_accuracy",
    "q93_rolling_active_users",
    "q94_value_trend_regression",
    "q95_source_token_entropy",
    "q96_value_outliers",
    "q97_weekly_value_wow",
    "q98_cross_source_dup_matrix",
]


def load_all():
    from . import queries_llm, queries_relational  # noqa: F401

    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    order = [*PRIORITY, *(n for n in QUERIES if n not in PRIORITY)]
    return (
        {n: QUERIES[n] for n in order},
        {n: ORACLES[n] for n in order},
    )
