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
# priority order, rotated each round so every query accumulates a recent
# green driver row on record (README "Driver correctness window").
# Round 8 window: the 9 queries whose latest driver row is r5 (the last
# stale rows on the books) go first, then the 9 queries new this round
# (never driver-checked), then 32 of the 48 whose latest row is r6. The
# 16 r6 rows deferred to round 9 — q08/q09/q12-q16/q35/q36/q54/q59-q61/
# q63/q66/q77 — are the simplest single-table projections/reshapes/
# grouping variants: no
# sketch state, no float accumulation, no operator shared with code touched
# this round, and all re-verified by the local exact-mode oracle sweep.
# Queries green in r7 rotate back in afterwards. q117-q121 (added after
# the window filled) carry local exact-sweep greens only this round and
# go to the FRONT of the round-9 window with the other deferrals.
PRIORITY = [
    # latest driver row is r5 (stale-most first)
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_orders",
    "q04_priority_counts",
    "q05_forecast_revenue",
    "q06_distinct_segments",
    "q07_union_nation_keys",
    "q23_minhash_signatures",
    "q25_simhash",
    # new in round 8, never driver-checked
    "q108_image_decode",
    "q109_salted_join_revenue",
    "q110_time_travel_diff",
    "q111_cluster_canonical",
    "q112_kll_quantile_accuracy",
    "q113_jdbc_roundtrip",
    "q114_bucketed_join_revenue",
    "q115_hybrid_retrieval",
    "q116_source_kl_divergence",
    # latest driver row is r6
    "q10_top_orders_per_customer",
    "q11_latest_event_per_user",
    "q17_load_plan",
    "q19_text_features",
    "q34_sessionize",
    "q39_asof_attribution",
    "q42_event_gaps",
    "q49_incremental_rollup",
    "q53_range_join_windows",
    "q62_funnel_stages",
    "q64_resample_ffill",
    "q65_trailing_hour_avg",
    "q68_quality_audit",
    "q69_skew_report",
    "q74_scd2_history",
    "q75_scd2_point_in_time",
    "q76_snapshot_diff",
    "q79_event_debounce",
    "q80_bloom_semi_join",
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
