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

# Faces written and oracle-verified locally but NOT yet registered with
# the driver: the freshness floor (tools/check_freshness.py) requires
# every *registered* new face to sit inside the 50-slot window, so in a
# slot-starved round new work stages here and promotes to @query when a
# rotation slot opens.  ``tools/check_oracle.py --staged`` exercises
# these against DuckDB exactly like registered faces.
STAGED: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def query(name: str, oracle: str | None):
    """Register a (spark, sf_dir) -> DataFrame callable with its DuckDB
    oracle SQL (None = driver records a weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = oracle
        return fn

    return deco


def staged_query(name: str, oracle: str | None):
    """Like ``query`` but holds the face out of the driver window until a
    rotation slot opens (promote by swapping the decorator to ``query``
    and appending the name to PRIORITY)."""

    def deco(fn):
        STAGED[name] = (fn, oracle)
        return fn

    return deco


# The driver's correctness harness records only the FIRST 50 registered
# queries each round (CORRECTNESS_r{N}.json is a 50-row window over
# registration order). load_all() therefore emits the maps in an explicit
# priority order, rotated each round so every query accumulates a recent
# green driver row on record (README "Driver correctness window").
# Round 17 window: 49 mandatory faces (the r14 cohort — every face whose
# latest green driver row is r14, per tools/check_freshness.py) plus ONE
# spare slot, spent on q150_wordpiece_merges: the first driver-oracle row
# for the r16 tokenizer batch (operators/wordpiece.py). The remaining r16
# capability faces stage in registry.STAGED (oracle-verified locally via
# `tools/check_oracle.py --staged`) and promote when r18 slots open.
PRIORITY = [
    "q08_customers_without_orders",
    "q09_active_customers",
    "q12_part_name_parsing",
    "q13_file_prefix_grouping",
    "q14_json_props",
    "q15_orders_by_month",
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
    "q108_image_decode",
    "q109_salted_join_revenue",
    "q110_time_travel_diff",
    "q111_cluster_canonical",
    "q112_kll_quantile_accuracy",
    "q113_jdbc_roundtrip",
    "q115_hybrid_retrieval",
    "q116_source_kl_divergence",
    "q133_group_cycle_consistency",
    "q135_stream_group_cycle",
    "q136_bloom_point_lookup",
    "q137_hybrid_merge_prune",
    "q138_pps_sample",
    "q139_bloom_partitioned_erase",
    "q140_scan_scoped_merge",
    "q141_recluster_merge_prune",
    "q142_delete_vectors",
    "q143_repetition_filter",
    "q150_wordpiece_merges",
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
