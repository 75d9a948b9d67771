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
# Round 9 window: the 5 queries registered after the r8 window filled
# (q117-q121, never driver-checked) go first, then the 16 queries whose
# latest driver row is r6 (the documented r8 deferrals), then any faces
# new this round, then the lowest-numbered queries whose latest driver row
# is r7. The r7 rows deferred to round 10 (q46/q47/q48/q50/q51/q58/
# q67/q70-q73/q78/q82-q86/q99-q107 area, exact set = whatever doesn't
# fit the 50 — q46-q48/q50/q51 were dropped from the tail as q126-q130
# rotated in) all carry green r7 driver rows plus the local exact-mode
# sweep this round.
PRIORITY = [
    # never driver-checked (registered after the r8 window filled)
    "q117_cdc_backlog",
    "q118_chunk_integrity",
    "q119_user_erasure_audit",
    "q120_pack_efficiency",
    "q121_scd2_current_view",
    # latest driver row is r6 (the r8 deferrals)
    "q08_customers_without_orders",
    "q09_active_customers",
    "q12_part_name_parsing",
    "q13_file_prefix_grouping",
    "q14_json_props",
    "q15_orders_by_month",
    "q16_hourly_event_windows",
    "q35_length_percentiles",
    "q36_rollup_acctbal",
    "q54_profile_orders",
    "q59_histogram_totalprice",
    "q60_pivot_lang_source",
    "q61_cube_flag_status",
    "q63_intersect_except",
    "q66_grouping_sets",
    "q77_unpivot_metrics",
    # new in round 9, never driver-checked
    "q122_png_decode",
    "q123_erasure_execution",
    "q124_scd2_delta_apply",
    "q125_group_commit_join",
    "q126_orc_stage_roundtrip",
    "q127_xml_stage_roundtrip",
    "q128_zonemap_prune",
    "q129_declared_layout_pipeline",
    "q130_zorder_multicol_prune",
    # latest driver row is r7 (lowest-numbered first)
    "q18_cdc_merge",
    "q20_corpus_profile",
    "q21_quality_filter",
    "q22_exact_dedup",
    "q24_minhash_dedup_pairs",
    "q26_simhash_pairs",
    "q27_ngram_jaccard_pairs",
    "q28_knn_brute",
    "q29_knn_lsh",
    "q30_knn_ivf",
    "q31_embedding_dup_pairs",
    "q32_media_decode",
    "q33_frame_sample",
    "q37_repetition_ratio",
    "q38_cleaning_pipeline",
    "q40_pii_redaction",
    "q41_vocab_df",
    "q43_dedup_clusters",
    "q44_decontaminate",
    "q45_stratified_sample",
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
