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
# Round 15 window: the 49 queries whose latest green driver row is r12
# (the r13 rotation seed; the N-2 freshness floor means every one must
# re-check this round or round 16 fails `tools/check_freshness.py`),
# plus ONE spare slot — the first since r12. Per the r14 verdict, the
# spare re-attests q114_bucketed_join_revenue rather than registering a
# new face: this round changed the bucketed read path (the pending-
# delete mask in read_bucketed) and q114 is the zero-exchange
# co-located-join witness for it. Seed the r16 rotation with the r13
# cohort (the 50 faces rotated out here).
PRIORITY = [
    # latest driver row is r12 (lowest-numbered first) — all 49 fit
    "q16_hourly_event_windows",
    "q18_cdc_merge",
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
    "q35_length_percentiles",
    "q36_rollup_acctbal",
    "q37_repetition_ratio",
    "q38_cleaning_pipeline",
    "q40_pii_redaction",
    "q41_vocab_df",
    "q43_dedup_clusters",
    "q44_decontaminate",
    "q45_stratified_sample",
    "q54_profile_orders",
    "q59_histogram_totalprice",
    "q60_pivot_lang_source",
    "q61_cube_flag_status",
    "q63_intersect_except",
    "q66_grouping_sets",
    "q77_unpivot_metrics",
    "q117_cdc_backlog",
    "q118_chunk_integrity",
    "q119_user_erasure_audit",
    "q120_pack_efficiency",
    "q121_scd2_current_view",
    "q122_png_decode",
    "q123_erasure_execution",
    "q124_scd2_delta_apply",
    "q125_group_commit_join",
    "q126_orc_stage_roundtrip",
    "q127_xml_stage_roundtrip",
    "q128_zonemap_prune",
    "q129_declared_layout_pipeline",
    "q130_zorder_multicol_prune",
    "q144_composite_delete_fold",
    "q145_maintenance_cycle",
    "q146_avro_stage_roundtrip",
    "q147_group_snapshot_mask",
    "q148_dsir_importance_weights",
    "q149_mixture_temperature",
    # spare slot: re-attest the bucketed co-located join after this
    # round's read_bucketed pending-delete mask change
    "q114_bucketed_join_revenue",
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
