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
# Round 16 window: FORCED with ZERO spare slots — exactly the 50 faces
# whose latest green driver row is r13 (the CORRECTNESS_r13.json keys;
# the N-2 freshness floor makes every one of them mandatory this round,
# per tools/check_freshness.py). No new face can register in r16; new
# capability work this round is pytest-gated or folded into existing
# faces' fixtures (the q114/q139 pattern). r17's rotation seed is the
# r14 cohort (also exactly 50, zero spare again).
PRIORITY = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_orders",
    "q04_priority_counts",
    "q05_forecast_revenue",
    "q06_distinct_segments",
    "q07_union_nation_keys",
    "q10_top_orders_per_customer",
    "q11_latest_event_per_user",
    "q17_load_plan",
    "q19_text_features",
    "q20_corpus_profile",
    "q23_minhash_signatures",
    "q25_simhash",
    "q34_sessionize",
    "q39_asof_attribution",
    "q42_event_gaps",
    "q46_token_chunks",
    "q47_line_dedup",
    "q48_unigram_logprob",
    "q50_pack_chunks",
    "q51_duplicate_spans",
    "q52_tfidf_top_terms",
    "q55_bpe_pair_counts",
    "q56_mixture_sample",
    "q57_kmeans_assign",
    "q58_embedding_decontam",
    "q67_incremental_neardup",
    "q70_knn_quantized",
    "q71_distinct_sketch_rollup",
    "q72_exact_stratified_sample",
    "q73_corpus_build",
    "q78_inverted_index",
    "q82_semantic_dedup",
    "q83_bm25_rank",
    "q84_quality_percentile",
    "q85_mixture_weights",
    "q86_leakage_safe_split",
    "q99_quantile_sketch_accuracy",
    "q100_heavy_hitters",
    "q101_token_budget_shards",
    "q102_audio_decode",
    "q103_cms_accuracy",
    "q104_domain_cap",
    "q105_global_shuffle_index",
    "q106_bpe_encode",
    "q107_embedding_moments",
    "q131_zone_merge_prune",
    "q132_jpeg_decode",
    "q134_jpeg_color_decode",
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
