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
# driver row on record (README "Driver correctness window"). Round 7:
# never-driver-checked queries go first (q99-q107, new this round), then
# the two r6 rows that changed this round — q18 (decimal column now
# rendered driver-safely; r6 row was hash-red) and q71 (gained an
# accuracy-contract oracle; r6 row was no_oracle) — then the queries
# whose latest driver row is r5. 9 + 2 + 39 fills the 50-row window; the
# deferred-to-round-8 stale rows are the seven most-stable relational
# queries (q01-q07: green in r5, heavily pytest-covered) plus the two
# signature relations q23/q25 (each re-checked downstream every round by
# its pair join, q24/q26) — all re-verified by the local exact-mode
# oracle sweep.
PRIORITY = [
    # never driver-checked (new in round 7)
    "q105_global_shuffle_index",
    "q106_bpe_encode",
    "q107_embedding_moments",
    "q99_quantile_sketch_accuracy",
    "q100_heavy_hitters",
    "q101_token_budget_shards",
    "q102_audio_decode",
    "q103_cms_accuracy",
    "q104_domain_cap",
    # r6 rows superseded by this round's changes
    "q18_cdc_merge",
    "q71_distinct_sketch_rollup",
    # latest driver row is r5
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
    "q43_dedup_clusters",
    "q38_cleaning_pipeline",
    "q44_decontaminate",
    "q45_stratified_sample",
    "q46_token_chunks",
    "q50_pack_chunks",
    "q47_line_dedup",
    "q48_unigram_logprob",
    "q52_tfidf_top_terms",
    "q51_duplicate_spans",
    "q40_pii_redaction",
    "q41_vocab_df",
    "q55_bpe_pair_counts",
    "q56_mixture_sample",
    "q57_kmeans_assign",
    "q58_embedding_decontam",
    "q67_incremental_neardup",
    "q70_knn_quantized",
    "q72_exact_stratified_sample",
    "q73_corpus_build",
    "q78_inverted_index",
    "q82_semantic_dedup",
    "q83_bm25_rank",
    "q84_quality_percentile",
    "q85_mixture_weights",
    "q86_leakage_safe_split",
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
