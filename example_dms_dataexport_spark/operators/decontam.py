"""Benchmark decontamination — n-gram overlap against a held-out set.

The standard training-data hygiene step (GPT-3 §C, PaLM, Llama reports):
before training, flag/drop documents sharing word-n-grams with evaluation
benchmarks so test questions don't leak into the corpus. Semantically it
is an n-gram semi-join: count each candidate document's distinct n-grams
that appear anywhere in the reference set.

100 TB design: the reference (benchmark) side is small — thousands of
eval documents versus billions of training docs — so its distinct-n-gram
relation is the natural broadcast side. No hint is forced: AQE broadcasts
when it fits and falls back to a shuffle join when someone passes a huge
reference set. The candidate side streams through explode -> join ->
partial-aggregated groupBy (one shuffle on doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH


def ngram_overlap(
    df: DataFrame,
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, n_shared) for every candidate doc sharing >= 1 distinct
    word-n-gram with ANY reference document. Docs with zero overlap are
    absent (inner semi-count) — callers drop or anti-join as policy.
    """
    # tokens materialized at a projection boundary before the n-gram
    # lambda (see word_ngrams docstring: inline re-evaluation is ~15x)
    ref_grams = (
        ref.select(TH.tokens(F.col(text_col)).alias("_toks"))
        .select(F.explode(TH.word_ngrams(F.col("_toks"), n)).alias("g"))
        .distinct()
    )
    doc_grams = df.select(
        id_col, TH.tokens(F.col(text_col)).alias("_toks")
    ).select(id_col, F.explode(TH.word_ngrams(F.col("_toks"), n)).alias("g"))
    return (
        doc_grams.join(ref_grams, "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def decontaminate(
    df: DataFrame,
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shared: int = 0,
) -> DataFrame:
    """Drop candidate docs whose reference n-gram overlap exceeds
    ``max_shared`` (default: any overlap contaminates)."""
    dirty = (
        ngram_overlap(df, ref, id_col, text_col, n)
        .filter(F.col("n_shared") > max_shared)
        .select(id_col)
    )
    return df.join(dirty, id_col, "left_anti")
