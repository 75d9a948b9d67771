"""Text analysis over the ``documents`` table: token stats, language ID,
quality scoring, and rolling-hash fingerprints.

These are the per-document filters a pretraining-data pipeline runs before
dedup: everything is a single narrow projection over the scan — no shuffle,
no UDFs — so at 100 TB it runs at parquet-scan speed inside whole-stage
codegen with column pruning (only ``text`` + ids are read).

Each feature has a DuckDB twin in ``functions.texthash`` (sql_* generators)
so the correctness oracles hash-compare bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..partitioning import spread


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append token/quality/language/fingerprint feature columns.

    The token array is materialized ONCE in its own projection: the
    feature expressions reference it many times, and Catalyst's
    CollapseProject keeps multiply-referenced non-trivial columns
    materialized instead of re-inlining the tokenizer into every
    (interpreted) higher-order lambda.
    """
    c = F.col(text_col)
    toks = F.col("_toks")
    return (
        spread(df).withColumn("_toks", TH.tokens(c))
        .withColumns(
            {
                "n_tokens": F.size(toks),
                "n_bpe_tokens": TH.bpe_token_count(c),
                "n_uniq_tokens": F.size(F.array_distinct(toks)),
                "avg_token_len": TH.avg_token_len(toks),
                "lang_pred": TH.lang_id(toks),
                "quality": TH.quality_score(toks),
                "fingerprint": TH.fingerprint(c),
            }
        )
        .drop("_toks")
    )


def quality_filter(
    df: DataFrame, text_col: str = "text", min_quality: float = 0.5
) -> DataFrame:
    """Keep documents above a quality threshold (the corpus-cleaning gate)."""
    return (
        df.withColumn("_toks", TH.tokens(F.col(text_col)))
        .filter(TH.quality_score(F.col("_toks")) >= min_quality)
        .drop("_toks")
    )
