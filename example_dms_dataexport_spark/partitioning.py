"""Partitioning utilities — keep compute-heavy operators CPU-bound, not
partition-bound.

``spread`` fixes the narrow-input trap: a compute-heavy operator (shingle
hashing, signature aggregation, cosine scoring) inherits the scan's
partitioning, and a scan of few/small files yields fewer partitions than
cores, serializing the work. At 100 TB inputs arrive in thousands of
splits and ``spread`` is a no-op (it never *reduces* partitioning); on a
narrow input it pays one small round-robin shuffle of the raw rows to
unlock every core for the expensive per-row math that follows — the right
trade whenever downstream compute dominates the reshuffled bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the DataFrame has fewer partitions than
    the cluster has cores (or ``min_partitions``). Metadata-only check —
    triggers no job."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> "tuple[DataFrame, str]":
    """Append a Z-order (Morton) key over ``cols`` and return
    (df_with_key, key_column_name) — the multi-column data-skipping
    layout (Delta's OPTIMIZE ZORDER BY): lexicographic range-clustering
    on (a, b) gives file-level min/max locality on ``a`` only; bit
    interleaving gives EVERY listed column ~|files|^(1/n_cols) locality,
    so pushed range filters on any of them skip files.

    Buckets are equi-width over each column's observed [min, max]
    (computed in one 1-row aggregate broadcast back — same shape as the
    histogram); heavily skewed columns would want quantile buckets
    instead. NULLs land in bucket 0 (sort first, like NULLS FIRST).
    """
    from pyspark.sql import functions as F

    if not cols or bits * len(cols) > 62:
        raise ValueError("need 1+ columns with bits*len(cols) <= 62")
    n = (1 << bits) - 1
    mm = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
            )
        ]
    )
    out = df.crossJoin(F.broadcast(mm))
    bucket_cols = []
    for c in cols:
        lo, hi = F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
        v = F.col(c).cast("double")
        b = F.when(
            v.isNull() | (hi == lo), F.lit(0)
        ).otherwise(
            F.least(
                F.floor((v - lo) / ((hi - lo) / F.lit(float(n + 1)))), F.lit(n)
            )
        ).cast("long")
        bucket_cols.append(b)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucket_cols):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)),
                i * len(cols) + j,
            )
    out = out.withColumn("_zorder", z)
    return out.drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols]), "_zorder"
