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
