"""Global row ordering at corpus scale — distributed zipWithIndex.

A training run wants every example numbered 0..N-1 in a deterministic
(usually pseudo-random) order: the global index drives shard assignment,
resume offsets, and epoch-stable shuffling. The naive Spark spelling —
``row_number() OVER (ORDER BY ...)`` with no PARTITION BY — collapses
the whole corpus into ONE task and is exactly the plan a 100 TB job
cannot run.

This module numbers rows with no global window:

1. ``repartitionByRange(n, keys)`` + ``sortWithinPartitions(keys)`` —
   one range shuffle gives a total sort split across n partitions
   (partition i holds a contiguous key range below partition i+1).
2. ``localCheckpoint(eager=False)`` pins that layout so the two
   downstream jobs (count, assign) read the same blocks instead of
   re-running the shuffle — the same two-pass shape as RDD
   ``zipWithIndex``, with the recompute traded for cached blocks.
   The pin is a CORRECTNESS requirement, not a cache optimization:
   ``repartitionByRange`` samples its boundaries, so an uncached
   recompute between the count job and the assign job could place
   rows in different partitions than the offsets were computed for.
3. A count per partition id — an n-row aggregate — is collected and
   prefix-summed on the driver (n = shuffle partitions, never data
   scale).
4. An Arrow-batched ``mapInPandas`` pass assigns
   ``offset[pid] + position-within-partition`` with a running counter
   per partition — in-place, no further shuffle, no per-row Python.

Because step 1 is a TOTAL sort under a strict total order (callers must
include a unique tie-break key), the assigned index equals the row's
global rank regardless of where the range sampler happened to place
partition boundaries — the output is deterministic even though the
boundary sampling is not.

The reference's engine exposes no ordering primitive at all (its row
numbering happens inside Snowflake, ref
control_migration_schema_script.sql:395-399 uses ROW_NUMBER only within
a per-key MERGE dedup); this operator is part of the training-pipeline
extension surface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..functions import texthash as TH


def global_index(
    df: DataFrame,
    order_by: list[Column | str],
    index_col: str = "idx",
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Append ``index_col`` = the row's 0-based global rank under
    ``order_by``.

    ``order_by`` MUST be a strict total order (include a unique key as
    the last sort column) — uniqueness is what makes the assignment
    independent of range-boundary placement. Ascending order only; wrap
    a column in a descending-friendly expression (e.g. negate) if
    needed.

    ``checkpoint_dir`` selects the layout pin for the two-pass
    (count, assign) protocol. Default None = ``localCheckpoint``:
    blocks live in executor storage — the right trade on a single node
    or short job, but on a real cluster an executor loss discards its
    blocks and kills the job mid-assign (localCheckpoint severs
    lineage, so there is no recompute path). Passing a RELIABLE
    checkpoint directory (HDFS/S3) writes the pinned layout to shared
    storage instead: executor loss then just re-reads the checkpointed
    blocks — the variant a 100 TB run should use. The extra cost is one
    materialized copy of the sorted input to distributed storage.
    ``setCheckpointDir`` is session-global; this function restores the
    previous directory after materializing (Spark offers no "unset", so
    if none was set before, ``checkpoint_dir`` remains in effect).

    Sizing ``num_partitions`` at scale: each range partition is sorted
    and (with a reliable dir) persisted whole, so pick
    ``num_partitions ≈ input_bytes / 1 GiB`` (e.g. ~100k partitions at
    100 TB) — large enough that a partition fits an executor's memory
    with headroom, small enough that the driver-side prefix sum (one
    collected count per partition) stays trivial.
    """
    if not order_by:
        raise ValueError("order_by must name at least one column")
    if index_col in df.columns:
        raise ValueError(f"column {index_col!r} already exists")
    pid_col = "__gidx_pid"
    if pid_col in df.columns:
        raise ValueError(
            f"column {pid_col!r} collides with the internal partition-id "
            "helper; rename it before calling global_index"
        )
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    laid_out = (
        df.repartitionByRange(int(n), *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn(pid_col, F.spark_partition_id())
    )
    if checkpoint_dir is not None:
        # setCheckpointDir is session-global; remember the prior value and
        # restore it after the eager materialization below so a later
        # .checkpoint() elsewhere in the application doesn't silently
        # land in this operator's directory. try/finally: the restore
        # must happen even when the materializing collect() throws.
        sc = df.sparkSession.sparkContext
        prior = sc.getCheckpointDir()
        sc.setCheckpointDir(checkpoint_dir)
        try:
            ordered = laid_out.checkpoint(eager=False)
            # n-row collect: one count per shuffle partition,
            # driver-bounded. This action materializes the (lazy)
            # checkpoint, so the dir can be restored right after.
            counts = (
                ordered.groupBy(pid_col)
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            )
        finally:
            if prior is not None:
                sc.setCheckpointDir(prior)
    else:
        ordered = laid_out.localCheckpoint(eager=False)
        counts = (
            ordered.groupBy(pid_col)
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r[pid_col]):
        offsets[row[pid_col]] = acc
        acc += row["c"]

    out_schema = StructType(
        [f for f in ordered.schema.fields if f.name != pid_col]
        + [StructField(index_col, LongType(), False)]
    )

    def assign(batches):
        seen: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf[pid_col].iloc[0])
            start = offsets[pid] + seen.get(pid, 0)
            seen[pid] = seen.get(pid, 0) + len(pdf)
            pdf = pdf.drop(columns=[pid_col])
            pdf[index_col] = np.arange(start, start + len(pdf), dtype=np.int64)
            yield pdf

    return ordered.mapInPandas(assign, schema=out_schema)


def shuffle_index(
    df: DataFrame,
    key_col: str,
    seed: str = "epoch0",
    index_col: str = "shuffle_idx",
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Deterministic pseudo-random global ordering: rank rows by
    ``poly_hash(seed || key)`` (tie-broken by the key itself, so the
    order is strict). Different ``seed`` strings give independent
    epoch shuffles; the same seed replays bit-identically — resumable
    training order without materializing a permutation table.
    """
    if "__gidx_h" in df.columns:
        raise ValueError(
            "column '__gidx_h' collides with the internal hash helper; "
            "rename it before calling shuffle_index"
        )
    h = TH.poly_hash(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string")))
    shuffled = df.withColumn("__gidx_h", h)
    out = global_index(
        shuffled,
        [F.col("__gidx_h"), F.col(key_col)],
        index_col=index_col,
        num_partitions=num_partitions,
        checkpoint_dir=checkpoint_dir,
    )
    return out.drop("__gidx_h")


def sql_shuffle_rank(key_expr: str, seed: str = "epoch0") -> str:
    """DuckDB twin of ``shuffle_index``'s ordering: an ORDER BY clause
    string ranking by the same poly_hash — for oracle restatements."""
    h = TH.sql_poly_hash(f"concat('{seed}:', CAST({key_expr} AS VARCHAR))")
    return f"{h}, {key_expr}"
