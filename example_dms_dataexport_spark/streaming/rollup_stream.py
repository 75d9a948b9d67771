"""Continuous materialized-view maintenance: a change-row stream folded
into a stored rollup via ``operators.incremental.update_rollup``.

Batch q49 proves the fold equals a full recompute; this driver runs the
same fold per micro-batch, so the stored aggregate tracks the fact
table's CDC feed with per-batch cost O(|batch| + |rollup|) and the fact
table is never scanned.  One code path for the fold semantics, two
drivers — the same structure as cdc_stream vs the batch merge.

Exactly-once: foreachBatch alone is at-least-once — if the driver dies
AFTER the warehouse overwrite succeeds but BEFORE the checkpoint records
the batch, the source replays it and a naive fold would re-apply the same
deltas to the POST-batch rollup, double-counting them.  The sink
therefore records the last-applied batch_id IN the same atomic overwrite
(``warehouse.overwrite(..., meta=...)`` writes the sidecar into the temp
dir before the swap), and ``fold_batch`` skips any batch_id it has
already applied — the standard idempotent-foreachBatch recipe.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.incremental import update_rollup
from ..sources.warehouse import ParquetWarehouse


def start_rollup_stream(
    spark: SparkSession,
    changes: DataFrame,
    warehouse: ParquetWarehouse,
    rollup_table: str,
    keys: Sequence[str],
    measures: Sequence[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Fold a STREAMING DataFrame of I/U/D change rows (op + before_*/
    after_* images, see operators.incremental) into ``rollup_table``,
    which must already exist (seed it with ``incremental.rollup``)."""
    # Lineage identity is the checkpoint PATH — normalize it so the same
    # lineage restarted with a differently spelled path (trailing slash,
    # relative vs absolute) still matches the stored guard and a crash-
    # replayed batch is not re-folded.
    lineage = os.path.realpath(checkpoint_dir)

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        meta = warehouse.read_meta(rollup_table)
        last = meta.get("last_batch_id")
        # Batch ids are monotonic only WITHIN one checkpoint lineage, so
        # the replay guard is scoped to it: a fresh checkpoint restarts
        # ids at 0 and its batch 0 may contain genuinely new files —
        # skipping it on the old lineage's last_batch_id would silently
        # drop that data. (Resetting the checkpoint without resetting the
        # rollup table therefore re-applies everything — at-least-once
        # across lineages; reseed the rollup when you reset the
        # checkpoint. tests/test_streaming.py pins both directions.)
        stored = meta.get("checkpoint")
        if (
            last is not None
            and stored is not None
            and os.path.realpath(stored) == lineage
            and batch_id <= last
        ):
            # crash-replay of a batch whose overwrite already committed —
            # folding it again would double-apply its deltas
            return
        current = warehouse.read(spark, rollup_table)
        merged = update_rollup(current, batch, keys, measures)
        # materialize BEFORE the overwrite: the fold reads the table it
        # replaces, and a failed/retried batch must re-read the old state
        merged.persist()
        merged.count()
        warehouse.overwrite(
            merged,
            rollup_table,
            meta={"checkpoint": lineage, "last_batch_id": batch_id},
        )
        merged.unpersist()

    writer = (
        changes.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
