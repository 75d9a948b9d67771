"""Continuous SCD2 dimension maintenance: a change-row stream folded
into a stored history table via ``operators.scd.scd2_apply_delta``.

Batch q124 proves the fold equals a full-stream rebuild; this driver
runs the same fold per micro-batch, so the stored dimension history
tracks the CDC feed with per-batch cost O(|batch| + touched open rows)
and the history is never rescanned — the dimension twin of
``rollup_stream`` (facts) and the third consumer of the shared
exactly-once ``guarded_fold`` (batch_id committed atomically with the
state, crash-replayed batches skipped).

Ordering across batches: the file source lists files in order, so a
well-formed CDC feed delivers each key's changes monotonically; a late
file (a batch row older than its key's open version) trips
``scd2_apply_delta``'s order guard and fails the batch LOUDLY instead
of silently corrupting intervals — the recovery is a rebuild
(``scd2_from_changes``) from the full retained stream, the same answer
every incremental view gives to out-of-order history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.scd import scd2_apply_delta
from ..sources.warehouse import ParquetWarehouse
from .rollup_stream import guarded_fold


def start_scd2_stream(
    spark: SparkSession,
    changes: DataFrame,
    warehouse: ParquetWarehouse,
    history_table: str,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] | None,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Fold a STREAMING DataFrame of state observations (key + attrs +
    ts [+ tiebreaks]) into ``history_table``, which must already exist —
    seed it with ``scd2_from_changes`` over the initial load (an empty
    change set seeds an empty history)."""

    def fold(batch: DataFrame) -> DataFrame:
        current = warehouse.read(spark, history_table)
        return scd2_apply_delta(
            current,
            batch,
            list(key_cols),
            ts_col,
            list(attr_cols),
            tiebreak_cols=list(tiebreak_cols or []) or None,
        )

    writer = (
        changes.writeStream.foreachBatch(
            guarded_fold(warehouse, history_table, checkpoint_dir, fold)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
