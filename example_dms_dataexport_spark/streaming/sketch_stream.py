"""Continuous COUNT(DISTINCT) maintenance: a fact-row stream folded into
a stored HLL sketch rollup (``operators.sketches``).

Exact incremental rollups (``rollup_stream``) cannot maintain distinct
counts — a delete/duplicate cannot be un-counted without the full value
set. Mergeable sketches can: each micro-batch is sketched
(``distinct_sketch_rollup`` — one vocabulary-sized aggregation over the
batch only) and UNION-merged into the stored per-group state
(``merge_rollups``), so "distinct users per (day, dimension)" tracks an
append-only event feed with per-batch cost O(|batch| + |rollup|) and the
fact table is never rescanned. Estimates at any coarser grain come from
``rollup_to`` + ``estimate`` on the stored state alone.

Inserts only: an HLL is a monotone set summary, so retracting a deleted
row is undefined — the right semantics for append-only telemetry/event
feeds (q71/q87's family). Exactly-once via the same ``guarded_fold``
recipe as the exact rollup stream: the last-applied batch id commits
atomically with the sketch state, replays within a checkpoint lineage
are skipped, and a lineage reset requires reseeding
(tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators import sketches
from ..sources.warehouse import ParquetWarehouse
from .rollup_stream import guarded_fold


def start_sketch_stream(
    spark: SparkSession,
    rows: DataFrame,
    warehouse: ParquetWarehouse,
    sketch_table: str,
    keys: Sequence[str],
    value_col: str,
    checkpoint_dir: str,
    lg_k: int = sketches.LG_K,
    available_now: bool = True,
) -> StreamingQuery:
    """Fold a STREAMING DataFrame of fact rows into ``sketch_table``
    ((keys..., sketch) per group), which must already exist — seed it
    with ``sketches.distinct_sketch_rollup`` over the initial facts (or
    an empty relation with the same schema)."""

    def fold(batch: DataFrame) -> DataFrame:
        delta = sketches.distinct_sketch_rollup(
            batch.select(*keys, value_col), list(keys), value_col, lg_k
        )
        current = warehouse.read(spark, sketch_table)
        return sketches.merge_rollups(current, delta, list(keys))

    writer = (
        rows.writeStream.foreachBatch(
            guarded_fold(warehouse, sketch_table, checkpoint_dir, fold)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_cms_stream(
    spark: SparkSession,
    rows: DataFrame,
    warehouse: ParquetWarehouse,
    cms_table: str,
    item_col: str,
    checkpoint_dir: str,
    depth: int | None = None,
    width: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """The frequency twin of ``start_sketch_stream``: fold a streaming
    item feed into stored count-min state (``operators.freq.cms_sketch``
    — (d, slot, n) rows, at most depth*width regardless of feed size),
    so any item's approximate count is answerable from the state alone
    (``cms_lookup``) without rescanning the feed. Per-batch cost
    O(|batch| + depth*width); depth/width are fixed at stream start —
    that cell alignment is what keeps every delta mergeable. Same
    exactly-once guarded fold and append-only semantics as the HLL and
    histogram maintainers; ``cms_table`` must be seeded first (initial
    items, or an empty (d, slot, n) relation)."""
    from ..operators import freq

    d = depth if depth is not None else freq.CMS_DEPTH
    w = width if width is not None else freq.CMS_WIDTH

    def fold(batch: DataFrame) -> DataFrame:
        delta = freq.cms_sketch(batch.select(item_col), item_col, d, w)
        current = warehouse.read(spark, cms_table)
        return freq.merge_cms(current, delta)

    writer = (
        rows.writeStream.foreachBatch(
            guarded_fold(warehouse, cms_table, checkpoint_dir, fold)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_histogram_stream(
    spark: SparkSession,
    rows: DataFrame,
    warehouse: ParquetWarehouse,
    hist_table: str,
    keys: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    checkpoint_dir: str,
    n_bins: int = 256,
    available_now: bool = True,
) -> StreamingQuery:
    """The quantile twin of ``start_sketch_stream``: fold a streaming
    fact feed into stored per-group histogram state
    (``sketches.histogram_sketch`` — (keys..., bin, n) rows), so any
    percentile is answerable from the state alone
    (``histogram_percentile``) without rescanning the feed. Per-batch
    cost O(|batch| + groups x n_bins); bin edges are fixed at stream
    start, which is what keeps every delta mergeable with the stored
    state. Same exactly-once guarded fold and append-only semantics as
    the HLL maintainer; ``hist_table`` must be seeded first (initial
    facts, or an empty (keys..., bin, n) relation)."""

    def fold(batch: DataFrame) -> DataFrame:
        delta = sketches.histogram_sketch(
            batch.select(*keys, value_col), list(keys), value_col, lo, hi, n_bins
        )
        current = warehouse.read(spark, hist_table)
        return sketches.merge_histograms(current, delta, list(keys))

    writer = (
        rows.writeStream.foreachBatch(
            guarded_fold(warehouse, hist_table, checkpoint_dir, fold)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_kll_stream(
    spark: SparkSession,
    rows: DataFrame,
    warehouse: ParquetWarehouse,
    kll_table: str,
    keys: Sequence[str],
    value_col: str,
    checkpoint_dir: str,
    k: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """The bounds-free quantile twin of ``start_histogram_stream``: fold
    a streaming fact feed into stored per-group KLL state
    (``operators.kll`` — (keys..., levels, parities, n, err_bound)
    rows), so any quantile is answerable from the state alone
    (``kll_quantile``) with its rank-error certificate, no bin edges
    fixed up front and the feed never rescanned. Per-batch cost
    O(|batch| + groups x k x log). Unlike the histogram/CMS maintainers
    the folded state is BATCH-ORDER dependent (compaction choices
    depend on arrival order) — but the certificate and the exact weight
    conservation hold for every fold order, which is the contract the
    parity test pins. Same exactly-once guarded fold and append-only
    semantics as the other maintainers; ``kll_table`` must be seeded
    first (initial facts, or an empty state relation)."""
    from ..operators import kll

    kk = k if k is not None else kll.DEFAULT_K

    def fold(batch: DataFrame) -> DataFrame:
        delta = kll.kll_sketch(
            batch.select(*keys, value_col), list(keys), value_col, kk
        )
        current = warehouse.read(spark, kll_table)
        return kll.kll_merge(current.unionByName(delta), list(keys), kk)

    writer = (
        rows.writeStream.foreachBatch(
            guarded_fold(warehouse, kll_table, checkpoint_dir, fold)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
