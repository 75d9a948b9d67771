"""Mergeable distinct-count sketches (HyperLogLog, Apache DataSketches)
— the pattern that makes "distinct users per day per dimension" viable
at 100 TB: exact COUNT(DISTINCT) must re-shuffle raw keys for every
re-aggregation, while a stored sketch is a few KB per group, merges
associatively across partitions/batches/time, and answers rollups to
any coarser grain WITHOUT touching the fact table again.

Built on Spark 4's built-in DataSketches HLL functions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``), so
sketches are JVM-side binary columns — storable in the parquet
warehouse next to the rollup they summarize (the sketch-as-state
analogue of ``operators.incremental``'s exact deltas; exact deltas
can't maintain COUNT(DISTINCT), sketches can).

Determinism: a DataSketches HLL is a pure function of the inserted
value set (per lgK), so re-building, merging batch-wise, or rolling up
yields byte-compatible estimates — pinned by the equality tests. No SQL
oracle: DuckDB's approx sketches are not bit-compatible, so this family
is pytest-gated (the documented weaker check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LG_K = 12  # 2^12 registers — ~1.6% relative error, ~4 KB per sketch


def rel_tolerance(lg_k: int = LG_K, sigmas: float = 4.0) -> float:
    """Relative-error tolerance for accuracy contracts, derived from the
    sketch's configured precision instead of a hard-coded percentage:
    HLL's standard error is 1.04/sqrt(2^lg_k) (~1.6% at lg_k=12), and the
    contracts allow ``sigmas`` of it (default 4 -> ~6.5%), so a freshly
    regenerated dataset can't legitimately flip a contract red on an
    unlucky-but-in-spec group."""
    return sigmas * 1.04 / (2.0 ** lg_k) ** 0.5


def distinct_sketch_rollup(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = LG_K
) -> DataFrame:
    """(keys..., sketch): one HLL sketch of ``value_col`` per group —
    the storable distinct-count state (one shuffle, map-side partial
    sketch merge)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def merge_rollups(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two sketch rollups group-wise (new batch into stored state).
    Groups present in only one side keep their sketch unchanged —
    implemented as union + re-aggregation, which Spark's partial
    aggregation turns into a sketch-sized (never fact-sized) shuffle."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(F.hll_union_agg("sketch", F.lit(False)).alias("sketch"))
    )


def rollup_to(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grain (e.g. daily ->
    monthly) — the fact table is never consulted."""
    return sketches.groupBy(*keys).agg(
        F.hll_union_agg("sketch", F.lit(False)).alias("sketch")
    )


def estimate(sketches: DataFrame) -> DataFrame:
    """Replace the binary sketch with its distinct-count estimate."""
    return sketches.withColumn(
        "n_distinct", F.hll_sketch_estimate("sketch").cast("long")
    ).drop("sketch")
