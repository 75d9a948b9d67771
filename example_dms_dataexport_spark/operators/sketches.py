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


# ---------------------------------------------------------------------------
# Mergeable quantile state: equi-width histogram sketch
# ---------------------------------------------------------------------------
# The percentile analogue of the HLL rollup above: exact percentiles need
# a full sort (or a whole-group window) per re-aggregation, while a
# (keys..., bin, n) histogram is a few KB per group, merges by SUM across
# partitions/batches/grains, and answers any percentile to within one bin
# width WITHOUT re-touching the fact table. Bin edges are fixed up front
# ([lo, hi) in n_bins equal steps), so two independently-built histograms
# are always bin-compatible — the property that makes the state mergeable.


def histogram_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """(keys..., bin, n): equi-width histogram of ``value_col`` per group
    — the storable/mergeable quantile state. One shuffle on
    (keys..., bin) with map-side partial counts; values outside [lo, hi)
    clamp into the edge bins so totals are preserved."""
    if not hi > lo:
        raise ValueError("need hi > lo")
    step = (hi - lo) / n_bins
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(step)).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.select(*keys, b.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_histograms(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two histogram states group-wise (new batch into stored
    state): union + sum — bin-aligned by construction."""
    return (
        a.unionByName(b)
        .groupBy(*keys, "bin")
        .agg(F.sum("n").alias("n"))
    )


def histogram_percentile(
    hist: DataFrame,
    keys: list[str],
    q: float,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """(keys..., estimate): the q-th percentile reconstructed from stored
    histogram state — the UPPER EDGE of the first bin whose cumulative
    count reaches ceil(q * total), which is within one bin width above
    the exact value-based percentile. The cumulative window runs over
    n_bins rows per group (sketch-sized, never fact-sized)."""
    from pyspark.sql import Window

    step = (hi - lo) / n_bins
    w = Window.partitionBy(*keys).orderBy("bin")
    tot = Window.partitionBy(*keys)
    cum = (
        hist.withColumn("_cum", F.sum("n").over(w))
        .withColumn("_tot", F.sum("n").over(tot))
        .filter(F.col("_cum") >= F.ceil(F.lit(q) * F.col("_tot")))
    )
    first = cum.groupBy(*keys).agg(F.min("bin").alias("_bin"))
    return first.select(
        *keys,
        (F.lit(lo) + (F.col("_bin") + 1) * F.lit(step)).alias("estimate"),
    )
