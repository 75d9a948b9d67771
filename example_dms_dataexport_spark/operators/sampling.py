"""Deterministic (hash-based) sampling for corpus construction.

`df.sample()` draws from an RNG seeded per-partition: the selected rows
change whenever partitioning, file order, or cluster size changes — which
makes corpus mixes irreproducible across runs. Hash sampling instead makes
the keep/drop decision a pure function of the row's KEY: keep iff
``poly_hash(key) % BUCKETS < rate * BUCKETS``. Properties a training-data
pipeline needs:

- reproducible across runs, partitionings, clusters, and engines (the
  DuckDB oracle computes the identical decision);
- consistent under rate changes: the 10% sample is a superset of the 5%
  sample (same bucket order), so a mix can be dialed up without resampling;
- auditable: membership is re-derivable from the key alone.

Narrow no-shuffle filter over the scan; whole-stage codegen'd arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH

SAMPLE_BUCKETS = 10_000


def sample_bucket(key: Column) -> Column:
    """Stable bucket in [0, SAMPLE_BUCKETS) from the row key."""
    return TH.poly_hash(key.cast("string")) % SAMPLE_BUCKETS


def sql_sample_bucket(e: str) -> str:
    """DuckDB twin of sample_bucket — bit-identical buckets."""
    return f"({TH.sql_poly_hash(f'CAST({e} AS VARCHAR)')} % {SAMPLE_BUCKETS})"


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Deterministic Bernoulli sample at ``rate``."""
    thr = int(round(rate * SAMPLE_BUCKETS))
    return df.filter(sample_bucket(F.col(key_col)) < thr)


def mixture_sample(
    df: DataFrame,
    parts: dict[str, int],
    budget: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Dial a corpus to a TARGET MIXTURE: keep ≈``budget`` rows overall,
    distributed across strata proportionally to integer weights ``parts``
    (the "40% web, 40% books, 20% code" recipe of pretraining mixes).

    Per-stratum keep-thresholds are derived from the observed stratum
    sizes: thr_s = min(BUCKETS, floor(BUCKETS * budget * part_s /
    (sum_parts * n_s))) — all int64, so the decision (and the oracle's)
    is exact. A stratum smaller than its target keeps everything
    (capped at 100%; no oversampling), one absent from ``parts`` drops.

    Plan shape: one stratum-sized count aggregation joined back onto the
    scan (AQE broadcasts it), then the same narrow hash filter as
    ``hash_sample`` — no extra shuffle of the fact side, no driver
    collect.
    """
    if budget < 0 or any(p < 0 for p in parts.values()) or not parts:
        raise ValueError("need non-empty parts with non-negative weights, budget >= 0")
    total = sum(parts.values())
    part_of = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in parts.items() for x in kv]
        )[F.col(strata_col)],
        F.lit(0),
    ).cast("long")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    thr = F.least(
        F.lit(SAMPLE_BUCKETS).cast("long"),
        F.floor(
            F.lit(SAMPLE_BUCKETS) * F.lit(budget) * part_of
            / (F.lit(total) * F.col("_n"))
        ),
    )
    return (
        df.join(counts, strata_col)
        .filter(sample_bucket(F.col(key_col)) < thr)
        .drop("_n")
    )


def exact_stratified_sample(
    df: DataFrame,
    quotas: dict[str, int],
    strata_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """EXACT per-stratum sample sizes (vs the Bernoulli samplers'
    in-expectation rates): rank rows within each stratum by their hash
    bucket (tie-break on the key) and keep the first ``quotas[s]``.
    Still fully deterministic and nested (a larger quota keeps a
    superset), at the price of one rank window per stratum partition —
    use when the budget is a contract, Bernoulli when a shuffle-free
    filter matters more. Strata without a quota drop."""
    if any(n < 0 for n in quotas.values()) or not quotas:
        raise ValueError("need non-empty quotas with non-negative counts")
    from pyspark.sql.window import Window

    quota = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )[F.col(strata_col)]
    w = Window.partitionBy(strata_col).orderBy(
        sample_bucket(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.coalesce(quota, F.lit(0)))
        .drop("_rk")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    strata_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. keep 80% of wiki, 25% of web crawl)."""
    thr = F.lit(int(round(default_rate * SAMPLE_BUCKETS)))
    for s, r in rates.items():
        thr = F.when(
            F.col(strata_col) == s, F.lit(int(round(r * SAMPLE_BUCKETS)))
        ).otherwise(thr)
    return df.filter(sample_bucket(F.col(key_col)) < thr)


def token_budget_shards(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    n_buckets: int = 32,
) -> DataFrame:
    """Assign every row a ``shard_id`` so that consecutive rows (in the
    deterministic global order ``(order_col % n_buckets, order_col)``)
    pack into shards of ~``budget`` total ``weight_col`` — the training-
    shard manifest ("each output file holds ≈100M tokens") without a
    global sort.

    A naive running total is a window over ONE partition — the whole
    corpus through a single task. Instead the classic two-level
    decomposition: (1) per-bucket weight totals (one map-side-combined
    aggregation, ``n_buckets`` rows), (2) exclusive bucket offsets via a
    window over those ``n_buckets`` rows (bounded, never fact-sized),
    (3) a within-bucket running sum — ``n_buckets`` independent window
    partitions running in parallel. shard_id = floor(exclusive_global_
    cumsum / budget), exact in int64 arithmetic, reproducible on any
    cluster layout, and restatable in ANSI SQL (one global window) for
    the oracle. Scale ``n_buckets`` with the corpus (10k buckets at
    100 TB keeps each in-bucket sort ~10 GB)."""
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError("budget must be positive")
    b = F.pmod(F.col(order_col), F.lit(n_buckets)).cast("int")
    rows = df.withColumn("_b", b)
    offsets = (
        rows.groupBy("_b")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("_bw"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_bw").over(
                    Window.orderBy("_b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_bw")
    )
    win = (
        Window.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        rows.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_start",
            F.col("_off")
            + F.coalesce(F.sum(F.col(weight_col).cast("long")).over(win), F.lit(0)),
        )
        .withColumn(
            "shard_id", F.floor(F.col("_start") / F.lit(budget)).cast("int")
        )
        .drop("_b", "_off", "_start")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    k: int,
    preprune: bool = True,
) -> DataFrame:
    """Keep only the top ``k`` rows per group under ``order_cols`` — the
    domain-capping primitive of web-corpus construction (C4/RefinedWeb
    style: at most k documents per domain/source, best-quality first).
    ``order_cols`` are (expr, 'asc'|'desc') pairs; make the total order
    strict (tie-break on a unique key) or the result is nondeterministic.

    Exact semantics come from one rank window (one shuffle on
    ``group_col``). At 100 TB the shuffle INPUT is the problem — a hot
    domain with 10M pages sends all 10M across the wire to keep 20 — so
    ``preprune`` first reduces each partition to its local top-k per group
    (a row outside its partition's top-k cannot be in the global top-k):
    a shuffle-free Arrow-batched pass that bounds shuffle input to
    k * n_partitions rows per group regardless of skew.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    ordering = [
        F.col(c).desc() if d == "desc" else F.col(c).asc()
        for c, d in order_cols
    ]
    src = df
    if preprune:
        cols = list(df.columns)
        sort_by = [group_col, *(c for c, _ in order_cols)]
        asc = [True, *(d != "desc" for _, d in order_cols)]

        def local_topk(batches):
            import pandas as pd

            def merge(parts):
                return (
                    pd.concat(parts)
                    .sort_values(sort_by, ascending=asc, kind="mergesort")
                    .groupby(group_col, sort=False)
                    .head(k)
                )

            # per-batch top-k with a BOUNDED accumulator: re-sorting the
            # survivor set on every Arrow batch would cost
            # O(acc * log(acc) * n_batches) per partition, but holding
            # every batch's top-k until partition end is unbounded when
            # batches touch disjoint groups. Compromise: collapse the
            # accumulated chunks whenever their total rows exceed 4x the
            # last merged size — per-batch cost stays amortized-batch-
            # proportional while memory stays near groups*k.
            chunks = []
            pending = 0
            merged_size = 0
            for pdf in batches:
                if len(pdf):
                    top = (
                        pdf.sort_values(
                            sort_by, ascending=asc, kind="mergesort"
                        )
                        .groupby(group_col, sort=False)
                        .head(k)
                    )
                    chunks.append(top)
                    pending += len(top)
                    if pending > max(4 * merged_size, 4 * len(top)):
                        chunks = [merge(chunks)]
                        merged_size = len(chunks[0])
                        pending = merged_size
            if not chunks:
                yield pd.DataFrame(columns=cols)
                return
            yield merge(chunks)

        src = df.mapInPandas(local_topk, df.schema)
    w = Window.partitionBy(group_col).orderBy(*ordering)
    return (
        src.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
