"""Provably-exact heavy hitters via Misra-Gries candidate pruning.

The naive exact top-k over a token/item stream shuffles EVERY distinct
item (the long tail is the cost: a 100 TB corpus has billions of
singleton tokens that all cross the wire just to lose). The classic
two-pass fix:

1. **Candidate pass** — each partition runs a Misra-Gries summary of
   capacity ``c`` over its local items (O(c) memory, one pass, no
   shuffle). MG guarantees any item with local count > n_p/(c+1)
   survives locally, so by pigeonhole any item with GLOBAL count >
   N/(c+1) survives in at least one partition. The union of per-
   partition survivors is the candidate set — tail items never leave
   their partition. The same pass emits per-partition item totals, so
   N costs no extra scan.
2. **Recount pass** — exact counts for candidates only (a semi-join-
   pruned aggregation), then top-k.

The result is EXACT, not approximate, whenever the k-th candidate's
exact count exceeds the MG threshold N/(c+1) — checked at runtime; if
the data is so flat the guarantee can't be certified, fall back to the
plain exact aggregation rather than return an unproven answer. That
certificate is what lets the oracle pin the output hash-for-hash.

The MG state is a pandas Series living across Arrow batches of one
partition (mapInPandas receives an iterator per partition), and the
decrement step is the vectorized variant: when the summary exceeds
capacity, subtract the (size-capacity)-th smallest count from EVERY
entry and drop the non-positive ones — each such event removes >=
(capacity+1) x decrement of stream mass, so the cumulative decrement
(= the max undercount, = the max count of any dropped item) is still
bounded by n_p/(capacity+1), the classic MG guarantee, with no
per-item Python loop.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SUMMARY_SCHEMA = StructType(
    [
        StructField("item", StringType()),  # NULL on the totals row
        StructField("total", LongType()),
    ]
)


def _mg_summaries(df: DataFrame, item_col: str, capacity: int) -> DataFrame:
    """One Misra-Gries summary per partition: surviving candidate items
    (total=0) plus one item=NULL row carrying the partition's item
    count."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        counters = pd.Series(dtype="int64")
        total = 0
        for pdf in batches:
            vc = pdf[item_col].value_counts()
            total += int(vc.sum())
            counters = counters.add(vc, fill_value=0)
            excess = len(counters) - capacity
            if excess > 0:
                vals = counters.to_numpy()
                t = np.partition(vals, excess - 1)[excess - 1]
                counters = counters[counters > t] - t
        yield pd.DataFrame(
            {
                "item": [*counters.index.astype(str), None],
                "total": [0] * len(counters) + [total],
            }
        )

    return df.select(F.col(item_col).alias(item_col)).mapInPandas(
        run, _SUMMARY_SCHEMA
    )


def heavy_hitters(
    df: DataFrame, item_col: str, k: int, capacity: int = 4096
) -> DataFrame:
    """Exact (item, n) top-``k`` by count, tail-pruned via Misra-Gries.

    Ties broken by item ascending (deterministic). Raises ValueError for
    k > capacity; falls back to the plain exact aggregation when the
    top-k certificate (k-th count > N/(capacity+1)) does not hold —
    correctness never depends on the sketch. Two scans of the item
    stream (candidates+totals, then the pruned recount); the only
    driver fetches are the k result rows and the 1-row total.
    """
    if k <= 0 or capacity < k:
        raise ValueError("need 0 < k <= capacity")

    items = df.select(F.col(item_col).cast("string").alias("item"))

    def topk(counted: DataFrame) -> DataFrame:
        return counted.orderBy(F.desc("n"), F.asc("item")).limit(k)

    # summaries are small (<= capacity+1 rows per partition); persist so
    # the totals aggregate and the candidate join don't re-run the scan,
    # and release before returning — both consumers are eager below
    summary = _mg_summaries(items, "item", capacity).persist()
    try:
        total = summary.agg(F.sum("total").alias("n")).collect()[0]["n"] or 0
        cand = summary.filter(F.col("item").isNotNull()).select("item").distinct()
        counted = (
            items.join(cand, "item", "left_semi")  # tail never reaches the agg
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = topk(counted).collect()  # bounded: k rows
    finally:
        summary.unpersist()

    if len(got) == k and got[-1]["n"] > total / (capacity + 1):
        # certified exact: every non-candidate's count <= N/(capacity+1)
        # < the k-th candidate's count, so no non-candidate can displace
        # the collected top-k
        return df.sparkSession.createDataFrame(got, "item string, n long")
    # certificate failed (tiny or pathologically flat data): exact path
    return topk(items.groupBy("item").agg(F.count(F.lit(1)).alias("n")))
