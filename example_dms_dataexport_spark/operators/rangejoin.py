"""Range (interval) join — the second join operator Spark lacks natively,
alongside the as-of join.

``range_join`` matches each left row's scalar ``point`` against right-side
intervals ``[start, end)`` with NO equi-key. The classic uses: IP → ASN
lookup, price → tariff band, timestamp → maintenance window, genomic
position → gene region.

Naive formulations are scale-killers: ``left.join(right, point >= start &
point < end)`` has no equi-condition, so Spark plans a
BroadcastNestedLoopJoin (right must fit in memory) or a CartesianProduct
(|L|x|R| comparisons). This operator instead BUCKETS the range dimension:

- each right interval explodes to the integer buckets it overlaps
  (``sequence(floor(start/w), floor((end-ulp)/w))``);
- each left row computes its single containing bucket;
- the join becomes a plain equi-join on bucket + residual range filter,
  which Catalyst executes as a shuffled hash / sort-merge join — fully
  parallel, AQE-sized, skew-splittable.

Each qualifying (left, right) pair meets in EXACTLY one bucket (the
point's), so no post-join dedup is needed.

100 TB design notes:
- replication factor of the right side is ceil(len/w)+1 buckets per
  interval: pick ``bucket_width`` near the median interval length so the
  factor stays O(1). Right relations are typically dimension-sized
  (bands, windows, regions), so even 10x replication is trivial next to
  shuffling the fact side once;
- the left side is NOT replicated — one shuffle on bucket, same cost as
  any equi-join on a derived key;
- a hot bucket (many intervals covering one popular value range) behaves
  like any skewed join key — AQE skew-join splits it.

Reference parity: the reference's Snowflake script has no interval join
(Snowflake also lacks one; users write the same bucketing by hand); this
is a mandated-extension operator per SURVEY.md §2.10 / BASELINE.json
north-star. DuckDB's inequality-join executor serves as the q53 oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width: float) -> Column:
    return F.floor(col.cast("double") / F.lit(float(width))).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    bucket_width: float,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Inner-join left rows to the right intervals containing them:
    ``right.start <= left.point < right.end`` (half-open, NULLs drop).

    ``bucket_width`` trades right-side replication (≈ interval_len/width
    rows per interval) against bucket selectivity (≈ width worth of
    intervals scanned per left row); set it near the median interval
    length. ``extra_on`` adds equi-key columns (same name both sides) to
    the bucket join — use when intervals are per-entity, which both
    shrinks buckets and removes false candidates before the range filter.

    Output columns: all left columns, then all right columns (names must
    not collide; rename beforehand). Empty intervals (end <= start) match
    nothing, mirroring the half-open predicate.
    """
    extra_on = list(extra_on or [])
    clash = (set(right.columns) & set(left.columns)) - set(extra_on)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    pt, lo, hi = F.col(point), F.col(start), F.col(end)
    # Last bucket a half-open interval touches: the bucket of the largest
    # double strictly below `end`. floor((end - ulp)/w) is awkward to write
    # portably, and over-covering by one bucket is harmless (the residual
    # filter removes false candidates), so cover through floor(end/w).
    r2 = right.filter(hi > lo).withColumn(
        "_bucket",
        F.explode(F.sequence(_bucket(lo, bucket_width), _bucket(hi, bucket_width))),
    )
    l2 = left.withColumn("_bucket", _bucket(pt, bucket_width))
    # A pair can now meet in up to 2 buckets only if point == end's bucket
    # yet point < end is false there — impossible: the residual predicate
    # keeps the pair iff start <= point < end, and the pair meets where
    # bucket(point) == exploded bucket, which holds for exactly one
    # exploded row because the explode emits distinct buckets.
    cond = [l2["_bucket"] == r2["_bucket"]] + [
        l2[c] == r2[c] for c in extra_on
    ]
    joined = l2.join(r2, cond).filter((lo <= pt) & (pt < hi))
    keep = [l2[c] for c in left.columns] + [
        r2[c] for c in right.columns if c not in extra_on
    ]
    return joined.select(*keep)
