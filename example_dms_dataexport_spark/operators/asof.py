"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_backward`` matches each left row with the latest right row for the
same key whose timestamp is earlier (strictly, or at-or-before with
``strict=False``). The classic uses: trade->quote matching, event
attribution ("last click before the error"), slowly-changing-dimension
lookups.

Implementation is the union+running-last formulation, not a range join:
both sides are tagged and unioned into one relation, sorted per key by
(ts, side), and the right side's carried columns are propagated forward
with ``last(col, ignorenulls=True)`` over an unbounded-preceding window.

100 TB design notes:
- cost is ONE shuffle of |L|+|R| rows on the key (the same shuffle any
  equi-join would pay) plus a per-key sort — there is no timestamp-range
  cross product, which is what kills naive ``l.join(r, key).filter(r.ts <=
  l.ts)`` + top-1 formulations when a key has many right rows;
- skew behaves like any window: a single hot key serializes within its
  partition, so pre-split hot keys upstream if needed;
- strictness is encoded in the tag sort order (right rows sort before left
  rows at equal timestamps iff ties may match), so no extra pass is needed.

Semantics mirror DuckDB's ``ASOF JOIN`` (inner variant = drop left rows
with no match; left variant = keep them with nulls), which serves as the
correctness oracle in q39.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    carry: list[str] | None = None,
    strict: bool = True,
    how: str = "inner",
    salt: int | None = None,
) -> DataFrame:
    """For each left row, attach ``carry`` columns from the latest right
    row with the same ``on`` key and ``right_ts`` < ``left_ts`` (``<=``
    when ``strict=False``).

    ``carry`` defaults to every right column that is neither a key nor the
    timestamp; carried names must not collide with left columns (rename on
    the right side first). Carried values come from the matched right row
    ATOMICALLY — a NULL in one of its carried columns stays NULL (DuckDB
    ASOF semantics), it does not let an older row's value show through.
    ``carry=[]`` is allowed: the join then only filters/keeps left rows.
    ``how``: "inner" drops unmatched left rows, "left" keeps them.

    ``salt``: hot-key mitigation. A single hot key serializes its window
    sort in one task; ``salt=N`` splits each key's LEFT rows into N
    hash-buckets, replicates the RIGHT side into every bucket, and windows
    on (key, bucket) — each left row still sees every earlier right row
    for its key, so the output is bit-identical to unsalted, while the
    largest task sort shrinks to |L_key|/N + |R_key| rows at the price of
    shuffling the right side N times. Use when the left side dominates a
    skewed key (the common shape: many events per entity, few dimension
    versions).
    """
    keys = list(on)
    if carry is None:
        carry = [c for c in right.columns if c not in set(keys) | {right_ts}]
    clash = set(carry) & set(left.columns)
    if clash:
        raise ValueError(f"carry columns collide with left columns: {sorted(clash)}")
    if "_matched" in carry:
        # The match flag lives inside the _rrow struct; a carried column of
        # the same name would make `_rrow._matched` ambiguous.
        raise ValueError("carry column '_matched' collides with the internal match flag")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    # Tag order decides tie behavior at equal timestamps: right rows must
    # sort BEFORE a left row to be visible to it (inclusive match) and
    # AFTER it to be hidden (strict match).
    left_side = 0 if strict else 2
    # The matched right row travels as ONE struct (`_rrow`): the struct is
    # non-null for every right row even when all its carried fields are
    # NULL, so (a) `last(ignorenulls=True)` propagates the latest row
    # atomically — a newer row's NULL field is NOT overridden by an older
    # row's value (DuckDB ASOF semantics), (b) struct-null IS the match
    # flag, so inner mode works for all-NULL carries and for carry == [].
    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    rrow = F.struct(F.lit(True).alias("_matched"), *carry).alias("_rrow")
    lrow_type = left.select(lrow).schema["_lrow"].dataType
    rrow_type = right.select(rrow).schema["_rrow"].dataType
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(left_side).alias("_side"),
        lrow,
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        rrow,
    )
    part_cols = list(keys)
    if salt is not None and salt > 1:
        # left rows hash into a bucket; right rows fan out to every bucket
        l2 = l2.withColumn(
            "_bucket", F.pmod(F.xxhash64(F.col("_lrow")), F.lit(salt))
        )
        r2 = r2.withColumn(
            "_bucket", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        )
        part_cols.append("_bucket")
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .select(
            "_side",
            "_lrow",
            F.last("_rrow", ignorenulls=True).over(w).alias("_rrow"),
        )
        .filter(F.col("_side") != 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("_rrow").isNotNull())
    return matched.select("_lrow.*", *[F.col(f"_rrow.{c}").alias(c) for c in carry])
