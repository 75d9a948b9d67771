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
) -> DataFrame:
    """For each left row, attach ``carry`` columns from the latest right
    row with the same ``on`` key and ``right_ts`` < ``left_ts`` (``<=``
    when ``strict=False``).

    ``carry`` defaults to every right column that is neither a key nor the
    timestamp; carried names must not collide with left columns (rename on
    the right side first). A right row with NULL in a carried column lets
    the previous non-null value show through (``last`` ignores nulls).
    ``how``: "inner" drops unmatched left rows, "left" keeps them.
    """
    keys = list(on)
    if carry is None:
        carry = [c for c in right.columns if c not in set(keys) | {right_ts}]
    clash = set(carry) & set(left.columns)
    if clash:
        raise ValueError(f"carry columns collide with left columns: {sorted(clash)}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    # Tag order decides tie behavior at equal timestamps: right rows must
    # sort BEFORE a left row to be visible to it (inclusive match) and
    # AFTER it to be hidden (strict match).
    left_side = 0 if strict else 2
    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(left_side).alias("_side"),
        lrow,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in carry
        ],
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"),
        *carry,
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .select(
            "_side",
            "_lrow",
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry],
        )
        .filter(F.col("_side") != 1)
        .select("_lrow.*", *carry)
    )
    if how == "inner":
        # a left row with no earlier right row carries all-null columns
        cond = None
        for c in carry:
            t = F.col(c).isNotNull()
            cond = t if cond is None else (cond | t)
        matched = matched.filter(cond)
    return matched
