"""Slowly-changing-dimension (SCD Type-2) history building — turn a CDC
change stream into versioned dimension rows with validity intervals:

    (key, attrs..., valid_from, valid_to)   -- valid_to NULL = current

the downstream the reference's CDC pipeline feeds in a real warehouse
(apply_changes keeps only latest-wins state; SCD2 keeps the full
history, which is what point-in-time joins — ``operators.asof`` /
``operators.rangejoin`` — then consume).

Semantics: within a key, ordered by (ts, tiebreak), a new version opens
whenever any tracked attribute differs from the previous row's (no-op
updates collapse); each version closes at the next version's open time
(half-open [from, to)).

Plan shape: both windows (the change-detection lag and the
interval-closing lead) partition on the key and order identically, so
Catalyst reuses ONE shuffle + sort for the whole derivation. NULL
attribute values compare null-safely (NULL -> NULL is a no-op, NULL ->
value is a change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_changes(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Compress a change stream into SCD2 validity intervals.

    ``tiebreak_cols`` break equal-timestamp ordering (pass a unique id
    for determinism). Returns key + attrs + valid_from + valid_to.
    """
    if not key_cols or not attr_cols:
        raise ValueError("need key_cols and attr_cols")
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(a).over(w)
        # null-safe inequality: different iff NOT (a <=> prev)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.lag(ts_col).over(w).isNull()
    versions = changes.withColumn("_open", first | changed).filter("_open")
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col, *(tiebreak_cols or []))
    return versions.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )
