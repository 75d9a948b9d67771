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


def scd2_apply_delta(
    history: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    validate_order: bool = True,
) -> DataFrame:
    """Fold a NEW batch of change rows into an existing SCD2 history
    WITHOUT rescanning the change stream — the dimension-table analogue
    of ``incremental.update_rollup`` (q49), and what a 100 TB CDC
    pipeline must do per sync: the history is huge, the batch is tiny.

    Contract (the standard CDC-watermark guarantee): every batch row
    sorts strictly AFTER the key's current open version under
    ``(ts, tiebreaks)`` — late/out-of-order data needs a rebuild
    (``scd2_from_changes``), exactly as for any incremental view.
    Result is then row-identical to rebuilding from the full stream:

    - closed versions of every key pass through untouched;
    - keys absent from the batch pass through untouched (open row
      included);
    - for each touched key, the OPEN version re-enters the compression
      as a seed state observation at its ``valid_from`` (an internal
      sequence column orders it before any batch row), so a leading
      no-op batch row collapses into it and the open interval closes at
      the first real change.

    Plan shape: the batch's key set broadcasts (one semi + one anti
    flag pass over the history — the history itself never shuffles);
    the window compression runs only over (touched open rows + batch),
    i.e. batch-sized input, one shuffle on the key.

    ``validate_order`` (default True) turns a contract VIOLATION into a
    loud runtime failure instead of a silently wrong history: a lazy
    per-row assert (an unordered max-over-key window sharing the
    compression's shuffle — no extra exchange, no eager action) raises
    if any batch row's ``ts`` precedes its key's open-version
    ``valid_from``. Equal-``ts`` rows pass the guard (tiebreak order
    against the open version is unknowable — the history does not store
    tiebreaks) and deterministically sort after the seed."""
    if not key_cols or not attr_cols:
        raise ValueError("need key_cols and attr_cols")
    tiebreaks = list(tiebreak_cols or [])
    seq = "_scd2_seq"
    for c in (seq,):
        if c in history.columns or c in changes.columns:
            raise ValueError(f"column {c!r} collides with the internal "
                             "sequence helper; rename it")
    keys = changes.select(*key_cols).distinct()
    open_mask = F.col("valid_to").isNull()
    untouched = history.join(F.broadcast(keys), key_cols, "left_anti")
    closed_touched = history.filter(~open_mask).join(
        F.broadcast(keys), key_cols, "left_semi"
    )
    # the open version re-enters as a state observation at valid_from;
    # NULL tiebreaks + seq 0 put it before any same-ts batch row
    ts_type = dict(zip(changes.schema.names, changes.schema.fields))
    seed = (
        history.filter(open_mask)
        .join(F.broadcast(keys), key_cols, "left_semi")
        .select(
            *key_cols,
            *attr_cols,
            F.col("valid_from").alias(ts_col),
            *[
                F.lit(None).cast(ts_type[c].dataType).alias(c)
                for c in tiebreaks
            ],
            F.lit(0).alias(seq),
        )
    )
    batch = changes.select(
        *key_cols, *attr_cols, ts_col, *tiebreaks, F.lit(1).alias(seq)
    )
    data = seed.unionByName(batch)
    if validate_order:
        wk = Window.partitionBy(*key_cols)
        open_ts = F.max(F.when(F.col(seq) == 0, F.col(ts_col))).over(wk)
        ok = (
            (F.col(seq) == 0)
            | open_ts.isNull()
            | (F.col(ts_col) >= open_ts)
        )
        # assert_true returns NULL when ok holds and raises otherwise;
        # wrapping ts keeps the check in the used plan (never pruned)
        data = data.withColumn(
            ts_col,
            F.when(
                F.assert_true(
                    ok,
                    F.lit(
                        "scd2_apply_delta: batch row older than its key's "
                        "open version — late/out-of-order data needs a "
                        "rebuild (scd2_from_changes)"
                    ),
                ).isNull(),
                F.col(ts_col),
            ),
        )
    tail = scd2_from_changes(
        data,
        key_cols,
        ts_col,
        attr_cols,
        tiebreak_cols=[seq, *tiebreaks],
    )
    return untouched.unionByName(closed_touched).unionByName(tail)
