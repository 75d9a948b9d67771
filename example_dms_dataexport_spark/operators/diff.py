"""snapshot_diff — derive an I/U/D change-set from two table snapshots.

The inverse of :func:`example_dms_dataexport_spark.merge.apply_changes`
(ref `control_migration_schema_script.sql:369-408` consumes change-sets;
this operator *produces* one when the upstream system can only hand over
full snapshots — the classic "no CDC on the source, diff the nightly
dumps" integration):

    old absent, new present                     → I  (new values)
    both present, any non-PK column differs     → U  (new values)
    old present, new absent                     → D  (old values)
    both present, identical                     → (no row)

Round-trip law (pytest-enforced): ``apply_changes(old, snapshot_diff(old,
new), pks)`` == ``new``.

Scale notes (100 TB):
- One full-outer sort-merge join on the PK — the minimum possible work for
  a snapshot diff; both sides shuffle once, AQE splits skewed keys.
- Column comparison is a null-safe conjunction evaluated inside the join's
  whole-stage-codegen stage — no second pass, no UDF.
- Unchanged rows (the overwhelming majority of a nightly diff) are dropped
  before anything downstream sees them, so the change-set that flows on is
  ~|actual churn|, not |table|.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..merge import DELETE_OP, OP_COL


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pks: list[str],
    op_col: str = OP_COL,
) -> DataFrame:
    """Diff two snapshots with identical schemas into an I/U/D change-set.

    Output schema: ``op_col`` followed by the snapshot columns; I/U rows
    carry ``new`` values, D rows carry ``old`` values. Feeding the result
    to ``apply_changes(old, ..., pks)`` reproduces ``new`` exactly.
    """
    if not pks:
        raise ValueError("snapshot_diff requires at least one primary-key column")
    if old.columns != new.columns:
        raise ValueError(
            f"snapshot schemas differ: {old.columns} vs {new.columns}"
        )
    if op_col in old.columns:
        raise ValueError(f"op column {op_col!r} collides with a snapshot column")
    data_cols = old.columns
    non_pk = [c for c in data_cols if c not in pks]

    o = old.withColumn("_o_exists", F.lit(True)).alias("O")
    n = new.withColumn("_n_exists", F.lit(True)).alias("N")
    joined = o.join(n, on=pks, how="full_outer")

    o_exists = F.col("_o_exists").isNotNull()
    n_exists = F.col("_n_exists").isNotNull()
    # Null-safe per-column comparison: NULL == NULL counts as unchanged.
    changed = (
        reduce(
            lambda a, b: a | b,
            [~F.col(f"O.{c}").eqNullSafe(F.col(f"N.{c}")) for c in non_pk],
        )
        if non_pk
        else F.lit(False)
    )
    op = (
        F.when(~o_exists, F.lit("I"))
        .when(~n_exists, F.lit(DELETE_OP))
        .when(changed, F.lit("U"))
    )
    picked = [
        F.when(n_exists, F.col(f"N.{c}")).otherwise(F.col(f"O.{c}")).alias(c)
        for c in non_pk
    ]
    return (
        joined.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(op_col, *pks, *picked)
        .select(op_col, *data_cols)
    )
