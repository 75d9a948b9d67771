"""Incremental aggregate maintenance under CDC change-sets.

A 100 TB fact table's rollups cannot be rebuilt by rescanning the facts on
every sync; the standard fix (materialized-view maintenance) folds the
CDC change-set directly into the aggregate: every change contributes a
*retraction* of its before-image and/or an *addition* of its after-image,
the contributions are pre-aggregated per group, and the (aggregate-sized)
rollup absorbs them in one outer join.  Cost is O(|changes| + |rollup|) —
the fact table is never read.

Change rows carry full row images, DMS-style (reference
``control_migration_schema_script.sql`` models I/U/D with after-images;
this operator additionally requires before-images on U/D, which is what
lets it skip the fact scan):

- ``I``: after-image columns populated;
- ``D``: before-image columns populated;
- ``U``: both — and the GROUP KEYS may differ between images (a row
  moving between groups retracts from one and adds to the other).

Supported aggregates are the self-decomposable ones (SUM and COUNT, and
anything derivable from them, e.g. AVG = sum/count).  MIN/MAX are *not*
maintainable from deltas alone (a deleted maximum needs a rescan of its
group) and are deliberately out of scope.

Plan shape: one groupBy over the change-set (tiny), one full-outer join
against the rollup on the group keys — both relations are
aggregate-sized, so AQE picks a broadcast when the delta fits.  Groups
whose row count reaches zero are dropped, keeping the rollup exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup(df: DataFrame, keys: Sequence[str], measures: Sequence[str]) -> DataFrame:
    """Build the initial aggregate: per-key SUM of each measure + row count
    (schema: keys..., sum_<m>..., n_rows)."""
    aggs = [F.sum(m).alias(f"sum_{m}") for m in measures]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return df.groupBy(*keys).agg(*aggs)


def update_rollup(
    rollup_df: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    op_col: str = "op",
    before_prefix: str = "before_",
    after_prefix: str = "after_",
) -> DataFrame:
    """Fold an I/U/D change-set into a ``rollup()``-shaped aggregate
    without touching the fact table.  Returns the new rollup (same
    schema); groups emptied by deletes disappear.
    """
    op = F.col(op_col)
    adds = changes.filter(op.isin("I", "U")).select(
        *[F.col(after_prefix + k).alias(k) for k in keys],
        *[F.col(after_prefix + m).alias(m) for m in measures],
        F.lit(1).cast("long").alias("_c"),
    )
    retracts = changes.filter(op.isin("U", "D")).select(
        *[F.col(before_prefix + k).alias(k) for k in keys],
        *[(-F.col(before_prefix + m)).alias(m) for m in measures],
        F.lit(-1).cast("long").alias("_c"),
    )
    delta = (
        adds.unionByName(retracts)
        .groupBy(*keys)
        .agg(
            *[F.sum(m).alias(f"_d_{m}") for m in measures],
            F.sum("_c").alias("_d_n"),
        )
    )
    zero = F.lit(0).cast("long")
    merged = rollup_df.join(delta, list(keys), "full_outer").select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"sum_{m}"), zero)
                + F.coalesce(F.col(f"_d_{m}"), zero)
            ).alias(f"sum_{m}")
            for m in measures
        ],
        (
            F.coalesce(F.col("n_rows"), zero) + F.coalesce(F.col("_d_n"), zero)
        ).alias("n_rows"),
    )
    return merged.filter(F.col("n_rows") > 0)
