"""Data-quality auditing — declarative constraint checks over a table
(the dbt-test / Deequ pattern), plus the skew report you run on a join
key before deciding to salt it.

``audit`` evaluates every rule in ONE aggregation pass where possible:
not-null and predicate rules are CASE-sums sharing a single scan;
uniqueness needs its own keyed aggregation; referential integrity needs
an anti-join per foreign key. Output is a tidy (rule, n_violations)
relation — the shape a monitoring sink wants.

At 100 TB: the CASE-sum pass is a map-side-combined single shuffle; each
unique check shuffles on its key (the same shuffle a dedup would pay);
each FK check is an anti-join whose dimension side AQE broadcasts. Rules
are data, not code — the audit of 50 rules is still O(rules) aggregate
relations, never O(rules) scans for the predicate family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    predicates: dict[str, Column] | None = None,
    foreign_keys: list[tuple[list[str], DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """(rule, n_violations) for every declared constraint.

    - not_null: columns that must not contain NULL
      (rule name ``not_null:<col>``);
    - unique: key lists that must identify rows uniquely
      (``unique:<c1,c2>`` counts rows IN EXCESS of one per key);
    - predicates: named boolean expressions every row must satisfy
      (NULL counts as a violation — constraints are three-valued-proof);
    - foreign_keys: (cols, parent_df, parent_cols) — child rows (with
      fully non-null keys) whose key is absent from the parent
      (``fk:<c1->p1>``).
    """
    checks: list[DataFrame] = []
    sums = []
    # sums over an EMPTY table are NULL; the (rule, count) contract wants 0
    def _sum0(col: Column) -> Column:
        return F.coalesce(F.sum(col), F.lit(0)).cast("long")

    for c in not_null or []:
        sums.append(_sum0(F.col(c).isNull().cast("long")).alias(f"not_null:{c}"))
    for name, pred in (predicates or {}).items():
        # violation when the predicate is false OR null
        sums.append(
            _sum0((~F.coalesce(pred, F.lit(False))).cast("long")).alias(
                f"predicate:{name}"
            )
        )
    if sums:
        wide = df.agg(*sums)
        names = wide.columns
        checks.append(
            wide.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(n).alias("rule"),
                                F.col(f"`{n}`").alias("n_violations"),
                            )
                            for n in names
                        ]
                    )
                ).alias("_r")
            ).select("_r.rule", "_r.n_violations")
        )
    for keys in unique or []:
        rule = f"unique:{','.join(keys)}"
        excess = (
            df.groupBy(*keys)
            .agg((F.count(F.lit(1)) - 1).alias("_x"))
            .agg(
                # empty input → sum over zero groups is NULL; the (rule,
                # count) contract wants 0
                F.coalesce(F.sum("_x"), F.lit(0))
                .cast("long")
                .alias("n_violations")
            )
            .select(F.lit(rule).alias("rule"), "n_violations")
        )
        checks.append(excess)
    for cols, parent, pcols in foreign_keys or []:
        rule = f"fk:{','.join(cols)}->{','.join(pcols)}"
        child = df.select(*cols).na.drop(subset=cols)
        p = parent.select(
            *[F.col(pc).alias(c) for c, pc in zip(cols, pcols)]
        ).distinct()
        orphans = (
            child.join(p, cols, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.lit(rule).alias("rule"), "n_violations")
        )
        checks.append(orphans)
    if not checks:
        raise ValueError("no rules declared")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def percentile_rank(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "pct",
) -> DataFrame:
    """Exact ``percent_rank()`` of ``value_col`` within each group,
    WITHOUT a row-level window — the per-group score-calibration step
    (e.g. quality thresholds that differ per language/source).

    A naive ``Window.partitionBy(group).orderBy(value)`` sorts each
    group's every row in ONE task — with a handful of giant groups (five
    languages at 100 TB) that's a single-machine sort.  Instead the
    distribution is compressed first: count rows per (group, value) —
    a partial-aggregated shuffle on a uniform key — then cumulate counts
    over the (small) distinct-value relation, and join the per-value
    rank back to the rows as a broadcast.  percent_rank = (rows strictly
    below) / (group size - 1); single-row groups get 0.0 like the window
    function.
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = (
        W.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    dist = counts.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(W.partitionBy(group_col))
    )
    pct = F.when(F.col("_n") == 1, F.lit(0.0)).otherwise(
        (F.col("_cum") - F.col("_c")).cast("double") / (F.col("_n") - 1)
    )
    ranks = dist.select(
        F.col(group_col).alias("_rg"),
        F.col(value_col).alias("_rv"),
        pct.alias(out_col),
    )
    # null-SAFE keys: groupBy ranks NULL groups/values like any other,
    # and a plain equi-join would silently drop those rows on the way back
    joined = df.join(
        ranks,
        df[group_col].eqNullSafe(ranks["_rg"])
        & df[value_col].eqNullSafe(ranks["_rv"]),
    )
    return joined.drop("_rg", "_rv")


def skew_report(
    df: DataFrame, key_cols: list[str], top: int = 10
) -> DataFrame:
    """Top-``top`` heaviest key values with their row share — the
    pre-join skew diagnostic (a key holding >~20% of rows is a salting /
    AQE-skew-join candidate). One groupBy shuffle; the global total is
    ``count(*)`` of the input itself (identical to summing the per-key
    counts) — a column-less scan, where aggregating the counts relation
    re-executed the fact groupBy shuffle a second time (r19; runtime
    exchange reuse was not firing for it)."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.agg(F.count(F.lit(1)).alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_t"), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), *key_cols)
        .limit(top)
    )
