"""Ordered-funnel analysis: for each user, the earliest time they
completed step k *after* completing step k-1 ("view -> click ->
purchase"), and how deep into the funnel they got.

This is DEPENDENT sequential aggregation — step k's filter references
step k-1's aggregate — so it cannot be one groupBy. The implementation
chains one small aggregation per step:

    s1 = min(ts) per user where type = step1
    sk = min(ts) per user where type = step_k and ts > t_{k-1}

Every join and aggregation keys on the same user column, so Catalyst
reuses ONE hash partitioning across the whole chain: the plan is
|steps| passes over the (filtered) event relation but only one logical
shuffle key, and each step's aggregate relation is per-user (small side,
AQE-broadcastable). Timestamps are compared and min-picked exactly —
no float arithmetic — so the DuckDB oracle (q62) matches bit-for-bit.

Strictly-after semantics (``ts > prev``): a same-timestamp event does
not complete the next step; funnels over coarse timestamps should
pre-assign tiebreaker microseconds upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel progression over ``steps`` (ordered event types).

    Returns (user, t1..tn, stage): tk = earliest step-k event strictly
    after t_{k-1} (NULL once the funnel is broken), stage = number of
    completed steps. Users who never did step 1 are absent.
    """
    if len(steps) < 1:
        raise ValueError("need at least one step")
    ev = events.select(
        F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"), F.col(type_col).alias("_ty")
    )
    cur = (
        ev.filter(F.col("_ty") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("t1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("_ty") == s)
            .join(cur.select("_u", F.col(f"t{i - 1}").alias("_prev")), "_u")
            .filter(F.col("_ts") > F.col("_prev"))
            .groupBy("_u")
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "_u", "left")
    stage = F.lit(1)
    for i in range(2, len(steps) + 1):
        stage = stage + F.col(f"t{i}").isNotNull().cast("int")
    return cur.select(
        F.col("_u").alias(user_col),
        *[f"t{i}" for i in range(1, len(steps) + 1)],
        stage.alias("stage"),
    )


def sql_funnel(
    steps: list[str],
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of ``funnel`` for the oracle — one CTE per step."""
    ctes = [
        f"s1 AS (SELECT {user_col}, min({ts_col}) AS t1 FROM {table}"
        f" WHERE {type_col} = '{steps[0]}' GROUP BY {user_col})"
    ]
    for i, s in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.{user_col}, min(e.{ts_col}) AS t{i}"
            f" FROM {table} e JOIN s{i - 1} USING ({user_col})"
            f" WHERE e.{type_col} = '{s}' AND e.{ts_col} > s{i - 1}.t{i - 1}"
            f" GROUP BY e.{user_col})"
        )
    joins = "s1 " + " ".join(
        f"LEFT JOIN s{i} USING ({user_col})" for i in range(2, len(steps) + 1)
    )
    stage = " + ".join(
        ["1"] + [
            f"CAST(t{i} IS NOT NULL AS INTEGER)"
            for i in range(2, len(steps) + 1)
        ]
    )
    tcols = ", ".join(f"t{i}" for i in range(1, len(steps) + 1))
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT {user_col}, {tcols}, {stage} AS stage FROM {joins}"
    )
