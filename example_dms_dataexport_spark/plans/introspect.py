"""Inspect physical plans — assertions for the properties that matter at
100 TB: filter pushdown, column pruning, broadcast vs shuffle joins, and
shuffle (Exchange) counts.

Tests use these to pin the *plan shape*, not just the result: a regression
that silently drops a pushed filter or turns a broadcast join into a
shuffle join fails CI long before anyone runs at scale.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (capture of .explain)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across every scan in the plan."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — the column-pruning witness."""
    plan = physical_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def broadcast_hint_count(df: DataFrame) -> int:
    """FORCED broadcasts: ResolvedHint nodes in the analyzed logical plan.

    Distinguishes a hard ``F.broadcast(...)`` hint (applies at any scale —
    dangerous on unbounded relations) from a broadcast that AQE/statistics
    freely chose for a small input (fine, and re-decided at real scale).
    """
    plan = df._jdf.queryExecution().analyzed().toString()
    # Only the broadcast strategy counts: a repartition/rebalance/merge hint
    # is also a ResolvedHint node but is not a forced broadcast, and the
    # ==0/==1 plan tests must not trip on it.
    return len(re.findall(r"(?i)resolvedhint.*broadcast", plan))


def exchange_count(df: DataFrame) -> int:
    """Shuffle-exchange operators in the plan (lower = fewer shuffles).

    Counts Exchange hashpartitioning/rangepartitioning, not broadcast
    exchanges (broadcasts are the cheap kind by design) and not
    single-partition exchanges (the O(1)-row global-agg finisher).

    Formatted explain splits an Exchange across the tree line
    (``Exchange (N)``) and its detail block (``Arguments:
    hashpartitioning(...)``), so both renderings are matched — matching
    only the simple-mode single-line form silently returns 0 on formatted
    plans and turns every plan pin vacuous.
    """
    plan = physical_plan(df)
    simple = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    formatted = len(
        re.findall(r"Arguments: (?:hash|range)partitioning", plan)
    )
    return max(simple, formatted)
