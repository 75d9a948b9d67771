"""Salted equi-join — hot-key mitigation for shuffle hash/sort joins.

A shuffle equi-join hashes both sides on the join key, so one hot key
(a stopword, a null-ish default id, one giant customer) lands its ENTIRE
row population in a single task: the stage is as slow as that one task
no matter how many executors exist. AQE's OptimizeSkewedJoin covers most
of this for sort-merge and shuffled-hash joins, but it cannot split the
preserved side of an outer join, only re-splits partitions the runtime
statistics flag as oversized, and offers no control over split
granularity; a broadcast join fixes skew only when the small side fits
in memory.

``salted_join`` is the classic explicit fix for the remaining case
(both sides too big to broadcast, hot keys known or suspected, or a
custom salt granularity needed):

- LEFT rows get a deterministic salt in [0, salt) — ``pmod(xxhash64(
  whole row), salt)`` — splitting each hot key's rows across salt tasks;
- RIGHT rows are replicated once per salt value (an in-row
  ``explode(sequence(...))``, no shuffle to build);
- the join key becomes (keys..., salt), so each of the salt tasks joins
  the left slice against a full copy of that key's right rows.

Output is row-identical to the unsalted join (pinned by tests): every
left row still meets every right row of its key, exactly once. Cost:
the right side shuffles salt x its size — use it when the right side is
the SMALLER of two unbroadcastable sides and the left carries the skew.

The reference's engine delegates join skew to Snowflake; this operator
is part of the scale toolkit (SURVEY §2.11), next to the as-of join's
window salting (operators/asof.py) and AQE's built-in SMJ handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__skew_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
    join_hint: str | None = None,
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with the left side's
    hot keys split across ``salt`` tasks. Supported ``how``: inner /
    left (the replicated side must be the non-preserved one, so right-
    preserving joins are rejected — swap the operands instead).

    ``join_hint`` (e.g. ``"merge"`` or ``"shuffle_hash"``) pins the
    physical strategy on the replicated side: at production scale both
    sides exceed the broadcast threshold anyway, but on small test data
    Catalyst would statically broadcast the dimension and the salt
    would never exercise — the hint makes the small-scale plan match
    the 100 TB plan."""
    if not on:
        raise ValueError("salted_join requires at least one key column")
    if salt < 2:
        raise ValueError("salt must be >= 2 (1 would be a plain join)")
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r} unsupported: replicating the right side requires "
            "it to be the non-preserved side (use inner/left, or swap "
            "operands)"
        )
    if SALT_COL in left.columns or SALT_COL in right.columns:
        raise ValueError(f"{SALT_COL!r} collides with an input column")
    # deterministic per-row salt: hash EVERY left column so two rows that
    # are full duplicates still spread only when something distinguishes
    # them — duplicates of one identical row co-locating is fine (they
    # would in the unsalted join too)
    salted_left = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*left.columns), F.lit(salt))
    )
    replicated_right = right.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>")),
    )
    if join_hint:
        replicated_right = replicated_right.hint(join_hint)
    out = salted_left.join(replicated_right, [*on, SALT_COL], how)
    return out.drop(SALT_COL)
