"""Driver-row freshness floor.

The driver's correctness harness records only the first 50 registered
queries per round, so registry.PRIORITY is rotated each round. This
check fails when the rotation would leave any query's latest driver row
older than N-2 rounds after the UPCOMING round lands — the silent
rotation-debt rebuild the round-10 verdict flagged (34 queries' latest
row had aged to r8 while the window re-checked fresher rows).

Run before committing a rotation:

    python tools/check_freshness.py

Checks, with N = the newest committed CORRECTNESS round:
- every registered query either sits in the upcoming window (first 50
  of registration order → gets an r{N+1} row) or already has a driver
  row >= N-1 (so its projected age stays within the floor);
- every query with NO driver row at all (a new face) is in the window;
- every PRIORITY name is registered (load_all raises otherwise) and
  every recorded query is still registered (no silently dropped faces).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

WINDOW = 50
FLOOR = 2  # max allowed age, in rounds, after the upcoming round lands


def latest_driver_rows(root: str = "/root/repo") -> tuple[dict[str, int], int]:
    """Latest GREEN driver row per query. A red row (any of rows/schema/
    hash mismatched) is NOT coverage — counting it would let a failing
    query rotate out of the window without ever getting a green row
    (the q133 shape: red in r10, must re-check in r11)."""
    latest: dict[str, int] = {}
    newest = 0
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", f).group(1))
        newest = max(newest, rnd)
        for name, row in json.load(open(f)).items():
            green = (
                row.get("rows_match", True)
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and not row.get("err")
            )
            if green:
                latest[name] = max(rnd, latest.get(name, 0))
            else:
                latest.setdefault(name, 0)  # known query, no green row yet
    return latest, newest


def main() -> int:
    from example_dms_dataexport_spark.registry import load_all

    queries, _ = load_all()
    order = list(queries)
    window = set(order[:WINDOW])
    latest, newest = latest_driver_rows()
    upcoming = newest + 1
    problems = []
    for name in order:
        projected = upcoming if name in window else latest.get(name)
        if projected is None:
            problems.append(f"{name}: new face not in the upcoming window")
        elif upcoming - projected > FLOOR:
            problems.append(
                f"{name}: projected latest driver row r{projected} is "
                f"older than the r{upcoming - FLOOR} floor for round "
                f"{upcoming} — rotate it into the window"
            )
    from example_dms_dataexport_spark.registry import MERGED

    for name in latest:
        if name not in queries:
            # a fold/merge retires the name; its attestation carries on
            # in the absorbing face, which must itself be registered
            if MERGED.get(name) in queries:
                continue
            problems.append(
                f"{name}: has driver rows but is no longer registered "
                "(and registry.MERGED does not map it to a live face)"
            )
    if problems:
        print("FRESHNESS FLOOR VIOLATIONS:")
        for p in problems:
            print(" -", p)
        return 1
    stale_after = sorted(
        (latest.get(n, upcoming) if n not in window else upcoming, n)
        for n in order
    )
    print(
        f"ok: {len(order)} queries, window={len(window)}, newest round "
        f"r{newest}; after r{upcoming} the oldest row will be "
        f"r{stale_after[0][0]} ({stale_after[0][1]})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
