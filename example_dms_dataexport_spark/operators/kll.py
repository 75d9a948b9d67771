"""Deterministic KLL-style mergeable quantile sketch with a tracked
error certificate.

The histogram sketch (operators/sketches.py) answers percentiles to one
bin width but needs the value RANGE fixed up front — useless for
unbounded or unknown-domain columns. The KLL compactor family (Karnin/
Lang/Liberty, "Optimal quantile approximation in streams", FOCS 2016)
needs no bounds: state is a small hierarchy of sorted item buffers,
level ``i`` items each standing for ``2^i`` original rows. Classic KLL
randomizes each compaction's odd/even choice; this implementation makes
the choice DETERMINISTIC (a per-level alternation counter carried in
the state) and — instead of relying on the probabilistic analysis that
randomization buys — tracks the exact worst-case rank-error budget as
data:

- compacting a level-``i`` buffer (keep every other item of the sorted
  buffer, promote with doubled weight) shifts any rank estimate by at
  most ``2^i`` — each compaction adds ``2^i`` to ``err_bound``;
- merging sketches concatenates levels (error budgets add), then
  re-compacts oversized levels, charging the same toll per compaction;
- total weight is conserved EXACTLY through every compaction and merge
  (odd buffers leave their last item in place), so the sketch's ``n``
  hash-matches ``count(*)`` — weight conservation is part of the
  oracle contract, not an assumption.

The certificate makes accuracy runtime-checkable (the q100 Misra-Gries
pattern): a quantile pulled from the sketch carries a rank-span
guarantee within ``err_bound`` true ranks of the target (tie-robust:
the target must fall inside the estimate's [strictly-below,
at-or-below] rank span padded by the budget), and the q112 face
verifies exactly that against the raw data.

Scale shape: ``kll_sketch`` builds per-(partition, group) partial
sketches in one Arrow-batched ``mapInPandas`` pass — values stream
through fixed-size buffers, no group ever sorts whole — then merges
them per group with ``applyInPandas``; only sketch-sized state (k items
per level, ~log(n/k) levels) crosses the shuffle. The reference engine
has no quantile primitive at all (Snowflake's APPROX_PERCENTILE is the
closest analogue); this operator is part of the training-pipeline
extension surface next to the histogram and HLL families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

DEFAULT_K = 128  # items per level buffer; error ~ n / k per full level


def _sketch_schema(keys_fields) -> StructType:
    return StructType(
        [
            *keys_fields,
            StructField("levels", ArrayType(ArrayType(DoubleType()))),
            StructField("parities", ArrayType(LongType())),
            StructField("n", LongType()),
            StructField("err_bound", LongType()),
        ]
    )


def _make_kll_core(k: int):
    """Factory returning the pure-python sketch kernel. Produced
    functions pickle BY VALUE into mapInPandas/applyInPandas closures
    (executor workers don't have this package on sys.path)."""

    def compact_level(levels, parities, i):
        """Sort level i, keep every other item (alternating offset),
        promote to level i+1. Leaves one item behind when the buffer is
        odd so total weight is conserved exactly. Returns the rank-error
        toll (2**i)."""
        buf = sorted(levels[i])
        keep_last = len(buf) % 2 == 1
        tail = [buf[-1]] if keep_last else []
        body = buf[: len(buf) - 1] if keep_last else buf
        offset = int(parities[i]) & 1
        parities[i] += 1
        promoted = body[offset::2]
        levels[i] = tail
        if i + 1 == len(levels):
            levels.append([])
            parities.append(0)
        levels[i + 1].extend(promoted)
        return 1 << i

    def add_values(state, values):
        """Feed raw values (level-0 items) into a sketch state dict.

        NULL/NaN inputs are DROPPED and do not count toward ``n`` — a NaN
        in a level buffer would break sorted()'s total order in
        compact_level and the quantile scan, silently voiding the
        certificate. ``n`` therefore matches ``count(value IS NOT NULL)``
        semantics, the same as reference percentile aggregates."""
        levels, parities = state["levels"], state["parities"]
        if not levels:
            levels.append([])
            parities.append(0)
        clean = [f for f in (float(v) for v in values) if f == f]
        levels[0].extend(clean)
        state["n"] += len(clean)
        i = 0
        while i < len(levels):
            if len(levels[i]) > k:
                state["err_bound"] += compact_level(levels, parities, i)
            i += 1
        return state

    def new_state():
        return {"levels": [[]], "parities": [0], "n": 0, "err_bound": 0}

    def merge_states(a, b):
        """Associative merge: concatenate levels, add budgets, then
        re-compact any oversized level (charging its toll)."""
        out = new_state()
        depth = max(len(a["levels"]), len(b["levels"]))
        out["levels"] = [[] for _ in range(depth)]
        out["parities"] = [0] * depth
        for src in (a, b):
            for i, lvl in enumerate(src["levels"]):
                out["levels"][i].extend(lvl)
            for i, p in enumerate(src["parities"]):
                out["parities"][i] += int(p)
        out["n"] = a["n"] + b["n"]
        out["err_bound"] = a["err_bound"] + b["err_bound"]
        i = 0
        while i < len(out["levels"]):
            if len(out["levels"][i]) > k:
                out["err_bound"] += compact_level(
                    out["levels"], out["parities"], i
                )
            i += 1
        return out

    def quantile(state, q):
        """(estimate, tolerance): the retained item whose cumulative
        sketch-rank first reaches target = ceil(q * n). The selection
        puts target inside the item's sketch rank SPAN
        (sum of weights strictly below, sum at-or-below], and each span
        endpoint is within err_bound of its true counterpart, so the
        tie-robust certificate holds with tolerance = err_bound alone:

            count(value <  estimate) <  target + err_bound
            count(value <= estimate) >= target - err_bound
        """
        items = []
        for i, lvl in enumerate(state["levels"]):
            w = 1 << i
            items.extend((v, w) for v in lvl)
        items.sort()
        target = -(-q * state["n"] // 1)  # ceil without math import
        acc = 0
        est = items[-1][0] if items else float("nan")
        for v, w in items:
            acc += w
            if acc >= target:
                est = v
                break
        return est, state["err_bound"]

    return new_state, add_values, merge_states, quantile


def kll_sketch(
    df: DataFrame, keys: list[str], value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """One partial KLL sketch per (input partition, group): values
    stream through bounded buffers in a single Arrow-batched
    ``mapInPandas`` pass — no shuffle, no full-group sort. Feed the
    result to ``kll_merge`` to collapse partials into one sketch per
    group."""
    new_state, add_values, _, _ = _make_kll_core(k)
    keys_fields = [f for f in df.schema.fields if f.name in keys]
    schema = _sketch_schema(keys_fields)

    def build(batches):
        import pandas as pd

        states = {}
        for pdf in batches:
            for key_vals, grp in pdf.groupby(keys, sort=False):
                kk = key_vals if isinstance(key_vals, tuple) else (key_vals,)
                st = states.get(kk)
                if st is None:
                    st = states[kk] = new_state()
                add_values(st, grp[value_col].to_numpy())
        rows = [
            {
                **dict(zip(keys, kk)),
                "levels": st["levels"],
                "parities": st["parities"],
                "n": st["n"],
                "err_bound": st["err_bound"],
            }
            for kk, st in states.items()
        ]
        yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(*keys, value_col).mapInPandas(build, schema)


def kll_merge(sketches: DataFrame, keys: list[str], k: int = DEFAULT_K) -> DataFrame:
    """Collapse partial sketches to ONE sketch per group (associative
    state merge via ``applyInPandas``; only sketch-sized rows shuffle)."""
    new_state, _, merge_states, _ = _make_kll_core(k)
    schema = _sketch_schema(
        [f for f in sketches.schema.fields if f.name in keys]
    )

    def merge_group(pdf):
        import pandas as pd

        acc = new_state()
        for _, row in pdf.iterrows():
            acc = merge_states(
                acc,
                {
                    "levels": [list(l) for l in row["levels"]],
                    "parities": [int(p) for p in row["parities"]],
                    "n": int(row["n"]),
                    "err_bound": int(row["err_bound"]),
                },
            )
        out = {kcol: [pdf[kcol].iloc[0]] for kcol in keys}
        out.update(
            levels=[acc["levels"]],
            parities=[acc["parities"]],
            n=[acc["n"]],
            err_bound=[acc["err_bound"]],
        )
        return pd.DataFrame(out)

    return sketches.groupBy(*keys).applyInPandas(merge_group, schema)


def kll_quantile(
    sketches: DataFrame, q: float, k: int = DEFAULT_K
) -> DataFrame:
    """(keys..., n, estimate, tol): pull a quantile from each group's
    sketch with its rank-error certificate — ``ceil(q * n)`` falls
    inside estimate's true rank span padded by ``tol`` ranks, by
    construction (see the core ``quantile`` docstring)."""
    if not 0.0 < q <= 1.0:
        raise ValueError("q must be in (0, 1]")
    _, _, _, quantile = _make_kll_core(k)
    keys = [
        f.name
        for f in sketches.schema.fields
        if f.name not in ("levels", "parities", "n", "err_bound")
    ]
    schema = StructType(
        [
            *[f for f in sketches.schema.fields if f.name in keys],
            StructField("n", LongType()),
            StructField("estimate", DoubleType()),
            StructField("tol", LongType()),
        ]
    )

    def pull(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                est, tol = quantile(
                    {
                        "levels": [list(l) for l in row["levels"]],
                        "parities": list(row["parities"]),
                        "n": int(row["n"]),
                        "err_bound": int(row["err_bound"]),
                    },
                    q,
                )
                rows.append(
                    {
                        **{kcol: row[kcol] for kcol in keys},
                        "n": int(row["n"]),
                        "estimate": est,
                        "tol": tol,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return sketches.mapInPandas(pull, schema)
