"""Property-based CDC merge test (SURVEY §5.4).

Invariant: for ANY change sequence, ``apply_changes`` equals replaying the
ops in (file, rownum) order into a Python dict — latest-wins per key
(ref :382), delete tombstones (ref :401-402), delete-of-absent no-op
(ref :405), insert/update of absent/present keys (ref :403-407).

Hypothesis generates op sequences; the Spark side sees them SHUFFLED (the
window dedup must restore the order); the model side applies them in
order. One spark job per example, so max_examples stays small — breadth
comes from the sequence generator, not the example count.
"""

from __future__ import annotations

import random

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from example_dms_dataexport_spark.merge import apply_changes

KEYS = list(range(6))  # few keys -> many per-key collisions (the hard case)

change = st.tuples(
    st.integers(min_value=1, max_value=3),  # file number
    st.sampled_from(KEYS),  # pk
    st.sampled_from(["I", "U", "D"]),  # op
    st.integers(min_value=0, max_value=99),  # payload value
)


def model_replay(initial: dict[int, int], seq) -> dict[int, int]:
    state = dict(initial)
    for _file, key, op, val in seq:  # seq already in (file, rownum) order
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = val
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=st.lists(change, min_size=0, max_size=25), data=st.data())
@pytest.mark.slow
def test_apply_changes_equals_model_replay(spark, seq, data):
    initial = {k: -k for k in KEYS[::2]}  # target starts with even keys
    target = spark.createDataFrame(
        [(k, v) for k, v in initial.items()], "id long, val long"
    )

    # assign rownum = position within file (the total order), then shuffle
    # the batch so the merge's dedup window has to reconstruct the order
    ordered = sorted(
        [(f, k, op, v) for f, k, op, v in seq], key=lambda c: c[0]
    )
    with_rownum = []
    per_file_count: dict[int, int] = {}
    for f, k, op, v in ordered:
        per_file_count[f] = per_file_count.get(f, 0) + 1
        with_rownum.append((f, per_file_count[f], k, op, v))
    shuffled = list(with_rownum)
    random.Random(data.draw(st.integers(0, 999))).shuffle(shuffled)

    expected = model_replay(
        initial, [(f, k, op, v) for f, r, k, op, v in with_rownum]
    )

    if shuffled:
        changes = spark.createDataFrame(
            [(op, k, v, f, r) for f, r, k, op, v in shuffled],
            "op string, id long, val long, _file int, _rownum int",
        )
        merged = apply_changes(
            target,
            changes,
            pks=["id"],
            version_cols=["_file", "_rownum"],
        )
    else:
        merged = target

    got = {r["id"]: r["val"] for r in merged.collect()}
    assert got == expected


# --- incremental rollup property --------------------------------------------

GROUPS = ["g0", "g1", "g2"]

fact_row = st.tuples(
    st.sampled_from(GROUPS), st.integers(min_value=-50, max_value=50)
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    facts=st.lists(fact_row, min_size=0, max_size=15),
    data=st.data(),
)
@pytest.mark.slow
def test_update_rollup_equals_full_recompute(spark, facts, data):
    """For ANY base facts and ANY consistent I/U/D change-set (including
    group-moving updates and group-emptying deletes), folding the deltas
    into the rollup equals recomputing the rollup over the final
    snapshot."""
    from example_dms_dataexport_spark.operators import incremental

    # build a consistent change-set against the drawn facts: each fact row
    # is kept / updated (possibly moving groups) / deleted; plus inserts
    snapshot, changes = [], []
    for grp, v in facts:
        action = data.draw(st.sampled_from(["keep", "update", "delete"]))
        if action == "keep":
            snapshot.append((grp, v))
        elif action == "update":
            ngrp = data.draw(st.sampled_from(GROUPS))
            nv = data.draw(st.integers(min_value=-50, max_value=50))
            changes.append(("U", grp, v, ngrp, nv))
            snapshot.append((ngrp, nv))
        else:
            changes.append(("D", grp, v, None, None))
    for _ in range(data.draw(st.integers(min_value=0, max_value=4))):
        grp = data.draw(st.sampled_from(GROUPS))
        v = data.draw(st.integers(min_value=-50, max_value=50))
        changes.append(("I", None, None, grp, v))
        snapshot.append((grp, v))

    fact_schema = "grp string, v long"
    chg_schema = (
        "op string, before_grp string, before_v long, "
        "after_grp string, after_v long"
    )
    start = incremental.rollup(
        spark.createDataFrame(facts, fact_schema), ["grp"], ["v"]
    )
    out = incremental.update_rollup(
        start,
        spark.createDataFrame(changes, chg_schema),
        ["grp"],
        ["v"],
    )
    got = {r["grp"]: (r["sum_v"], r["n_rows"]) for r in out.collect()}
    expect = {}
    for grp, v in snapshot:
        s, n = expect.get(grp, (0, 0))
        expect[grp] = (s + v, n + 1)
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from([0.0, 1.0, 1.5, 2.0, 7.25]),  # forces ties
        ),
        min_size=1,
        max_size=30,
    )
)
def test_percentile_rank_equals_window_reference(spark, rows):
    """quality.percentile_rank (compressed-distribution algorithm) must
    equal percent_rank() over a row window for any group/tie structure."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from example_dms_dataexport_spark.quality import percentile_rank

    df = spark.createDataFrame(rows, ["grp", "val"])
    got = sorted(
        (r["grp"], r["val"], r["pct"])
        for r in percentile_rank(df, "grp", "val").collect()
    )
    ref = sorted(
        (r["grp"], r["val"], r["pct"])
        for r in df.withColumn(
            "pct", F.percent_rank().over(W.partitionBy("grp").orderBy("val"))
        ).collect()
    )
    assert got == ref
