"""As-of join operator: tie behavior, strictness, inner/left, null carry."""

from __future__ import annotations

import pytest

from example_dms_dataexport_spark.operators.asof import asof_backward


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_strict_excludes_equal_ts(spark):
    left = _mk(spark, [(1, 10, "e1"), (1, 20, "e2")], ["k", "ts", "eid"])
    right = _mk(spark, [(1, 10, "c0"), (1, 15, "c1")], ["k", "rts", "tag"])
    out = asof_backward(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        carry=["tag"], strict=True,
    )
    got = {(r.eid, r.tag) for r in out.collect()}
    # e1@10: the c0@10 tie is excluded under strict -> no match, dropped
    assert got == {("e2", "c1")}


def test_inclusive_matches_equal_ts(spark):
    left = _mk(spark, [(1, 10, "e1")], ["k", "ts", "eid"])
    right = _mk(spark, [(1, 10, "c0")], ["k", "rts", "tag"])
    out = asof_backward(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        carry=["tag"], strict=False,
    )
    assert [(r.eid, r.tag) for r in out.collect()] == [("e1", "c0")]


def test_left_keeps_unmatched(spark):
    left = _mk(spark, [(1, 5, "early"), (2, 50, "other-key")], ["k", "ts", "eid"])
    right = _mk(spark, [(1, 10, "c1")], ["k", "rts", "tag"])
    out = asof_backward(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        carry=["tag"], how="left",
    )
    got = {(r.eid, r.tag) for r in out.collect()}
    assert got == {("early", None), ("other-key", None)}


def test_latest_of_many_wins(spark):
    left = _mk(spark, [(1, 100, "e")], ["k", "ts", "eid"])
    right = _mk(
        spark, [(1, t, f"c{t}") for t in (1, 7, 42, 99)], ["k", "rts", "tag"]
    )
    out = asof_backward(
        left, right, on=["k"], left_ts="ts", right_ts="rts", carry=["tag"]
    )
    assert [r.tag for r in out.collect()] == ["c99"]


def test_carry_collision_raises(spark):
    df = _mk(spark, [(1, 1, "x")], ["k", "ts", "tag"])
    with pytest.raises(ValueError, match="collide"):
        asof_backward(df, df, on=["k"], left_ts="ts", right_ts="ts", carry=["tag"])


def test_inner_keeps_match_with_all_null_carry(spark):
    # a MATCHED right row whose carried columns are all NULL must survive
    # inner mode (DuckDB ASOF keeps it) — match is a row property, not
    # "any carry non-null"
    left = _mk(spark, [(1, 20, "e")], ["k", "ts", "eid"])
    right = spark.createDataFrame(
        [(1, 10, None)], "k int, rts int, tag string"
    )
    out = asof_backward(
        left, right, on=["k"], left_ts="ts", right_ts="rts", carry=["tag"]
    )
    assert [(r.eid, r.tag) for r in out.collect()] == [("e", None)]


def test_null_carry_is_atomic_not_show_through(spark):
    # latest matching row wins ATOMICALLY: its NULL field is NOT backfilled
    # from an older row (DuckDB ASOF semantics, verified below)
    left = _mk(spark, [(1, 100, "e")], ["k", "ts", "eid"])
    right = spark.createDataFrame(
        [(1, 10, "old"), (1, 50, None)], "k int, rts int, tag string"
    )
    out = asof_backward(
        left, right, on=["k"], left_ts="ts", right_ts="rts", carry=["tag"]
    )
    assert [(r.eid, r.tag) for r in out.collect()] == [("e", None)]

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE l AS SELECT 1 k, 100 ts, 'e' eid")
    con.execute(
        "CREATE TABLE r AS SELECT * FROM (VALUES (1, 10, 'old'), (1, 50, NULL))"
        " t(k, rts, tag)"
    )
    oracle = con.execute(
        "SELECT eid, tag FROM l ASOF JOIN r ON l.k = r.k AND r.rts < l.ts"
    ).fetchall()
    assert oracle == [("e", None)]


def test_empty_carry_inner_and_left(spark):
    # carry=[] = pure point-in-time filter; used to crash on .filter(None)
    left = _mk(spark, [(1, 5, "early"), (1, 20, "late")], ["k", "ts", "eid"])
    right = _mk(spark, [(1, 10, "c")], ["k", "rts", "tag"])
    inner = asof_backward(
        left, right, on=["k"], left_ts="ts", right_ts="rts", carry=[]
    )
    assert [r.eid for r in inner.collect()] == ["late"]
    kept = asof_backward(
        left, right, on=["k"], left_ts="ts", right_ts="rts", carry=[], how="left"
    )
    assert sorted(r.eid for r in kept.collect()) == ["early", "late"]


def test_matched_carry_name_raises(spark):
    left = _mk(spark, [(1, 10, "e1")], ["k", "ts", "eid"])
    right = _mk(spark, [(1, 5, True)], ["k", "rts", "_matched"])
    with pytest.raises(ValueError, match="_matched"):
        asof_backward(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            carry=["_matched"],
        )


def test_salted_hot_key_matches_unsalted(spark):
    import pyspark.sql.functions as F
    from example_dms_dataexport_spark.plans.introspect import physical_plan

    # one hot key carrying 100k left rows, plus a normal key; a handful of
    # right versions per key
    left = (
        spark.range(100_000)
        .select(
            F.when(F.col("id") % 10 == 0, "cold").otherwise("hot").alias("k"),
            (F.col("id") + 1000).alias("ts"),
            F.col("id").alias("eid"),
        )
    )
    right = spark.createDataFrame(
        [("hot", t, f"h{t}") for t in (0, 5_000, 50_000, 99_000)]
        + [("cold", 2_000, "c")],
        ["k", "rts", "tag"],
    )
    kw = dict(on=["k"], left_ts="ts", right_ts="rts", carry=["tag"], how="left")
    plain = asof_backward(left, right, **kw)
    salted = asof_backward(left, right, salt=8, **kw)
    # the salted window must partition on the bucket (N-way parallelism)
    assert "_bucket" in physical_plan(salted)
    assert "_bucket" not in physical_plan(plain)
    a = {(r.eid, r.tag) for r in plain.collect()}
    b = {(r.eid, r.tag) for r in salted.collect()}
    assert a == b and len(a) == 100_000
