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
