"""Generic O(batch) INSERT INTO (warehouse.append_files)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from example_dms_dataexport_spark.sources.warehouse import ParquetWarehouse

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def wh(tmp_path):
    return ParquetWarehouse(str(tmp_path))


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _inodes(root):
    out = {}
    for dp, _, fns in os.walk(root):
        for fn in fns:
            if fn.endswith(".parquet"):
                p = os.path.join(dp, fn)
                out[os.path.relpath(p, root)] = os.stat(p).st_ino
    return out


def test_append_is_o_batch_and_content_exact(spark, wh):
    df = _orders(spark)
    head = df.filter(F.col("o_orderkey") % 2 == 0)
    tail = df.filter(F.col("o_orderkey") % 2 == 1)
    wh.overwrite(head, "o")
    before = _inodes(wh.path("o"))
    res = wh.append_files(spark, tail, "o")
    assert res["rows"] == tail.count() and res["files_added"] >= 1
    after = _inodes(wh.path("o"))
    for rel, ino in before.items():  # no pre-append file touched
        assert after.get(rel) == ino
    got = {r["o_orderkey"] for r in wh.read(spark, "o").collect()}
    assert got == {r["o_orderkey"] for r in df.collect()}


def test_append_partitioned_lands_in_hive_dirs(spark, wh):
    df = _orders(spark).withColumn(
        "bucket", (F.col("o_orderkey") % 4).cast("int")
    )
    wh.overwrite(df.filter("o_orderkey % 2 = 0"), "p", partition_by=["bucket"])
    wh.append_files(
        spark, df.filter("o_orderkey % 2 = 1"), "p", partition_by=["bucket"]
    )
    assert wh.read(spark, "p").count() == df.count()
    root = wh.path("p")
    assert any(d.startswith("bucket=") for d in os.listdir(root))


def test_append_invalidates_zonemap_and_sweeps_staging(spark, wh):
    df = _orders(spark)
    wh.overwrite(
        df, "z", cluster_by=["o_orderkey"], stat_cols=["o_orderkey"]
    )
    assert wh.zonemap("z") is not None
    root = wh.path("z").rstrip("/")
    ghost = os.path.join(
        os.path.dirname(root), f".{os.path.basename(root)}.append-tmp-dead"
    )
    os.makedirs(ghost)
    wh.append_files(spark, df.limit(5), "z")
    assert wh.zonemap("z") is None
    assert not os.path.isdir(ghost)


def test_append_refusals(spark, wh):
    df = _orders(spark)
    wh.overwrite(df, "o")
    with pytest.raises(ValueError, match="schema mismatch"):
        wh.append_files(spark, df.drop("o_totalprice"), "o")
    lo = df.agg(F.min("o_orderkey")).first()[0]
    wh.delete_keys(spark, "o", "o_orderkey", [lo])
    with pytest.raises(ValueError, match="pending merge-on-read"):
        wh.append_files(spark, df.limit(1), "o")
    wh.write_bucketed(df, "b", ["o_custkey"], 4)
    with pytest.raises(ValueError, match="bucketed"):
        wh.append_files(spark, df.limit(1), "b")
    wh.overwrite_versioned(df, "v")
    with pytest.raises(ValueError, match="versioned"):
        wh.append_files(spark, df.limit(1), "v")


def test_append_under_foreign_fence_fails_fast(spark, wh):
    import os as _os

    from example_dms_dataexport_spark.sources.warehouse import (
        ConcurrentWriteError,
    )

    df = _orders(spark)
    wh.overwrite(df, "o")
    lock = wh._mutation_lock_path("o")
    with open(lock, "w") as f:
        f.write(f"pid={_os.getpid()} host={_os.uname().nodename}")
    try:
        with pytest.raises(ConcurrentWriteError):
            wh.append_files(spark, df.limit(1), "o")
    finally:
        _os.remove(lock)


def test_empty_append_is_a_true_noop(spark, wh):
    df = _orders(spark)
    wh.overwrite(df, "o", cluster_by=["o_orderkey"], stat_cols=["o_orderkey"])
    before = _inodes(wh.path("o"))
    res = wh.append_files(spark, df.limit(0), "o")
    assert res == {"files_added": 0, "rows": 0}
    assert _inodes(wh.path("o")) == before
    assert wh.zonemap("o") is not None  # no mutation -> sidecar intact
