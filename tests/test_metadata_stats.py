"""Metadata-only stats answering (warehouse.metadata_stats)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_dms_dataexport_spark.sources.warehouse import ParquetWarehouse

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def wh(tmp_path):
    return ParquetWarehouse(str(tmp_path))


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


def test_matches_true_aggregates_with_zero_scan(spark, wh):
    df = _orders(spark)
    wh.overwrite(
        df,
        "o",
        cluster_by=["o_orderkey"],
        stat_cols=["o_orderkey", "o_orderpriority"],
    )
    got = wh.metadata_stats("o")
    want = df.agg(
        F.count(F.lit(1)),
        F.min("o_orderkey"),
        F.max("o_orderkey"),
        F.min("o_orderpriority"),
        F.max("o_orderpriority"),
    ).first()
    assert got["rows"] == want[0]
    assert got["cols"]["o_orderkey"] == {"min": want[1], "max": want[2]}
    assert got["cols"]["o_orderpriority"] == {"min": want[3], "max": want[4]}
    assert got["files"] >= 1


def test_none_without_zonemap(spark, wh):
    wh.overwrite(_orders(spark), "plain")
    assert wh.metadata_stats("plain") is None


def test_refuses_pending_deletes_then_reflects_materialization(spark, wh):
    df = _orders(spark)
    wh.overwrite(df, "o", cluster_by=["o_orderkey"], stat_cols=["o_orderkey"])
    lo = df.agg(F.min("o_orderkey")).first()[0]
    wh.delete_keys(spark, "o", "o_orderkey", [lo])
    with pytest.raises(ValueError, match="pending merge-on-read deletes"):
        wh.metadata_stats("o")
    wh.materialize_deletes(spark, "o")
    got = wh.metadata_stats("o")
    assert got["rows"] == df.count() - 1
    # the manifest's min moved off the erased key
    assert got["cols"]["o_orderkey"]["min"] > lo


def test_all_null_band_reports_none(spark, wh):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "k long, v string"
    )
    wh.overwrite(df, "t", stat_cols=["v"])
    got = wh.metadata_stats("t")
    assert got["rows"] == 2
    assert got["cols"]["v"] == {"min": None, "max": None}


def test_versioned_snapshots_answer_per_version(spark, wh):
    """Each immutable snapshot carries its own zone map, so stats
    answer per retained version — time travel at zero data I/O."""
    df = _orders(spark)
    v1 = wh.overwrite_versioned(
        df, "v", cluster_by=["o_orderkey"], stat_cols=["o_orderkey"]
    )
    half = df.filter(F.col("o_orderkey") % 2 == 0)
    v2 = wh.overwrite_versioned(
        half, "v", cluster_by=["o_orderkey"], stat_cols=["o_orderkey"]
    )
    assert wh.metadata_stats("v", version=v1)["rows"] == df.count()
    assert wh.metadata_stats("v", version=v2)["rows"] == half.count()
    assert wh.metadata_stats("v")["rows"] == half.count()  # current
