"""Pin the driver-side numpy xxHash64 (functions/xxh64.py) bit-exactly
against Spark's own ``xxhash64`` expression — the guarantee that bloom
probe hashes computed without a Spark job index the same bitmap
positions the build pass set."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from example_dms_dataexport_spark.functions.xxh64 import (
    chain_integral_hashes,
)

K = 5


def _spark_hashes(spark, rows, fields, k=K):
    probe = spark.createDataFrame(rows, StructType(fields))
    cols = [F.col(f.name) for f in fields]
    got = probe.select(
        *[F.xxhash64(*cols, F.lit(i)).alias(f"h{i}") for i in range(k)]
    ).collect()
    return [[r[f"h{i}"] for i in range(k)] for r in got]


LONG_EDGES = [0, 1, -1, 42, 2**63 - 1, -(2**63), 0x9E3779B185EBCA87 - 2**64]
INT_EDGES = [0, 1, -1, 2**31 - 1, -(2**31)]


def test_long_edges_match_spark(spark):
    rows = [(v,) for v in LONG_EDGES]
    fields = [StructField("x", LongType())]
    assert chain_integral_hashes(rows, ["long"], K) == _spark_hashes(
        spark, rows, fields
    )


def test_int_edges_match_spark(spark):
    rows = [(v,) for v in INT_EDGES]
    fields = [StructField("x", IntegerType())]
    assert chain_integral_hashes(rows, ["integer"], K) == _spark_hashes(
        spark, rows, fields
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(-(2**63), 2**63 - 1),
            st.integers(-(2**31), 2**31 - 1),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_tuple_chain_matches_spark(spark, rows):
    """(long, int) composite keys — the chained-seed path."""
    fields = [StructField("a", LongType()), StructField("b", IntegerType())]
    assert chain_integral_hashes(
        rows, ["long", "integer"], K
    ) == _spark_hashes(spark, rows, fields)


def test_fallback_on_non_integral_and_nulls():
    assert chain_integral_hashes([("s",)], ["string"], K) is None
    assert chain_integral_hashes([(None,)], ["long"], K) is None
    assert chain_integral_hashes([(True,)], ["boolean"], K) is None
    assert chain_integral_hashes([], ["long"], K) == []


def test_bloom_split_runs_zero_jobs_for_long_keys(spark, tmp_path):
    """bloom_hit_split on a long key column must not launch a probe-hash
    job — the split is pure driver work (manifest JSON + numpy hashes).
    The pruned lookup itself stays exact."""
    from example_dms_dataexport_spark.sources.warehouse import (
        ParquetWarehouse,
    )

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    wh.overwrite(df, "t", bloom_cols=["id"])
    sc = spark.sparkContext
    sc.setJobGroup("probe-split", "bloom split only")
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup("probe-split"))
    hit, miss = wh.bloom_hit_split(spark, "t", "id", [3, 500, 999])
    after = len(tracker.getJobIdsForGroup("probe-split"))
    sc.setJobGroup("", "")
    assert after == before == 0
    assert hit  # the keys exist, so at least one file must admit them
    got = sorted(
        r["id"]
        for r in wh.read_bloom_keys(spark, "t", "id", [3, 500, 999]).collect()
    )
    assert got == [3, 500, 999]
