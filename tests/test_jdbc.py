"""JDBC source tests against the Derby embedded DB shipped in Spark's jars.

This exercises the REAL spark.read.format("jdbc") path (SURVEY S15) — not
a mock: partitioned range reads, predicate pushdown into the remote SQL,
and the full JDBC→warehouse sync (the reference's Oracle→Snowflake
pattern, ref control_migration_schema_script.sql:215-259, without the
DMS CSV hop).
"""

import pytest

from example_dms_dataexport_spark.sources.jdbc import (
    jdbc_options,
    read_jdbc,
    sync_to_warehouse,
)
from example_dms_dataexport_spark.sources.warehouse import ParquetWarehouse

URL = "jdbc:derby:memory:jdbctest"


@pytest.fixture(scope="module")
def derby(spark):
    """Create an in-memory Derby table through the driver JVM."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL + ";create=true")
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE orders_src (o_id INT PRIMARY KEY, region VARCHAR(16), "
        "amount DECIMAL(10,2))"
    )
    for i in range(100):
        st.executeUpdate(
            f"INSERT INTO orders_src VALUES ({i}, 'r{i % 4}', {i}.25)"
        )
    st.close()
    yield URL
    # Derby in-memory DBs die with the JVM; drop explicitly for re-entrancy.
    d = jvm.java.sql.DriverManager.getConnection(URL)
    d.createStatement().executeUpdate("DROP TABLE orders_src")


def test_option_validation():
    with pytest.raises(ValueError, match="not both"):
        jdbc_options(URL, "t", query="SELECT 1")
    with pytest.raises(ValueError, match="partitioned read needs"):
        jdbc_options(URL, "t", partition_column="id")
    opts = jdbc_options(
        URL, "t", partition_column="id", lower_bound=0, upper_bound=10,
        num_partitions=4,
    )
    assert opts["numPartitions"] == "4" and opts["partitionColumn"] == "id"


def test_partitioned_read(spark, derby):
    df = read_jdbc(
        spark,
        url=derby,
        table="orders_src",
        partition_column="o_id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    # Decimal precision/scale arrives intact (no information_schema round-trip).
    assert dict(df.dtypes)["AMOUNT"] == "decimal(10,2)"


def test_predicate_pushdown(spark, derby):
    df = read_jdbc(spark, url=derby, table="orders_src").filter("o_id >= 90")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(O_ID,90)" in plan
    assert df.count() == 10


def test_sync_to_warehouse(spark, derby, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    n = sync_to_warehouse(
        spark,
        wh,
        "orders_synced",
        url=derby,
        table="orders_src",
        partition_column="o_id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert n == 100
    out = wh.read(spark, "orders_synced")
    assert out.count() == 100
    assert {r["REGION"] for r in out.select("REGION").distinct().collect()} == {
        "r0", "r1", "r2", "r3"
    }
    # Idempotent re-sync (TRUNCATE+COPY contract): same state, not doubled.
    n2 = sync_to_warehouse(spark, wh, "orders_synced", url=derby, table="orders_src")
    assert n2 == 100
