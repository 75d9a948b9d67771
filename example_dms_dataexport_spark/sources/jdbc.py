"""JDBC source — partitioned reads from an upstream RDBMS (SURVEY S15).

The reference's upstream is Oracle, exported by AWS DMS to CSV. The
north-star extension reads the RDBMS directly with Spark's JDBC source,
which gives three things DMS CSVs cannot:

- **partitioned parallel reads**: ``partitionColumn/lowerBound/upperBound/
  numPartitions`` shards the table into range predicates executed by
  independent executors — the JDBC analogue of file splits;
- **predicate pushdown**: Catalyst pushes filters into the remote SQL
  (``pushDownPredicate``, on by default), so the database does the
  filtering — crucial when the table is 100x the cluster's memory;
- **schema fidelity**: numeric precision/scale arrive as DecimalType
  directly instead of the reference's information_schema round-trip
  (ref :307-348).

Tested end-to-end against the Derby embedded database that ships in
Spark's jars (tests/test_jdbc.py): partitioned reads, predicate pushdown
into the remote SQL, and the full JDBC→warehouse sync. The same call
shape works unchanged against Oracle/Postgres/MySQL URLs with their
drivers on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    query: str | None = None,
) -> dict[str, str]:
    """Validated option map for a (possibly partitioned) JDBC read.

    ``table`` and ``query`` are mutually exclusive (Spark's own contract);
    partitioned reads need all four partition options — fail fast here
    rather than at executor time.
    """
    if query is not None and table:
        raise ValueError("pass either table or query, not both")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetch_size)}
    if query is not None:
        opts["query"] = query
    else:
        opts["dbtable"] = table
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    partition_opts = [partition_column, lower_bound, upper_bound, num_partitions]
    if any(o is not None for o in partition_opts):
        if any(o is None for o in partition_opts):
            raise ValueError(
                "partitioned read needs partitionColumn, lowerBound, "
                "upperBound AND numPartitions"
            )
        if query is not None:
            raise ValueError("partitionColumn requires dbtable, not query")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """spark.read over a JDBC source; kwargs as in ``jdbc_options``."""
    return spark.read.format("jdbc").options(**jdbc_options(**kwargs)).load()


def sync_to_warehouse(
    spark: SparkSession,
    warehouse,
    target_table: str,
    partition_by: list[str] | None = None,
    **jdbc_kwargs,
) -> int:
    """The north-star ETL in one call: RDBMS → warehouse full sync.

    This is the direct-connect equivalent of the reference's whole
    DMS-export → stage → COPY INTO path (ref :215-259): a partitioned JDBC
    read (shards the source table across executors) landed as an atomic
    warehouse overwrite — same TRUNCATE+COPY idempotency, no intermediate
    CSV hop. Returns rows synced.

    Scale: pass partition_column/bounds sized so each of numPartitions
    range-shards fits an executor; the write is a straight narrow pipeline
    (no shuffle) of scan → parquet encode.
    """
    df = read_jdbc(spark, **jdbc_kwargs)
    warehouse.overwrite(df, target_table, partition_by=partition_by)
    return warehouse.read(spark, target_table).count()
