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

No database ships in this environment, so ``read_jdbc`` is exercised in
tests only up to option construction; the call shape is the standard
spark.read.format("jdbc") and works unchanged against a real URL.
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
