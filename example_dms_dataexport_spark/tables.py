"""Load the driver-generated parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under a scale-factor dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _events_ts_unit(path: str) -> str:
    """Physical unit of ``events.ts`` from the parquet footer ("ns"/"us").

    Driver-side, one footer read — the generated data has used both
    nanosecond- and microsecond-precision timestamps across versions, and
    the two need different read paths.  Handles a directory-shaped table
    (reads the first part file's footer) and defaults to "us" (the native
    read path) when the column isn't an annotated timestamp at all.
    """
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not parts:
            return "us"
        path = os.path.join(path, parts[0])
    try:
        # INT96 (Spark's default writer type) also surfaces as
        # timestamp[ns] in the arrow schema, but Spark reads it natively —
        # only an int64 column ANNOTATED nanos needs the legacy-long shim.
        phys = pq.ParquetFile(path).schema
        for i in range(len(phys)):
            if phys.column(i).name == "ts":
                if phys.column(i).physical_type == "INT96":
                    return "us"
                break
        return str(pq.read_schema(path).field("ts").type.unit)
    except (KeyError, AttributeError):
        return "us"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; shims parquet timestamp precision for ``events.ts``.

    Nanosecond parquet timestamps are rejected outright by Spark's reader
    (PARQUET_TYPE_ILLEGAL); the legacy conf reads them as a plain long and
    integer-dividing by 1000 (``div`` — exact long arithmetic, no double
    round-trip) truncates toward zero exactly like DuckDB's ns→µs
    conversion.  Microsecond timestamps read natively as TIMESTAMP_NTZ and
    are cast to the session-zone type (session tz is pinned UTC, so the
    cast is value-preserving) — both paths land on identical
    TimestampType microsecond values.
    """
    if name == "events":
        from pyspark.sql import functions as F

        path = os.path.join(sf_dir, "events.parquet")
        if _events_ts_unit(path) == "ns":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return spark.read.parquet(path).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for spark.sql access."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
