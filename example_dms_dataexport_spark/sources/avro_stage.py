"""DMS Avro stage reader — capability-gated stage format.

Snowflake's COPY INTO (ref control_migration_schema_script.sql:291)
accepts Avro stage files. Spark's Avro support is the EXTERNAL
``spark-avro`` module (external since Spark 2.4): the core ``avro-*``
jars ship with pyspark but the DataSource itself does not, so this
container cannot load the format. The reader keeps the same contract
as the parquet/ORC readers (Avro records are ordered, so the
POSITIONAL cast applies, and ordering uses the split-safe
``(file_block_start, monotonically_increasing_id)`` window) and fails
fast with deploy guidance when the module is absent — on a real
cluster, add the public artifact
``org.apache.spark:spark-avro_2.13:<spark-version>`` via
``spark.jars.packages`` and the path lights up unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .filemeta import positional_cast, with_split_safe_rownum


# Probe result per Spark application: module presence cannot change
# within a running JVM, and a continuous avro incremental_load must not
# pay a driver-side format-resolution failure per batch.
_PROBE_CACHE: dict[str, bool] = {}


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro DataSource module is deployed.

    Probes the real DataSource lookup ONCE per application (a schema'd
    load of a deliberately-nonexistent path: a missing MODULE fails
    with FAILED_TO_FIND_DATA_SOURCE before the path is ever touched;
    any other error means the format resolved). A bare
    ``Class.forName("...AvroFileFormat")`` is NOT a valid probe — some
    distributions ship avro classes on the classpath without
    registering the DataSource, and the lookup still fails."""
    key = spark.sparkContext.applicationId
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    try:
        spark.read.format("avro").schema("__probe INT").load(
            "/__avro_module_probe_nonexistent__"
        )
        ok = True
    except Exception as e:  # noqa: BLE001 — classify by error text
        msg = str(e)
        ok = not (
            "Failed to find data source" in msg
            or "FAILED_TO_FIND_DATA_SOURCE" in msg
        )
    _PROBE_CACHE[key] = ok
    return ok


def read_stage_avro(
    spark: SparkSession,
    files: list[str],
    schema: StructType,
    with_file_metadata: bool = False,
) -> DataFrame:
    """Read an explicit (driver-pruned) list of stage Avro files,
    positionally cast to ``schema``. Raises ``RuntimeError`` with
    deploy guidance when the spark-avro module is not on the
    classpath (see module docstring)."""
    if not avro_available(spark):
        raise RuntimeError(
            "stage file_format 'avro' needs the external spark-avro "
            "module; deploy org.apache.spark:spark-avro_2.13:"
            f"{spark.version} via spark.jars.packages"
        )
    if not files:
        return spark.createDataFrame([], schema)
    raw = spark.read.format("avro").load(files)
    cols = positional_cast(raw, schema, "avro")
    if with_file_metadata:
        return with_split_safe_rownum(raw, cols)
    return raw.select(*cols)
