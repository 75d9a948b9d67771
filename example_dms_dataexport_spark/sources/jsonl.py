"""JSON-lines source — the landing format document/event corpora usually
arrive in (one JSON object per line, gz-chunked at scale).

Same stance as the CSV stage reader: NO schema inference. Inference
needs an extra full pass over the data and silently widens/narrows types
between batches; a 100 TB ingest declares its schema once (or
introspects the target table, as the reference does for CSVs at
control_migration_schema_script.sql:341-348) and lets corrupt records
land in a quarantine column instead of failing the job.

- explicit ``StructType`` applied at read: column pruning pushes into
  the JSON parser (Jackson only materializes requested fields);
- PERMISSIVE mode with ``_corrupt`` capture: bad lines become one
  non-null ``_corrupt`` row — count them, don't crash the load;
- ``multiLine`` stays False: line-delimited JSON is splittable, so one
  large file still fans out across executors (a multiline JSON array
  is a single-split scan — never land data that way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read line-delimited JSON under an explicit schema.

    Rows that fail to parse are dropped by default; with
    ``keep_corrupt=True`` they are kept with every data column NULL and
    the raw line in ``_corrupt`` (quarantine-table pattern).
    """
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL!r}")
    read_schema = StructType(
        [*schema.fields, StructField(CORRUPT_COL, StringType(), True)]
    )
    df = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
