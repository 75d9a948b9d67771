"""Stage-format dispatch: one entry point for reading DMS stage files.

The reference stores a per-table ``file_format`` in its metadata table
(ref control_migration_schema_script.sql:26) but its procedures hardcode
CSV; here the column is honored — ``csv`` (headerless positional, the
DMS default) and ``parquet`` (the other DMS S3 target format) share one
positional-cast contract and one (filename, rownum) ordering contract,
so the loaders and the CDC merge are format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .csv_stage import read_stage_csv
from .parquet_stage import read_stage_parquet

STAGE_FORMATS = ("csv", "parquet")


def stage_extension(file_format: str) -> str:
    """File extension for a table's stage format (used in the LIST
    patterns); raises on formats the engine doesn't read."""
    fmt = (file_format or "csv").lower()
    if fmt not in STAGE_FORMATS:
        raise ValueError(
            f"unsupported stage file_format {file_format!r}; "
            f"supported: {STAGE_FORMATS}"
        )
    return fmt


def read_stage(
    spark: SparkSession,
    files: list[str],
    schema: StructType,
    file_format: str = "csv",
    with_file_metadata: bool = False,
) -> DataFrame:
    """Read driver-pruned stage files positionally cast to ``schema``,
    dispatched on the table's metadata ``file_format``."""
    fmt = stage_extension(file_format)
    if fmt == "parquet":
        return read_stage_parquet(
            spark, files, schema, with_file_metadata=with_file_metadata
        )
    return read_stage_csv(
        spark, files, schema, with_file_metadata=with_file_metadata
    )
