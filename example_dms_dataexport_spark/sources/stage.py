"""Stage-format dispatch: one entry point for reading DMS stage files.

The reference stores a per-table ``file_format`` in its metadata table
(ref control_migration_schema_script.sql:26) but its procedures hardcode
CSV; here the column is honored across the formats Snowflake's COPY
INTO (the reference's load primitive, ref :291,341-348) accepts —
``csv`` (headerless positional, the DMS default), ``parquet`` (the
other DMS S3 target format), ``orc``, ``xml`` (named-column contract,
see ``xml_stage``) and ``avro`` (capability-gated on the external
spark-avro module, see ``avro_stage``). All formats share the
(filename, rownum) ordering contract, so the loaders and the CDC merge
are format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .avro_stage import read_stage_avro
from .csv_stage import read_stage_csv
from .orc_stage import read_stage_orc
from .parquet_stage import read_stage_parquet
from .xml_stage import read_stage_xml

STAGE_FORMATS = ("csv", "parquet", "orc", "xml", "avro")


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
    if fmt == "orc":
        return read_stage_orc(
            spark, files, schema, with_file_metadata=with_file_metadata
        )
    if fmt == "xml":
        return read_stage_xml(
            spark, files, schema, with_file_metadata=with_file_metadata
        )
    if fmt == "avro":
        return read_stage_avro(
            spark, files, schema, with_file_metadata=with_file_metadata
        )
    return read_stage_csv(
        spark, files, schema, with_file_metadata=with_file_metadata
    )
