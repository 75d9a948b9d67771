"""DMS ORC stage reader — third stage file format.

The reference's metadata carries a per-table ``file_format`` column
(ref control_migration_schema_script.sql:26); Snowflake's COPY INTO —
the load primitive the reference's procedures generate — accepts ORC
alongside CSV/Parquet/Avro/XML, so an ORC landing zone is a first-class
stage layout even though the reference's own procedures hardcode CSV.
Contract is identical to ``parquet_stage.read_stage_parquet``:

- columns are POSITIONAL against the target schema (ORC is
  self-describing with an *ordered* struct, so file column order is the
  position; CDC files prepend the 1-char op column, ref :291,341-348);
- ``_dms_filename`` / ``_dms_rownum`` mirror metadata$filename /
  metadata$file_row_number (ref :382,388-389).

Ordering under file SPLITTING: ORC has no ``_metadata.row_index``
(that hidden field is parquet-only), but it does expose
``_metadata.file_block_start`` — the byte offset of the split a row
came from. Within one split, rows are produced in file order, so
``monotonically_increasing_id`` is monotone there; across splits of the
same file, ``file_block_start`` orders the splits by byte offset. A
window over ``file_path`` ordered by ``(file_block_start, mono_id)``
therefore reconstructs the exact intra-file row order REGARDLESS of how
Spark splits or bin-packs the scan — big ORC stage files keep full scan
parallelism (unlike the CSV reader, which must force one split per
file). That is the property the CDC merge's (filename, rownum)
versioning depends on at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


def read_stage_orc(
    spark: SparkSession,
    files: list[str],
    schema: StructType,
    with_file_metadata: bool = False,
) -> DataFrame:
    """Read an explicit (driver-pruned) list of stage ORC files,
    positionally cast to ``schema``. The caller prunes ``files`` by
    watermark before this call — already-loaded files are never
    scanned."""
    if not files:
        return spark.createDataFrame([], schema)
    # NB: unlike .parquet(*paths), DataFrameReader.orc takes the list
    raw = spark.read.orc(files)
    src = raw.columns
    if len(src) != len(schema.fields):
        raise ValueError(
            f"stage orc has {len(src)} columns, target schema needs "
            f"{len(schema.fields)} (positional contract)"
        )
    cols = [
        F.col(src[i]).cast(f.dataType).alias(f.name)
        for i, f in enumerate(schema.fields)
    ]
    if with_file_metadata:
        df = raw.select(
            *cols,
            F.col("_metadata.file_path").alias("_dms_filename"),
            F.col("_metadata.file_block_start").alias("_dms_blockstart"),
            F.monotonically_increasing_id().alias("_dms_monoid"),
        )
        w = Window.partitionBy("_dms_filename").orderBy(
            "_dms_blockstart", "_dms_monoid"
        )
        return (
            df.withColumn("_dms_rownum", F.row_number().over(w))
            .drop("_dms_blockstart", "_dms_monoid")
        )
    return raw.select(*cols)
