"""Shared stage-reader building blocks: the positional cast and the
split-safe per-file row number.

The (filename, rownum) total order is what the CDC merge's latest-wins
versioning depends on (ref control_migration_schema_script.sql:382,
388-389) — it has exactly ONE definition here, used by the ORC, Avro
and XML readers (parquet gets ``_metadata.row_index`` natively, CSV
forces one split per file; see their modules).

Ordering under file SPLITTING: ``_metadata.file_block_start`` is the
byte offset of the split a row came from. Within one split, rows are
produced in file order, so ``monotonically_increasing_id`` is monotone
there; across splits of one file, the offset orders the splits. A
window over ``file_path`` ordered by ``(file_block_start, mono_id)``
therefore reconstructs exact intra-file order REGARDLESS of how Spark
splits or bin-packs the scan — large stage files keep full scan
parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


def positional_cast(raw: DataFrame, schema: StructType, fmt: str) -> list[Column]:
    """Each file column, in file order, cast+renamed to the target
    schema's field at the same position (the ``$1..$n`` contract)."""
    src = raw.columns
    if len(src) != len(schema.fields):
        raise ValueError(
            f"stage {fmt} has {len(src)} columns, target schema needs "
            f"{len(schema.fields)} (positional contract)"
        )
    return [
        F.col(src[i]).cast(f.dataType).alias(f.name)
        for i, f in enumerate(schema.fields)
    ]


def with_split_safe_rownum(df: DataFrame, cols: list[Column]) -> DataFrame:
    """Project ``cols`` plus ``_dms_filename``/``_dms_rownum`` from a
    file-source scan, via the split-safe window (module docstring)."""
    out = df.select(
        *cols,
        F.col("_metadata.file_path").alias("_dms_filename"),
        F.col("_metadata.file_block_start").alias("_dms_blockstart"),
        F.monotonically_increasing_id().alias("_dms_monoid"),
    )
    w = Window.partitionBy("_dms_filename").orderBy(
        "_dms_blockstart", "_dms_monoid"
    )
    return out.withColumn("_dms_rownum", F.row_number().over(w)).drop(
        "_dms_blockstart", "_dms_monoid"
    )
