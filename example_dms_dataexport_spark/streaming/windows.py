"""Watermarked tumbling-window aggregation over an event stream.

Identical aggregation expression to the batch ``q16_hourly_event_windows``
query — the DataFrame API is the IR, so batch and streaming share it; only
the source (readStream) and the late-data policy (withWatermark) differ.

The watermark bounds state: windows older than (max event time - delay)
are finalized and evicted, so state size is O(active windows), not
O(stream length) — the property that lets this run forever at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def hourly_event_windows(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """(window_start, event_type, n_events, sum_value) per closed hour."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_hourly_event_windows(
    spark: SparkSession,
    source_glob: str,
    schema: StructType,
    checkpoint_dir: str,
    out_path: str,
    watermark: str = "2 hours",
):
    """File-source stream -> windowed agg -> parquet append sink.

    ``append`` output mode emits each window exactly once, when the
    watermark passes its end — the deterministic-output mode suitable for
    a downstream warehouse.
    """
    events = (
        spark.readStream.schema(schema).json(source_glob)
        if source_glob.endswith(".json") or source_glob.endswith("json")
        else spark.readStream.schema(schema).csv(source_glob)
    )
    agg = hourly_event_windows(events, watermark)
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_path)
        .start()
    )
