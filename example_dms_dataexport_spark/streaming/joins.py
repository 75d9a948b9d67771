"""Watermarked stream-stream interval join — click attribution as the
two-stream case ("each click joined to the views it followed within N
minutes, per user"), running continuously.

A stream-stream join must buffer both sides; unbounded buffering is the
failure mode. Two constraints make the state finite, and Spark REQUIRES
both for append-mode inner joins:

- a watermark on each input (how late either stream can be);
- a time-bound in the join condition (``view.ts <= click.ts <
  view.ts + horizon``), so a buffered row is provably joinable only
  within a bounded event-time span and can be evicted once the other
  side's watermark passes it.

State per key is then O(events inside watermark + horizon) — the
streaming analogue of the batch ``operators.rangejoin`` bucketing, and
the same semantics the batch side expresses as a range join of clicks
into [view.ts, view.ts + horizon) intervals (the parity test pins batch
== stream on a closed input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_clicks_to_views(
    views: DataFrame,
    clicks: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(user_id, view_id, view_ts, click_id, click_ts) for every click
    within ``horizon`` at-or-after a view by the same user. Works on
    both batch and streaming inputs (the DataFrame expression is the
    IR); on streams both sides get ``watermark`` and the plan is an
    append-mode inner stream-stream join with bounded state.
    """
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    return v.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") < F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select("user_id", "view_id", "view_ts", "click_id", "click_ts")
