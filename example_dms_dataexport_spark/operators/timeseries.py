"""Time-series regularization: resample an irregular event stream onto a
fixed-interval grid with forward-filled values (the gap-filling /
"last observation carried forward" primitive behind dashboards,
feature-store point-in-time features, and sensor downsampling).

Built by COMPOSITION of existing operators, which is the point: the
per-key grid is a ``sequence`` explode (no shuffle — rows fan out in
place), and the fill is exactly an as-of join (grid point <- latest
event at-or-before it), so it reuses ``asof_backward``'s
union + running-last single-shuffle plan, inheriting its skew notes and
its DuckDB-ASOF oracle story (q64).

100 TB notes: output size is sum over keys of span/step — the operator
densifies, so pick ``step`` with the same care as a window size; the one
shuffle keys on (key), same as any per-key window. Grid generation adds
zero shuffles: min/max ride the same aggregation that starts the as-of
union's left side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .asof import asof_backward


def resample_ffill(
    events: DataFrame,
    step: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, grid_ts, obs_ts, value) on a regular ``step`` grid
    (e.g. ``"6 hours"``) per key, spanning day-truncated first event to
    last event; value/obs_ts come from the latest event at-or-before the
    grid point (ties at the grid instant DO match).
    """
    span = events.groupBy(key_col).agg(
        F.date_trunc("day", F.min(ts_col)).alias("_t0"),
        F.max(ts_col).alias("_t1"),
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence("_t0", "_t1", F.expr(f"INTERVAL {step}"))
        ).alias("grid_ts"),
    )
    right = events.select(
        key_col,
        F.col(ts_col).alias("_obs_ts"),
        F.col(value_col).alias("_obs_value"),
    )
    return asof_backward(
        grid,
        right,
        on=[key_col],
        left_ts="grid_ts",
        right_ts="_obs_ts",
        carry=["_obs_ts", "_obs_value"],
        strict=False,
        how="inner",
    ).select(
        key_col,
        "grid_ts",
        F.col("_obs_ts").alias("obs_ts"),
        F.col("_obs_value").alias("value"),
    )
