"""Sessionization — gap-based session windows, batch and stateful-stream.

The reference has no sessionization (its only "state" is the per-table
watermark), but an events pipeline at 100 TB needs it; this is the
showcase custom *stateful* operator (SURVEY §7.2 step 6):

- **batch**: ``F.session_window`` — JVM-side, whole-stage-codegen'd,
  shuffles once on (user, session-assignment). SQL-expressible → the
  DuckDB oracle reproduces it with a lag/cumsum split (q34).
- **streaming**: ``applyInPandasWithState`` — per-key session state in
  the state store, Arrow-batched. A session closes when a later event
  for the same key arrives more than ``gap`` after it; closed sessions
  are emitted, the trailing open session stays in state. With a real
  unbounded stream, pair with an event-time timeout so idle keys are
  evicted; state size is O(active keys), not O(events).

Both paths share the session definition: consecutive events of one user
belong to one session iff each gap between neighbors is <= ``gap``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def sessionize_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value) per
    gap-delimited session. One shuffle on user_id; session assignment is
    computed inside the aggregation (built-in session_window)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    )


# state: trailing open session as epoch-microsecond bounds + running aggs
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _sessionizer(gap_minutes: int, timeout: bool = False):
    gap_us = gap_minutes * 60 * 1_000_000

    def emit(closed):
        out = pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "n_events",
                "sum_value",
            ],
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        out["sum_value"] = out["sum_value"].round(2)
        return out

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        # Timer fired: the watermark passed this key's session end + gap
        # with no new events — flush the open session and evict the state
        # (this is what bounds state to O(active keys) on a real stream).
        if state.hasTimedOut:
            cur_start, cur_end, cur_n, cur_sum = state.get
            state.remove()
            yield emit([(user_id, cur_start, cur_end, cur_n, cur_sum)])
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        # Arrow hands ts over as datetime64[ns]; normalize to epoch micros.
        ts_us = rows["ts"].values.astype("datetime64[us]").astype("int64")
        vals = rows["value"].astype("float64")

        if state.exists:
            cur_start, cur_end, cur_n, cur_sum = state.get
        else:
            cur_start, cur_end, cur_n, cur_sum = None, None, 0, 0.0

        closed = []
        for t, v in zip(ts_us, vals):
            if cur_start is None:
                cur_start, cur_end, cur_n, cur_sum = t, t, 1, float(v)
            elif t - cur_end <= gap_us:
                cur_end, cur_n, cur_sum = t, cur_n + 1, cur_sum + float(v)
            else:
                closed.append((user_id, cur_start, cur_end, cur_n, cur_sum))
                cur_start, cur_end, cur_n, cur_sum = t, t, 1, float(v)

        state.update((int(cur_start), int(cur_end), int(cur_n), float(cur_sum)))
        if timeout:
            # close this session once the event-time watermark passes its
            # gap boundary (epoch millis, the GroupState timestamp unit)
            state.setTimeoutTimestamp((int(cur_end) + gap_us) // 1000)
        if closed:
            yield emit(closed)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming sessionization: emits each session once — when a later
    event for the same user closes it, or (with ``watermark_delay``) when
    the event-time watermark passes its gap boundary with no new events.

    ``watermark_delay=None``: no timeout — sessions only close on a
    subsequent event (simple, but idle keys hold state forever).
    ``watermark_delay='10 minutes'``: withWatermark + EventTimeTimeout —
    idle keys are flushed and evicted once the watermark passes
    session_end + gap, so state is O(active keys) on an unbounded stream.

    ``events`` must be a streaming DataFrame with (user_id, ts, value).
    """
    use_timeout = watermark_delay is not None
    if use_timeout:
        events = events.withWatermark("ts", watermark_delay)
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionizer(gap_minutes, timeout=use_timeout),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout
        if use_timeout
        else GroupStateTimeout.NoTimeout,
    )


def start_session_stream(
    spark: SparkSession,
    source_glob: str,
    schema: StructType,
    checkpoint_dir: str,
    out_path: str,
    gap_minutes: int = 30,
    max_files_per_trigger: int = 1,
    watermark_delay: str | None = None,
):
    """CSV file source -> stateful sessionizer -> parquet append sink."""
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .csv(source_glob)
    )
    sessions = sessionize_stream(events, gap_minutes, watermark_delay)
    return (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_path)
        .start()
    )
