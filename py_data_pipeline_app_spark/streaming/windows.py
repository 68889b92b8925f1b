"""Event-time windowed aggregations: tumbling, sliding, session
windows with watermark-based late-data handling.

The reference has no streaming (SURVEY.md §2.8) — its upload loop is an
externally-triggered micro-batch. These operators are the Structured
Streaming extension over the driver's ``events`` table; every builder
works identically on a batch DataFrame (Spark defines streaming windows
as plain functions), which is how the DuckDB oracle checks them: the
batch run over the full table equals the final state of the streaming
run after all data has arrived (watermarks only drop data that is late
*relative to already-seen data*; a complete replay produces the same
result).

Scale: windowed aggregation shuffles on (window, keys) with map-side
partial aggregation; state store size is bounded by the watermark
horizon, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window_dur: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window count/sum per key. On a streaming input pass
    ``watermark`` (e.g. '10 minutes') to bound state and drop late
    rows."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_dur).alias("w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window_dur: str = "1 hour",
    slide: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window event counts: each event lands in
    window_dur/slide overlapping windows."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_dur, slide).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def session_windows(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    key: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows per key: a session closes after ``gap`` of
    inactivity. Uses the native ``session_window`` operator (dynamic,
    merging state) — in batch mode it is the classic gaps-and-islands
    computation, which is exactly what the SQL oracle replicates."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n_events",
        )
    )
