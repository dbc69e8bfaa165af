"""Watermarked event-time windowed aggregation for late data — the
standard Structured Streaming shape (readStream -> withWatermark ->
window groupBy), packaged for the events-table schema.

Scale shape: state per (window, key) lives in the state store; the
watermark bounds state size by evicting windows older than the allowed
lateness, so memory is O(active windows), not O(stream length).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    slide: Optional[str] = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Per-window, per-key event counts and value sums with an event-time
    watermark: events later than ``watermark`` behind the max seen event
    time are dropped and their windows finalized. Works on streaming and
    batch DataFrames (batch ignores the watermark, same results)."""
    win = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )
