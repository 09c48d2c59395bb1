"""Watermarked windowed aggregation over event-time streams.

``windowed_stats`` is the declarative Structured Streaming pattern for
late-data-tolerant time-window statistics: event-time watermark bounds
state, tumbling/sliding windows group rows, and the aggregates are
plain built-ins (count/sum/avg/min/max) so the whole query stays inside
Spark's incremental execution — state is evicted as the watermark
passes each window.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["windowed_stats", "session_stats"]


def session_stats(
    stream: DataFrame,
    time_col: str,
    value_col: str,
    gap_duration: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    group_cols: list | None = None,
) -> DataFrame:
    """Session-window statistics: rows within ``gap_duration`` of each
    other (per key) merge into one session (``F.session_window`` — the
    built-in dynamic-gap session operator). Watermark bounds state, so
    closed sessions are emitted and evicted. Works on batch frames too.

    Output: (session_start, session_end, group_cols..., n, total,
    avg_v)."""
    group_cols = list(group_cols or [])
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(time_col, watermark_delay)
    return (
        src.groupBy(
            F.session_window(F.col(time_col), gap_duration).alias("s"),
            *group_cols,
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("total"),
            F.avg(value_col).alias("avg_v"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            *group_cols,
            "n", "total", "avg_v",
        )
    )


def windowed_stats(
    stream: DataFrame,
    time_col: str,
    value_col: str,
    window_duration: str = "10 minutes",
    slide_duration: str | None = None,
    watermark_delay: str = "10 minutes",
    group_cols: list | None = None,
) -> DataFrame:
    """Windowed count/sum/avg/min/max with an event-time watermark.

    Output: (window.start, window.end, group_cols..., n, total, avg_v,
    min_v, max_v). Works on both streaming and batch DataFrames (batch
    ignores the watermark), so results are directly comparable.
    """
    group_cols = list(group_cols or [])
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(time_col, watermark_delay)
    win = (
        F.window(F.col(time_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(time_col), window_duration)
    )
    out = (
        src.groupBy(win.alias("w"), *group_cols)
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("total"),
            F.avg(value_col).alias("avg_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n", "total", "avg_v", "min_v", "max_v",
        )
    )
    return out
