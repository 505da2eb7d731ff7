"""Windowed streaming aggregation: tumbling / sliding / session.

NiFi analogs (SURVEY.md §2.11): MergeContent's correlation-key bins with
max-bin-age → tumbling windows; AttributeRollingWindow → sliding windows;
idle-gap bins → session windows.  All three carry ``withWatermark`` so
state is bounded (NiFi's bin age-off / FlowFile expiration).

These builders work on BOTH batch and streaming DataFrames — the
batch-parity property the oracle gate relies on (SURVEY.md §5.2: every
streaming query is checked through its batch-equivalent SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["tumbling_agg", "sliding_agg", "session_agg"]


def _dsum_dec(col: str, alias: str) -> Column:
    # exact decimal accumulation (registry determinism rules)
    return F.sum(F.col(col).cast("decimal(30,6)")).cast("double").alias(alias)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window count+sum per key (MergeContent bins with
    max-bin-age = window length)."""
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        src.groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum_dec("value", "total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "6 hours",
    slide: str = "3 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding-window rolling stats (AttributeRollingWindow): each event
    lands in window/slide overlapping windows."""
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum_dec("value", "total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows: a bin closes after ``gap`` idle time per key —
    NiFi's MergeContent-with-bin-age semantics for bursty sources.
    Session end = last event + gap (Spark's session_window contract).
    """
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum_dec("value", "total_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )
