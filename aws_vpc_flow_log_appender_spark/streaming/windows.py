"""Streaming event-time windows with watermarks — the streaming twins of
operators/timeseries.py (which the DuckDB oracle verifies in batch form).

The reference discards event time entirely (processing-time @timestamp,
decorator/index.js:111); these operators use the true event time with
bounded-state watermarks, which is what a 100 TB stream needs: state size is
(watermark horizon x key cardinality), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts_stream(events: DataFrame, width: str = "1 hour",
                           watermark: str = "10 minutes") -> DataFrame:
    """Tumbling event-time counts per event_type; late rows beyond the
    watermark are dropped (append-mode emittable)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts_stream(events: DataFrame, width: str = "1 hour",
                          slide: str = "30 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "10 minutes") -> DataFrame:
    """Native session windows (dynamic-length, gap-merged) — the streaming
    form of ts_sessionize's lag+cumsum batch construction."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
