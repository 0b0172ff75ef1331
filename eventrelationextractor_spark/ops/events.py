"""Event-stream operators over the `events` table: tumbling-window
aggregation and gap-based sessionization.

Batch forms are pure built-in expressions with exact SQL oracles; the
streaming form (Structured Streaming with watermark + window) shares the
same aggregation expression and is exercised in tests via a file source -
the reference itself is batch-only (SURVEY.md §2.9), so streaming is an
additive capability, not a parity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """(window_start, event_type, n_events, total_value) per tumbling
    window."""
    w = F.window("ts", f"{minutes} minutes")
    return (events.groupBy(w.alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "total_value"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the previous
    event is more than ``gap_minutes`` older. Returns one row per session
    (user_id, session_id, session_start, n_events)."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # epoch seconds; works for both TIMESTAMP and TIMESTAMP_NTZ columns
    # (session timezone is pinned to UTC in session.py so NTZ == instant)
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp_ltz"))
    gap = epoch - F.lag(epoch).over(by_user)
    tagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    numbered = tagged.withColumn(
        "session_id", F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)))
    return (numbered.groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("session_start"),
                 F.count(F.lit(1)).alias("n_events")))


def streaming_windowed_counts(stream: DataFrame, minutes: int = 60,
                              watermark: str = "2 hours") -> DataFrame:
    """Structured-Streaming twin of windowed_counts (watermarked).

    Watermarks require an instant (TIMESTAMP) event-time column; NTZ inputs
    are reinterpreted in the session timezone (pinned to UTC)."""
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return (stream.withWatermark("ts", watermark)
            .groupBy(F.window("ts", f"{minutes} minutes").alias("w"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events"))
