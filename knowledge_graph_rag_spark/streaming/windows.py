"""Windowed streaming aggregations (capability superset; reference is
batch-only, SURVEY.md §2.10).

Event-time sliding-window counts with a watermark for late data — the
standard Structured Streaming shape for the per-key rate rollups that the
batch detectors compute over static frames (A5/A8). Kept separate from the
batch operators: batch plans stay window-function-based; stream plans use
event-time windows + watermark state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup for training-data ingestion: first-seen-wins on
    the content hash within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — state is one hash per distinct doc,
    evicted once older than the watermark, so memory is bounded by the
    horizon's distinct count, not the stream's length). Batch twin:
    operators/dedup.dedup_exact."""
    hashed = docs.withColumn("content_hash", F.md5(F.col(text_col)))
    if docs.isStreaming:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])


def session_windows(
    events: DataFrame,
    ts_col: str = "timestamp",
    key_col: str = "source_ip",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization with the NATIVE session_window operator —
    state is managed JVM-side (merging session state per key, watermark
    eviction), no custom applyInPandasWithState needed for this shape.

    The batch counterpart (identical semantics, window-function form with a
    lag/running-sum island id) is the driver entry ``session_counts`` —
    pinned equal on a static frame by test_session_window_batch_parity.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "key",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "timestamp",
    key_col: str = "protocol",
    window_duration: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-(window, key) counts + byte volume with late-data watermark.

    Works on both a stream (readStream source) and a static frame (same
    plan; Catalyst handles either), so tests can assert semantics in batch
    and smoke the stream with availableNow.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    return (
        src.groupBy(win.alias("win"), F.col(key_col).alias("key"))
        .agg(
            F.count("*").alias("events"),
            F.sum(F.coalesce(F.col("bytes_sent"), F.lit(0))).alias("bytes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "key",
            "events",
            "bytes",
        )
    )
