"""Accelerometer operators — P2 (unit conversion), P3 (magnitude),
A7 (AUC per segment / rolling window with optional normalization).

Parity (reference: pipeline/ACC.py): magnitude = sqrt(x²+y²+z²);
``convert_acc`` = (x/(sensitivity*fs))*9.81; AUC pre-aggregates per second
(``groupby(idx // fs).sum()``, :87) before windowing — the same two-level
aggregation here, which is exactly Spark's partial-agg shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

B = "subject_id"


def _sdiv(num, den):
    return num / F.nullif(den, F.lit(0))


def convert_acc(df: DataFrame, fs: float, sensitivity: float = 64.0,
                cols: tuple = ("x", "y", "z")) -> DataFrame:
    """G-force → m/s² (reference: pipeline/ACC.py:4-24)."""
    for c in cols:
        df = df.withColumn(c, F.col(c) / (sensitivity * fs) * 9.81)
    return df


def compute_magnitude(df: DataFrame, cols: tuple = ("x", "y", "z"),
                      out_col: str = "magnitude") -> DataFrame:
    expr = sum((F.col(c) * F.col(c) for c in cols), F.lit(0.0))
    return df.withColumn(out_col, F.sqrt(expr))


def compute_auc(
    df: DataFrame,
    fs: float,
    seg_size: int = 60,
    rolling_window: int | None = None,
    rolling_step: int = 15,
    value_col: str = "magnitude",
    norm: str | None = None,
) -> DataFrame:
    """Two-level AUC: per-second sums, then per-segment (or sliding-window)
    sums; optional 'minmax'/'zscore' normalization of the per-second series
    before the window sum (reference: pipeline/ACC.py:47-197)."""
    per_sec = df.groupBy(
        B, F.floor(F.col("sample_idx") / int(fs)).alias("sec")
    ).agg(F.sum(value_col).alias("sec_sum"))

    if norm == "minmax":
        w = Window.partitionBy(B)
        per_sec = per_sec.withColumn(
            "sec_sum",
            _sdiv(
                F.col("sec_sum") - F.min("sec_sum").over(w),
                F.nullif(
                    F.max("sec_sum").over(w) - F.min("sec_sum").over(w),
                    F.lit(0.0),
                ),
            ),
        )
    elif norm == "zscore":
        w = Window.partitionBy(B)
        per_sec = per_sec.withColumn(
            "sec_sum",
            _sdiv(
                F.col("sec_sum") - F.avg("sec_sum").over(w),
                F.nullif(F.stddev_samp("sec_sum").over(w), F.lit(0.0)),
            ),
        )

    if rolling_window is None:
        return (
            per_sec.groupBy(
                B, (F.floor(F.col("sec") / seg_size) + 1).alias("segment")
            )
            .agg(F.sum("sec_sum").alias("auc"))
            .select(B, "segment", "auc")
        )
    lo = F.greatest(
        F.lit(0), F.ceil((F.col("sec") - rolling_window + 1) / F.lit(rolling_step))
    )
    hi = F.floor(F.col("sec") / F.lit(rolling_step))
    return (
        per_sec.withColumn("mw", F.explode(F.sequence(lo, hi)))
        .groupBy(B, (F.col("mw") + 1).alias("moving_window"))
        .agg(F.sum("sec_sum").alias("auc"))
        .select(B, "moving_window", "auc")
    )


def get_duration(df: DataFrame, fs: float) -> DataFrame:
    """P4: recording duration in seconds per subject."""
    return df.groupBy(B).agg(
        (F.count(F.lit(1)) / F.lit(fs)).alias("duration_s")
    )
