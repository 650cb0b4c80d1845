"""Accelerometer operators — P2 (unit conversion), P3 (magnitude),
A7 (AUC per segment / rolling window with optional normalization).

Parity (reference: pipeline/ACC.py): magnitude = sqrt(x²+y²+z²);
``convert_acc`` = (x/(sensitivity*fs))*9.81; AUC pre-aggregates per second
(``groupby(idx // fs).sum()``, :87) before windowing — the same two-level
aggregation here, which is exactly Spark's partial-agg shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

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
    sums (reference: pipeline/ACC.py:47-197).

    With ``norm`` ('minmax'/'zscore') the per-second series is normalized
    WITHIN each segment/window (stats over that window only, reference:
    pipeline/ACC.py:100-170) and the normalized sum is emitted as
    ``auc_norm`` ALONGSIDE the raw ``auc`` — never replacing it. Both
    normalizations reduce to closed forms over plain aggregates —
    ``sum((x-mn)/range) = (sum - n*mn)/range`` and
    ``sum((x-mean)/sd) = (sum - n*mean)/sd`` — so the whole thing is one
    partial-aggregable groupBy: no window functions, one shuffle, the
    same plan shape at 100 TB.
    """
    if norm not in (None, "minmax", "zscore"):
        raise ValueError(
            "The `norm` parameter must take None, 'minmax', or 'zscore'."
        )
    per_sec = df.groupBy(
        B, F.floor(F.col("sample_idx") / int(fs)).alias("sec")
    ).agg(F.sum(value_col).alias("sec_sum"))

    if rolling_window is None:
        win = (F.floor(F.col("sec") / seg_size) + 1).alias("segment")
        key = "segment"
        grouped = per_sec.groupBy(B, win)
    else:
        # windows start every rolling_step s, span rolling_window s; each
        # second lands in its covering windows via bounded sequence+explode
        lo = F.greatest(
            F.lit(0),
            F.ceil((F.col("sec") - rolling_window + 1) / F.lit(rolling_step)),
        )
        hi = F.floor(F.col("sec") / F.lit(rolling_step))
        key = "moving_window"
        grouped = per_sec.withColumn(
            "mw", F.explode(F.sequence(lo, hi))
        ).groupBy(B, (F.col("mw") + 1).alias(key))

    aggs = [F.sum("sec_sum").alias("auc")]
    if norm is not None:
        aggs += [
            F.count(F.lit(1)).alias("__n"),
            F.min("sec_sum").alias("__mn"),
            F.max("sec_sum").alias("__mx"),
            F.avg("sec_sum").alias("__avg"),
            F.stddev_samp("sec_sum").alias("__sd"),
        ]
    out = grouped.agg(*aggs)
    if norm is None:
        return out.select(B, key, "auc")
    if norm == "minmax":
        auc_norm = _sdiv(
            F.col("auc") - F.col("__n") * F.col("__mn"),
            F.nullif(F.col("__mx") - F.col("__mn"), F.lit(0.0)),
        )
    else:  # zscore
        auc_norm = _sdiv(
            F.col("auc") - F.col("__n") * F.col("__avg"),
            F.nullif(F.col("__sd"), F.lit(0.0)),
        )
    return out.select(B, key, "auc", auc_norm.alias("auc_norm"))


def get_duration(df: DataFrame, fs: float) -> DataFrame:
    """P4: recording duration in seconds per subject."""
    return df.groupBy(B).agg(
        (F.count(F.lit(1)) / F.lit(fs)).alias("duration_s")
    )
