"""Declared kernel queries — the non-SQL-expressible operator surface.

These exercise the applyInPandas kernel pipeline (filters K1-K9, detectors
K10-K15, artifact kernels Q1-Q3, EDA K16-K18) end-to-end on deterministic
synthetic signals. No DuckDB oracle exists for them (SciPy-class kernels);
the driver records rows-only checks, and tests/test_detectors.py holds the
golden recall/precision assertions against ground truth.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, functions as F

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def q(name: str):
    def deco(fn):
        QUERIES[name] = fn
        return fn
    return deco


def _synth_frame(spark: SparkSession, kind: str, fs: float, duration: float,
                 subjects: int = 2) -> DataFrame:
    from physioview_spark.testing import synth_ecg, synth_eda, synth_ppg

    rows = []
    start = dt.datetime(2024, 1, 1)
    for s in range(subjects):
        if kind == "ecg":
            x, _ = synth_ecg(fs=fs, duration=duration, seed=42 + s)
        elif kind == "ppg":
            x, _ = synth_ppg(fs=fs, duration=duration, seed=42 + s)
        else:
            x, _ = synth_eda(fs=fs, duration=duration, seed=42 + s)
        rows += [
            (f"s{s}", i, start + dt.timedelta(seconds=i / fs), float(v))
            for i, v in enumerate(x)
        ]
    return spark.createDataFrame(
        rows, f"subject_id string, sample_idx long, ts timestamp, {kind} double"
    )


@q("kernel_cardiac_sqa_ecg")
def kernel_cardiac_sqa_ecg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7.2 minimum slice: synthetic ECG -> elliptic filter (K4) ->
    manikandan beats (K11) -> cbd artifacts (Q2) -> segmented SQA metrics
    (A1+A2+A3)."""
    from physioview_spark.functions.spark_kernels import annotate_cardiac
    from physioview_spark.operators.metrics import compute_metrics

    df = _synth_frame(spark, "ecg", fs=250.0, duration=60.0)
    annotated = annotate_cardiac(df, fs=250.0, detector="manikandan")
    return compute_metrics(annotated, fs=250.0, seg_size=10, with_ts=False)


@q("kernel_cardiac_rolling_ppg")
def kernel_cardiac_rolling_ppg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPG path with rolling windows: K7 filter -> erma (K15) -> hegarty+cbd
    (Q3) -> rolling SQA (A4)."""
    from physioview_spark.functions.spark_kernels import annotate_cardiac
    from physioview_spark.operators.metrics import compute_metrics_rolling

    df = _synth_frame(spark, "ppg", fs=64.0, duration=60.0)
    annotated = annotate_cardiac(
        df, fs=64.0, dtype="PPG", detector="erma", artifact_method="both",
        value_col="ppg",
    )
    return compute_metrics_rolling(
        annotated, fs=64.0, rolling_window=20, rolling_step=5, with_ts=False
    )


@q("kernel_eda_scr")
def kernel_eda_scr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDA path: K9 FIR filter -> decomposition (K17 fallback) -> SCR peaks
    (K16) -> per-segment SCR counts."""
    from physioview_spark.functions.spark_kernels import annotate_eda
    from physioview_spark.operators.segment import segment_data

    df = _synth_frame(spark, "eda", fs=4.0, duration=300.0)
    annotated = annotate_eda(df, fs=4.0, value_col="eda")
    seg = segment_data(annotated, fs=4.0, seg_size=60)
    return (
        seg.groupBy("subject_id", "segment")
        .agg(
            F.sum(F.when(F.col("scr") == 1, 1).otherwise(0)).alias("n_scrs"),
            F.round(F.avg("tonic"), 4).alias("mean_tonic"),
        )
        .orderBy("subject_id", "segment")
    )


@q("kernel_seconds_hr")
def kernel_seconds_hr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 get_seconds over detected beats on synthetic ECG."""
    from physioview_spark.functions.spark_kernels import annotate_cardiac
    from physioview_spark.operators.metrics import get_seconds

    df = _synth_frame(spark, "ecg", fs=250.0, duration=30.0, subjects=1)
    annotated = annotate_cardiac(df, fs=250.0, detector="pantompkins")
    return get_seconds(annotated, fs=250.0, with_ts=False)
