"""Declared kernel queries — the non-SQL-expressible operator surface.

These exercise the applyInPandas kernel pipeline (filters K1-K9, detectors
K10-K15, artifact kernels Q1-Q3, EDA K16-K18) end-to-end on deterministic
synthetic signals. A SQL twin cannot recompute SciPy-class kernels, so
each query is hash-gated against a pinned parquet FIXTURE oracle
(tests/fixtures/oracle/<name>, regenerated intentionally via
tools/make_fixture_oracles.py) — every input here is seeded and
sf-independent, so the pinned result is exact. tests/test_detectors.py
holds the golden recall/precision assertions against ground truth.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, functions as F

from physioview_spark.plans.common import fixture_oracle

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def q(name: str):
    def deco(fn):
        QUERIES[name] = fn
        fx = fixture_oracle(name)
        if fx is not None:
            ORACLE[name] = fx
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


@q("kernel_beat_correction")
def kernel_beat_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 Hegarty-Craver correction + A8 per-segment rollup on beats with
    injected missing/extra defects."""
    import numpy as np

    from physioview_spark.functions.spark_kernels import corrected_segment_summary

    fs = 250.0
    clean = np.arange(0, 250 * 120, 200)
    missing = np.delete(clean, [40, 80])
    extra = np.sort(np.append(clean, [clean[30] + 90, clean[90] + 70]))
    rows = [("s_missing", int(b)) for b in missing] + [
        ("s_extra", int(b)) for b in extra
    ]
    beats = spark.createDataFrame(rows, "subject_id string, sample_idx long")
    out = corrected_segment_summary(beats, fs, seg_size=30)
    return out.orderBy("subject_id", "segment")


@q("kernel_hrv_features")
def kernel_hrv_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 HRV features over sliding windows of detected beats on
    synthetic ECG (time + frequency + nonlinear domains)."""
    from physioview_spark.functions.spark_kernels import annotate_cardiac, compute_hrv

    df = _synth_frame(spark, "ecg", fs=250.0, duration=120.0, subjects=1)
    annotated = annotate_cardiac(df, fs=250.0, detector="pantompkins")
    beats = annotated.where(F.col("beat") == 1).select("subject_id", "sample_idx")
    hrv = compute_hrv(beats, fs=250.0, window_length=60, window_step=30)
    return hrv.select(
        "subject_id", "window_id",
        *[F.round(F.col(c), 4).alias(c) for c in
          ["num_ibis", "mean_nni", "sdnn", "rmssd", "pnni_50", "mean_hr",
           "lf", "hf", "sd1", "sd2"]],
    ).orderBy("subject_id", "window_id")


@q("kernel_eda_quality_metrics")
def kernel_eda_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 Kleckner EDA QA metrics (segmented) with temperature rule."""
    import numpy as np

    from physioview_spark.operators.eda_metrics import compute_eda_metrics
    from physioview_spark.testing import synth_eda

    fs = 4.0
    rows = []
    for s in range(2):
        x, _ = synth_eda(fs=fs, duration=300.0, seed=11 + s)
        temp = np.full(len(x), 33.0)
        temp[100 * s: 100 * s + 20] = 15.0
        rows += [
            (f"s{s}", i, float(x[i]), float(temp[i])) for i in range(len(x))
        ]
    df = spark.createDataFrame(
        rows, "subject_id string, sample_idx long, eda double, temp double"
    )
    return compute_eda_metrics(df, fs, seg_size=60).orderBy(
        "subject_id", "segment"
    )


@q("kernel_acc_auc")
def kernel_acc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3/A7: magnitude + two-level AUC (segmented, zscore-normalized
    rolling) on synthetic 3-axis accelerometry."""
    from physioview_spark.operators.acc import compute_auc, compute_magnitude
    from physioview_spark.testing import synth_acc

    fs = 32.0
    x, y, z = synth_acc(fs=fs, duration=300.0)
    rows = [
        ("s0", i, float(x[i]), float(y[i]), float(z[i])) for i in range(len(x))
    ]
    df = spark.createDataFrame(
        rows, "subject_id string, sample_idx long, x double, y double, z double"
    )
    m = compute_magnitude(df)
    seg = compute_auc(m, fs, seg_size=60).withColumnRenamed("segment", "win")
    roll = (
        compute_auc(m, fs, rolling_window=60, rolling_step=15, norm="zscore")
        .withColumnRenamed("moving_window", "win")
        .withColumnRenamed("auc", "auc_roll")
        .withColumnRenamed("auc_norm", "auc_z")
    )
    return (
        seg.join(roll, ["subject_id", "win"], "outer")
        .select(
            "subject_id", "win",
            F.round("auc", 4).alias("auc"),
            F.round("auc_roll", 4).alias("auc_roll"),
            F.round("auc_z", 4).alias("auc_z"),
        )
        .orderBy("subject_id", "win")
    )


@q("e4_ingest_aligned")
def e4_ingest_aligned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3-S5 + J1 through the driver contract: synthesize a deterministic
    Empatica E4 archive, ingest every stream distributed (binaryFile +
    mapInPandas ZIP decode), time-align IBI/HR onto the BVP grid with the
    un-fill as-of join, and roll up per-stream checks."""
    import os
    import tempfile

    import numpy as np

    from physioview_spark.sources.empatica import (
        align_hrv, load_empatica, write_e4_zip,
    )

    d = tempfile.mkdtemp(prefix="e4q_")
    rng = np.random.default_rng(123)
    start = 1700000000.0
    n_sec = 60
    bvp = np.sin(2 * np.pi * 1.1 * np.arange(64 * n_sec) / 64.0)
    acc = rng.integers(-64, 64, size=(32 * n_sec, 3)).astype(float)
    eda = 2.0 + 0.1 * np.sin(np.arange(4 * n_sec) / 4.0)
    hr = 60.0 + rng.normal(0, 2, n_sec)
    temp = 33.0 + rng.normal(0, 0.05, 4 * n_sec)
    ibi = np.column_stack([np.cumsum(np.full(55, 0.95)),
                           np.full(55, 0.95)])
    for subj in ("e4a", "e4b"):
        write_e4_zip(os.path.join(d, f"{subj}.zip"), start,
                     acc=acc, bvp=bvp, eda=eda, hr=hr, temp=temp, ibi=ibi)

    frames = load_empatica(spark, d)
    aligned = align_hrv(frames["bvp"], frames["ibi"], frames["hr"])
    per_stream = [
        frames[s].groupBy("subject_id").agg(
            F.lit(s).alias("stream"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg(c), 4).alias("mean_value"),
        ).select("subject_id", "stream", "n_rows", "mean_value")
        for s, c in [("acc", "magnitude"), ("bvp", "bvp"), ("eda", "eda"),
                     ("hr", "hr"), ("temp", "temp"), ("ibi", "ibi")]
    ]
    al = aligned.groupBy("subject_id").agg(
        F.lit("aligned").alias("stream"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.when(F.col("ibi").isNotNull(), 1).otherwise(0))
                .cast("double"), 4).alias("mean_value"),
    ).select("subject_id", "stream", "n_rows", "mean_value")
    out = per_stream[0]
    for f in per_stream[1:] + [al]:
        out = out.unionByName(f)
    return out.orderBy("subject_id", "stream")
