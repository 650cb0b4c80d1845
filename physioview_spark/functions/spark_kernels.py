"""Spark transformers over the NumPy kernel library.

One ``applyInPandas`` pass per subject does filter -> detect -> artifact
flagging in a single Python crossing (Arrow in/out), because chaining three
separate grouped UDFs would shuffle and cross the boundary three times.
Everything downstream (IBIs, segments, metrics) is relational.

Scale note: the parallelism unit is the subject — a cohort of thousands of
recordings fans out across executors. Single recordings too long for one
task would use halo-chunked grouping ((subject, chunk) keys with
overlap-and-discard edges); the kernels are pure array->array so the
chunking wrapper composes around them.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from physioview_spark.functions import kernels_cardiac as kc
from physioview_spark.functions.filters import ECGFilters, EDAFilters, PPGFilters
from physioview_spark.functions.kernels_artifacts import identify_artifacts

DETECTORS: dict[str, Callable] = {
    "pantompkins": kc.pantompkins,
    "manikandan": kc.manikandan,
    "nabian": kc.nabian,
    "engzee": kc.engzee,
    "adaptive_threshold": kc.ppg_adaptive_threshold,
    "erma": kc.ppg_erma,
}


def default_filter(dtype: str, fs: float) -> Callable[[np.ndarray], np.ndarray]:
    """The dashboard-default filter per data type (reference: §3.1 step 3)."""
    if dtype.upper() == "ECG":
        return ECGFilters(fs).filter_signal
    if dtype.upper() in ("PPG", "BVP"):
        return PPGFilters(fs).filter_signal
    if dtype.upper() == "EDA":
        return EDAFilters(fs).filter_signal
    raise ValueError(dtype)


def apply_kernel(
    df: DataFrame,
    kernel: Callable[[np.ndarray], np.ndarray],
    value_col: str,
    out_col: str,
    by: str = "subject_id",
) -> DataFrame:
    """Apply an array->array kernel per subject, appending ``out_col``."""
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType(), True)]
    )
    cols = list(df.columns)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx").reset_index(drop=True)
        pdf[out_col] = kernel(pdf[value_col].to_numpy())
        return pdf[cols + [out_col]]

    return df.groupBy(by).applyInPandas(run, schema=schema)


def annotate_cardiac(
    df: DataFrame,
    fs: float,
    dtype: str = "ECG",
    detector: str = "manikandan",
    filter_on: bool = True,
    artifact_method: str = "cbd",
    artifact_tol: float = 1.0,
    initial_hr: float | str = "auto",
    value_col: str = "ecg",
    by: str = "subject_id",
) -> DataFrame:
    """Filter + detect beats + flag artifacts in ONE grouped pass.

    Input: sample frame (subject_id, sample_idx, ts?, <value_col>).
    Output: input + ``filtered``, ``beat`` (1/NULL), ``artifact`` (1/NULL)
    — the annotated frame the relational SQA metrics consume
    (mirrors reference _preprocess_cardiac, dashboard/utils.py:56-122).
    """
    det = DETECTORS[detector]
    filt = default_filter(dtype, fs) if filter_on else None
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("filtered", T.DoubleType(), True),
            T.StructField("beat", T.DoubleType(), True),
            T.StructField("artifact", T.DoubleType(), True),
        ]
    )
    cols = list(df.columns)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=float)
        xf = filt(x) if filt is not None else x
        beats = det(xf, fs)
        arts = identify_artifacts(
            beats, fs, method=artifact_method, tol=artifact_tol,
            initial_hr=initial_hr,
        )
        beat = np.full(len(pdf), np.nan)
        artifact = np.full(len(pdf), np.nan)
        beat[beats] = 1.0
        artifact[arts] = 1.0
        pdf["filtered"] = xf
        pdf["beat"] = beat
        pdf["artifact"] = artifact
        return pdf[cols + ["filtered", "beat", "artifact"]]

    return df.groupBy(by).applyInPandas(run, schema=schema)


def annotate_eda(
    df: DataFrame,
    fs: float,
    scr_amp_min: float = 0.25,
    value_col: str = "eda",
    by: str = "subject_id",
) -> DataFrame:
    """EDA path in one grouped pass: FIR filter -> decompose -> SCR peaks.

    Output adds ``filtered``, ``phasic``, ``tonic``, ``scr`` (1/NULL)
    (mirrors reference _preprocess_eda, dashboard/utils.py:187-277).
    """
    from physioview_spark.functions.kernels_eda import decompose_eda, detect_scr_peaks

    filt = EDAFilters(fs)
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("filtered", T.DoubleType(), True),
            T.StructField("phasic", T.DoubleType(), True),
            T.StructField("tonic", T.DoubleType(), True),
            T.StructField("scr", T.DoubleType(), True),
        ]
    )
    cols = list(df.columns)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=float)
        xf = filt.filter_signal(x)
        phasic, tonic = decompose_eda(xf, fs)
        peaks = detect_scr_peaks(phasic, min_peak_amp=scr_amp_min)
        scr = np.full(len(pdf), np.nan)
        if len(peaks):
            scr[peaks] = 1.0
        pdf["filtered"] = xf
        pdf["phasic"] = phasic
        pdf["tonic"] = tonic
        pdf["scr"] = scr
        return pdf[cols + ["filtered", "phasic", "tonic", "scr"]]

    return df.groupBy(by).applyInPandas(run, schema=schema)
