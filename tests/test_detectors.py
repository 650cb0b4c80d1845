"""Golden tests: detectors + artifact kernels on synthetic signals with
known ground truth, plus the end-to-end Spark cardiac path."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from physioview_spark.dsp import cheby2, ellip, filtfilt_fft
from physioview_spark.functions import kernels_cardiac as kc
from physioview_spark.functions.kernels_artifacts import (
    cbd_artifacts, hegarty_artifacts, identify_artifacts,
)
from physioview_spark.testing import beat_match_stats, synth_ecg, synth_ppg


FS = 250.0


@pytest.fixture(scope="module")
def ecg():
    x, truth = synth_ecg(fs=FS, duration=120.0)
    b, a = ellip(4, 0.15, 80, [1 / (FS / 2), 15 / (FS / 2)], "bandpass")
    return filtfilt_fft(b, a, x), truth


@pytest.mark.parametrize("detector", ["pantompkins", "manikandan", "nabian", "engzee"])
def test_ecg_detector_recall(ecg, detector):
    xf, truth = ecg
    beats = getattr(kc, detector)(xf, FS)
    recall, precision = beat_match_stats(beats, truth, FS)
    assert recall >= 0.95, (detector, recall)
    assert precision >= 0.95, (detector, precision)


@pytest.mark.parametrize("detector", ["ppg_adaptive_threshold", "ppg_erma"])
def test_ppg_detector_recall(detector):
    fs = 64.0
    x, truth = synth_ppg(fs=fs, duration=120.0)
    from physioview_spark.functions.filters import PPGFilters

    xf = PPGFilters(fs).filter_signal(x)
    beats = getattr(kc, detector)(xf, fs)
    # the 0.5 s MA smoothing (Liang 2018) shifts peaks by a constant ~0.13 s;
    # IBIs are unaffected, so match with a wider tolerance
    recall, precision = beat_match_stats(beats, truth, fs, tol_s=0.2)
    assert recall >= 0.9, (detector, recall)
    assert precision >= 0.9, (detector, precision)


def test_artifact_kernels_flag_ectopics():
    # regular 800 ms rhythm with two ectopic (early) beats
    fs = 250.0
    beats = list(range(0, 250 * 60, 200))  # 800 ms IBIs
    beats[30] -= 100  # 400 ms early
    beats[60] += 120
    beats_ix = np.array(sorted(beats))
    arts_h = hegarty_artifacts(beats_ix, fs)
    arts_c = cbd_artifacts(beats_ix, fs)
    both = identify_artifacts(beats_ix, fs, "both")
    assert len(arts_h) > 0 and len(arts_c) > 0
    assert set(arts_h) | set(arts_c) == set(both)
    # the perturbed beats are flagged by at least one method
    assert beats_ix[30] in both or beats_ix[31] in both
    # a clean rhythm yields no artifacts
    clean = np.arange(0, 250 * 60, 200)
    assert len(identify_artifacts(clean, fs, "both")) == 0


def test_spark_cardiac_end_to_end(spark):
    """CSV-shaped frame -> annotate_cardiac -> compute_metrics (SURVEY §7.2)."""
    from physioview_spark.functions.spark_kernels import annotate_cardiac
    from physioview_spark.operators.metrics import compute_metrics

    fs = 250.0
    rows = []
    for subject in ("s1", "s2"):
        x, truth = synth_ecg(fs=fs, duration=60.0, seed=42 if subject == "s1" else 7)
        start = dt.datetime(2024, 1, 1)
        rows += [
            (subject, i, start + dt.timedelta(seconds=i / fs), float(v))
            for i, v in enumerate(x)
        ]
    df = spark.createDataFrame(
        rows, "subject_id string, sample_idx long, ts timestamp, ecg double"
    )
    annotated = annotate_cardiac(df, fs=fs, detector="manikandan")
    metrics = compute_metrics(annotated, fs=fs, seg_size=10)
    out = {(r["subject_id"], r["segment"]): r for r in metrics.collect()}
    assert len(out) == 12  # 2 subjects x 6 segments
    for (subj, seg), r in out.items():
        # synthetic HR ~70 bpm -> ~11-12 beats per 10 s segment
        assert 9 <= r["n_detected"] <= 14, r
        assert r["n_missing"] <= 2
        assert r["invalid"] is None
