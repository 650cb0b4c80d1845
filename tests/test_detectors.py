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


class TestCvxEda:
    """cvxEDA QP parity (K17): synthetic Bateman-kernel SCRs with known
    phasic/tonic ground truth; the ADMM+CG solve must recover both with
    bounded RMS error (reference _cvxEDA, pipeline/EDA.py:520-688)."""

    @staticmethod
    def _ground_truth(fs=4.0, seconds=240.0, seed=0):
        rng = np.random.default_rng(seed)
        n = int(fs * seconds)
        t = np.arange(n) / fs
        tonic = 2.0 + 0.3 * np.sin(2 * np.pi * t / 300.0) + 0.002 * t
        kern = np.exp(-t / 2.0) - np.exp(-t / 0.7)
        kern /= kern.max()
        imp = np.zeros(n)
        for onset in (30.0, 80.0, 130.0, 132.0, 185.0):
            imp[int(onset * fs)] = 0.5 + 0.5 * rng.random()
        phasic = np.convolve(imp, kern)[:n]
        y = tonic + phasic + 0.005 * rng.standard_normal(n)
        return y, phasic, tonic

    def test_recovers_bateman_ground_truth(self):
        from physioview_spark.functions.cvxeda import cvxeda_decompose

        y, phasic_true, tonic_true = self._ground_truth()
        res = cvxeda_decompose(y, fs=4.0)

        rms_t = np.sqrt(np.mean((res["tonic"] - tonic_true) ** 2))
        rms_p = np.sqrt(np.mean((res["phasic"] - phasic_true) ** 2))
        assert rms_t < 0.05, f"tonic RMS {rms_t}"      # signal scale ~2-3
        assert rms_p < 0.05, f"phasic RMS {rms_p}"
        assert np.corrcoef(res["phasic"], phasic_true)[0, 1] > 0.99
        # SMNA driver: nonnegative (ADMM tolerance) and sparse
        assert res["driver"].min() > -1e-2
        assert (np.abs(res["driver"]) > 1e-3).mean() < 0.2
        # model consistency: y = phasic + tonic + residual, residual small
        assert np.sqrt(np.mean(res["e"] ** 2)) < 0.02

    def test_qp_beats_fast_approximation(self):
        """The QP must be measurably closer to ground truth than the
        'fast' opening/low-pass approximation it replaced."""
        from physioview_spark.functions.kernels_eda import decompose_eda

        y, phasic_true, tonic_true = self._ground_truth(seed=3)
        ph_cvx, to_cvx = decompose_eda(y, 4.0)            # default = cvx
        ph_fast, to_fast = decompose_eda(y, 4.0, method="fast")

        def rms(a, b):
            return np.sqrt(np.mean((a - b) ** 2))

        assert rms(to_cvx, tonic_true) < 0.5 * rms(to_fast, tonic_true)
        assert rms(ph_cvx, phasic_true) < 0.5 * rms(ph_fast, phasic_true)

    def test_short_signal_falls_back(self):
        from physioview_spark.functions.kernels_eda import decompose_eda

        ph, to = decompose_eda(np.array([1.0, 1.1, 1.2]), 4.0)
        assert len(ph) == len(to) == 3

    def test_chunked_matches_whole_signal(self, spark):
        """100x insurance for K17: the halo-chunked decomposition of a
        2 h recording must agree with the single-task whole-signal QP
        (and with ground truth) within the existing 0.05 RMS bound —
        boundary effects die inside the 60 s halo."""
        import pandas as pd

        from physioview_spark.functions.cvxeda import cvxeda_decompose
        from physioview_spark.functions.spark_kernels import (
            decompose_eda_chunked,
        )

        rng = np.random.default_rng(5)
        fs, seconds = 4.0, 7200.0
        n = int(fs * seconds)
        t = np.arange(n) / fs
        tonic_true = (2.0 + 0.3 * np.sin(2 * np.pi * t / 900.0)
                      + 0.00005 * t)
        kern = np.exp(-t / 2.0) - np.exp(-t / 0.7)
        kern /= kern.max()
        imp = np.zeros(n)
        for onset in np.arange(60.0, seconds - 60.0, 97.0):
            imp[int(onset * fs)] = 0.3 + 0.7 * rng.random()
        phasic_true = np.convolve(imp, kern)[:n]
        y = tonic_true + phasic_true + 0.005 * rng.standard_normal(n)

        whole = cvxeda_decompose(y, fs)
        pdf = pd.DataFrame({
            "subject_id": np.repeat("s0", n),
            "sample_idx": np.arange(n, dtype=np.int64),
            "eda": y,
        })
        out = (decompose_eda_chunked(
            spark.createDataFrame(pdf), fs=fs,
            chunk_seconds=1200.0, halo_seconds=60.0)
            .orderBy("sample_idx").toPandas())
        assert len(out) == n  # every core row exactly once

        def rms(a, b):
            return float(np.sqrt(np.mean((np.asarray(a) - b) ** 2)))

        assert rms(out["tonic"], whole["tonic"]) < 0.05
        assert rms(out["phasic"], whole["phasic"]) < 0.05
        assert rms(out["tonic"], tonic_true) < 0.05
        assert rms(out["phasic"], phasic_true) < 0.05

    def test_signals_shorter_than_spline_bump(self):
        """Signals shorter than the 4*delta_knot*fs-3 spline kernel must
        still decompose to len(n) outputs (regression: np.convolve
        mode='same' returns kernel-length when len(h) > len(x), which
        crashed the QP for any EDA segment under ~40 s at fs=4)."""
        from physioview_spark.functions.cvxeda import cvxeda_decompose
        from physioview_spark.functions.kernels_eda import decompose_eda

        rng = np.random.default_rng(11)
        for n in (8, 20, 80, 156, 157):
            y = 2.0 + 0.05 * rng.standard_normal(n)
            res = cvxeda_decompose(y, fs=4.0)
            assert len(res["phasic"]) == n and len(res["tonic"]) == n
            assert np.isfinite(res["phasic"]).all()
            assert np.isfinite(res["tonic"]).all()
            ph, to = decompose_eda(y, 4.0)  # default cvx path
            assert len(ph) == n and len(to) == n

    def test_matvec_ceiling_flags_capped_solve(self):
        """VERDICT r09 item 2: the straggler ceiling. A solve that
        exhausts ``max_matvecs`` must return its best iterate FLAGGED
        (capped=True) — never a silently wrong answer — with the work
        overshoot bounded by a single capped CG call; an ample budget
        must reproduce the uncapped iterate sequence bit-for-bit (the
        default-path guarantee)."""
        from physioview_spark.functions.cvxeda import cvxeda_decompose

        y, _, _ = self._ground_truth(seed=7)

        free = cvxeda_decompose(y, fs=4.0)
        assert free["capped"] is False  # no budget -> never capped
        assert free["matvecs"] > 0
        assert np.isfinite(free["rel_residual"])
        # tight-tolerance contract: rel_residual <= 1 iff converged
        assert (free["rel_residual"] <= 1.0) == free["converged"]

        # ample budget == uncapped, bit-for-bit (same CG caps apply)
        ample = cvxeda_decompose(y, fs=4.0, max_matvecs=10**9)
        assert ample["capped"] is False
        assert np.array_equal(ample["phasic"], free["phasic"])
        assert np.array_equal(ample["tonic"], free["tonic"])
        assert ample["matvecs"] == free["matvecs"]

        # r10 advisor: a budget < 1 would break before any CG runs and
        # return the zero initialization as a "best iterate" — reject
        with pytest.raises(ValueError, match="max_matvecs"):
            cvxeda_decompose(y, fs=4.0, max_matvecs=0)
        with pytest.raises(ValueError, match="max_matvecs"):
            cvxeda_decompose(y, fs=4.0, max_matvecs=-5)

        budget = max(10, free["matvecs"] // 20)
        capped = cvxeda_decompose(y, fs=4.0, max_matvecs=budget)
        assert capped["capped"] is True
        assert capped["converged"] is False
        # overshoot bound: each CG call is clipped to the remaining
        # budget, so at most one extra matvec past the ceiling
        assert capped["matvecs"] <= budget + 1
        assert len(capped["phasic"]) == len(y)
        assert np.isfinite(capped["phasic"]).all()

    def test_decompose_eda_info_paths(self):
        """return_info on every gear: the QP path surfaces the solver's
        own verdict; the closed-form fast/short paths are trivially
        uncapped with zero QP work."""
        from physioview_spark.functions.kernels_eda import decompose_eda

        y, _, _ = self._ground_truth(seed=9)
        ph, to, info = decompose_eda(y, 4.0, return_info=True)
        assert info["capped"] is False and info["matvecs"] > 0
        assert np.isfinite(info["rel_residual"])

        _, _, fast = decompose_eda(y, 4.0, method="fast",
                                   return_info=True)
        assert fast == {"capped": False, "converged": True,
                        "rel_residual": 0.0, "matvecs": 0}
        _, _, short = decompose_eda(np.array([1.0, 1.1, 1.2]), 4.0,
                                    return_info=True)
        assert short["capped"] is False and short["matvecs"] == 0

    def test_chunked_diagnostics_columns(self, spark):
        """decompose_eda_chunked with a ceiling emits per-row
        cvx_capped / cvx_rel_residual / cvx_matvecs (constant within
        a chunk) so a capped chunk is relationally quarantinable; an
        ample ceiling leaves every chunk uncapped and the
        phasic/tonic values identical to the uncapped plan."""
        import pandas as pd

        from physioview_spark.functions.spark_kernels import (
            decompose_eda_chunked,
        )

        rng = np.random.default_rng(13)
        fs, seconds = 4.0, 2400.0
        n = int(fs * seconds)
        t = np.arange(n) / fs
        y = (2.0 + 0.3 * np.sin(2 * np.pi * t / 900.0)
             + 0.005 * rng.standard_normal(n))
        df = spark.createDataFrame(pd.DataFrame({
            "subject_id": np.repeat("s0", n),
            "sample_idx": np.arange(n, dtype=np.int64),
            "eda": y,
        }))

        plain = decompose_eda_chunked(df, fs=fs, chunk_seconds=1200.0,
                                      halo_seconds=60.0)
        assert "cvx_capped" not in plain.columns  # default unchanged

        starved = (decompose_eda_chunked(
            df, fs=fs, chunk_seconds=1200.0, halo_seconds=60.0,
            max_matvecs=10)
            .orderBy("sample_idx").toPandas())
        assert len(starved) == n
        assert set(starved["cvx_capped"]) == {1.0}
        assert (starved["cvx_rel_residual"] > 1.0).all()
        assert (starved["cvx_matvecs"] <= 11).all()

        ample = (decompose_eda_chunked(
            df, fs=fs, chunk_seconds=1200.0, halo_seconds=60.0,
            max_matvecs=10**9)
            .orderBy("sample_idx").toPandas())
        free = (plain.orderBy("sample_idx").toPandas())
        assert set(ample["cvx_capped"]) == {0.0}
        assert np.isfinite(ample["cvx_rel_residual"]).all()
        assert np.array_equal(ample["phasic"].to_numpy(),
                              free["phasic"].to_numpy())
        # flags are chunk-constant: one distinct matvec count per chunk
        per_chunk = (ample.assign(chunk=ample["sample_idx"]
                                  // int(1200 * fs))
                     .groupby("chunk")["cvx_matvecs"].nunique())
        assert (per_chunk == 1).all()

    def test_capped_chunk_lands_in_quarantine(self, spark):
        """VERDICT r10 item 6 — close the loop on the straggler
        ceiling: a chunk that exhausted max_matvecs (cvx_capped = 1)
        must land in the quarantine frame with its reason via the
        cvx_solver_rules recipe, while uncapped chunks pass through
        the valid frame untouched."""
        import pandas as pd

        from physioview_spark.functions.spark_kernels import (
            decompose_eda_chunked,
        )
        from physioview_spark.operators.validate import (
            cvx_solver_rules, quarantine, validate,
        )

        rng = np.random.default_rng(29)
        fs, seconds = 4.0, 300.0
        n = int(fs * seconds)
        t = np.arange(n) / fs

        def frame(subject):
            y = (2.0 + 0.3 * np.sin(2 * np.pi * t / 120.0)
                 + 0.005 * rng.standard_normal(n))
            return pd.DataFrame({
                "subject_id": np.repeat(subject, n),
                "sample_idx": np.arange(n, dtype=np.int64),
                "eda": y,
            })

        starved = decompose_eda_chunked(
            spark.createDataFrame(frame("s_bad")), fs=fs,
            chunk_seconds=600.0, halo_seconds=30.0, max_matvecs=10)
        healthy = decompose_eda_chunked(
            spark.createDataFrame(frame("s_ok")), fs=fs,
            chunk_seconds=600.0, halo_seconds=30.0, max_matvecs=10**9)
        diag = starved.unionByName(healthy)

        valid, rejected = quarantine(diag, cvx_solver_rules())
        vpdf = valid.toPandas()
        rpdf = rejected.toPandas()
        assert set(vpdf["subject_id"]) == {"s_ok"}
        assert len(vpdf) == n
        assert set(rpdf["subject_id"]) == {"s_bad"}
        assert len(rpdf) == n
        assert all(v == ["cvx_not_capped"] for v in rpdf["violations"])
        # the one-row health probe counts the same rows, no shuffle
        rep = validate(diag, cvx_solver_rules()).collect()[0]
        assert rep.n_rows == 2 * n
        assert rep.cvx_not_capped_violations == n
        # opt-in residual rule: the starved iterate's residual is far
        # from the stopping test, so it fails both rules
        _, rej2 = quarantine(starved, cvx_solver_rules(
            max_rel_residual=1.0))
        reasons = set(map(tuple, rej2.toPandas()["violations"]))
        assert reasons == {("cvx_not_capped", "cvx_rel_residual_ok")}
