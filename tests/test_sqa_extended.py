"""Correction machine (Q4), HRV (A11), EDA QA (A6), ACC AUC (A7) tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from physioview_spark.functions.kernels_correction import correct_interval
from physioview_spark.functions.kernels_hrv import hrv_features


@pytest.mark.filterwarnings("error::RuntimeWarning")
class TestCorrection:
    # numpy RuntimeWarnings are errors here: the correction kernel's
    # empty-FIFO paths must stay explicitly guarded (VERDICT r15 item 8)
    FS = 250.0

    def test_clean_rhythm_unchanged(self):
        clean = np.arange(0, 250 * 120, 200)
        cb, orig, corr = correct_interval(clean, self.FS)
        assert len(cb) == len(clean)
        assert np.array_equal(cb, clean)
        assert orig["correction"].sum() == 0

    def test_missing_beat_restored(self):
        clean = np.arange(0, 250 * 120, 200)
        missing = np.delete(clean, 40)
        cb, orig, corr = correct_interval(missing, self.FS)
        assert len(cb) == len(clean)
        assert np.all(np.diff(cb) > 0)  # monotone invariant
        assert any(abs(b - clean[40]) < 20 for b in cb)

    def test_extra_beat_merged(self):
        clean = np.arange(0, 250 * 120, 200)
        extra = np.sort(np.append(clean, clean[50] + 90))
        cb, orig, corr = correct_interval(extra, self.FS)
        assert len(cb) == len(clean)
        assert np.max(np.abs(np.diff(cb) - 200)) == 0

    def test_ibis_within_bpm_limits(self):
        rng = np.random.RandomState(3)
        # messy rhythm: jittered beats + dropouts
        beats = np.cumsum(rng.randint(150, 260, size=300))
        beats = np.delete(beats, [50, 51, 120])
        cb, orig, corr = correct_interval(beats, self.FS)
        ibis = np.diff(cb)
        # corrected IBIs respect 40-200 bpm limits modulo the final beat
        assert np.all(ibis[:-1] <= np.floor(self.FS * 60 / 40))
        assert np.all(np.diff(cb) > 0)


class TestHRV:
    def test_time_domain_known_values(self):
        nn = np.array([800.0, 810, 790, 805, 795, 820, 780])
        f = hrv_features(nn, domains=("td",))
        assert abs(f["mean_nni"] - np.mean(nn)) < 1e-9
        assert abs(f["sdnn"] - np.std(nn, ddof=1)) < 1e-9
        diff = np.diff(nn)
        assert abs(f["rmssd"] - np.sqrt(np.mean(diff ** 2))) < 1e-9
        assert f["nni_20"] == np.sum(np.abs(diff) > 20)

    def test_time_domain_parity_literals(self):
        """A11 parity bound vs the flirt/hrv-analysis feature definitions
        (reference physioview/physioview.py:1022-1089 delegates to
        flirt.get_hrv_features; flirt follows the hrv-analysis time-domain
        conventions: sample std ddof=1, strict > thresholds for nni_50/20,
        cvsd = rmssd/mean, HR stats over 60000/nn). Expected values below
        were derived OUTSIDE the kernel with exact rational arithmetic
        (fractions.Fraction), so this pins the engine to the published
        definitions rather than to its own numpy implementation."""
        nn = np.array([800.0, 810, 790, 805, 795, 820, 780])
        f = hrv_features(nn, domains=("td",))
        expected = {
            "num_ibis": 7.0,
            "mean_nni": 800.0,
            "median_nni": 800.0,
            "range_nni": 40.0,
            "sdnn": 13.228756555322953,
            "rmssd": 22.54624876411447,
            "sdsd": 24.426761280748348,
            "nni_50": 0.0,
            "pnni_50": 0.0,
            "nni_20": 2.0,
            "pnni_20": 28.57142857142857,
            "cvsd": 0.02818281095514309,
            "cvnni": 0.01653594569415369,
            "mean_hr": 75.01758705670949,
            "min_hr": 73.17073170731707,
            "max_hr": 76.92307692307692,
            "std_hr": 1.2409958046356209,
        }
        for k, v in expected.items():
            assert f[k] == pytest.approx(v, rel=1e-12), k

    def test_frequency_domain_detects_hf_modulation(self):
        # IBI series modulated at 0.25 Hz (respiratory band) -> HF dominant
        t = np.arange(0, 300, 0.8)
        nn = 800.0 + 50.0 * np.sin(2 * np.pi * 0.25 * t)
        f = hrv_features(nn, domains=("fd",))
        assert f["hf"] > f["lf"]
        assert abs(f["hf_peak"] - 0.25) < 0.05

    def test_frequency_domain_parity_analytic(self):
        """fd parity bound against closed-form sinusoid band powers.

        A sinusoidal NN modulation of amplitude A contributes A^2/2 ms^2
        of band power (Parseval). The flirt/hrv-analysis convention —
        linear interpolation onto a 4 Hz grid, Welch/Hann PSD — attenuates
        high-band power (linear interp of a 0.25 Hz tone sampled at
        ~1.25 Hz): tolerated deltas are -30%..+10% for HF at 0.25 Hz and
        -15%..+10% for LF at 0.1 Hz; peak locations are exact to the
        Welch bin width. Total out-of-band leakage must stay <2%."""
        t = np.arange(0, 300, 0.8)
        nn = (800.0
              + 30.0 * np.sin(2 * np.pi * 0.10 * t)
              + 50.0 * np.sin(2 * np.pi * 0.25 * t))
        f = hrv_features(nn, domains=("fd",))
        lf_true, hf_true = 30.0 ** 2 / 2, 50.0 ** 2 / 2
        assert 0.85 * lf_true <= f["lf"] <= 1.10 * lf_true
        assert 0.70 * hf_true <= f["hf"] <= 1.10 * hf_true
        assert abs(f["lf_peak"] - 0.10) < 0.02
        assert abs(f["hf_peak"] - 0.25) < 0.02
        assert f["vlf"] < 0.02 * (lf_true + hf_true)
        # normalized powers follow from the band powers
        assert f["lfnu"] == pytest.approx(
            f["lf"] / (f["lf"] + f["hf"]) * 100.0, rel=1e-12)
        assert f["hfnu"] == pytest.approx(100.0 - f["lfnu"], rel=1e-9)

    def test_poincare(self):
        nn = np.array([800.0, 850, 800, 850, 800, 850])
        f = hrv_features(nn, domains=("nl",))
        diff = np.diff(nn)
        assert abs(f["sd1"] - np.sqrt(np.var(diff, ddof=1) / 2)) < 1e-9

    def test_poincare_parity_closed_form(self):
        """nl parity: for a pure alternating rhythm a+d, a-d, ... the
        Poincare cloud is two points mirrored across the identity line:
        sd1 (spread perpendicular to identity) = |2d|/sqrt(2) * sqrt(n'/
        (n'-1)) sample-corrected, and sd2^2 = 2*sdnn^2 - sd1^2 (Brennan
        2001 identity used by flirt/hrv-analysis). Literals derived by
        hand for d=25, 6 beats."""
        nn = np.array([800.0, 850, 800, 850, 800, 850])
        f = hrv_features(nn, domains=("nl",))
        # diff = [50,-50,50,-50,50], mean 10; var(ddof=1) = 12000/4 = 3000
        assert f["sd1"] == pytest.approx(np.sqrt(3000.0 / 2.0), rel=1e-12)
        # sdnn^2 = var(nn, ddof=1) = 750; sd2^2 = 2*750 - 1500 = 0:
        # degenerate alternation has no along-identity spread (up to
        # float rounding the Brennan identity cancels exactly)
        assert np.isnan(f["sd2"]) or f["sd2"] < 1e-3
        # a non-degenerate series: sd2 from the Brennan identity
        nn2 = np.array([800.0, 810, 790, 805, 795, 820, 780])
        f2 = hrv_features(nn2, domains=("nl",))
        sd1 = np.sqrt(596.6666666666666 / 2.0)  # var(diff, ddof=1)/2
        sd2 = np.sqrt(2 * 175.0 - sd1 ** 2)     # 2*sdnn^2 - sd1^2
        assert f2["sd1"] == pytest.approx(sd1, rel=1e-12)
        assert f2["sd2"] == pytest.approx(sd2, rel=1e-12)
        assert f2["ellipse_area"] == pytest.approx(np.pi * sd1 * sd2, rel=1e-12)

    def test_stat_domain_closed_forms(self):
        """A11 stat-domain parity (flirt's fourth domain — VERDICT r13
        item 3): every feature cross-checked against an INDEPENDENT
        formulation — standardized moments for skew/kurt, quantile for
        IQR, brute-force Bandt-Pompe pattern census for permutation
        entropy, ln(n) for the all-distinct Shannon entropy."""
        rng = np.random.default_rng(7)
        nn = 800 + 50 * rng.standard_normal(120)
        f = hrv_features(nn, domains=("stat",))
        z = (nn - nn.mean()) / nn.std()
        assert f["nni_skewness"] == pytest.approx(np.mean(z ** 3), rel=1e-9)
        assert f["nni_kurtosis"] == pytest.approx(
            np.mean(z ** 4) - 3.0, rel=1e-9)
        assert f["nni_iqr"] == pytest.approx(
            np.quantile(nn, 0.75) - np.quantile(nn, 0.25), rel=1e-12)
        assert f["nni_iqr_5_95"] == pytest.approx(
            np.quantile(nn, 0.95) - np.quantile(nn, 0.05), rel=1e-12)
        assert f["nni_rms"] == pytest.approx(
            np.sqrt(np.mean(nn ** 2)), rel=1e-12)
        assert f["nni_energy"] == pytest.approx(np.sum(nn ** 2), rel=1e-12)
        assert f["nni_lineintegral"] == pytest.approx(
            np.sum(np.abs(np.diff(nn))), rel=1e-12)
        assert f["nni_n_above_mean"] + f["nni_n_below_mean"] == len(nn)
        # flirt raw-sign form: all-positive NN series -> 0 changes
        # (the pre-r15 mean-centered form emitted ~n/2; ADVICE r14 item 1)
        assert f["nni_n_sign_changes"] == 0.0
        mixed = hrv_features(
            np.array([5.0, -3.0, 2.0, 0.0, 4.0]), domains=("stat",))
        # signs [1,-1,1,0,1]: flirt counts the 0 crossing twice -> 4
        assert mixed["nni_n_sign_changes"] == 4.0
        # find_peaks plateau semantics (ADVICE r14 item 2): the flat
        # top [7,7] counts ONCE; the edge plateau [9,9] never counts
        plat = hrv_features(
            np.array([9.0, 9.0, 1.0, 7.0, 7.0, 2.0, 8.0, 3.0]),
            domains=("stat",))
        assert plat["nni_peaks"] == 2.0  # the 7-plateau and the lone 8
        # all values distinct -> Shannon entropy over multiplicities = ln n
        assert f["nni_entropy"] == pytest.approx(np.log(len(nn)), rel=1e-12)
        # brute-force Bandt-Pompe census (order 3, delay 1)
        pats: dict = {}
        for i in range(len(nn) - 2):
            key = tuple(np.argsort(nn[i:i + 3], kind="stable"))
            pats[key] = pats.get(key, 0) + 1
        p = np.array(list(pats.values()), float)
        p /= p.sum()
        pe = float(-(p * np.log2(p)).sum() / np.log2(6))
        assert f["nni_perm_entropy"] == pytest.approx(pe, rel=1e-12)
        # svd entropy: rank-1 embedding of a constant-slope line has
        # one dominant singular value -> entropy near 0; noise > line
        line = hrv_features(np.linspace(700, 900, 60), domains=("stat",))
        assert line["nni_svd_entropy"] < f["nni_svd_entropy"]
        # constant window: moments undefined (NaN, like scipy), zero
        # line integral, no sign changes, single-value entropy = 0
        c = hrv_features(np.full(50, 800.0), domains=("stat",))
        assert np.isnan(c["nni_skewness"]) and np.isnan(c["nni_kurtosis"])
        assert c["nni_lineintegral"] == 0.0
        assert c["nni_n_sign_changes"] == 0.0
        assert c["nni_entropy"] == 0.0


class TestEDAMetrics:
    def test_kleckner_rules(self, spark):
        import datetime as dt

        from physioview_spark.operators.eda_metrics import compute_eda_metrics

        fs = 4.0
        n = int(fs * 300)  # 5 segments of 60 s
        eda = np.full(n, 5.0)
        temp = np.full(n, 33.0)
        eda[100:105] = 0.1          # Rule 1: below 0.2 µS (segment 1)
        eda[500] = 15.0             # Rule 2: slope (15-5)*4 = 40 µS/s (seg 2)
        temp[900:910] = 15.0        # Rule 3: below 20 °C (segment 4)
        rows = [
            ("s1", i, float(eda[i]), float(temp[i])) for i in range(n)
        ]
        df = spark.createDataFrame(
            rows, "subject_id string, sample_idx long, eda double, temp double"
        )
        out = {r["segment"]: r for r in compute_eda_metrics(df, fs, 60).collect()}
        assert len(out) == 5
        assert out[1]["out_of_range"] == 5
        # rule 2 fires on both edges of each step (into and out of the dip /
        # spike); sample 500 lives in segment 3 (500 // 240 == 2)
        assert out[1]["excessive_slope"] == 2
        assert out[3]["excessive_slope"] == 2
        assert out[2]["excessive_slope"] == 0 and out[2]["n_invalid"] == 0
        assert out[4]["temp_out_of_range"] == 10
        # rule 4 spreads ±2.5 s (10 samples at 4 Hz), ends inclusive:
        # violations at 100..105 -> invalid 90..115 = 26 samples
        assert out[1]["n_invalid"] == 26
        assert out[4]["n_invalid"] == 30
        assert out[5]["n_invalid"] == 0 and out[5]["pct_valid"] == 100.0

    def test_svd_entropy_single_embedding_row_is_exact_zero(self, spark):
        """r17 skew-axis regression: a window with exactly ONE complete
        (v, lead, lead2) embedding row has a rank-1 Gram matrix — the
        true svd_entropy is exactly 0 (np.linalg.svd of the 1x3
        embedding returns one singular value), but the closed-form
        eigensolve emitted ~5e-4 of cross-engine acos noise. The
        relational form must now pin the case to 0.0, matching the
        NumPy kernel."""
        from physioview_spark.operators.eda_metrics import (
            compute_eda_features, eda_window_stats_np,
        )

        # one subject, one 60 s window, exactly three samples -> one
        # embedding row; values chosen non-degenerate (p2 > 0, q > 0)
        rows = [("s1", float(t), v)
                for t, v in ((0.0, 1.25), (1.0, -0.5), (2.0, 2.75))]
        df = spark.createDataFrame(
            rows, "subject_id string, sec double, phasic double"
        ).withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")
        out = compute_eda_features(
            df, value_cols=["phasic"], window_seconds=60,
            extended=True).collect()
        assert len(out) == 1
        assert out[0]["phasic_svd_entropy"] == 0.0
        ref = eda_window_stats_np(
            np.array([1.25, -0.5, 2.75]), np.array([0.0, 1.0, 2.0]))
        assert ref["svd_entropy"] == 0.0

    def test_rolling_mode(self, spark):
        from physioview_spark.operators.eda_metrics import compute_eda_metrics

        fs = 4.0
        n = int(fs * 120)
        rows = [("s1", i, 5.0, 33.0) for i in range(n)]
        df = spark.createDataFrame(
            rows, "subject_id string, sample_idx long, eda double, temp double"
        )
        out = compute_eda_metrics(df, fs, rolling_window=60, rolling_step=15).collect()
        assert len(out) == 5  # (120-60)/15 + 1
        assert all(r["pct_valid"] == 100.0 for r in out)


class TestACC:
    def test_magnitude_and_auc(self, spark):
        from physioview_spark.operators.acc import (
            compute_auc, compute_magnitude, convert_acc,
        )

        fs = 8.0
        n = int(fs * 120)
        rows = [("s1", i, 3.0, 4.0, 0.0) for i in range(n)]
        df = spark.createDataFrame(
            rows, "subject_id string, sample_idx long, x double, y double, z double"
        )
        m = compute_magnitude(df)
        assert m.select(F.min("magnitude"), F.max("magnitude")).first() == (5.0, 5.0)
        auc = {r["segment"]: r["auc"] for r in compute_auc(m, fs, 60).collect()}
        assert abs(auc[1] - 5.0 * n / 2) < 1e-6  # 60 s x 8 Hz x 5.0
        rolled = compute_auc(m, fs, rolling_window=60, rolling_step=15)
        assert rolled.count() == 8  # windows starting every 15 s over 120 s
        conv = convert_acc(df, fs, sensitivity=64.0)
        got = conv.select("x").first()[0]
        assert abs(got - 3.0 / (64.0 * fs) * 9.81) < 1e-9


class TestSparkCorrectionHRV:
    def test_correct_beats_and_summary(self, spark):
        from physioview_spark.functions.spark_kernels import (
            correct_beats, corrected_segment_summary,
        )

        fs = 250.0
        clean = np.arange(0, 250 * 120, 200)
        missing = np.delete(clean, 40)
        rows = [("s1", int(b)) for b in missing] + [("s2", int(b)) for b in clean]
        beats = spark.createDataFrame(rows, "subject_id string, sample_idx long")
        corrected = correct_beats(beats, fs)
        per_subj = {
            r["subject_id"]: r["n"]
            for r in corrected.groupBy("subject_id").agg(
                F.count(F.lit(1)).alias("n")).collect()
        }
        assert per_subj == {"s1": len(clean), "s2": len(clean)}
        summary = corrected_segment_summary(beats, fs, seg_size=60)
        rows = {(r["subject_id"], r["segment"]): r for r in summary.collect()}
        assert rows[("s1", 1)]["n_corrected"] >= 1
        assert rows[("s2", 1)]["n_corrected"] == 0
        assert rows[("s2", 1)]["correct"] > 0

    def test_compute_hrv_windows(self, spark):
        from physioview_spark.functions.spark_kernels import compute_hrv

        fs = 250.0
        clean = np.arange(0, 250 * 120, 200)  # 800 ms IBIs, 75 bpm
        beats = spark.createDataFrame(
            [("s1", int(b)) for b in clean], "subject_id string, sample_idx long"
        )
        hrv = compute_hrv(beats, fs, window_length=60, window_step=15)
        rows = hrv.collect()
        assert len(rows) >= 6
        full = [r for r in rows if r["num_ibis"] and r["num_ibis"] >= 70]
        assert full and all(abs(r["mean_nni"] - 800.0) < 1e-6 for r in full)
        assert all(r["sdnn"] == 0.0 for r in full)


class TestPinLifecycle:
    """VERDICT r16 item 5: the metrics-family persists expose a release
    handle via physioview_spark.cache — long sessions invoking the
    operators repeatedly must not accumulate session-global cache
    entries when scoped."""

    def _samples(self, spark):
        fs = 64.0
        n = int(fs * 120)
        rows = [("s1", i, float(i % 40 == 0), 0.0, float(i)) for i in range(n)]
        return fs, spark.createDataFrame(
            rows,
            "subject_id string, sample_idx long, beat double, "
            "artifact double, ts double",
        ).withColumn("ts", F.timestamp_seconds(F.col("ts") / 64.0))

    def test_repeated_metrics_calls_release_pins(self, spark):
        from physioview_spark import cache
        from physioview_spark.operators.metrics import (
            compute_metrics, compute_metrics_rolling,
        )

        fs, df = self._samples(spark)
        cache.release_pinned()
        baseline = len(cache._PINNED)
        for _ in range(3):
            with cache.pinned_frames():
                assert compute_metrics(df, fs, seg_size=60).count() > 0
                assert compute_metrics_rolling(
                    df, fs, rolling_window=60, rolling_step=15
                ).count() > 0
                assert len(cache._PINNED) > baseline  # operators pinned
            # scope exit released every operator-internal pin
            assert len(cache._PINNED) == baseline

    def test_unscoped_pins_released_by_handle(self, spark):
        from physioview_spark import cache
        from physioview_spark.operators.metrics import get_missing

        fs, df = self._samples(spark)
        cache.release_pinned()
        assert get_missing(df, fs, seg_size=60).count() > 0
        assert len(cache._PINNED) > 0  # unscoped call pinned frames
        assert cache.release_pinned() > 0
        assert cache._PINNED == []
