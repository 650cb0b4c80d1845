"""HRV feature extraction (A11) — NumPy kernels over IBI windows.

The reference delegates to ``flirt.get_hrv_features(window_length,
window_step_size, domains=['td','fd','nl','stat'])``
(reference: physioview/physioview.py:1022-1089). flirt is not available
here, so the standard published feature set is computed directly:

- time domain: mean/median/min/max/std of NN, sdnn, rmssd, sdsd, nn50,
  pnn50, nn20, pnn20, hr mean/std/min/max, cv
- frequency domain: VLF/LF/HF power, LF/HF ratio, peaks, relative and
  normalized powers — Welch periodogram on the 4 Hz-resampled NN series
- nonlinear: Poincaré sd1/sd2, ratio, ellipse area
- stat domain (flirt's fourth domain, ``domains=['td','fd','nl','stat']``
  at reference physioview/physioview.py:1082): the generic statistical
  feature set flirt's ``get_stats`` applies to the NN series —
  skewness/kurtosis (scipy-default biased/Fisher forms), percentiles
  (5/95, IQR, 5-95 spread), energy/RMS/line integral, counts above/
  below mean and mean-crossing sign changes, strict local-max peak
  count, and three entropies (Shannon over value multiplicities in
  nats; permutation and SVD entropies, order 3 / delay 1, normalized,
  in bits). Duplicates of td features (mean/std/min/max/ptp/sum) are
  NOT re-emitted under second names.

Runs as a grouped kernel over (subject, window) inside applyInPandas.
"""

from __future__ import annotations

import numpy as np

VLF_BAND = (0.003, 0.04)
LF_BAND = (0.04, 0.15)
HF_BAND = (0.15, 0.4)


def hrv_time_domain(nn_ms: np.ndarray) -> dict:
    nn = np.asarray(nn_ms, dtype=float)
    nn = nn[~np.isnan(nn)]
    if len(nn) < 2:
        return {}
    diff = np.diff(nn)
    hr = 60000.0 / nn
    return {
        "num_ibis": float(len(nn)),
        "mean_nni": float(np.mean(nn)),
        "median_nni": float(np.median(nn)),
        "range_nni": float(np.max(nn) - np.min(nn)),
        "sdnn": float(np.std(nn, ddof=1)),
        "rmssd": float(np.sqrt(np.mean(diff ** 2))),
        "sdsd": float(np.std(diff, ddof=1)) if len(diff) > 1 else np.nan,
        "nni_50": float(np.sum(np.abs(diff) > 50.0)),
        "pnni_50": float(np.sum(np.abs(diff) > 50.0) / len(nn) * 100.0),
        "nni_20": float(np.sum(np.abs(diff) > 20.0)),
        "pnni_20": float(np.sum(np.abs(diff) > 20.0) / len(nn) * 100.0),
        "cvsd": float(np.sqrt(np.mean(diff ** 2)) / np.mean(nn)),
        "cvnni": float(np.std(nn, ddof=1) / np.mean(nn)),
        "mean_hr": float(np.mean(hr)),
        "min_hr": float(np.min(hr)),
        "max_hr": float(np.max(hr)),
        "std_hr": float(np.std(hr, ddof=1)),
    }


def _welch(x: np.ndarray, fs: float, nperseg: int):
    """Welch PSD (Hann window, 50% overlap) in pure NumPy."""
    n = len(x)
    nperseg = min(nperseg, n)
    if nperseg < 8:
        return np.array([]), np.array([])
    step = nperseg // 2
    win = np.hanning(nperseg)
    scale = 1.0 / (fs * (win ** 2).sum())
    segs = []
    for start in range(0, n - nperseg + 1, step):
        seg = x[start: start + nperseg]
        seg = seg - np.mean(seg)
        spec = np.abs(np.fft.rfft(seg * win)) ** 2 * scale
        spec[1:-1] *= 2.0
        segs.append(spec)
    psd = np.mean(segs, axis=0)
    freqs = np.fft.rfftfreq(nperseg, d=1.0 / fs)
    return freqs, psd


def hrv_frequency_domain(nn_ms: np.ndarray, resample_fs: float = 4.0) -> dict:
    nn = np.asarray(nn_ms, dtype=float)
    nn = nn[~np.isnan(nn)]
    if len(nn) < 4:
        return {}
    t = np.cumsum(nn) / 1000.0
    t -= t[0]
    if t[-1] <= 1.0:
        return {}
    grid = np.arange(0.0, t[-1], 1.0 / resample_fs)
    x = np.interp(grid, t, nn)
    freqs, psd = _welch(x, resample_fs, nperseg=min(256, len(x)))
    if len(freqs) == 0:
        return {}

    def band(b):
        m = (freqs >= b[0]) & (freqs < b[1])
        if not m.any():
            return 0.0, np.nan
        power = float(np.trapz(psd[m], freqs[m]))
        peak = float(freqs[m][np.argmax(psd[m])])
        return power, peak

    vlf, _ = band(VLF_BAND)
    lf, lf_peak = band(LF_BAND)
    hf, hf_peak = band(HF_BAND)
    total = vlf + lf + hf
    out = {
        "vlf": vlf, "lf": lf, "hf": hf, "total_power": total,
        "lf_hf_ratio": lf / hf if hf > 0 else np.nan,
        "lfnu": lf / (lf + hf) * 100.0 if (lf + hf) > 0 else np.nan,
        "hfnu": hf / (lf + hf) * 100.0 if (lf + hf) > 0 else np.nan,
        "lf_peak": lf_peak, "hf_peak": hf_peak,
    }
    return out


def hrv_nonlinear(nn_ms: np.ndarray) -> dict:
    nn = np.asarray(nn_ms, dtype=float)
    nn = nn[~np.isnan(nn)]
    if len(nn) < 3:
        return {}
    diff = np.diff(nn)
    sd1 = float(np.sqrt(np.var(diff, ddof=1) / 2.0))
    sdnn = float(np.std(nn, ddof=1))
    sd2_sq = 2.0 * sdnn ** 2 - sd1 ** 2
    sd2 = float(np.sqrt(sd2_sq)) if sd2_sq > 0 else np.nan
    return {
        "sd1": sd1,
        "sd2": sd2,
        "sd1_sd2_ratio": sd1 / sd2 if sd2 and not np.isnan(sd2) else np.nan,
        "ellipse_area": float(np.pi * sd1 * sd2) if not np.isnan(sd2) else np.nan,
    }


def _perm_entropy(x: np.ndarray, order: int = 3, delay: int = 1) -> float:
    """Permutation entropy (Bandt-Pompe), normalized to [0, 1] by
    log2(order!) — the antropy/flirt default (order=3, delay=1)."""
    n = len(x) - (order - 1) * delay
    if n < 1:
        return float("nan")
    emb = np.empty((n, order))
    for i in range(order):
        emb[:, i] = x[i * delay: i * delay + n]
    # ranks of each embedded vector -> base-`order` pattern id (vectorized)
    ranks = np.argsort(emb, axis=1, kind="stable")
    ids = ranks @ (order ** np.arange(order))
    _, counts = np.unique(ids, return_counts=True)
    p = counts / counts.sum()
    h = -np.sum(p * np.log2(p))
    from math import factorial
    return float(h / np.log2(factorial(order)))


def _svd_entropy(x: np.ndarray, order: int = 3, delay: int = 1) -> float:
    """SVD entropy of the delay-embedding matrix, normalized by
    log2(order) — the antropy/flirt default (order=3, delay=1)."""
    n = len(x) - (order - 1) * delay
    if n < 1:
        return float("nan")
    emb = np.empty((n, order))
    for i in range(order):
        emb[:, i] = x[i * delay: i * delay + n]
    s = np.linalg.svd(emb, compute_uv=False)
    tot = s.sum()
    if tot <= 0:
        return float("nan")
    p = s / tot
    p = p[p > 0]
    return float(-np.sum(p * np.log2(p)) / np.log2(order))


def find_peaks_count(x: np.ndarray) -> int:
    """Number of interior local maxima with scipy.signal.find_peaks'
    plateau semantics (a maximal run of equal values strictly above
    both neighboring distinct values counts ONCE; runs touching either
    edge never count) — the form flirt's ``get_stats`` calls.
    Implemented by run-compressing the series (scipy-free): a run is a
    peak iff its value exceeds both neighboring runs' values."""
    x = np.asarray(x, dtype=float)
    if len(x) < 3:
        return 0
    vals = x[np.concatenate(([True], x[1:] != x[:-1]))]
    if len(vals) < 3:
        return 0
    interior = vals[1:-1]
    return int(np.sum((interior > vals[:-2]) & (interior > vals[2:])))


def hrv_stat_domain(nn_ms: np.ndarray) -> dict:
    """flirt's ``stat`` domain over the NN series (non-duplicative
    subset — mean/std/min/max/range already ship from the td domain).

    Closed forms match the scipy defaults flirt calls: skewness is the
    biased Fisher-Pearson g1 = m3 / m2^1.5, kurtosis the biased excess
    g2 = m4 / m2^2 - 3 (both NaN on a constant window, like scipy);
    percentiles are NumPy's linear-interpolation quantiles; entropy is
    Shannon over unique-value multiplicities in nats (flirt feeds
    ``np.unique`` counts to ``scipy.stats.entropy``); peaks counts
    local maxima with find_peaks' plateau handling; sign changes are
    of the RAW series (flirt: ``np.sum(np.diff(np.sign(data)) != 0)``
    — a zero sample therefore contributes a change on each side; both
    fixed to the flirt forms r15, ADVICE r14 items 1-2)."""
    nn = np.asarray(nn_ms, dtype=float)
    nn = nn[~np.isnan(nn)]
    if len(nn) < 2:
        return {}
    mu = float(np.mean(nn))
    d = nn - mu
    m2 = float(np.mean(d ** 2))
    p5, p25, p75, p95 = (float(v) for v in
                         np.percentile(nn, [5.0, 25.0, 75.0, 95.0]))
    diff = np.diff(nn)
    _, counts = np.unique(nn, return_counts=True)
    pv = counts / counts.sum()
    return {
        "nni_skewness": float(np.mean(d ** 3) / m2 ** 1.5)
        if m2 > 0 else np.nan,
        "nni_kurtosis": float(np.mean(d ** 4) / m2 ** 2 - 3.0)
        if m2 > 0 else np.nan,
        "nni_pct_5": p5,
        "nni_pct_95": p95,
        "nni_iqr": p75 - p25,
        "nni_iqr_5_95": p95 - p5,
        "nni_energy": float(np.sum(nn ** 2)),
        "nni_rms": float(np.sqrt(np.mean(nn ** 2))),
        "nni_lineintegral": float(np.sum(np.abs(diff))),
        "nni_n_above_mean": float(np.sum(nn > mu)),
        "nni_n_below_mean": float(np.sum(nn < mu)),
        "nni_n_sign_changes": float(np.sum(np.diff(np.sign(nn)) != 0)),
        "nni_peaks": float(find_peaks_count(nn)),
        "nni_entropy": float(-np.sum(pv * np.log(pv))),
        "nni_perm_entropy": _perm_entropy(nn),
        "nni_svd_entropy": _svd_entropy(nn),
    }


FEATURE_NAMES = [
    "num_ibis", "mean_nni", "median_nni", "range_nni", "sdnn", "rmssd",
    "sdsd", "nni_50", "pnni_50", "nni_20", "pnni_20", "cvsd", "cvnni",
    "mean_hr", "min_hr", "max_hr", "std_hr",
    "vlf", "lf", "hf", "total_power", "lf_hf_ratio", "lfnu", "hfnu",
    "lf_peak", "hf_peak", "sd1", "sd2", "sd1_sd2_ratio", "ellipse_area",
    "nni_skewness", "nni_kurtosis", "nni_pct_5", "nni_pct_95",
    "nni_iqr", "nni_iqr_5_95", "nni_energy", "nni_rms",
    "nni_lineintegral", "nni_n_above_mean", "nni_n_below_mean",
    "nni_n_sign_changes", "nni_peaks", "nni_entropy",
    "nni_perm_entropy", "nni_svd_entropy",
]


def hrv_features(nn_ms: np.ndarray,
                 domains=("td", "fd", "nl", "stat")) -> dict:
    """All-domain feature dict with a stable key set (NaN for missing).
    Default domains mirror the reference's flirt call
    (physioview/physioview.py:1082: ['td','fd','nl','stat'])."""
    out = {k: np.nan for k in FEATURE_NAMES}
    if "td" in domains:
        out.update(hrv_time_domain(nn_ms))
    if "fd" in domains:
        out.update(hrv_frequency_domain(nn_ms))
    if "nl" in domains:
        out.update(hrv_nonlinear(nn_ms))
    if "stat" in domains:
        out.update(hrv_stat_domain(nn_ms))
    return out
