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


FEATURE_NAMES = [
    "num_ibis", "mean_nni", "median_nni", "range_nni", "sdnn", "rmssd",
    "sdsd", "nni_50", "pnni_50", "nni_20", "pnni_20", "cvsd", "cvnni",
    "mean_hr", "min_hr", "max_hr", "std_hr",
    "vlf", "lf", "hf", "total_power", "lf_hf_ratio", "lfnu", "hfnu",
    "lf_peak", "hf_peak", "sd1", "sd2", "sd1_sd2_ratio", "ellipse_area",
]


def hrv_features(nn_ms: np.ndarray, domains=("td", "fd", "nl")) -> dict:
    """All-domain feature dict with a stable key set (NaN for missing)."""
    out = {k: np.nan for k in FEATURE_NAMES}
    if "td" in domains:
        out.update(hrv_time_domain(nn_ms))
    if "fd" in domains:
        out.update(hrv_frequency_domain(nn_ms))
    if "nl" in domains:
        out.update(hrv_nonlinear(nn_ms))
    return out
