"""Deterministic synthetic physiological signals (FIXTURES.md shapes).

Used by the golden test harness and the kernel demo queries: signals with
*known* ground-truth event locations so detector recall/precision is
measurable without a reference implementation.
"""

from __future__ import annotations

import numpy as np


def synth_ecg(
    fs: float = 250.0,
    duration: float = 60.0,
    hr: float = 70.0,
    hrv: float = 5.0,
    noise: float = 0.03,
    baseline: float = 0.1,
    powerline: float = 0.02,
    seed: int = 42,
):
    """Synthetic ECG: Gaussian QRS bumps at known beat positions over
    baseline-wander + powerline + white noise (FIXTURES.md F1).

    Returns (signal, beat_idx).
    """
    rng = np.random.RandomState(seed)
    n = int(fs * duration)
    t = np.arange(n) / fs
    # beat times: HR modulated sinusoidally (respiratory sinus arrhythmia)
    beat_times = []
    tt = 0.3
    while tt < duration - 0.3:
        inst_hr = hr + hrv * np.sin(2 * np.pi * 0.25 * tt)
        beat_times.append(tt)
        tt += 60.0 / inst_hr
    beat_idx = np.round(np.array(beat_times) * fs).astype(int)
    beat_idx = beat_idx[beat_idx < n]

    x = np.zeros(n)
    qrs_width = 0.012  # seconds (sharp R wave)
    for bt in beat_idx / fs:
        lo = max(0, int((bt - 0.05) * fs))
        hi = min(n, int((bt + 0.05) * fs))
        seg_t = t[lo:hi]
        x[lo:hi] += 1.0 * np.exp(-0.5 * ((seg_t - bt) / qrs_width) ** 2)
        # small T wave
        x[lo:hi] += 0.15 * np.exp(-0.5 * ((seg_t - bt - 0.18) / 0.05) ** 2)
    x += baseline * np.sin(2 * np.pi * 0.05 * t)
    x += powerline * np.sin(2 * np.pi * 60.0 * t)
    x += noise * rng.randn(n)
    return x, beat_idx


def synth_ppg(
    fs: float = 64.0,
    duration: float = 60.0,
    hr: float = 70.0,
    hrv: float = 5.0,
    noise: float = 0.02,
    seed: int = 7,
):
    """Synthetic PPG/BVP: systolic peak + dicrotic notch per beat (F2)."""
    rng = np.random.RandomState(seed)
    n = int(fs * duration)
    t = np.arange(n) / fs
    beat_times = []
    tt = 0.5
    while tt < duration - 0.5:
        inst_hr = hr + hrv * np.sin(2 * np.pi * 0.2 * tt)
        beat_times.append(tt)
        tt += 60.0 / inst_hr
    beat_idx = np.round(np.array(beat_times) * fs).astype(int)
    beat_idx = beat_idx[beat_idx < n]
    x = np.zeros(n)
    for bt in beat_idx / fs:
        lo = max(0, int((bt - 0.1) * fs))
        hi = min(n, int((bt + 0.5) * fs))
        seg_t = t[lo:hi]
        x[lo:hi] += 1.0 * np.exp(-0.5 * ((seg_t - bt) / 0.08) ** 2)
        x[lo:hi] += 0.3 * np.exp(-0.5 * ((seg_t - bt - 0.3) / 0.06) ** 2)
    x += noise * rng.randn(n)
    return x, beat_idx


def synth_eda(
    fs: float = 4.0,
    duration: float = 300.0,
    scr_times: tuple = (30.0, 90.0, 150.0, 210.0, 270.0),
    scr_amp: float = 0.8,
    noise: float = 0.01,
    seed: int = 11,
):
    """Synthetic EDA: tonic ramp + Bateman-shaped SCRs at known onsets
    (FIXTURES.md F3). Returns (signal, onset_idx)."""
    rng = np.random.RandomState(seed)
    n = int(fs * duration)
    t = np.arange(n) / fs
    tonic = 2.0 + 6.0 * t / duration
    x = tonic.copy()
    tau0, tau1 = 2.0, 0.7
    for ot in scr_times:
        if ot >= duration:
            continue
        rel = t - ot
        mask = rel > 0
        bateman = np.zeros(n)
        bateman[mask] = np.exp(-rel[mask] / tau0) - np.exp(-rel[mask] / tau1)
        peak = bateman.max()
        if peak > 0:
            x += scr_amp * bateman / peak
    x += noise * rng.randn(n)
    onset_idx = np.round(np.array(scr_times) * fs).astype(int)
    return x, onset_idx[onset_idx < n]


def synth_acc(fs: float = 32.0, duration: float = 300.0, seed: int = 13):
    """Synthetic 3-axis accelerometer: rest/active bouts (F4)."""
    rng = np.random.RandomState(seed)
    n = int(fs * duration)
    t = np.arange(n) / fs
    active = ((t // 60).astype(int) % 2 == 1).astype(float)  # alternating bouts
    x = 0.1 * np.sin(2 * np.pi * 1.3 * t) * (1 + 5 * active)
    y = 0.1 * np.sin(2 * np.pi * 0.7 * t + 1.0) * (1 + 5 * active)
    z = 9.81 + 0.05 * rng.randn(n) + 0.5 * active * np.sin(2 * np.pi * 2.1 * t)
    return x, y, z


def beat_match_stats(detected: np.ndarray, truth: np.ndarray, fs: float,
                     tol_s: float = 0.05):
    """Recall/precision of detected beats vs ground truth within tol."""
    tol = tol_s * fs
    detected = np.asarray(detected)
    truth = np.asarray(truth)
    if len(truth) == 0 or len(detected) == 0:
        return 0.0, 0.0
    d = np.abs(detected[:, None] - truth[None, :])
    recall = float(np.mean(d.min(axis=0) <= tol))
    precision = float(np.mean(d.min(axis=1) <= tol))
    return recall, precision
