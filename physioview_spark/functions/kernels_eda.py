"""EDA kernels: SCR peak detection, phasic/tonic decomposition, tonic SCL.

- ``detect_scr_peaks``: Bartlett-smoothed derivative, +/- zero-crossing
  pairing, relative (10% of max) + absolute amplitude thresholds
  (reference: pipeline/EDA.py:219-309, Nabian 2018).
- ``decompose_eda``: Greco's cvxEDA sparse QP (reference:
  pipeline/EDA.py:417-449, 520-688), solved by the pure-NumPy ADMM+CG
  port in functions/cvxeda.py — same model (Bateman ARMA + spline tonic
  + drift, alpha/gamma penalties, A q >= 0), no cvxopt dependency.
  ``method='fast'`` selects a cheap documented approximation (tonic =
  low-pass of a running-minimum opening, phasic = clipped residual) for
  throughput-bound paths that only need the downstream contract (tonic
  slow + smooth, phasic sparse positive bumps at SCRs).
- ``compute_tonic_scl``: mean EDA excluding SCR rise/recovery intervals
  (reference: pipeline/EDA.py:311-415).
"""

from __future__ import annotations

import numpy as np

from physioview_spark.dsp import butter, filtfilt_fft


def detect_scr_peaks(
    phasic: np.ndarray,
    smooth_size: int = 20,
    min_amp_thresh: float = 0.1,
    min_peak_amp: float | None = None,
) -> np.ndarray:
    x = np.asarray(phasic, dtype=float)
    if len(x) < 3:
        return np.array([], dtype=int)
    diff = np.diff(x, prepend=x[0])
    kernel = np.bartlett(smooth_size)
    s = kernel.sum()
    if s > 0:
        kernel = kernel / s
    ds = np.convolve(diff, kernel, mode="same")

    sign = np.sign(ds)
    flips = np.nonzero(np.diff(sign) != 0)[0]
    pos = [i for i in flips if ds[i] < 0 <= ds[i + 1]]
    neg = [i for i in flips if ds[i] > 0 >= ds[i + 1]]
    if neg and pos and neg[0] < pos[0]:
        neg = neg[1:]
    n_pairs = min(len(pos), len(neg))
    pos, neg = pos[:n_pairs], neg[:n_pairs]

    candidates = []
    for onset, offset in zip(pos, neg):
        seg = x[onset:offset]
        if len(seg) == 0:
            continue
        peak = onset + int(np.argmax(seg))
        candidates.append((peak, x[peak] - x[onset]))
    if not candidates:
        return np.array([], dtype=int)

    peaks: list[int] = []
    amps: list[float] = []
    for idx, amp in candidates:
        ok_abs = min_peak_amp is None or amp >= min_peak_amp
        if not amps:
            if ok_abs:
                peaks.append(idx)
                amps.append(amp)
        elif ok_abs and amp >= min_amp_thresh * max(amps):
            peaks.append(idx)
            amps.append(amp)
    return np.array(peaks, dtype=int)


def _running_min_open(x: np.ndarray, w: int) -> np.ndarray:
    """Morphological opening-ish floor: running min then running max."""
    from physioview_spark.dsp.apply import sliding_max

    floor = -sliding_max(-x, w)
    return sliding_max(floor, w)


def decompose_eda(
    eda: np.ndarray,
    fs: float,
    method: str = "cvx",
    max_matvecs: int | None = None,
    return_info: bool = False,
):
    """Split EDA into (phasic, tonic).

    ``method='cvx'`` (default, reference parity): the cvxEDA QP solved by
    the ADMM+CG port (functions/cvxeda.py; reference:
    pipeline/EDA.py:417-449, 520-688). ``method='fast'``: the documented
    low-pass/opening approximation. Signals too short for the QP model
    fall back to the approximation.

    ``max_matvecs`` caps the QP's deterministic work budget (CG operator
    applications — the straggler ceiling, see
    :func:`physioview_spark.functions.cvxeda.cvxeda_decompose`); ``None``
    preserves the historical uncapped iterate sequence bit-for-bit.
    ``return_info=True`` returns ``(phasic, tonic, info)`` where ``info``
    carries ``capped`` (bool — budget exhausted, THE quarantine flag),
    ``converged`` (formal ADMM stopping test; tight tolerances mean a
    natural max_iter exit commonly reports False while well inside the
    parity contracts), ``rel_residual`` (float, <= 1.0 iff converged)
    and ``matvecs`` (work spent) so callers can FLAG a capped solve
    instead of silently trusting it. The non-QP paths (``'fast'``,
    short-signal fallback) are closed-form — their info is trivially
    ``capped=False, converged=True, rel_residual=0.0, matvecs=0``."""
    x = np.asarray(eda, dtype=float)
    if method == "cvx" and len(x) >= 8:
        from physioview_spark.functions.cvxeda import cvxeda_decompose

        res = cvxeda_decompose(x, fs, max_matvecs=max_matvecs)
        if return_info:
            info = {"capped": res["capped"],
                    "converged": res["converged"],
                    "rel_residual": res["rel_residual"],
                    "matvecs": res["matvecs"]}
            return res["phasic"], res["tonic"], info
        return res["phasic"], res["tonic"]
    w = max(int(8 * fs), 3)
    base = _running_min_open(x, w)
    cutoff = min(0.05, 0.45 * fs / 2)
    b, a = butter(2, cutoff / (fs / 2), "lowpass")
    tonic = filtfilt_fft(b, a, base)
    phasic = np.maximum(x - tonic, 0.0)
    if return_info:
        return phasic, tonic, {"capped": False, "converged": True,
                               "rel_residual": 0.0, "matvecs": 0}
    return phasic, tonic


def compute_tonic_scl(
    eda: np.ndarray,
    fs: float,
    peaks: np.ndarray | None = None,
    rise: float = 2.0,
    recovery: float = 4.0,
) -> float:
    """Mean EDA excluding [peak - rise, peak + recovery] SCR intervals."""
    x = np.asarray(eda, dtype=float)
    mask = np.ones(len(x), dtype=bool)
    if peaks is not None:
        r0 = int(rise * fs)
        r1 = int(recovery * fs)
        for p in np.asarray(peaks, dtype=int):
            mask[max(0, p - r0): min(len(x), p + r1 + 1)] = False
    if not mask.any():
        return float(np.mean(x))
    return float(np.mean(x[mask]))
