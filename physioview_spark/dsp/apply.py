"""Filtering / transform kernels: vectorized NumPy, no per-sample Python.

IIR filtering uses truncated-impulse-response FFT convolution: the impulse
response of a stable IIR decays geometrically, so computing it once (short
recurrence) and FFT-convolving the signal is O(n log n) vectorized — the
correct performance shape inside Arrow-batched pandas UDFs, vs an O(n)
Python-interpreted recurrence that would dominate the pipeline.

``filtfilt_fft`` gives zero-phase filtering (|H|^2 response) with odd
reflection padding at the edges, matching the edge strategy of classical
forward-backward filtering.
"""

from __future__ import annotations

import numpy as np


def lfilter(b, a, x: np.ndarray) -> np.ndarray:
    """Direct-form causal IIR/FIR recurrence (exact; use for short x)."""
    b = np.asarray(b, dtype=float)
    a = np.asarray(a, dtype=float)
    if a[0] != 1.0:
        b = b / a[0]
        a = a / a[0]
    y = np.zeros_like(np.asarray(x, dtype=float))
    x = np.asarray(x, dtype=float)
    nb, na = len(b), len(a)
    for i in range(len(x)):
        acc = 0.0
        for j in range(nb):
            if i - j >= 0:
                acc += b[j] * x[i - j]
        for j in range(1, na):
            if i - j >= 0:
                acc -= a[j] * y[i - j]
        y[i] = acc
    return y


def impulse_response(b, a, tol: float = 1e-12, max_len: int = 1 << 18) -> np.ndarray:
    """Truncated impulse response of (b, a), long enough that the dropped
    tail is below ``tol`` of the peak."""
    b = np.asarray(b, dtype=float)
    a = np.asarray(a, dtype=float)
    if len(a) == 1:
        return b / a[0]
    n = 1024
    while True:
        x = np.zeros(n)
        x[0] = 1.0
        h = _iir_recurrence(b, a, x)
        peak = np.max(np.abs(h))
        tail = np.max(np.abs(h[-max(8, n // 64):]))
        if tail <= tol * max(peak, 1e-300) or n >= max_len:
            nz = np.nonzero(np.abs(h) > tol * peak)[0]
            return h[: (nz[-1] + 1)] if len(nz) else h[:1]
        n *= 2


def _iir_recurrence(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Vectorized-in-b recurrence: y[i] = (b*x)[i] - sum a[j] y[i-j].

    The feed-forward part is a convolution (vectorized); only the short
    feedback taps loop per sample — acceptable because it is only ever
    used to materialize impulse responses (a few thousand samples).
    """
    if a[0] != 1.0:
        b = b / a[0]
        a = a / a[0]
    fb = a[1:]
    v = np.convolve(x, b)[: len(x)]
    y = np.empty(len(x))
    order = len(fb)
    for i in range(len(x)):
        lo = max(0, i - order)
        acc = v[i]
        if i > lo:
            acc -= np.dot(fb[: i - lo], y[i - 1: lo - 1 if lo > 0 else None: -1])
        y[i] = acc
    return y


def fftconvolve(x: np.ndarray, h: np.ndarray, mode: str = "full") -> np.ndarray:
    n = len(x) + len(h) - 1
    nfft = 1 << max(0, (n - 1)).bit_length()
    y = np.fft.irfft(np.fft.rfft(x, nfft) * np.fft.rfft(h, nfft), nfft)[:n]
    if mode == "full":
        return y
    if mode == "same":
        start = (len(h) - 1) // 2
        return y[start: start + len(x)]
    raise ValueError(mode)


def lfilter_fft(b, a, x: np.ndarray) -> np.ndarray:
    """Causal filtering of a long signal via truncated-IR FFT convolution."""
    h = impulse_response(b, a)
    return fftconvolve(np.asarray(x, dtype=float), h)[: len(x)]


def filtfilt_fft(b, a, x: np.ndarray) -> np.ndarray:
    """Zero-phase filtering: apply |H(w)|^2 in the frequency domain.

    Odd reflection padding (3x the impulse-response length, like classical
    filtfilt's default padlen heuristic scaled up) suppresses edge
    transients; the result has exactly zero phase distortion.
    """
    x = np.asarray(x, dtype=float)
    h = impulse_response(b, a)
    pad = min(max(3 * len(h), 64), max(len(x) - 1, 1))
    left = 2.0 * x[0] - x[pad:0:-1]
    right = 2.0 * x[-1] - x[-2: -pad - 2: -1]
    ext = np.concatenate([left, x, right])
    nfft = 1 << max(0, (len(ext) - 1)).bit_length()
    hw = np.fft.rfft(h, nfft)
    mag2 = (hw * np.conj(hw)).real
    y = np.fft.irfft(np.fft.rfft(ext, nfft) * mag2, nfft)[: len(ext)]
    return y[pad: pad + len(x)]


def moving_average(x: np.ndarray, w: int, mode: str = "same") -> np.ndarray:
    """O(n) cumulative-sum moving average (reference: pipeline/ECG.py:663-671
    uses the same cumsum idea).

    FINITE-SAMPLES CONTRACT (r17 null-axis, extended r18 extremes
    axis): a non-finite sample — NaN (the Arrow representation of SQL
    NULL) or +-Inf (a sensor glitch / saturated reading) — is a
    MISSING sample: skipped, each window averaging its finite members,
    NaN only when NO member is finite. Two reasons this is the signal
    tier's contract rather than IEEE propagation: (a) the O(n) prefix
    sum is structurally non-robust to Inf — windows that do NOT
    contain the Inf still hit inf - inf = NaN through the poisoned
    cumulative sums, which is not even self-consistent; (b) the FFT
    kernels downstream (filtfilt_fft, hilbert, resample) globalize any
    non-finite input over the entire signal, so no finite-window SQL
    semantics can ever be reproduced — masking at the kernel boundary
    is the only contract both engines can express. The SQL twin wraps
    the value as ``CASE WHEN isfinite(value) THEN value END``. On
    finite input the arithmetic is bit-identical to the plain cumsum
    (the count path divides by the same w)."""
    x = np.asarray(x, dtype=float)
    v = np.isfinite(x)
    xz = np.where(v, x, 0.0)
    c = np.cumsum(np.insert(xz, 0, 0.0))
    cn = np.cumsum(np.insert(v.astype(float), 0, 0.0))
    counts = cn[w:] - cn[:-w]
    full = np.where(counts > 0.0,
                    (c[w:] - c[:-w]) / np.where(counts > 0.0, counts, 1.0),
                    np.nan)  # len n-w+1, aligned to window start
    if mode == "valid":
        return full

    def _edge_mean(seg: np.ndarray) -> float:
        vs = seg[np.isfinite(seg)]
        return vs.mean() if len(vs) else float("nan")

    out = np.empty(len(x))
    half = (w - 1) // 2
    # centered alignment with shrinking edge windows
    for i in range(min(half, len(x))):
        out[i] = _edge_mean(x[: i + w - half])
    out[half: half + len(full)] = full
    for i in range(half + len(full), len(x)):
        out[i] = _edge_mean(x[i - half:])
    return out


def hilbert(x: np.ndarray) -> np.ndarray:
    """Analytic signal via FFT (positive-frequency doubling)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    xf = np.fft.fft(x)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1.0
        h[1: n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1: (n + 1) // 2] = 2.0
    return np.fft.ifft(xf * h)


def sliding_max(x: np.ndarray, w: int) -> np.ndarray:
    """Centered sliding-window maximum, O(n) van Herk/Gil-Werman.

    Output[i] = max(x[i-hw : i-hw+w]) with edge windows clipped.
    """
    x = np.asarray(x, dtype=float)
    n = len(x)
    if w <= 1 or n == 0:
        return x.copy()
    w = min(w, n)
    hw = (w - 1) // 2
    # -inf padding makes every window exactly w long; clipped edge windows
    # come out right because -inf never wins the max.
    xp = np.concatenate([np.full(hw, -np.inf), x, np.full(w - 1 - hw, -np.inf)])
    m = len(xp)
    nblocks = -(-m // w)
    padded = np.full(nblocks * w, -np.inf)
    padded[:m] = xp
    blocks = padded.reshape(nblocks, w)
    fwd = np.maximum.accumulate(blocks, axis=1).ravel()
    bwd = np.maximum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
    lo = np.arange(n)          # window i covers xp[i : i+w]
    hi = lo + w - 1
    return np.maximum(bwd[lo], fwd[hi])


def fourier_resample(x: np.ndarray, num: int) -> np.ndarray:
    """Fourier-domain resampling to exactly ``num`` samples (K20 parity —
    the reference calls ``scipy.signal.resample`` for ACC<->BVP/EDA
    alignment, reference: physioview/physioview.py:305-318, 1364-1370).

    rFFT -> truncate or zero-pad the spectrum -> irFFT, with the Nyquist
    bin split/folded symmetrically so real signals stay real and energy is
    conserved.
    """
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n == 0 or num == n:
        return x.copy()
    xf = np.fft.rfft(x)
    n_out_bins = num // 2 + 1
    yf = np.zeros(n_out_bins, dtype=complex)
    ncopy = min(len(xf), n_out_bins)
    yf[:ncopy] = xf[:ncopy]
    # Nyquist-bin handling for even lengths (split on upsample, fold on
    # downsample) keeps the inverse transform exactly real.
    if num > n and n % 2 == 0 and ncopy > n // 2:
        yf[n // 2] *= 0.5
    elif num < n and num % 2 == 0 and len(xf) > num // 2:
        yf[num // 2] = xf[num // 2].real
    y = np.fft.irfft(yf, num)
    return y * (float(num) / n)


def resample_poly(x: np.ndarray, up: int, down: int,
                  numtaps_per_phase: int = 10) -> np.ndarray:
    """Polyphase rational-ratio resampling (K19 parity — the reference uses
    ``scipy.signal.resample_poly(up, down)`` after a gcd reduction,
    reference: pipeline/EDA.py:484-518).

    Zero-stuff by ``up``, FIR low-pass at min(1/up, 1/down) x Nyquist
    (windowed sinc, Hamming), stride by ``down``. Output length
    ``ceil(len(x) * up / down)`` matching the classical convention.
    """
    from physioview_spark.dsp.design import firwin

    x = np.asarray(x, dtype=float)
    g = np.gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    if up == 1 and down == 1:
        return x.copy()
    n_out = -(-len(x) * up // down)
    # windowed-sinc anti-alias / anti-image filter, gain `up`
    max_rate = max(up, down)
    numtaps = 2 * numtaps_per_phase * max_rate + 1
    h = firwin(numtaps, 1.0 / max_rate) * up
    xu = np.zeros(len(x) * up)
    xu[::up] = x
    y = fftconvolve(xu, h, mode="full")
    delay = (numtaps - 1) // 2
    y = y[delay: delay + len(x) * up]
    return y[::down][:n_out]


def decimate_fir(x: np.ndarray, factor: int,
                 numtaps: int = 129) -> np.ndarray:
    """Render decimation (K21 parity): anti-alias FIR (129 taps, cutoff
    ``0.45 / factor`` x Nyquist, Hamming) then stride ``::factor``
    (reference: dashboard/utils.py:494-581, target ~250 Hz via
    ``ds_factor = fs // 250`` at :529)."""
    from physioview_spark.dsp.design import firwin

    x = np.asarray(x, dtype=float)
    if factor <= 1:
        return x.copy()
    h = firwin(numtaps, 0.45 / factor * 2.0)
    y = fftconvolve(x, h, mode="same")
    return y[::factor]
