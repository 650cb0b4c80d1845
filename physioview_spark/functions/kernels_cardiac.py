"""Beat-detection kernels (NumPy; run inside applyInPandas per subject).

Algorithms re-derived from their published descriptions with the same
parameterization as the reference's detector suite (behavior parity, own
implementation):

- Pan-Tompkins (1985)          — reference: pipeline/ECG.py:556-661
- Manikandan & Soman (2012)    — reference: pipeline/ECG.py:385-513
- Nabian et al. (2018)         — reference: pipeline/ECG.py:515-554
- Engelse-Zeelenberg/Lourenço  — reference: pipeline/ECG.py:231-383
- van Gent adaptive threshold  — reference: pipeline/PPG.py:174-233
- Elgendi ERMA (2013)          — reference: pipeline/PPG.py:235-322

Implementation stance: full-array preprocessing is vectorized NumPy; the
state machines iterate over *sparse peak candidates* (a few per second),
never per sample, so a 1 h @ 1024 Hz recording stays fast inside one Arrow
batch. Engzee's per-sample threshold automaton is re-expressed
event-driven (jump from QRS to next threshold crossing).
"""

from __future__ import annotations

import numpy as np

from physioview_spark.dsp.apply import hilbert, moving_average, sliding_max


def _local_maxima(x: np.ndarray) -> np.ndarray:
    """Strict single-sample local maxima (plateau width 1)."""
    if len(x) < 3:
        return np.array([], dtype=int)
    core = (x[1:-1] > x[:-2]) & (x[1:-1] > x[2:])
    return np.nonzero(core)[0] + 1


def _prominences(x: np.ndarray, peaks: np.ndarray) -> np.ndarray:
    """Topographic prominence of each peak (small-segment use)."""
    proms = np.empty(len(peaks))
    for j, p in enumerate(peaks):
        h = x[p]
        # left base
        i = p
        lmin = h
        while i > 0 and x[i - 1] <= h:
            i -= 1
            lmin = min(lmin, x[i])
        if i == 0 and x[0] <= h:
            left = np.min(x[: p + 1])
        else:
            left = lmin
        # right base
        i = p
        rmin = h
        n = len(x)
        while i < n - 1 and x[i + 1] <= h:
            i += 1
            rmin = min(rmin, x[i])
        if i == n - 1 and x[-1] <= h:
            right = np.min(x[p:])
        else:
            right = rmin
        proms[j] = h - max(left, right)
    return proms


def _dedupe_keep_order(ix: np.ndarray) -> np.ndarray:
    """Drop duplicate indices keeping first occurrence (O5 parity)."""
    ix = np.asarray(ix, dtype=int)
    _, first = np.unique(ix, return_index=True)
    return ix[np.sort(first)]


def pantompkins(signal: np.ndarray, fs: float) -> np.ndarray:
    """Pan-Tompkins QRS detection: derivative -> square -> 150 ms moving
    integration -> SPKI/NPKI dual-threshold scan with missed-beat searchback.
    """
    x = np.asarray(signal, dtype=float)
    squared = np.diff(x) ** 2
    w = int(0.15 * fs)
    mwa = moving_average(squared, w, mode="same")
    # warm-up: causal expanding average, then blanked first 200 ms
    head = min(w - 1, len(squared))
    if head > 0:
        mwa[:head] = np.cumsum(x[:head]) / np.linspace(1, head, head)
    mwa[: int(0.2 * fs)] = 0.0

    min_dist = int(0.3 * fs)
    min_missed = int(0.25 * fs)
    peaks = _local_maxima(mwa)

    beats: list[int] = []
    spki = npki = 0.0
    last_peak, last_i = 0, -1
    for i, p in enumerate(peaks):
        v = mwa[p]
        thr1 = npki + 0.25 * (spki - npki)
        if v > thr1 and p > last_peak + min_dist:
            beats.append(int(p))
            if len(beats) > 9:
                ibi_avg = (beats[-2] - beats[-10]) // 8
                if (p - last_peak) > int(1.66 * ibi_avg):
                    missed = peaks[last_i + 1: i]
                    missed = missed[
                        (missed > last_peak + min_missed) & (missed < p - min_missed)
                    ]
                    missed = missed[mwa[missed] > 0.5 * thr1]
                    if len(missed) > 0:
                        beats[-1] = int(missed[np.argmax(mwa[missed])])
                        beats.append(int(p))
            last_peak, last_i = p, i
            spki = 0.125 * v + 0.875 * spki
        else:
            npki = 0.125 * v + 0.875 * npki
    return _dedupe_keep_order(np.array(beats, dtype=int))


def _adaptive_amplitude_pass(
    signal: np.ndarray, beats_ix: np.ndarray, fs: float,
    window: float = 0.44, step: float = 0.1,
) -> np.ndarray:
    """Sliding-window amplitude gate (W5): drop beats below the window's
    mid-amplitude threshold (median/max blend for 3+ beats, min/max for 2).
    """
    keep = np.ones(len(beats_ix), dtype=bool)
    if len(beats_ix) == 0:
        return beats_ix
    amp = signal[beats_ix]
    wl = int(fs * window)
    ws = int(fs * step)
    n = len(signal)
    starts = np.arange(0, n, ws)
    # beats are sorted; find the member range per window via searchsorted
    lo = np.searchsorted(beats_ix, starts)
    hi = np.searchsorted(beats_ix, starts + wl)
    for s in range(len(starts)):
        a, b = lo[s], hi[s]
        if b - a < 2:
            continue
        w_amp = amp[a:b]
        if b - a == 2:
            thresh = (w_amp.min() + w_amp.max()) * 0.5
        else:
            thresh = (np.median(w_amp) + w_amp.max()) * 0.5
        keep[a:b] &= ~(w_amp < thresh)
    return beats_ix[keep]


def manikandan(
    signal: np.ndarray, fs: float, adaptive_threshold: bool = True,
    window: float = 0.44,
) -> np.ndarray:
    """Shannon-energy envelope + Hilbert + MA-drift removal + positive
    zero-crossings + 120 ms peak search (Manikandan & Soman 2012)."""
    x = np.asarray(signal, dtype=float)
    dn = np.append(x[1:], 0) - x
    mx = np.max(np.abs(dn))
    if mx == 0:
        return np.array([], dtype=int)
    dtn = dn / mx
    with np.errstate(divide="ignore", invalid="ignore"):
        sn = -(dtn ** 2) * np.log10(dtn ** 2)
    sn = np.nan_to_num(sn, nan=0.0, posinf=0.0, neginf=0.0)

    wl = int(0.15 * fs)
    sn_f = np.concatenate([np.zeros(wl - 1), moving_average(sn, wl, mode="valid")])
    zn = np.imag(hilbert(sn_f))
    ma_len = int(fs * 2.5)
    if len(zn) >= ma_len:
        zn_ma = np.concatenate(
            [np.zeros(ma_len - 1), moving_average(zn, ma_len, mode="valid")]
        )
    else:
        zn_ma = np.zeros_like(zn)
    hf = zn - zn_ma

    crossings = np.nonzero(np.diff(np.sign(hf)) > 0)[0]
    half = round(fs * 0.12)
    beats = []
    n = len(x)
    for c in crossings:
        lo = c - half
        hi = min(c + half + 1, n)
        seg = x[max(lo, 0): hi]
        if len(seg) == 0:
            continue
        peak = max(lo, 0) + int(np.argmax(seg))
        if peak > 0:
            beats.append(peak)
    beats = _dedupe_keep_order(np.array(beats, dtype=int))
    if adaptive_threshold:
        beats = _adaptive_amplitude_pass(x, beats, fs, window)
    return beats


def nabian(signal: np.ndarray, fs: float) -> np.ndarray:
    """0.4 s sliding-argmax R-peak test, vectorized with an O(n) van Herk
    sliding maximum instead of the reference's per-sample argmax loop."""
    x = np.asarray(signal, dtype=float)
    ws = int(0.4 * fs)
    if len(x) < 2 * ws + 1:
        return np.array([], dtype=int)
    # reference window: x[i-ws : i+ws] (length 2*ws), peak iff argmax == ws
    smax = sliding_max(x, 2 * ws + 1)  # centered max over [i-ws, i+ws]
    cand = np.nonzero(x == smax)[0]
    cand = cand[(cand >= 1 + ws) & (cand < len(x) - ws)]
    # argmax tie-break: reject i if an equal max occurs earlier in window
    out = []
    for i in cand:
        w = x[i - ws: i + ws]
        if int(np.argmax(w)) == ws:
            out.append(int(i))
    return _dedupe_keep_order(np.array(out, dtype=int))


def engzee(signal: np.ndarray, fs: float) -> np.ndarray:
    """Engelse-Zeelenberg (Lourenço mod.): 4-sample differentiator, [1,4,6,
    4,1] smoothing, adaptive M threshold with decay, negative-crossing
    confirmation. Event-driven re-expression of the per-sample automaton."""
    x = np.asarray(signal, dtype=float)
    n = len(x)
    diff = np.zeros(n)
    diff[4:] = x[4:] - x[:-4]
    lp = np.convolve(diff, np.array([1.0, 4.0, 6.0, 4.0, 1.0]))[:n]
    ms200 = int(0.2 * fs)
    ms1200 = int(1.2 * fs)
    ms160 = int(0.16 * fs)
    neg_thresh = int(0.01 * fs)
    lp[:ms200] = 0.0
    slope = np.linspace(1.0, 0.6, ms1200 - ms200)

    beats: list[int] = []
    mm: list[float] = []
    init_end = min(int(5 * fs), n)
    cummax = np.maximum.accumulate(lp[:init_end])

    def confirm(qrs: int) -> None:
        """Negative-crossing confirmation within 160 ms after the QRS."""
        m = mm_mean[0]
        end = min(qrs + ms160, n)
        seg = lp[qrs:end]
        below = seg < -m
        # need a crossing from above, then > neg_thresh consecutive belows
        run = 0
        started = False
        for j in range(1, len(seg)):
            if below[j] and not below[j - 1]:
                started = True
                run = 0
            if started and below[j]:
                run += 1
                if run > neg_thresh:
                    lo = max(qrs - int(0.01 * fs), 0)
                    hi = qrs + j
                    if hi > lo:
                        beats.append(lo + int(np.argmax(x[lo:hi])))
                    return
            elif started and not below[j]:
                return

    # --- initial 5 s region: M = 0.6 * cummax, per-sample semantics ---
    mm_mean = [0.0]
    qrs = None
    for i in range(init_end):
        m = 0.6 * cummax[i]
        if lp[i] > m:
            qrs = i
            break
    # MM seeded with the last value of the warm-up threshold sequence
    mm = [0.6 * cummax[min(init_end, n) - 1]] * 5 if init_end > 0 else [0.0]
    mm_mean[0] = float(np.mean(mm))
    if qrs is not None:
        confirm(qrs)

    # --- event-driven main loop: jump from QRS to next crossing ---
    while qrs is not None:
        new_m5 = 0.6 * np.max(lp[qrs: min(qrs + ms200, n)])
        new_m5 = min(new_m5, 1.1 * mm[-1]) if mm else new_m5
        mm.append(new_m5)
        if len(mm) > 5:
            mm.pop(0)
        mbase = float(np.mean(mm))
        mm_mean[0] = mbase

        start = qrs + ms200
        if start >= n:
            break
        # piecewise threshold after the refractory period
        seg_end = min(qrs + ms1200, n)
        m_seg = mbase * slope[: seg_end - start]
        cand = np.nonzero(lp[start:seg_end] > m_seg)[0]
        if len(cand) > 0:
            qrs = start + int(cand[0])
        else:
            tail = lp[seg_end:]
            cand = np.nonzero(tail > 0.6 * mbase)[0]
            qrs = seg_end + int(cand[0]) if len(cand) > 0 else None
        if qrs is not None:
            confirm(qrs)

    if beats:
        beats = beats[1:]  # first detection is warm-up-biased
    return _dedupe_keep_order(np.array(beats, dtype=int))


def ppg_adaptive_threshold(
    signal: np.ndarray, fs: float, ma_perc: float = 20.0
) -> np.ndarray:
    """van Gent (HeartPy) adaptive threshold: raised 0.75 s moving average,
    argmax per supra-threshold run — fully vectorized run detection."""
    x = np.asarray(signal, dtype=float)
    ma = moving_average(x, int(0.75 * fs), mode="same")
    ma = ma + np.mean(ma / 100.0) * ma_perc
    above = np.nonzero(x > ma)[0]
    if len(above) == 0:
        return np.array([], dtype=int)
    edges = np.concatenate([[0], np.nonzero(np.diff(above) > 1)[0] + 1, [len(above)]])
    beats = []
    for s, e in zip(edges[:-1], edges[1:]):
        if e > s:
            run = above[s:e]
            beats.append(int(run[np.argmax(x[run])]))
    return np.array(beats, dtype=int)


def ppg_erma(
    signal: np.ndarray, fs: float, w1: float = 0.111, w2: float = 0.667,
    offset: float = 0.02, refractory: float = 0.3,
) -> np.ndarray:
    """Elgendi event-related moving averages: clip+square, 111/667 ms MAs,
    wave gating, max-prominence peak per wave, 300 ms refractory."""
    x = np.asarray(signal, dtype=float)
    squared = np.maximum(x, 0.0) ** 2
    ma_peak = moving_average(squared, int(np.rint(w1 * fs)), mode="same")
    ma_beat = moving_average(squared, int(np.rint(w2 * fs)), mode="same")
    thr1 = ma_beat + offset * np.mean(squared)
    waves = ma_peak > thr1
    beg = np.nonzero(~waves[:-1] & waves[1:])[0]
    end = np.nonzero(waves[:-1] & ~waves[1:])[0]
    if len(beg) == 0:
        return np.array([], dtype=int)
    end = end[end > beg[0]]
    min_len = int(np.rint(w1 * fs))
    min_delay = int(np.rint(refractory * fs))
    beats = [0]
    for b, e in zip(beg, end):
        if e - b < min_len:
            continue
        seg = x[b:e]
        peaks = _local_maxima(seg)
        if len(peaks) == 0:
            continue
        proms = _prominences(seg, peaks)
        peak = b + int(peaks[np.argmax(proms)])
        if peak - beats[-1] > min_delay:
            beats.append(peak)
    return np.array(beats[1:], dtype=int)
