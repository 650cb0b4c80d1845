"""Artifact identification kernels — Q1 (Hegarty-Craver) / Q2 (Berntson CBD).

Own implementations of the published methods with the reference's exact
parameterization and edge-case behavior (reference: pipeline/SQA.py:342-501).
Both operate on beat-index arrays (positions into the sample grid) and
return artifact beat indices; loops run over *beats* (~1-3/s), never over
samples, so they stay cheap inside an Arrow batch.
"""

from __future__ import annotations

import numpy as np


def hegarty_artifacts(
    beats_ix: np.ndarray,
    fs: float,
    initial_hr: float | str = "auto",
    prev_n: int = 6,
) -> np.ndarray:
    """Sequential IBI validation against the median of up to ``prev_n``
    preceding IBIs; valid range [26/32, 44/32] of the estimate
    (Hegarty-Craver 2018). ``initial_hr='auto'`` seeds from the mean of the
    6 consecutive IBIs with the smallest mean successive difference."""
    beats_ix = np.asarray(beats_ix, dtype=int)
    if len(beats_ix) < 2:
        return np.array([], dtype=int)
    ibis = np.diff(beats_ix) / fs * 1000.0
    beats = beats_ix[1:]

    if initial_hr == "auto":
        sd = np.abs(np.diff(ibis))
        if len(sd) >= 6:
            min_ix = int(np.convolve(sd, np.ones(6) / 6, mode="valid").argmin())
        else:
            min_ix = 0
        first_ibi = float(np.mean(ibis[min_ix: min_ix + 6]))
    else:
        first_ibi = 60000.0 / float(initial_hr)

    artifacts = []
    for n in range(len(ibis)):
        if n < prev_n:
            if n == 0:
                est = first_ibi
            else:
                est = float(np.median(np.concatenate([[first_ibi], ibis[:n]])))
        else:
            est = float(np.median(ibis[n - prev_n: n]))
        if not ((26.0 / 32.0) * est <= ibis[n] <= (44.0 / 32.0) * est):
            artifacts.append(int(beats[n]))
    return np.array(artifacts, dtype=int)


def cbd_artifacts(
    beats_ix: np.ndarray,
    fs: float,
    neighbors: int = 5,
    tol: float = 1.0,
) -> np.ndarray:
    """Criterion-beat-difference test (Berntson 1990): per-IBI-difference
    neighbor window -> quartile deviation -> MED/MAD criterion; flags the
    following 25%-of-neighbors beats too, plus IBIs slower than 40 bpm."""
    beats_ix = np.asarray(beats_ix, dtype=int)
    if len(beats_ix) < 3:
        return np.array([], dtype=int)
    ibis = np.diff(beats_ix) / fs * 1000.0
    diffs = np.abs(np.diff(ibis))
    artifacts: list[int] = []

    # implausible IBIs: slower than 40 bpm
    invalid = np.nonzero(ibis > 60000.0 / 40.0)[0]
    for ix in invalid:
        artifacts.append(int(beats_ix[ix + 1]))

    if len(diffs) < neighbors:
        neighbors = len(diffs)
    if neighbors == 0:
        return np.unique(np.array(artifacts, dtype=int))
    half = int(neighbors / 2)

    for ii in range(len(diffs)):
        if ii < half + 1:
            sel_d = np.concatenate([diffs[:ii], diffs[ii + 1: neighbors + 1]])
            sel_i = np.concatenate([ibis[:ii], ibis[ii + 1: neighbors + 1]])
        elif (len(diffs) - ii) < (half + 1) and (len(diffs) - ii) > 1:
            sel_d = np.concatenate([diffs[-(neighbors - 1): ii], diffs[ii + 1:]])
            sel_i = np.concatenate([ibis[-(neighbors - 1): ii], ibis[ii + 1:]])
        elif len(diffs) - ii == 1:
            sel_d = diffs[-(neighbors - 1): -1]
            sel_i = ibis[-(neighbors - 1): -1]
        else:
            sel_d = np.concatenate([diffs[ii - half: ii],
                                    diffs[ii + 1: ii + 1 + half]])
            sel_i = np.concatenate([ibis[ii - half: ii],
                                    ibis[ii + 1: ii + 1 + half]])
        if len(sel_d) == 0:
            continue
        q75, q25 = np.percentile(sel_d, [75, 25])
        qd = (q75 - q25) * 0.5
        med = 3.32 * qd
        mad = (float(np.median(sel_i)) - 2.9 * qd) / 3.0
        criterion = (med + mad) / 2.0
        if diffs[ii] > tol * criterion:
            bad = int(neighbors * 0.25)
            if ii + (bad - 1) < len(beats_ix):
                artifacts.extend(beats_ix[ii + 1: ii + bad + 1].tolist())
            else:
                artifacts.extend(beats_ix[ii + 1: ii + (bad - 1)].tolist())
    return np.unique(np.array(artifacts, dtype=int))


def identify_artifacts(
    beats_ix: np.ndarray,
    fs: float,
    method: str = "both",
    initial_hr: float | str = "auto",
    prev_n: int = 6,
    neighbors: int = 5,
    tol: float = 1.0,
) -> np.ndarray:
    """Dispatch + union, mirroring the reference's Q1/Q2/Q3 surface."""
    if method == "hegarty":
        return hegarty_artifacts(beats_ix, fs, initial_hr, prev_n)
    if method == "cbd":
        return cbd_artifacts(beats_ix, fs, neighbors, tol)
    if method == "both":
        return np.union1d(
            hegarty_artifacts(beats_ix, fs, initial_hr, prev_n),
            cbd_artifacts(beats_ix, fs, neighbors, tol),
        ).astype(int)
    raise ValueError("method must be 'hegarty', 'cbd', or 'both'")
