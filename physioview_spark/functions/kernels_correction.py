"""Hegarty-Craver beat-correction state machine (Q4) — own implementation.

Behavior parity with the reference's ``correct_interval``
(reference: pipeline/SQA.py:725-1415 + _MaxNFifo :1766-1845): per-IBI flags
(Correct / Short / Long / Extra Long against thresholds 24/32, 44/32,
52/32 of a median-of-FIFO estimate), then a sequential pass combining
accept / add-previous+current / add-second-previous+previous / average /
split-into-n intervals, with acceptance checks, 40-200 bpm limit
enforcement, a FIFO of previous IBIs and a reset after 3 failed
corrections in the last window.

All IBIs are in SAMPLE-INDEX units. The machine is inherently serial per
recording; it runs inside applyInPandas with the recording as the
parallelism unit (never attempt a relational translation).
"""

from __future__ import annotations

import numpy as np

CORRECT, SHORT, LONG, EXTRA = "Correct", "Short", "Long", "Extra Long"


class _Fifo:
    """Bounded FIFO holding at most cap+1 items; seeded items enter twice."""

    def __init__(self, cap: int, item: float | None = None):
        self.cap = cap
        self.q: list[float] = [item, item] if item is not None else []

    def push(self, item: float) -> None:
        self.q.append(item)
        if len(self.q) > self.cap + 1:
            self.q.pop(0)

    def change_last(self, item: float) -> None:
        self.q[-1] = item

    def reset(self, item: float | None = None) -> None:
        self.q = [item, item] if item is not None else []


class IntervalCorrector:
    def __init__(
        self,
        fs: float,
        initial_hr: float | str = "auto",
        prev_n: int = 6,
        min_bpm: float = 40.0,
        max_bpm: float = 200.0,
        hr_estimate_window: int = 6,
        short_threshold: float = 24.0 / 32.0,
        long_threshold: float = 44.0 / 32.0,
        extra_threshold: float = 52.0 / 32.0,
    ):
        self.fs = fs
        self.initial_hr = initial_hr
        self.prev_n = prev_n
        self.min_ibi = np.floor(fs * 60.0 / max_bpm)
        self.max_ibi = np.floor(fs * 60.0 / min_bpm)
        self.hr_w = hr_estimate_window
        self.t_short = short_threshold
        self.t_long = long_threshold
        self.t_extra = extra_threshold

    # --- helpers -----------------------------------------------------------
    @staticmethod
    def _estimate(prev_ibis) -> float:
        # The FIFO slices (q[:-1] / q[1:]) are empty while fewer than two
        # beats have been seen; np.median([]) is nan but warns. Return the
        # nan explicitly — every comparison against a nan estimate is
        # False, which is the behavior the state machine already relies on.
        if len(prev_ibis) == 0:
            return float("nan")
        return float(np.median(prev_ibis))

    def _flag(self, ibi: float, prev_ibis) -> str:
        est = self._estimate(prev_ibis)
        lo, hi, ex = self.t_short * est, self.t_long * est, self.t_extra * est
        if lo <= ibi <= hi:
            return CORRECT
        if ibi < lo:
            return SHORT
        if hi < ibi < ex:
            return LONG
        return EXTRA

    def _acceptable(self, ibi: float, prev_ibis) -> bool:
        est = self._estimate(prev_ibis)
        return self.t_short * est <= ibi <= self.t_long * est

    # --- actions (mutate the run state dict) -------------------------------
    def _check_limits(self, s, n: int) -> None:
        if s["prev_ibi"] < self.min_ibi:
            rem = self.min_ibi - s["prev_ibi"]
            s["prev_beat"] += rem
            s["prev_ibi"] = self.min_ibi
            s["prev_flag"] = self._flag(s["prev_ibi"], s["fifo"].q[:-1])
            s["cur_ibi"] -= rem
            s["cur_flag"] = self._flag(s["cur_ibi"], s["fifo"].q[1:])
            s["flags"][n - 1] = 1
            s["flags"][n] = 1
            s["cnt"] += 1
        elif s["prev_ibi"] > self.max_ibi:
            rem = s["prev_ibi"] - self.max_ibi
            s["prev_beat"] -= rem
            s["prev_ibi"] = self.max_ibi
            s["prev_flag"] = self._flag(s["prev_ibi"], s["fifo"].q[:-1])
            s["cur_ibi"] += rem
            s["cur_flag"] = self._flag(s["cur_ibi"], s["fifo"].q[1:])
            s["flags"][n - 1] = 1
            s["flags"][n] = 1
            s["cnt"] += 1

    def _accept(self, s, n: int, failed: int = 0) -> None:
        self._check_limits(s, n)
        s["out_ibis"].append(s["prev_ibi"])
        s["out_beats"].append(s["prev_beat"])
        s["out_flags"].append(s["prev_flag"])
        s["fifo"].push(s["prev_ibi"])
        s["prev_ibi"], s["prev_beat"], s["prev_flag"] = (
            s["cur_ibi"], s["cur_beat"], s["cur_flag"])
        s["cnt"] = max(0, s["cnt"] - 1)
        s["failed"].push(1 if failed else 0)

    def _add_prev_current(self, s, n: int) -> None:
        corrected = s["prev_ibi"] + s["cur_ibi"]
        if self._acceptable(corrected, s["fifo"].q[1:]):
            s["cur_ibi"] = corrected
            s["cur_flag"] = self._flag(corrected, s["fifo"].q[1:])
            if n == 1:
                s["prev_ibi"], s["prev_beat"], s["prev_flag"] = (
                    s["cur_ibi"], s["cur_beat"], s["cur_flag"])
            else:
                s["prev_ibi"] = s["out_ibis"][-1]
                s["prev_beat"] = s["out_beats"][-1]
                s["prev_flag"] = s["out_flags"][-1]
                self._check_limits(s, n)
                s["out_ibis"][-1] = s["prev_ibi"]
                s["out_beats"][-1] = s["prev_beat"]
                s["out_flags"][-1] = s["prev_flag"]
                s["fifo"].change_last(s["prev_ibi"])
                s["prev_ibi"], s["prev_beat"], s["prev_flag"] = (
                    s["cur_ibi"], s["cur_beat"], s["cur_flag"])
            s["flags"][n - 1] = 1
            s["flags"][n] = 1
            s["cnt"] += 1
        else:
            self._accept(s, n, failed=1)

    def _add_secondprev_prev(self, s, n: int) -> None:
        corrected = s["out_ibis"][-1] + s["prev_ibi"]
        if self._acceptable(corrected, s["fifo"].q[:-2]):
            s["prev_ibi"] = corrected
            s["prev_flag"] = self._flag(corrected, s["fifo"].q[:-2])
            self._check_limits(s, n)
            s["out_ibis"][-1] = s["prev_ibi"]
            s["out_beats"][-1] = s["prev_beat"]
            s["out_flags"][-1] = s["prev_flag"]
            s["fifo"].change_last(s["prev_ibi"])
            s["prev_ibi"], s["prev_beat"], s["prev_flag"] = (
                s["cur_ibi"], s["cur_beat"], s["cur_flag"])
            s["flags"][n - 2] = 1
            s["flags"][n - 1] = 1
            s["cnt"] += 1
        else:
            self._accept(s, n, failed=1)

    def _insert(self, s, n: int, beats_ix: np.ndarray) -> None:
        total = s["prev_ibi"] + s["cur_ibi"]
        est = self._estimate(s["fifo"].q[1:])
        n_split = int(round(total / est)) if est > 0 else 0
        if n_split < 1:
            self._accept(s, n, failed=1)
            return
        ibi = np.floor(total / n_split)
        if self._acceptable(ibi, s["fifo"].q[1:]):
            for i in range(n_split - 2):
                s["out_ibis"].append(ibi)
                s["out_flags"].append(self._flag(ibi, s["fifo"].q[1:]))
                if (n == 1 and i == 0) or len(s["out_beats"]) == 0:
                    s["out_beats"].append(beats_ix[0] + ibi)
                else:
                    s["out_beats"].append(s["out_beats"][-1] + ibi)
                s["fifo"].push(ibi)
            s["prev_ibi"] = ibi
            s["prev_beat"] = (
                s["out_beats"][-1] + ibi if s["out_beats"] else beats_ix[0] + ibi
            )
            s["prev_flag"] = self._flag(ibi, s["fifo"].q[:-1])
            s["cur_ibi"] = s["cur_beat"] - s["prev_beat"]
            s["cur_flag"] = self._flag(ibi, s["fifo"].q[1:])
            self._check_limits(s, n)
            s["out_ibis"].append(s["prev_ibi"])
            s["out_beats"].append(s["prev_beat"])
            s["out_flags"].append(s["prev_flag"])
            s["fifo"].push(s["prev_ibi"])
            s["prev_ibi"], s["prev_beat"], s["prev_flag"] = (
                s["cur_ibi"], s["cur_beat"], s["cur_flag"])
            s["flags"][n - 1] = 1
            s["flags"][n] = 1
            s["cnt"] += n_split - 1
        else:
            self._accept(s, n, failed=1)

    def _average(self, s, n: int, beats_ix: np.ndarray) -> None:
        ibi = np.floor((s["prev_ibi"] + s["cur_ibi"]) / 2)
        if self._acceptable(ibi, s["fifo"].q[1:]):
            s["prev_ibi"] = ibi
            s["prev_beat"] = (
                beats_ix[0] + ibi if n == 1 else s["out_beats"][-1] + ibi
            )
            s["prev_flag"] = self._flag(ibi, s["fifo"].q[:-1])
            s["cur_ibi"] = s["cur_beat"] - s["prev_beat"]
            s["cur_flag"] = self._flag(ibi, s["fifo"].q[1:])
            self._check_limits(s, n)
            s["out_ibis"].append(s["prev_ibi"])
            s["out_beats"].append(s["prev_beat"])
            s["out_flags"].append(s["prev_flag"])
            s["fifo"].push(s["prev_ibi"])
            s["prev_ibi"], s["prev_beat"], s["prev_flag"] = (
                s["cur_ibi"], s["cur_beat"], s["cur_flag"])
            s["flags"][n - 1] = 1
            s["flags"][n] = 1
            s["cnt"] += 1
        else:
            self._accept(s, n, failed=1)

    # --- main --------------------------------------------------------------
    def run(self, beats_ix: np.ndarray):
        """Returns (corrected_beats_ix, original dict, corrected dict)."""
        beats_ix = np.asarray(beats_ix, dtype=float)
        if len(beats_ix) < 3:
            empty = {
                "ibi_ms": np.array([]), "ibi_idx": np.array([]),
                "beat": beats_ix.astype(int), "flag": np.array([]),
                "correction": np.array([], dtype=int),
            }
            return beats_ix.astype(int), empty, empty
        ibis = np.diff(beats_ix)
        beats = beats_ix[1:]

        if self.initial_hr == "auto":
            sd = np.abs(np.diff(ibis))
            w = self.hr_w
            if len(sd) >= w:
                ix = int(np.convolve(sd, np.ones(w) / w, mode="valid").argmin())
            else:
                ix = 0
            first_ibi = float(np.mean(ibis[ix: ix + w]))
        else:
            first_ibi = self.fs * 60.0 / float(self.initial_hr)

        s = {
            "fifo": _Fifo(self.prev_n, first_ibi),
            "failed": _Fifo(self.prev_n - 1),
            "cnt": 0,
            "prev_ibi": 0.0, "prev_beat": 0.0, "prev_flag": None,
            "cur_ibi": 0.0, "cur_beat": 0.0, "cur_flag": None,
            "out_ibis": [], "out_beats": [], "out_flags": [],
            "flags": [0] * len(beats),
        }

        for n in range(len(ibis)):
            s["cur_ibi"] = ibis[n]
            s["cur_beat"] = beats[n]
            if n == 0:
                s["cur_flag"] = self._flag(s["cur_ibi"], s["fifo"].q)
                s["prev_ibi"], s["prev_beat"], s["prev_flag"] = (
                    s["cur_ibi"], s["cur_beat"], s["cur_flag"])
            else:
                s["cur_flag"] = self._flag(s["cur_ibi"], s["fifo"].q[:-1])
                cf, pf = s["cur_flag"], s["prev_flag"]
                if cf == CORRECT:
                    if pf in (CORRECT, LONG):
                        self._accept(s, n)
                    elif pf == SHORT:
                        if n == 1:
                            self._add_prev_current(s, n)
                        elif s["out_ibis"][-1] > s["cur_ibi"]:
                            self._add_prev_current(s, n)
                        else:
                            self._add_secondprev_prev(s, n)
                    elif pf == EXTRA:
                        self._insert(s, n, beats_ix)
                elif cf == SHORT:
                    if pf == CORRECT:
                        self._accept(s, n)
                    elif pf == SHORT:
                        self._add_prev_current(s, n)
                    else:
                        self._average(s, n, beats_ix)
                elif cf == LONG:
                    if pf in (CORRECT, LONG):
                        self._accept(s, n)
                    elif pf == SHORT:
                        self._average(s, n, beats_ix)
                    else:
                        self._insert(s, n, beats_ix)
                else:  # EXTRA
                    if pf == SHORT:
                        self._average(s, n, beats_ix)
                    else:
                        self._insert(s, n, beats_ix)
            if sum(s["failed"].q) >= 3:
                s["fifo"].reset(first_ibi)

        s["out_ibis"].append(s["cur_ibi"])
        s["out_beats"].append(s["cur_beat"])
        s["out_flags"].append(s["cur_flag"])

        flags = np.array(s["flags"], dtype=int)
        original = {
            "ibi_ms": np.round(np.insert(ibis / self.fs * 1000.0, 0, np.nan), 2),
            "ibi_idx": np.insert(ibis, 0, np.nan),
            "beat": np.insert(beats, 0, beats_ix[0]).astype(int),
            "correction": np.insert(flags, 0, 0),
        }
        out_ibis = np.array(s["out_ibis"], dtype=float)
        corrected = {
            "ibi_ms": np.round(
                np.insert(out_ibis / self.fs * 1000.0, 0, np.nan), 2
            ),
            "ibi_idx": np.insert(out_ibis, 0, np.nan),
            "beat": np.insert(
                np.array(s["out_beats"], dtype=float), 0, beats_ix[0]
            ).astype(int),
            "flag": np.insert(np.array(s["out_flags"], dtype=object), 0, None),
        }
        return corrected["beat"].copy(), original, corrected


def correct_interval(beats_ix: np.ndarray, fs: float, **kwargs):
    """Functional entry point mirroring the reference signature."""
    return IntervalCorrector(fs, **kwargs).run(beats_ix)
