"""Signal filter banks — parity surface for the reference's Filters classes.

All functions are NumPy array->array kernels meant to run inside
``applyInPandas`` per subject (see physioview_spark.functions.spark_kernels).
Zero-phase filtering uses the engine's FFT |H|^2 method (SciPy-free).

Parameter parity (reference):
- ECG: baseline_wander HP 0.05 Hz o2 (pipeline/ECG.py:43-72); muscle_noise
  band-stop 30-100 Hz o2 (:74-111); powerline notch Q=30 (:113-138);
  filter_signal elliptic BP 1-15 Hz rp .15 rs 80 o2 (:140-189) — the
  dashboard default; detector preprocessing butter 5-15 o2 (:685-712),
  elliptic 0.5-50 o2 (:714-730), cheby1 6-18 o4 rp1 (:732-748).
- PPG: baseline_wander HP 0.5 Hz o2 (pipeline/PPG.py:26-50); filter_signal
  cheby2 BP 0.5-10 Hz o4 rs20 + 0.5 s MA (Liang 2018) (:76-128).
- EDA: butter LP 2 Hz o3; elliptic LP 1 Hz o4 rp1 rs40; Gaussian FFT LP;
  FIR LP firwin 2057 taps 0.35 Hz (Kleckner 2017) (pipeline/EDA.py:33-193).

Note: the reference passes ``w0 = 2*pi*f/fs`` to scipy's iirnotch, which
interprets w0 as a Nyquist-normalized frequency — notching ~2πf/fs·(fs/2)
instead of f. This engine notches the *requested* frequency (documented
deviation).
"""

from __future__ import annotations

import numpy as np

from physioview_spark.dsp import (
    butter, cheby1, cheby2, ellip, filtfilt_fft, firwin, iirnotch,
    moving_average,
)


class ECGFilters:
    def __init__(self, fs: float, pl_freq: float = 60.0):
        self.fs = fs
        self.pl_freq = pl_freq

    def baseline_wander(self, x: np.ndarray, cutoff: float = 0.05,
                        order: int = 2) -> np.ndarray:
        b, a = butter(order, cutoff / (self.fs / 2), "highpass")
        return filtfilt_fft(b, a, x)

    def muscle_noise(self, x: np.ndarray, lowcut: float = 30.0,
                     highcut: float = 100.0, order: int = 2) -> np.ndarray:
        nyq = self.fs / 2
        b, a = butter(order, [lowcut / nyq, highcut / nyq], "bandstop")
        return filtfilt_fft(b, a, x)

    def powerline_interference(self, x: np.ndarray, q: float = 30.0) -> np.ndarray:
        b, a = iirnotch(self.pl_freq / (self.fs / 2), q)
        return filtfilt_fft(b, a, x)

    def filter_signal(self, x: np.ndarray, lowcut: float = 1.0,
                      highcut: float = 15.0, rp: float = 0.15,
                      rs: float = 80.0, order: int = 2) -> np.ndarray:
        """Dashboard-default elliptic band-pass."""
        nyq = self.fs / 2
        b, a = ellip(order, rp, rs, [lowcut / nyq, highcut / nyq], "bandpass")
        return filtfilt_fft(b, a, x)

    # detector preprocessing filters
    def pan_bandpass(self, x: np.ndarray) -> np.ndarray:
        nyq = self.fs / 2
        b, a = butter(2, [5.0 / nyq, 15.0 / nyq], "bandpass")
        return filtfilt_fft(b, a, x)

    def nabian_elliptic(self, x: np.ndarray) -> np.ndarray:
        nyq = self.fs / 2
        b, a = ellip(2, 0.5, 40.0, [0.5 / nyq, 50.0 / nyq], "bandpass")
        return filtfilt_fft(b, a, x)

    def manikandan_cheby1(self, x: np.ndarray) -> np.ndarray:
        nyq = self.fs / 2
        b, a = cheby1(4, 1.0, [6.0 / nyq, 18.0 / nyq], "bandpass")
        return filtfilt_fft(b, a, x)


class PPGFilters:
    def __init__(self, fs: float):
        self.fs = fs

    def baseline_wander(self, x: np.ndarray, cutoff: float = 0.5,
                        order: int = 2) -> np.ndarray:
        b, a = butter(order, cutoff / (self.fs / 2), "highpass")
        return filtfilt_fft(b, a, x)

    def moving_average(self, x: np.ndarray, window: int) -> np.ndarray:
        return moving_average(x, max(int(window), 1), mode="same")

    def filter_signal(self, x: np.ndarray, lowcut: float = 0.5,
                      highcut: float = 10.0, order: int = 4,
                      window_len: float = 0.5) -> np.ndarray:
        """Liang 2018: Cheby2 band-pass + 0.5 s moving-average smoothing."""
        nyq = self.fs / 2
        b, a = cheby2(order, 20.0, [lowcut / nyq, highcut / nyq], "bandpass")
        y = filtfilt_fft(b, a, x)
        return self.moving_average(y, int(self.fs * window_len))

    def erma_bandpass(self, x: np.ndarray) -> np.ndarray:
        nyq = self.fs / 2
        b, a = butter(2, [0.5 / nyq, 8.0 / nyq], "bandpass")
        return filtfilt_fft(b, a, x)


class EDAFilters:
    def __init__(self, fs: float):
        self.fs = fs

    def lowpass_butter(self, x: np.ndarray, cutoff: float = 2.0,
                       order: int = 3) -> np.ndarray:
        b, a = butter(order, cutoff / (self.fs / 2), "lowpass")
        return filtfilt_fft(b, a, x)

    def lowpass_elliptic(self, x: np.ndarray, cutoff: float = 1.0,
                         order: int = 4, rp: float = 1.0,
                         rs: float = 40.0) -> np.ndarray:
        b, a = ellip(order, rp, rs, cutoff / (self.fs / 2), "lowpass")
        return filtfilt_fft(b, a, x)

    def lowpass_gaussian(self, x: np.ndarray, cutoff: float = 1.0) -> np.ndarray:
        """FFT-domain Gaussian low-pass (reference: pipeline/EDA.py:95-133)."""
        x = np.asarray(x, dtype=float)
        n = len(x)
        freqs = np.fft.fftfreq(n, d=1.0 / self.fs)
        response = np.exp(-0.5 * (freqs / cutoff) ** 2)
        return np.real(np.fft.ifft(np.fft.fft(x) * response))

    def filter_signal(self, x: np.ndarray, cutoff: float = 0.35,
                      filter_length: int = 2057) -> np.ndarray:
        """Kleckner 2017 FIR low-pass — the dashboard default for EDA."""
        numtaps = min(filter_length, max(3, 2 * len(x) - 3))
        if numtaps % 2 == 0:
            numtaps -= 1
        h = firwin(numtaps, cutoff / (self.fs / 2))
        return filtfilt_fft(h, [1.0], x)
