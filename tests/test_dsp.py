"""DSP layer: design specs verified via frequency response, kernels vs
brute force."""

from __future__ import annotations

import numpy as np
import pytest

from physioview_spark.dsp import (
    butter, cheby1, cheby2, ellip, filtfilt_fft, firwin, iirnotch,
    lfilter, lfilter_fft, moving_average, sliding_max, hilbert,
)
from physioview_spark.dsp.design import freqz, _ellipdeg


def _mag(b, a, n=4096):
    w, h = freqz(b, a, n)
    return w / np.pi, np.abs(h)


def test_butter_lowpass_spec():
    b, a = butter(4, 0.2)
    f, m = _mag(b, a)
    assert abs(m[0] - 1.0) < 1e-9
    assert abs(np.interp(0.2, f, m) - 1 / np.sqrt(2)) < 1e-3
    assert np.interp(0.6, f, m) < 5e-3


def test_butter_bandstop_spec():
    b, a = butter(2, [30 / 512, 100 / 512], "bandstop")
    f, m = _mag(b, a)
    assert abs(m[0] - 1.0) < 1e-6
    assert np.interp(65 / 512, f, m) < 0.1
    assert np.interp(240 / 512, f, m) > 0.98


def test_cheby_specs():
    b, a = cheby1(4, 0.5, [6 / 128, 18 / 128], "bandpass")
    f, m = _mag(b, a)
    assert np.interp(12 / 128, f, m) > 10 ** (-0.5 / 20) - 1e-3
    assert np.interp(1 / 128, f, m) < 1e-3
    b, a = cheby2(5, 40, 0.3)
    f, m = _mag(b, a)
    assert m[f > 0.45].max() <= 0.01 + 1e-6


def test_elliptic_equiripple():
    b, a = ellip(5, 1.0, 60, 0.3)
    f, m = _mag(b, a, 8192)
    pb = m[f <= 0.2999]
    assert pb.min() >= 10 ** (-1 / 20) - 1e-3
    assert pb.max() <= 1.0 + 1e-6
    k = _ellipdeg(5, np.sqrt(10 ** 0.1 - 1) / np.sqrt(10 ** 6 - 1))
    sb = m[f >= 0.3 / k * 1.001]
    assert sb.max() <= 10 ** (-60 / 20) * 1.01


def test_notch_spec():
    b, a = iirnotch(60 / 250, 30)
    f, m = _mag(b, a, 8192)
    assert np.interp(60 / 250, f, m) < 0.01
    assert np.interp(50 / 250, f, m) > 0.98
    assert abs(m[0] - 1.0) < 1e-9


def test_firwin_lowpass():
    h = firwin(101, 0.2)
    m = np.abs(np.fft.rfft(h, 4096))
    f = np.linspace(0, 1, len(m))
    assert abs(np.interp(0.0, f, m) - 1.0) < 1e-6
    assert np.interp(0.5, f, m) < 1e-3


def test_filtfilt_zero_phase():
    b, a = butter(4, 0.2)
    x = np.zeros(1001)
    x[500] = 1.0
    y = filtfilt_fft(b, a, x)
    assert np.argmax(y) == 500
    assert abs(y[0]) < 1e-12


def test_lfilter_fft_matches_recurrence():
    b, a = butter(3, 0.15)
    x = np.random.RandomState(0).randn(400)
    assert np.allclose(lfilter(b, a, x), lfilter_fft(b, a, x), atol=1e-10)


def test_sliding_max_brute():
    x = np.random.RandomState(1).randn(300)
    for w in [2, 3, 5, 8, 41, 100, 300]:
        hw = (w - 1) // 2
        brute = np.array(
            [x[max(0, i - hw): min(len(x), i - hw + w)].max() for i in range(len(x))]
        )
        assert np.allclose(sliding_max(x, w), brute)


def test_moving_average_center():
    x = np.random.RandomState(2).randn(200)
    conv = np.convolve(x, np.ones(7) / 7, mode="same")
    assert np.allclose(moving_average(x, 7)[3:-3], conv[3:-3])


def test_hilbert_envelope():
    t = np.arange(4096) / 512
    env = np.abs(hilbert(np.sin(2 * np.pi * 10 * t)))
    assert env[100:-100].min() > 0.99
    assert env[100:-100].max() < 1.01
