"""Classical filter design in pure NumPy (zpk pipeline + bilinear).

All designs return ``(b, a)`` transfer-function coefficients for the
digital filter, normalized frequencies in (0, 1) with 1 = Nyquist — the
same convention the reference's SciPy calls use, so parameterizations
carry over directly (reference: pipeline/ECG.py:43-189, PPG.py:26-128,
EDA.py:33-193).
"""

from __future__ import annotations

import numpy as np


# --- analog prototypes (unit cutoff lowpass, zpk form) ---------------------

def _buttap(n: int):
    k = np.arange(n)
    poles = np.exp(1j * np.pi * (2 * k + n + 1) / (2 * n))
    return np.array([]), poles, 1.0


def _cheb1ap(n: int, rp: float):
    eps = np.sqrt(10 ** (rp / 10.0) - 1.0)
    mu = np.arcsinh(1.0 / eps) / n
    theta = np.pi * (2 * np.arange(n) + 1) / (2 * n)
    poles = -np.sinh(mu) * np.sin(theta) + 1j * np.cosh(mu) * np.cos(theta)
    gain = np.prod(-poles).real
    if n % 2 == 0:
        gain /= np.sqrt(1.0 + eps * eps)
    return np.array([]), poles, gain


def _cheb2ap(n: int, rs: float):
    de = 1.0 / np.sqrt(10 ** (rs / 10.0) - 1.0)
    mu = np.arcsinh(1.0 / de) / n
    theta = np.pi * (2 * np.arange(n) + 1) / (2 * n)
    mask = np.abs(np.cos(theta)) > 1e-12  # odd order: drop zero at infinity
    zeros = 1j / np.cos(theta[mask])
    poles = 1.0 / (-np.sinh(mu) * np.sin(theta) + 1j * np.cosh(mu) * np.cos(theta))
    gain = (np.prod(-poles) / np.prod(-zeros)).real
    return zeros, poles, gain


# --- elliptic prototype via Landen/Jacobi (Orfanidis formulation) ----------

def _ellipk(k: float) -> float:
    """Complete elliptic integral K(k) by arithmetic-geometric mean."""
    a, b = 1.0, np.sqrt(1.0 - k * k)
    while abs(a - b) > 1e-15 * a:
        a, b = (a + b) / 2.0, np.sqrt(a * b)
    return np.pi / (2.0 * a)


def _landen(k: float, tol: float = 1e-15) -> list[float]:
    """Descending Landen sequence k -> 0."""
    ks = []
    while k > tol:
        k = (k / (1.0 + np.sqrt(1.0 - k * k))) ** 2
        ks.append(k)
        if len(ks) > 64:
            break
    return ks


def _cde(u, k: float):
    """Jacobi cd(u*K, k) via backward Landen recursion (u in K-units)."""
    ks = _landen(k)
    w = np.cos(np.asarray(u, dtype=complex) * np.pi / 2.0)
    for kn in reversed(ks):
        w = (1.0 + kn) * w / (1.0 + kn * w * w)
    return w


def _acde(w, k: float):
    """Inverse cd in K-units: u with cd(u*K,k) = w."""
    ks = [k] + _landen(k)
    w = np.asarray(w, dtype=complex)
    for i in range(1, len(ks)):
        w = 2.0 * w / ((1.0 + ks[i]) * (1.0 + np.sqrt((1 - ks[i - 1] * w) *
                                                      (1 + ks[i - 1] * w))))
    u = 2.0 / np.pi * np.arccos(w)
    return u


def _sne(u, k: float):
    """Jacobi sn(u*K, k) via sn(uK) = cd((1-u)K)."""
    return _cde(1.0 - np.asarray(u, dtype=complex), k)


def _asne(w, k: float):
    """Inverse sn in K-units: asne(w) = 1 - acde(w)."""
    return 1.0 - _acde(w, k)


def _ellipdeg(n: int, k1: float) -> float:
    """Degree equation: selectivity k from order n and ripple ratio k1."""
    L = n // 2
    ui = (2.0 * np.arange(1, L + 1) - 1.0) / n
    kp1 = np.sqrt(1.0 - k1 * k1)
    prod = np.prod(np.real(_sne(ui, kp1)))
    kp = kp1 ** n * prod ** 4
    return float(np.sqrt(1.0 - kp * kp))


def _ellipap(n: int, rp: float, rs: float):
    """Elliptic analog lowpass prototype (Orfanidis' construction)."""
    if n == 1:
        eps = np.sqrt(10 ** (rp / 10.0) - 1.0)
        return np.array([]), np.array([-1.0 / eps + 0j]), 1.0 / eps
    eps_p = np.sqrt(10 ** (rp / 10.0) - 1.0)
    eps_s = np.sqrt(10 ** (rs / 10.0) - 1.0)
    k1 = eps_p / eps_s
    k = _ellipdeg(n, k1)
    L = n // 2
    ui = (2.0 * np.arange(1, L + 1) - 1.0) / n
    zeta = np.real(_cde(ui, k))  # zeros of R_N live at 1/(k*zeta)
    zeros = 1j / (k * zeta)
    zeros = np.concatenate([zeros, np.conj(zeros)])
    v0 = -1j * np.asarray(_asne(1j / eps_p, k1)).ravel()[0] / n
    pu = _cde(ui - 1j * v0, k)
    poles = 1j * pu
    poles = np.concatenate([poles, np.conj(poles)])
    if n % 2 == 1:
        p0 = 1j * _cde(1.0 - 1j * v0, k)
        poles = np.append(poles, np.real(p0) + 1j * np.imag(p0))
    gain = (np.prod(-poles) / np.prod(-zeros)).real
    if n % 2 == 0:
        gain /= np.sqrt(1.0 + eps_p * eps_p)
    return zeros, poles, gain


# --- frequency transforms + bilinear (zpk) ---------------------------------

def _lp2lp(z, p, k, wo):
    return z * wo, p * wo, k * wo ** (len(p) - len(z))


def _lp2hp(z, p, k, wo):
    zh = wo / z if len(z) else np.array([])
    ph = wo / p
    zh = np.append(zh, np.zeros(len(p) - len(z)))
    k = k * np.real(np.prod(-z) / np.prod(-p)) if len(z) else \
        k * np.real(1.0 / np.prod(-p))
    return zh, ph, k


def _lp2bp(z, p, k, wo, bw):
    deg = len(p) - len(z)
    zs = z * bw / 2.0
    ps = p * bw / 2.0
    zb = np.concatenate([zs + np.sqrt(zs * zs - wo * wo),
                         zs - np.sqrt(zs * zs - wo * wo)]) if len(z) else np.array([])
    pb = np.concatenate([ps + np.sqrt(ps * ps - wo * wo),
                         ps - np.sqrt(ps * ps - wo * wo)])
    zb = np.append(zb, np.zeros(deg))
    return zb, pb, k * bw ** deg


def _lp2bs(z, p, k, wo, bw):
    deg = len(p) - len(z)
    zs = (bw / 2.0) / z if len(z) else np.array([])
    ps = (bw / 2.0) / p
    zb = np.concatenate([zs + np.sqrt(zs * zs - wo * wo),
                         zs - np.sqrt(zs * zs - wo * wo)]) if len(z) else np.array([])
    pb = np.concatenate([ps + np.sqrt(ps * ps - wo * wo),
                         ps - np.sqrt(ps * ps - wo * wo)])
    zb = np.append(zb, np.full(deg, 1j * wo))
    zb = np.append(zb, np.full(deg, -1j * wo))
    num = np.prod(-z) if len(z) else 1.0
    return zb, pb, k * np.real(num / np.prod(-p))


def _bilinear(z, p, k, fs: float = 2.0):
    fs2 = 2.0 * fs
    zd = (fs2 + z) / (fs2 - z) if len(z) else np.array([])
    pd = (fs2 + p) / (fs2 - p)
    num = np.prod(fs2 - z) if len(z) else 1.0
    kd = k * np.real(num / np.prod(fs2 - p))
    zd = np.append(zd, -np.ones(len(p) - len(z)))
    return zd, pd, kd


def _zpk2tf(z, p, k):
    b = np.real(k * np.poly(z)) if len(z) else np.array([k])
    a = np.real(np.poly(p))
    return b, a


def _design(proto, n, wn, btype):
    wn = np.atleast_1d(np.asarray(wn, dtype=float))
    warped = 4.0 * np.tan(np.pi * wn / 2.0)  # prewarp, fs=2 convention
    z, p, k = proto(n)
    if btype == "lowpass":
        z, p, k = _lp2lp(z, p, k, warped[0])
    elif btype == "highpass":
        z, p, k = _lp2hp(z, p, k, warped[0])
    elif btype == "bandpass":
        wo = np.sqrt(warped[0] * warped[1])
        z, p, k = _lp2bp(z, p, k, wo, warped[1] - warped[0])
    elif btype == "bandstop":
        wo = np.sqrt(warped[0] * warped[1])
        z, p, k = _lp2bs(z, p, k, wo, warped[1] - warped[0])
    else:
        raise ValueError(f"unknown btype {btype}")
    z, p, k = _bilinear(z, p, k)
    return _zpk2tf(z, p, k)


def butter(n: int, wn, btype: str = "lowpass"):
    """Butterworth digital filter (b, a); wn normalized to Nyquist=1."""
    return _design(lambda m: _buttap(m), n, wn, btype)


def cheby1(n: int, rp: float, wn, btype: str = "lowpass"):
    return _design(lambda m: _cheb1ap(m, rp), n, wn, btype)


def cheby2(n: int, rs: float, wn, btype: str = "lowpass"):
    return _design(lambda m: _cheb2ap(m, rs), n, wn, btype)


def ellip(n: int, rp: float, rs: float, wn, btype: str = "lowpass"):
    return _design(lambda m: _ellipap(m, rp, rs), n, wn, btype)


def iirnotch(w0: float, q: float):
    """Second-order IIR notch (RBJ biquad), w0 normalized to Nyquist=1."""
    w = np.pi * w0
    alpha = np.sin(w) / (2.0 * q)
    b = np.array([1.0, -2.0 * np.cos(w), 1.0])
    a = np.array([1.0 + alpha, -2.0 * np.cos(w), 1.0 - alpha])
    return b / a[0], a / a[0]


def _hamming(m: int) -> np.ndarray:
    n = np.arange(m)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * n / (m - 1))


def firwin(numtaps: int, cutoff, pass_zero: bool = True) -> np.ndarray:
    """Windowed-sinc FIR (Hamming), unity gain in the passband center."""
    cutoff = np.atleast_1d(np.asarray(cutoff, dtype=float))
    m = np.arange(numtaps) - (numtaps - 1) / 2.0
    if pass_zero and len(cutoff) == 1:          # lowpass
        h = cutoff[0] * np.sinc(cutoff[0] * m)
        scale_freq = 0.0
    elif not pass_zero and len(cutoff) == 1:    # highpass
        h = np.sinc(m) - cutoff[0] * np.sinc(cutoff[0] * m)
        scale_freq = 1.0
    elif not pass_zero:                          # bandpass
        h = cutoff[1] * np.sinc(cutoff[1] * m) - cutoff[0] * np.sinc(cutoff[0] * m)
        scale_freq = (cutoff[0] + cutoff[1]) / 2.0
    else:                                        # bandstop
        h = (np.sinc(m) - cutoff[1] * np.sinc(cutoff[1] * m)
             + cutoff[0] * np.sinc(cutoff[0] * m))
        scale_freq = 0.0
    h *= _hamming(numtaps)
    c = np.cos(np.pi * m * scale_freq)
    h /= np.sum(c * h)
    return h


def freqz(b, a, n_points: int = 512):
    """Frequency response H(e^{jw}) on w in [0, pi)."""
    w = np.linspace(0, np.pi, n_points, endpoint=False)
    zm1 = np.exp(-1j * w)
    num = np.polynomial.polynomial.polyval(zm1, np.asarray(b))
    den = np.polynomial.polynomial.polyval(zm1, np.asarray(a))
    return w, num / den
