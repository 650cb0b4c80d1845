"""cvxEDA decomposition (Greco et al. 2016) as a pure-NumPy sparse QP.

Model parity with the reference ``_cvxEDA`` (reference:
physioview/pipeline/EDA.py:520-688): the EDA signal is modeled as
``y = M q + B l + C d + e`` where

- ``M q`` is the phasic component — the sparse nonnegative SMNA driver
  ``p = A q`` pushed through the Bateman bi-exponential smoother
  (A/M are the ARMA-discretized Bateman model, 3-tap banded matrices),
- ``B l`` is the tonic spline (order-1 B-spline bumps every
  ``delta_knot`` seconds),
- ``C d`` is a linear drift term,

and the decomposition solves

    min 0.5*||M q + B l + C d - y||^2 + alpha*1'(A q) + 0.5*gamma*||l||^2
    s.t. A q >= 0.

The reference hands this QP to cvxopt. Here it is solved with ADMM on
the splitting ``z = A q, z >= 0`` (the alpha*1'p term moves onto z, so
the z-update is a nonnegative soft shift), with the x-update's SPD
system solved by Jacobi-preconditioned conjugate gradients. Every
operator application is a bounded convolution or 3-tap banded stencil —
O(n log n) worst case, no sparse-matrix library, no sequential
recurrences — so the kernel vectorizes cleanly inside Arrow batches on
executors.
"""

from __future__ import annotations

import numpy as np

from physioview_spark.dsp import fftconvolve


def _bateman_arma(fs: float, tau0: float, tau1: float):
    """Bilinear-transform ARMA coefficients of the Bateman function
    (reference: pipeline/EDA.py:603-610)."""
    delta = 1.0 / fs
    a1 = 1.0 / min(tau1, tau0)  # a1 > a0
    a0 = 1.0 / max(tau1, tau0)
    ar = np.array([
        (a1 * delta + 2.0) * (a0 * delta + 2.0),
        2.0 * a1 * a0 * delta ** 2 - 8.0,
        (a1 * delta - 2.0) * (a0 * delta - 2.0),
    ]) / ((a1 - a0) * delta ** 2)
    ma = np.array([1.0, 2.0, 1.0])
    return ar, ma


def _band_apply(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Rows 2..n-1 of the banded model matrix: out[i] = c0*q[i] +
    c1*q[i-1] + c2*q[i-2]; rows 0,1 are zero (reference builds A/M with
    row indices starting at 2)."""
    out = np.zeros_like(q)
    out[2:] = coef[0] * q[2:] + coef[1] * q[1:-1] + coef[2] * q[:-2]
    return out


def _band_apply_t(coef: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Adjoint of ``_band_apply``."""
    out = np.zeros_like(v)
    vv = v[2:]
    out[2:] += coef[0] * vv
    out[1:-1] += coef[1] * vv
    out[:-2] += coef[2] * vv
    return out


def _spline_basis(n: int, dks: int):
    """Order-1 B-spline bump (triangle convolved with itself, peak 1)
    and its knot positions (reference: pipeline/EDA.py:612-627)."""
    dks = max(int(dks), 1)
    tri = np.r_[np.arange(1.0, dks), np.arange(float(dks), 0.0, -1.0)]
    spl = np.convolve(tri, tri, "full")
    spl /= spl.max()
    knots = np.arange(0, n, dks)
    return spl, knots


def _conv_same(x: np.ndarray, h: np.ndarray) -> np.ndarray:
    """'same'-mode convolution that ALWAYS returns len(x) samples.

    np.convolve(mode='same') returns max(len(x), len(h)) values, so a
    signal shorter than the kernel (any EDA segment under ~4*delta_knot
    seconds vs the spline bump) would come back kernel-sized and break
    the model's shapes. Slice the full convolution explicitly instead.
    """
    if len(x) * len(h) > 1 << 21:
        return fftconvolve(x, h, mode="same")
    start = (len(h) - 1) // 2
    return np.convolve(x, h, mode="full")[start:start + len(x)]


class _Model:
    """Bundles the model operators for one signal length/rate."""

    def __init__(self, n: int, fs: float, tau0: float, tau1: float,
                 delta_knot: float):
        self.n = n
        self.ar, self.ma = _bateman_arma(fs, tau0, tau1)
        self.spl, self.knots = _spline_basis(n, round(delta_knot * fs))
        self.n_b = len(self.knots)
        self.c_lin = np.arange(1.0, n + 1.0) / n  # drift regressor

    # --- banded ARMA blocks -------------------------------------------
    def A(self, q):
        return _band_apply(self.ar, q)

    def At(self, v):
        return _band_apply_t(self.ar, v)

    def M(self, q):
        return _band_apply(self.ma, q)

    def Mt(self, v):
        return _band_apply_t(self.ma, v)

    # --- spline block (symmetric bump: correlate == convolve) ---------
    def B(self, l):
        imp = np.zeros(self.n)
        imp[self.knots] = l
        return _conv_same(imp, self.spl)

    def Bt(self, v):
        return _conv_same(v, self.spl)[self.knots]

    # --- drift block ---------------------------------------------------
    def C(self, d):
        return d[0] + d[1] * self.c_lin

    def Ct(self, v):
        return np.array([v.sum(), self.c_lin @ v])


def _jacobi_diag(m: _Model, rho: float, gamma: float) -> np.ndarray:
    """Exact diagonal of the x-step normal matrix, for preconditioning."""
    n = m.n
    dq = np.zeros(n)
    for coef, w in ((m.ma, 1.0), (m.ar, rho)):
        dq[2:] += w * coef[0] ** 2
        dq[1:-1] += w * coef[1] ** 2
        dq[:-2] += w * coef[2] ** 2
    dl = _conv_same(np.ones(n), m.spl ** 2)[m.knots] + gamma
    dd = np.array([float(n), float(m.c_lin @ m.c_lin)])
    out = np.concatenate([dq, dl, dd])
    return np.maximum(out, 1e-12)


def _cg(matvec, b, x0, m_inv, tol, max_iter):
    """Preconditioned conjugate gradients on an SPD operator.

    Returns ``(x, matvecs)`` — the operator-application count is the
    unit of the deterministic work budget in :func:`cvxeda_decompose`
    (every matvec costs the same O(n log n) on a fixed-length chunk,
    so the count is a host-independent wall-time proxy)."""
    x = x0.copy()
    r = b - matvec(x)
    used = 1
    z = m_inv * r
    p = z.copy()
    rz = r @ z
    b_norm = max(np.linalg.norm(b), 1e-30)
    for _ in range(max_iter):
        if np.linalg.norm(r) <= tol * b_norm:
            break
        hp = matvec(p)
        used += 1
        denom = p @ hp
        if denom <= 0:  # numerically exhausted
            break
        a = rz / denom
        x += a * p
        r -= a * hp
        z = m_inv * r
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return x, used


def cvxeda_decompose(
    signal: np.ndarray,
    fs: float,
    tau0: float = 2.0,
    tau1: float = 0.7,
    delta_knot: float = 10.0,
    alpha: float = 8e-4,
    gamma: float = 1e-2,
    max_iter: int = 400,
    eps_abs: float = 1e-8,
    eps_rel: float = 1e-6,
    max_matvecs: int | None = None,
) -> dict:
    """Solve the cvxEDA QP; returns the same septet as the reference
    (phasic r, driver p, tonic t, spline coefs l, drift d, residual e,
    objective) keyed by name. Model parameters mirror reference
    pipeline/EDA.py:520-533.

    Convergence is deliberately TIGHTER than a typical ADMM default
    (eps_rel 1e-6, not 1e-3): with a loose tolerance the stopping test
    flips at different iterations on different hosts (SIMD dispatch
    perturbs the residual norms in the last ulp), scattering the
    returned optimum by O(eps_rel * scale) ~ 1e-3 — enough to move a
    4-decimal-rounded downstream aggregate and break the pinned-fixture
    oracle across machines (observed: mean tonic 3.7555 vs 3.7557 for
    identical code on two hosts). At 1e-6 the cross-host scatter sits
    ~2 orders below the rounding grid. Cost: ~2x iterations on signals
    minutes long — noise next to the Arrow transfer around it.

    ``max_matvecs`` is the straggler ceiling (VERDICT r09 item 2): the
    per-chunk ADMM/CG work varies ~100x with signal content, so a
    cohort of halo-chunks is wall-bounded by its slowest chunk unless
    the work is capped. The budget counts CG operator applications —
    deterministic, host-independent (a wall-clock ceiling would make
    the returned optimum machine-dependent and break pinned-fixture
    parity) — and a run that exhausts it returns the best iterate
    FLAGGED (``capped=True``) with its residuals recorded, never a
    silently wrong answer. ``None`` (default) preserves the exact
    historical iterate sequence bit-for-bit. The result dict always
    carries ``capped`` (budget exhausted — THE quarantine flag),
    ``converged`` (formal stopping test satisfied; under these
    deliberately tight tolerances a natural max_iter exit commonly
    reports False while the iterate is well inside every downstream
    parity contract — pre-existing behavior, not an error state),
    ``rel_residual`` (max of the scale-free primal/dual residual
    ratios at exit; <= 1.0 iff converged) and ``matvecs`` (work
    actually spent)."""
    if max_matvecs is not None and max_matvecs < 1:
        # A non-positive budget would break out before the first CG call
        # and hand back the zero initialization as the "best iterate" —
        # flagged capped, but never a real iterate. Reject it up front
        # (mirrors the max_domains >= 1 guard in sampling.temperature_weights).
        raise ValueError(
            f"max_matvecs must be >= 1 or None (uncapped), got {max_matvecs}")
    y = np.asarray(signal, dtype=float)
    n = len(y)
    if n < 8:
        raise ValueError("cvxEDA needs at least 8 samples")
    m = _Model(n, fs, tau0, tau1, delta_knot)
    nb = m.n_b

    def split(x):
        return x[:n], x[n:n + nb], x[n + nb:]

    def matvec_factory(rho):
        def matvec(x):
            q, l, d = split(x)
            w = m.M(q) + m.B(l) + m.C(d)
            return np.concatenate([
                m.Mt(w) + rho * m.At(m.A(q)),
                m.Bt(w) + gamma * l,
                m.Ct(w),
            ])
        return matvec

    rho = 1.0
    x = np.zeros(n + nb + 2)
    z = np.zeros(n)
    u = np.zeros(n)
    m_inv = 1.0 / _jacobi_diag(m, rho, gamma)
    matvec = matvec_factory(rho)
    bty = np.concatenate([m.Mt(y), m.Bt(y), m.Ct(y)])
    sqrt_n = np.sqrt(n)

    used = 0
    converged = False
    capped = False
    r_prim = r_dual = np.inf
    eps_p = eps_d = sqrt_n * eps_abs
    for it in range(max_iter):
        if max_matvecs is not None and used >= max_matvecs:
            capped = True
            it -= 1  # budget spent before this iteration started
            break
        rhs = bty.copy()
        rhs[:n] += rho * m.At(z - u)
        cg_tol = 1e-10 if it < 2 else 1e-9
        cg_cap = 400 if it < 2 else 160
        if max_matvecs is not None:
            # each _cg call costs >= 1 matvec; the cap keeps the
            # overshoot bounded by a single capped call
            cg_cap = min(cg_cap, max(max_matvecs - used, 1))
        x, cg_used = _cg(matvec, rhs, x, m_inv, cg_tol, cg_cap)
        used += cg_used
        q, l, d = split(x)
        aq = m.A(q)
        z_old = z
        z = np.maximum(0.0, aq + u - alpha / rho)
        u = u + aq - z

        r_prim = np.linalg.norm(aq - z)
        r_dual = rho * np.linalg.norm(m.At(z - z_old))
        eps_p = sqrt_n * eps_abs + eps_rel * max(
            np.linalg.norm(aq), np.linalg.norm(z))
        eps_d = sqrt_n * eps_abs + eps_rel * rho * np.linalg.norm(m.At(u))
        if r_prim <= eps_p and r_dual <= eps_d:
            converged = True
            break
        # residual balancing keeps the splitting well-scaled despite the
        # O(1/delta^2) magnitude of the AR coefficients
        if r_prim > 10.0 * r_dual:
            rho *= 2.0
            u /= 2.0
        elif r_dual > 10.0 * r_prim:
            rho /= 2.0
            u *= 2.0
        else:
            continue
        m_inv = 1.0 / _jacobi_diag(m, rho, gamma)
        matvec = matvec_factory(rho)

    q, l, d = split(x)
    r = m.M(q)
    p = m.A(q)
    t = m.B(l) + m.C(d)
    e = y - r - t
    obj = (0.5 * e @ e + alpha * p.sum() + 0.5 * gamma * l @ l)
    rel_residual = float(max(r_prim / max(eps_p, 1e-30),
                             r_dual / max(eps_d, 1e-30)))
    return {"phasic": r, "driver": p, "tonic": t, "l": l, "d": d,
            "e": e, "obj": float(obj), "iterations": it + 1,
            "converged": converged, "capped": capped,
            "rel_residual": rel_residual, "matvecs": used}
