"""Cubic spline interpolation evaluated inside JAX graphs.

Stands in for the reference's GCVSpline resampling/prescription
(reference MocoUtilities.h:174, PositionMotion's spline functions,
Components/PositionMotion.h). Coefficients are precomputed with numpy
(natural boundary conditions); evaluation is a vectorized piecewise cubic
with `searchsorted`, so q(t), u(t) = q'(t), udot(t) = q''(t) are available
as pure jittable functions of (traced) time.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class CubicSpline:
    """Natural cubic spline through (x, y) with analytic derivatives."""

    def __init__(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n = len(x)
        assert n >= 2 and y.shape[0] == n
        h = np.diff(x)
        if n == 2:
            M = np.zeros((2,) + y.shape[1:])
        else:
            # solve tridiagonal system for second derivatives (natural BCs)
            A = np.zeros((n, n))
            rhs = np.zeros_like(y)
            A[0, 0] = 1.0
            A[-1, -1] = 1.0
            for i in range(1, n - 1):
                A[i, i - 1] = h[i - 1]
                A[i, i] = 2 * (h[i - 1] + h[i])
                A[i, i + 1] = h[i]
                rhs[i] = 6 * ((y[i + 1] - y[i]) / h[i] -
                              (y[i] - y[i - 1]) / h[i - 1])
            M = np.linalg.solve(A, rhs.reshape(n, -1)).reshape(y.shape)
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.M = jnp.asarray(M)
        self.h = jnp.asarray(h)

    def _locate(self, t):
        i = jnp.clip(jnp.searchsorted(self.x, t, side="right") - 1, 0,
                     len(self.x) - 2)
        return i

    def __call__(self, t):
        i = self._locate(t)
        x0, x1 = self.x[i], self.x[i + 1]
        h = x1 - x0
        A = (x1 - t) / h
        B = (t - x0) / h
        y0, y1 = self.y[i], self.y[i + 1]
        M0, M1 = self.M[i], self.M[i + 1]
        return (A * y0 + B * y1 +
                ((A ** 3 - A) * M0 + (B ** 3 - B) * M1) * (h * h) / 6.0)

    def derivative(self, t):
        i = self._locate(t)
        x0, x1 = self.x[i], self.x[i + 1]
        h = x1 - x0
        A = (x1 - t) / h
        B = (t - x0) / h
        y0, y1 = self.y[i], self.y[i + 1]
        M0, M1 = self.M[i], self.M[i + 1]
        return ((y1 - y0) / h +
                (-(3 * A ** 2 - 1) * M0 + (3 * B ** 2 - 1) * M1) * h / 6.0)

    def second_derivative(self, t):
        i = self._locate(t)
        x0, x1 = self.x[i], self.x[i + 1]
        h = x1 - x0
        A = (x1 - t) / h
        B = (t - x0) / h
        return A * self.M[i] + B * self.M[i + 1]


def _natural_quintic_coeffs(x, Y):
    """Natural interpolating quintic spline coefficients (Woltring GCVSPL
    with half-order m=3 and zero error variance — the reference's
    GCVSpline(5) in interpolating mode, used by PositionMotion,
    Components/PositionMotion.h). The interpolant minimizes the
    third-derivative energy ∫(f''')² over all interpolants, which the
    penalty-free B-spline formulation solves exactly via the KKT system

        [Ω  Bᵀ] [c]   [0]
        [B  0 ] [μ] = [y]

    with B the quintic B-spline collocation matrix on the data sites
    (single interior knots => all quintic splines with breaks at the data)
    and Ω_ij = ∫ B_i''' B_j'''.

    Returns (breakpoints, (6, nseg, d) PPoly-style coefficients)."""
    from scipy.interpolate import BSpline, PPoly

    n = len(x)
    # the minimum-∫(f''')² interpolant is invariant under affine time
    # scaling; solve in s = (x - x0)/h_mean so the KKT system is well
    # conditioned (raw Ω entries scale like h^-5), then map back
    x_raw = np.asarray(x, dtype=np.float64)
    h_mean = float(np.mean(np.diff(x_raw)))
    x0 = float(x_raw[0])
    x = (x_raw - x0) / h_mean
    t = np.r_[[x[0]] * 6, x[1:-1], [x[-1]] * 6]
    nb = n + 4
    B = BSpline.design_matrix(x, t, 5).toarray()  # (n, nb)
    # Gram matrix of third derivatives: f''' is piecewise quadratic, so
    # 3-point Gauss-Legendre per interval is exact
    gauss_x = np.array([-np.sqrt(3.0 / 5.0), 0.0, np.sqrt(3.0 / 5.0)])
    gauss_w = np.array([5.0 / 9.0, 8.0 / 9.0, 5.0 / 9.0])
    a = x[:-1]
    b = x[1:]
    h2 = 0.5 * (b - a)  # (n-1,)
    pts = (0.5 * (a + b)[:, None] + h2[:, None] * gauss_x[None, :]).ravel()
    w = (h2[:, None] * gauss_w[None, :]).ravel()
    D3 = BSpline(t, np.eye(nb), 5)(pts, nu=3)  # (npts, nb), all basis
    Om = (D3 * w[:, None]).T @ D3
    K = np.zeros((nb + n, nb + n))
    K[:nb, :nb] = Om
    K[:nb, nb:] = B.T
    K[nb:, :nb] = B
    rhs = np.zeros((nb + n, Y.shape[1]))
    rhs[nb:] = Y
    sol = np.linalg.solve(K, rhs)
    c = sol[:nb]
    cols = []
    for j in range(Y.shape[1]):
        pp = PPoly.from_spline(BSpline(t, c[:, j], 5))
        cols.append((pp.x, pp.c))
    xb = cols[0][0]
    C = np.stack([cc for _, cc in cols], axis=-1)  # (6, nseg, d)
    # map back to raw time: t_raw - t_i = h_mean * (s - s_i), so the
    # coefficient of (t_raw - t_i)^e is c_e / h_mean^e (c ordered by
    # descending power: index m has power k - m)
    k = C.shape[0] - 1
    for m in range(C.shape[0]):
        C[m] /= h_mean ** (k - m)
    xb = x0 + h_mean * xb
    return xb, C


def _bspline_deriv_design(pts, t, k, nu):
    """Dense design matrix of the nu-th derivative of the B-spline basis
    of degree k with knots t, evaluated at pts."""
    from scipy.interpolate import BSpline

    nb = len(t) - k - 1
    out = np.zeros((len(pts), nb))
    c = np.zeros(nb)
    for i in range(nb):
        c[:] = 0.0
        c[i] = 1.0
        out[:, i] = BSpline(t, c, k)(pts, nu=nu)
    return out


def quintic_resample(x, Y, new_x):
    """Host-side vectorized resample of a table ``Y`` (n, d) from grid ``x``
    onto ``new_x`` using the natural quintic interpolant — the analogue of
    the reference's GCVSpline(degree=5) resampling in
    MocoTrajectory::resample (reference Moco/Moco/MocoTrajectory.h:235,
    which builds a GCVSplineSet of degree min(5, n-1) over each column).
    Falls back to the highest odd degree the table supports for short
    tables, matching the reference's degree clamp."""
    from scipy.interpolate import PPoly, make_interp_spline

    x = np.asarray(x, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    new_x = np.asarray(new_x, dtype=np.float64)
    if Y.ndim == 1:
        Y = Y[:, None]
    if Y.shape[1] == 0:
        return np.zeros((len(new_x), 0))
    if len(x) == 1:
        return np.repeat(Y, len(new_x), axis=0)
    # evaluation clamped to the data range (the reference errors on
    # out-of-range resample times; we clamp, callers pre-check ranges)
    tq = np.clip(new_x, x[0], x[-1])
    if len(x) > 5:
        xb, C = _natural_quintic_coeffs(x, Y)
        return np.stack([PPoly(C[:, :, j], xb)(tq)
                         for j in range(Y.shape[1])], axis=1)
    k = max(1, min(3, len(x) - 1))
    return np.stack([make_interp_spline(x, Y[:, j], k=k)(tq)
                     for j in range(Y.shape[1])], axis=1)


class QuinticSpline:
    """Interpolating quintic spline matching the reference's GCVSpline of
    degree 5 with zero smoothing (Woltring's natural quintic — minimum
    ∫(f''')² interpolant), used by PositionMotion's coordinate functions
    (Components/PositionMotion.h). Coefficients precomputed with
    numpy/scipy; evaluation is piecewise-polynomial Horner inside JAX,
    with analytic first/second derivatives."""

    def __init__(self, x, y):
        from scipy.interpolate import PPoly, make_interp_spline

        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        squeeze = y.ndim == 1
        Y = y[:, None] if squeeze else y
        if len(x) > 5:
            xb, C = _natural_quintic_coeffs(x, Y)
        else:
            k = max(1, len(x) - 1)
            cols = []
            for j in range(Y.shape[1]):
                pp = PPoly.from_spline(make_interp_spline(x, Y[:, j], k=k))
                cols.append((pp.x, pp.c))
            xb = cols[0][0]
            C = np.stack([c for _, c in cols], axis=-1)  # (k+1, nseg, d)
        self.squeeze = squeeze
        self.xb = jnp.asarray(xb)
        self.C = jnp.asarray(C)
        self.order = C.shape[0]

    def _eval(self, t, deriv):
        i = jnp.clip(jnp.searchsorted(self.xb, t, side="right") - 1, 0,
                     self.C.shape[1] - 1)
        dt = t - self.xb[i]
        c = self.C[:, i]  # (k+1, d)
        # derivative of sum c[m] dt^(k-m): multiply by falling factorials
        k = self.order - 1
        out = jnp.zeros(c.shape[-1], dtype=c.dtype)
        for m in range(self.order):
            e = k - m  # power of dt
            if e - deriv < 0:
                continue
            fac = 1.0
            for r in range(deriv):
                fac *= (e - r)
            out = out + c[m] * fac * dt ** (e - deriv)
        return out[0] if self.squeeze else out

    def __call__(self, t):
        return self._eval(t, 0)

    def derivative(self, t):
        return self._eval(t, 1)

    def second_derivative(self, t):
        return self._eval(t, 2)
