"""Derivative-free minimization (pure NumPy) for MLE/MSE fitting.

The engine needs a small, dependable optimizer for maximum-likelihood and
maximum-spacing estimation inside pandas-UDF batches. Nelder-Mead with
adaptive coefficients (Gao & Han 2012) is robust to the noisy, cliff-edged
penalized likelihood surfaces distribution fitting produces.
"""

from __future__ import annotations

import numpy as np


def nelder_mead(
    func,
    x0,
    maxiter: int | None = None,
    xatol: float = 1e-6,
    fatol: float = 1e-6,
    initial_step: float = 0.1,
):
    """Minimize ``func(x) -> float`` starting at ``x0``.

    Returns (x_best, f_best, converged).
    """
    x0 = np.asarray(x0, dtype=np.float64).ravel()
    n = x0.size
    if maxiter is None:
        maxiter = 200 * n

    # Adaptive coefficients for higher dimensions
    rho, chi, psi, sigma = 1.0, 1.0 + 2.0 / n, 0.75 - 0.5 / n, 1.0 - 1.0 / n

    sim = np.empty((n + 1, n), dtype=np.float64)
    sim[0] = x0
    for k in range(n):
        y = x0.copy()
        if y[k] != 0.0:
            y[k] = y[k] * (1.0 + initial_step)
        else:
            y[k] = initial_step * 0.25
        sim[k + 1] = y

    def _safe(x):
        v = func(x)
        if not np.isfinite(v):
            return 1e308
        return float(v)

    fsim = np.array([_safe(s) for s in sim])
    order = np.argsort(fsim, kind="stable")
    sim, fsim = sim[order], fsim[order]

    it = 0
    while it < maxiter:
        it += 1
        if (
            np.max(np.abs(sim[1:] - sim[0])) <= xatol
            and np.max(np.abs(fsim[1:] - fsim[0])) <= fatol
        ):
            break
        xbar = np.mean(sim[:-1], axis=0)
        xr = xbar + rho * (xbar - sim[-1])
        fr = _safe(xr)
        if fr < fsim[0]:
            xe = xbar + rho * chi * (xbar - sim[-1])
            fe = _safe(xe)
            if fe < fr:
                sim[-1], fsim[-1] = xe, fe
            else:
                sim[-1], fsim[-1] = xr, fr
        elif fr < fsim[-2]:
            sim[-1], fsim[-1] = xr, fr
        else:
            if fr < fsim[-1]:
                xc = xbar + psi * rho * (xbar - sim[-1])
                fc = _safe(xc)
                if fc <= fr:
                    sim[-1], fsim[-1] = xc, fc
                else:
                    for j in range(1, n + 1):
                        sim[j] = sim[0] + sigma * (sim[j] - sim[0])
                        fsim[j] = _safe(sim[j])
            else:
                xcc = xbar - psi * (xbar - sim[-1])
                fcc = _safe(xcc)
                if fcc < fsim[-1]:
                    sim[-1], fsim[-1] = xcc, fcc
                else:
                    for j in range(1, n + 1):
                        sim[j] = sim[0] + sigma * (sim[j] - sim[0])
                        fsim[j] = _safe(sim[j])
        order = np.argsort(fsim, kind="stable")
        sim, fsim = sim[order], fsim[order]

    converged = it < maxiter
    return sim[0], fsim[0], converged


def minimize_scalar(func, lo: float, hi: float, maxiter: int = 100, tol: float = 1e-8):
    """Golden-section minimization on [lo, hi]. Returns (x, f(x))."""
    gr = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = float(lo), float(hi)
    c = b - gr * (b - a)
    d = a + gr * (b - a)
    fc, fd = func(c), func(d)
    for _ in range(maxiter):
        if abs(b - a) < tol * (abs(a) + abs(b) + 1e-12):
            break
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = func(c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = func(d)
    x = c if fc < fd else d
    return x, min(fc, fd)
