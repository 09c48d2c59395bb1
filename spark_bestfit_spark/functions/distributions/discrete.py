"""Discrete distribution implementations (scipy-compatible conventions).

Params are ``(*shapes, loc)``. Per-distribution MLE initialization and
bounds follow the same strategy the reference hand-tunes for scipy discrete
distributions (/root/reference/src/spark_bestfit/distributions.py:372-550):
method-of-moments starting points and integer rounding for count params.
"""

from __future__ import annotations

import numpy as np

from spark_bestfit_spark.functions import special as sp
from spark_bestfit_spark.functions.distributions.base import (
    DiscreteDistribution,
)


def _logbinom(n, k):
    """log C(n, k) via gammaln."""
    return sp.gammaln(n + 1.0) - sp.gammaln(k + 1.0) - sp.gammaln(n - k + 1.0)


class Poisson(DiscreteDistribution):
    name = "poisson"
    shapes = ("mu",)
    shape_kind = ("pos",)

    def _logpmf(self, k, mu):
        return k * np.log(mu) - mu - sp.gammaln(k + 1.0)

    def _cdf(self, k, mu):
        k = np.floor(np.asarray(k, dtype=np.float64))
        return np.where(k < 0, 0.0, sp.gammaincc(np.clip(k, 0, None) + 1.0, mu))

    def _fit_start(self, data):
        return (max(float(np.mean(data)), 1e-6), 0.0)

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data)]
        return (max(float(np.mean(data)), 1e-6), 0.0)


class Bernoulli(DiscreteDistribution):
    name = "bernoulli"
    shapes = ("p",)
    shape_kind = ("unit",)
    b = 1.0

    def _logpmf(self, k, p):
        k = np.asarray(k, dtype=np.float64)
        return np.where(k >= 0.5, np.log(p), np.log1p(-p))

    def _cdf(self, k, p):
        k = np.floor(np.asarray(k, dtype=np.float64))
        return np.where(k < 0, 0.0, np.where(k < 1, 1.0 - p, 1.0))

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        p = float(np.clip(np.mean(data), 1e-9, 1 - 1e-9))
        return (p, 0.0)


class Binom(DiscreteDistribution):
    name = "binom"
    shapes = ("n", "p")
    shape_kind = ("int", "unit")

    def _get_support(self, n, p):
        return 0.0, float(n)

    def _logpmf(self, k, n, p):
        return (
            _logbinom(n, k)
            + k * np.log(p)
            + (n - k) * np.log1p(-p)
        )

    def _cdf(self, k, n, p):
        k = np.floor(np.asarray(k, dtype=np.float64))
        out = np.where(
            k < 0,
            0.0,
            sp.betainc(
                np.clip(n - k, 1e-12, None), np.clip(k, 0, None) + 1.0, 1.0 - p
            ),
        )
        return np.where(k >= n, 1.0, out)

    def _fit_start(self, data):
        mx = float(np.max(data))
        m = float(np.mean(data))
        n0 = max(mx, 1.0)
        return (n0, min(max(m / n0, 1e-6), 1 - 1e-6), 0.0)

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data)]
        mx = int(np.max(data))
        m = float(np.mean(data))
        v = float(np.var(data))
        best = None
        # Search n over a small grid >= max(data); p = mean/n
        if v < m and m > 0:  # underdispersed: binomial plausible
            n_hat = int(np.round(m * m / max(m - v, 1e-9)))
        else:
            n_hat = mx
        cands = sorted({max(mx, 1), max(n_hat, mx), mx + 1, 2 * mx})
        for n in cands:
            if n < 1:
                continue
            p = min(max(m / n, 1e-9), 1 - 1e-9)
            nll = self.nnlf((float(n), p, 0.0), data)
            if best is None or nll < best[0]:
                best = (nll, float(n), p)
        return (best[1], best[2], 0.0)


class NBinom(DiscreteDistribution):
    name = "nbinom"
    shapes = ("n", "p")
    shape_kind = ("pos", "unit")

    def _logpmf(self, k, n, p):
        return (
            sp.gammaln(k + n)
            - sp.gammaln(k + 1.0)
            - sp.gammaln(n)
            + n * np.log(p)
            + k * np.log1p(-p)
        )

    def _cdf(self, k, n, p):
        k = np.floor(np.asarray(k, dtype=np.float64))
        return np.where(
            k < 0, 0.0, sp.betainc(n, np.clip(k, 0, None) + 1.0, p)
        )

    def _fit_start(self, data):
        m = float(np.mean(data))
        v = float(np.var(data))
        if v > m > 0:
            p = m / v
            n = m * p / (1.0 - p)
        else:
            p, n = 0.5, max(m, 1.0)
        return (max(n, 1e-3), min(max(p, 1e-6), 1 - 1e-6), 0.0)


class Geom(DiscreteDistribution):
    name = "geom"
    shapes = ("p",)
    shape_kind = ("unit",)
    a = 1.0

    def _logpmf(self, k, p):
        return (k - 1.0) * np.log1p(-p) + np.log(p)

    def _cdf(self, k, p):
        k = np.floor(np.asarray(k, dtype=np.float64))
        return np.where(k < 1, 0.0, -np.expm1(k * np.log1p(-p)))

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data) & (data >= 1)]
        m = float(np.mean(data)) if data.size else 1.0
        return (min(max(1.0 / m, 1e-9), 1 - 1e-9), 0.0)


class Randint(DiscreteDistribution):
    """Uniform over integers [low, high) — scipy randint(low, high)."""

    name = "randint"
    shapes = ("low", "high")
    shape_kind = ("real", "real")

    def _check_shapes(self, shapes):
        low, high = shapes
        return np.isfinite(low) and np.isfinite(high) and high > low

    def _get_support(self, low, high):
        return float(low), float(high) - 1.0

    def _logpmf(self, k, low, high):
        return np.full(np.shape(k), -np.log(high - low))

    def _cdf(self, k, low, high):
        k = np.floor(np.asarray(k, dtype=np.float64))
        return np.clip((k - low + 1.0) / (high - low), 0.0, 1.0)

    def _ppf(self, q, low, high):
        q = np.asarray(q, dtype=np.float64)
        return np.ceil(q * (high - low) + low - 1.0)

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data)]
        return (float(np.min(data)), float(np.max(data)) + 1.0, 0.0)


class Logser(DiscreteDistribution):
    name = "logser"
    shapes = ("p",)
    shape_kind = ("unit",)
    a = 1.0

    def _logpmf(self, k, p):
        return k * np.log(p) - np.log(k) - np.log(-np.log1p(-p))

    def _fit_start(self, data):
        return (0.5, 0.0)


class Zipf(DiscreteDistribution):
    name = "zipf"
    shapes = ("a_",)
    shape_kind = ("real",)
    a = 1.0

    def _check_shapes(self, shapes):
        (a_,) = shapes
        return np.isfinite(a_) and a_ > 1.0

    @staticmethod
    def _zeta(a_, terms: int = 64):
        """Riemann zeta via Euler-Maclaurin tail correction."""
        a_ = np.asarray(a_, dtype=np.float64)
        k = np.arange(1, terms + 1, dtype=np.float64)
        shape = np.broadcast_shapes(np.shape(a_), ())
        s = np.sum(k[:, None] ** (-np.atleast_1d(a_)[None, :]), axis=0)
        N = float(terms)
        tail = N ** (1.0 - a_) / (a_ - 1.0) + 0.5 * N ** (-a_)
        tail += a_ / 12.0 * N ** (-a_ - 1.0)
        out = s + np.atleast_1d(tail)
        return out if np.shape(a_) else float(out[0])

    def _logpmf(self, k, a_):
        return -a_ * np.log(k) - np.log(self._zeta(a_))

    def _fit_start(self, data):
        return (2.0, 0.0)


class DLaplace(DiscreteDistribution):
    name = "dlaplace"
    shapes = ("a_",)
    shape_kind = ("pos",)
    a = -np.inf

    def _logpmf(self, k, a_):
        return np.log(np.tanh(a_ / 2.0)) - a_ * np.abs(k)

    def _cdf(self, k, a_):
        k = np.floor(np.asarray(k, dtype=np.float64))
        ea = np.exp(-a_)
        # P(K <= k): symmetric two-sided geometric around 0
        pos = 1.0 - np.exp(-a_ * (k + 1.0)) / (1.0 + ea)
        neg = np.exp(a_ * k) / (1.0 + ea)
        return np.where(k < 0, neg, pos)

    def _fit_start(self, data):
        s = float(np.std(data)) or 1.0
        return (min(2.0 / s, 5.0), float(np.round(np.median(data))))

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data)]
        loc = float(np.round(np.median(data)))
        d = np.abs(data - loc)
        m = float(np.mean(d)) or 0.5
        # E|K| = 1/sinh(a) -> a = asinh(1/m)
        a_ = float(np.arcsinh(1.0 / m)) if m > 0 else 2.0
        return (max(a_, 1e-3), loc)


class Planck(DiscreteDistribution):
    """Planck (discrete exponential): pmf = (1 - e^-l) e^{-l k}, k >= 0."""

    name = "planck"
    shapes = ("lambda_",)
    shape_kind = ("pos",)

    def _logpmf(self, k, lambda_):
        return np.log(-np.expm1(-lambda_)) - lambda_ * k

    def _cdf(self, k, lambda_):
        k = np.floor(np.asarray(k, dtype=np.float64))
        return np.where(k < 0, 0.0, -np.expm1(-lambda_ * (k + 1.0)))

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data) & (data >= 0)]
        m = float(np.mean(data))
        # mean = 1/(e^l - 1) -> l = log(1 + 1/mean)
        lam = float(np.log1p(1.0 / m)) if m > 0 else 1.0
        return (lam, 0.0)


class Hypergeom(DiscreteDistribution):
    """hypergeom(M, n, N): draws N from M with n successes."""

    name = "hypergeom"
    shapes = ("M", "n", "N")
    shape_kind = ("int", "int", "int")

    def _get_support(self, M, n, N):
        return max(0.0, N - (M - n)), min(n, N)

    def _logpmf(self, k, M, n, N):
        return (
            _logbinom(n, k)
            + _logbinom(M - n, N - k)
            - _logbinom(M, N)
        )

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data)]
        mx = float(np.max(data))
        m = float(np.mean(data))
        N = max(mx, 1.0)
        best = None
        # Grid-search population size M; n follows from the mean:
        # E[K] = N * n / M  ->  n = M * mean / N
        for mult in (1.2, 1.5, 2, 3, 4, 5, 7, 10, 15, 20, 30, 50):
            M = float(np.round(N * mult))
            n = float(np.clip(np.round(M * m / N), mx, M))
            if M - n < N - mx:  # support must reach max(data)
                continue
            nll = self.nnlf((M, n, N, 0.0), data)
            if best is None or nll < best[0]:
                best = (nll, M, n)
        if best is None:
            return (2.0 * N, max(mx, 1.0), N, 0.0)
        return (best[1], best[2], N, 0.0)


class BetaBinom(DiscreteDistribution):
    name = "betabinom"
    shapes = ("n", "a_", "b_")
    shape_kind = ("int", "pos", "pos")

    def _get_support(self, n, a_, b_):
        return 0.0, float(n)

    def _logpmf(self, k, n, a_, b_):
        return (
            _logbinom(n, k)
            + sp.betaln(k + a_, n - k + b_)
            - sp.betaln(a_, b_)
        )

    def _fit_start(self, data):
        mx = max(float(np.max(data)), 1.0)
        return (mx, 2.0, 2.0, 0.0)

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data)]
        n = max(float(np.max(data)), 1.0)
        m = float(np.mean(data)) / n
        v = float(np.var(data)) / (n * n) or 1e-4
        common = max(m * (1.0 - m) / v - 1.0, 0.2)
        from spark_bestfit_spark.functions.optimize import nelder_mead

        def obj(theta):
            return self.nnlf(
                (n, float(np.exp(theta[0])), float(np.exp(theta[1])), 0.0), data
            )

        t0 = np.log([max(m * common, 0.1), max((1 - m) * common, 0.1)])
        t, fv, _ = nelder_mead(obj, t0)
        return (n, float(np.exp(t[0])), float(np.exp(t[1])), 0.0)


class YuleSimon(DiscreteDistribution):
    name = "yulesimon"
    shapes = ("alpha",)
    shape_kind = ("pos",)
    a = 1.0

    def _logpmf(self, k, alpha):
        return (
            np.log(alpha)
            + sp.betaln(k, alpha + 1.0)
        )

    def _fit_start(self, data):
        m = float(np.mean(data))
        a0 = m / (m - 1.0) if m > 1.0 else 2.0
        return (max(a0, 1.01), 0.0)


class Boltzmann(DiscreteDistribution):
    """Truncated discrete exponential: pmf ~ e^{-l k} on 0..N-1
    (scipy boltzmann)."""

    name = "boltzmann"
    shapes = ("lambda_", "n_trunc")
    shape_kind = ("pos", "int")

    def _get_support(self, lambda_, n_trunc):
        return 0.0, float(n_trunc) - 1.0

    def _logpmf(self, k, lambda_, n_trunc):
        with np.errstate(divide="ignore"):
            log_norm = np.log(-np.expm1(-lambda_)) - np.log(
                -np.expm1(-lambda_ * n_trunc)
            )
        return log_norm - lambda_ * k

    def _cdf(self, k, lambda_, n_trunc):
        k = np.floor(np.asarray(k, dtype=np.float64))
        k = np.clip(k, -1.0, n_trunc - 1.0)
        num = -np.expm1(-lambda_ * (k + 1.0))
        den = -np.expm1(-lambda_ * n_trunc)
        return np.where(k < 0, 0.0, np.clip(num / den, 0.0, 1.0))

    def _fit_start(self, data):
        m = float(np.mean(data))
        n_trunc = float(np.max(data)) + 1.0
        lam = float(np.log1p(1.0 / m)) if m > 0 else 1.0
        return (lam, n_trunc, 0.0)

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data) & (data >= 0)]
        if data.size < 2:
            raise ValueError("boltzmann.fit needs >= 2 points")
        n_trunc = float(np.max(data)) + 1.0
        from spark_bestfit_spark.functions.optimize import minimize_scalar

        def obj(log_lam):
            return self.nnlf((float(np.exp(log_lam)), n_trunc, 0.0), data)

        t, _ = minimize_scalar(obj, np.log(1e-3), np.log(10.0))
        return (float(np.exp(t)), n_trunc, 0.0)


class NHypergeom(DiscreteDistribution):
    """Negative hypergeometric nhypergeom(M, n, r): failures drawn before
    the r-th success when sampling without replacement from M objects of
    which n are successes."""

    name = "nhypergeom"
    shapes = ("M", "n", "r")
    shape_kind = ("int", "int", "int")

    def _get_support(self, M, n, r):
        return 0.0, float(M - n)

    def _logpmf(self, k, M, n, r):
        # pmf = C(k + r - 1, k) C(M - r - k, n - r) / C(M, n)
        return (
            _logbinom(k + r - 1.0, k)
            + _logbinom(M - r - k, n - r)
            - _logbinom(M, n)
        )

    def _fit_start(self, data):
        mx = max(float(np.max(data)), 1.0)
        return (3.0 * mx, 2.0 * mx, max(mx / 2.0, 1.0), 0.0)

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data) & (data >= 0)]
        if data.size < 2:
            raise ValueError("nhypergeom.fit needs >= 2 points")
        mx = float(np.max(data))
        m = float(np.mean(data)) or 0.5
        best = None
        # grid-search (M, r); n follows from mean = r (M - n)/(n + 1)
        for r in (1.0, 2.0, 3.0, 5.0, 8.0, 13.0, 20.0):
            for mult in (1.5, 2.0, 3.0, 5.0, 8.0, 15.0, 30.0):
                M = float(np.round(mx * mult + r))
                n = float(np.round((r * M - m) / (r + m)))
                if n < r or M - n < mx:
                    continue
                nll = self.nnlf((M, n, r, 0.0), data)
                if best is None or nll < best[0]:
                    best = (nll, M, n, r)
        if best is None:
            return (3.0 * mx + 2.0, 2.0 * mx + 1.0, 1.0, 0.0)
        return (best[1], best[2], best[3], 0.0)


class Zipfian(DiscreteDistribution):
    """Finite Zipf zipfian(a, n): pmf ~ 1/k^a on 1..n (scipy zipfian)."""

    name = "zipfian"
    shapes = ("a_", "n_size")
    shape_kind = ("real", "int")
    a = 1.0

    def _check_shapes(self, shapes) -> bool:
        a_, n_size = shapes
        return bool(
            np.isfinite(a_) and a_ >= 0 and np.isfinite(n_size) and n_size >= 1
        )

    def _get_support(self, a_, n_size):
        return 1.0, float(n_size)

    def _hn(self, a_, n_size):
        ks = np.arange(1, int(n_size) + 1, dtype=np.float64)
        return float(np.sum(ks ** (-a_)))

    def _logpmf(self, k, a_, n_size):
        with np.errstate(divide="ignore"):
            return -a_ * np.log(k) - np.log(self._hn(a_, n_size))

    def _cdf(self, k, a_, n_size):
        k = np.floor(np.asarray(k, dtype=np.float64))
        ks = np.arange(1, int(n_size) + 1, dtype=np.float64)
        weights = ks ** (-a_)
        cum = np.cumsum(weights) / np.sum(weights)
        idx = np.clip(k, 0, int(n_size)).astype(int)
        padded = np.concatenate(([0.0], cum))
        return padded[idx]

    def _fit_start(self, data):
        return (1.5, float(np.max(data)), 0.0)

    def fit(self, data, fix_loc: bool = True):
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data) & (data >= 1)]
        if data.size < 2:
            raise ValueError("zipfian.fit needs >= 2 points")
        n_size = float(np.max(data))
        from spark_bestfit_spark.functions.optimize import minimize_scalar

        def obj(a_):
            return self.nnlf((float(a_), n_size, 0.0), data)

        t, _ = minimize_scalar(obj, 0.0, 6.0)
        return (float(t), n_size, 0.0)


_DISCRETE_CLASSES = [
    Bernoulli,
    BetaBinom,
    Binom,
    Boltzmann,
    DLaplace,
    Geom,
    Hypergeom,
    Logser,
    NBinom,
    NHypergeom,
    Planck,
    Poisson,
    Randint,
    YuleSimon,
    Zipf,
    Zipfian,
]

DISCRETE: dict = {cls().name: cls() for cls in _DISCRETE_CLASSES}
