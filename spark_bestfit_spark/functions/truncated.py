"""Truncated distribution wrapper (reference truncated.py:10-344 semantics).

Wraps any continuous distribution + fitted params with [lower, upper]
bounds: pdf/logpdf are renormalized by the retained mass, cdf maps into
[0, 1] over the bounds, ppf/rvs quantile-remap into the retained CDF
band. Analytical mean/std for norm/expon/uniform; Monte-Carlo (10k
samples, seed 42) otherwise — matching the reference's observable
behavior without its implementation.
"""

from __future__ import annotations

import numpy as np

__all__ = ["TruncatedDistribution"]

_MC_SIZE = 10_000
_MC_SEED = 42


class TruncatedDistribution:
    """Frozen truncated view over (dist, params, lower, upper)."""

    def __init__(self, dist, params, lower=None, upper=None):
        self.dist = dist
        self.params = tuple(float(p) for p in params)
        self.lower = -np.inf if lower is None else float(lower)
        self.upper = np.inf if upper is None else float(upper)
        if self.lower >= self.upper:
            raise ValueError("lower must be < upper")
        flo = (
            float(dist.cdf(np.array([self.lower]), *self.params)[0])
            if np.isfinite(self.lower) else 0.0
        )
        fhi = (
            float(dist.cdf(np.array([self.upper]), *self.params)[0])
            if np.isfinite(self.upper) else 1.0
        )
        self._flo, self._fhi = flo, fhi
        self._mass = fhi - flo
        if not np.isfinite(self._mass) or self._mass <= 1e-12:
            raise ValueError(
                f"truncation [{self.lower}, {self.upper}] retains no "
                f"probability mass for {getattr(dist, 'name', dist)}"
            )

    @property
    def name(self) -> str:
        return getattr(self.dist, "name", "unknown")

    # ----------------------------------------------------------- densities
    def _in_support(self, x: np.ndarray) -> np.ndarray:
        return (x >= self.lower) & (x <= self.upper)

    def pdf(self, x, *ignored) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        base = self.dist.pdf(x, *self.params) / self._mass
        return np.where(self._in_support(x), base, 0.0)

    def logpdf(self, x, *ignored) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        base = self.dist.logpdf(x, *self.params) - np.log(self._mass)
        return np.where(self._in_support(x), base, -np.inf)

    def cdf(self, x, *ignored) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        raw = (self.dist.cdf(x, *self.params) - self._flo) / self._mass
        out = np.clip(raw, 0.0, 1.0)
        out = np.where(x < self.lower, 0.0, out)
        return np.where(x > self.upper, 1.0, out)

    def sf(self, x, *ignored) -> np.ndarray:
        return 1.0 - self.cdf(x)

    def ppf(self, q, *ignored) -> np.ndarray:
        q = np.asarray(q, dtype=np.float64)
        mapped = self._flo + np.clip(q, 0.0, 1.0) * self._mass
        out = np.asarray(self.dist.ppf(mapped, *self.params), dtype=np.float64)
        lo = self.lower if np.isfinite(self.lower) else -np.inf
        hi = self.upper if np.isfinite(self.upper) else np.inf
        return np.clip(out, lo, hi)

    def rvs(self, size: int = 1, random_state=None) -> np.ndarray:
        rng = (
            random_state
            if isinstance(random_state, np.random.Generator)
            else np.random.default_rng(random_state)
        )
        return self.ppf(rng.uniform(0.0, 1.0, size))

    # ------------------------------------------------------------- moments
    def mean(self) -> float:
        analytic = self._analytic_moments()
        if analytic is not None:
            return analytic[0]
        return float(np.mean(self._mc_sample()))

    def std(self) -> float:
        analytic = self._analytic_moments()
        if analytic is not None:
            return analytic[1]
        return float(np.std(self._mc_sample()))

    def _mc_sample(self) -> np.ndarray:
        return self.rvs(_MC_SIZE, np.random.default_rng(_MC_SEED))

    def _analytic_moments(self):
        """Closed forms for norm / expon / uniform truncations."""
        name = self.name
        a, b = self.lower, self.upper
        if name == "uniform":
            loc, scale = self.params
            lo = max(a, loc)
            hi = min(b, loc + scale)
            return (lo + hi) / 2.0, (hi - lo) / np.sqrt(12.0)
        if name == "norm":
            from spark_bestfit_spark.functions import special as sp

            mu, sigma = self.params
            alpha = (a - mu) / sigma if np.isfinite(a) else -np.inf
            beta = (b - mu) / sigma if np.isfinite(b) else np.inf
            phi = lambda z: (  # noqa: E731
                np.exp(-0.5 * z * z) / np.sqrt(2 * np.pi)
                if np.isfinite(z) else 0.0
            )
            Phi = lambda z: (  # noqa: E731
                float(sp.ndtr(np.array([z]))[0]) if np.isfinite(z)
                else (0.0 if z < 0 else 1.0)
            )
            z = Phi(beta) - Phi(alpha)
            d_phi = phi(alpha) - phi(beta)
            mean = mu + sigma * d_phi / z
            ab_term = (
                (alpha * phi(alpha) if np.isfinite(alpha) else 0.0)
                - (beta * phi(beta) if np.isfinite(beta) else 0.0)
            )
            var = sigma**2 * (1.0 + ab_term / z - (d_phi / z) ** 2)
            return float(mean), float(np.sqrt(max(var, 0.0)))
        if name == "expon":
            loc, scale = self.params
            lam = 1.0 / scale
            lo = max(a, loc) - loc
            hi = (b - loc) if np.isfinite(b) else np.inf
            # E[X | lo <= X <= hi] for Exp(lam), shifted back by loc
            elo, ehi = np.exp(-lam * lo), (
                np.exp(-lam * hi) if np.isfinite(hi) else 0.0
            )
            z = elo - ehi
            num = (lo + scale) * elo - (
                (hi + scale) * ehi if np.isfinite(hi) else 0.0
            )
            mean = num / z
            # second moment via integration by parts
            num2 = (lo * lo + 2 * scale * lo + 2 * scale * scale) * elo - (
                (hi * hi + 2 * scale * hi + 2 * scale * scale) * ehi
                if np.isfinite(hi) else 0.0
            )
            var = num2 / z - mean * mean
            return float(loc + mean), float(np.sqrt(max(var, 0.0)))
        return None
