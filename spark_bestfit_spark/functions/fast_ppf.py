"""Closed-form percent-point functions for the hot sampling path.

The copula / synthetic-data generators evaluate PPFs for millions of
uniforms; the generic bisection PPF in the distribution base class costs
~90 CDF evaluations per point. These closed forms (reference semantics:
fast_ppf.py:56-299 — direct special-function inversions for the common
distributions, frozen ``dist.ppf`` fallback otherwise) cut that to one
vectorized special-function call.

Truncation support maps the uniform into the [cdf(lb), cdf(ub)] band
before inverting; the band is cached per (dist, params, bounds) since a
generator calls it once per batch with identical arguments.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from spark_bestfit_spark.functions import special as sp

__all__ = ["fast_ppf", "truncated_ppf", "has_fast_ppf"]


def _norm(q, loc, scale):
    return loc + scale * sp.ndtri(q)


def _expon(q, loc, scale):
    return loc - scale * np.log1p(-q)


def _uniform(q, loc, scale):
    return loc + scale * q


def _lognorm(q, s, loc, scale):
    return loc + scale * np.exp(s * sp.ndtri(q))


def _gamma(q, a, loc, scale):
    return loc + scale * sp.gammaincinv(a, q)


def _beta(q, a, b, loc, scale):
    return loc + scale * sp.betaincinv(a, b, q)


def _weibull_min(q, c, loc, scale):
    return loc + scale * np.power(-np.log1p(-q), 1.0 / c)


def _gumbel_r(q, loc, scale):
    return loc - scale * np.log(-np.log(q))


def _gumbel_l(q, loc, scale):
    return loc + scale * np.log(-np.log1p(-q))


def _logistic(q, loc, scale):
    return loc + scale * np.log(q / (1.0 - q))


def _laplace(q, loc, scale):
    q = np.asarray(q, dtype=np.float64)
    return loc + scale * np.where(
        q < 0.5, np.log(2.0 * q), -np.log(2.0 * (1.0 - q))
    )


def _cauchy(q, loc, scale):
    return loc + scale * np.tan(np.pi * (np.asarray(q) - 0.5))


def _rayleigh(q, loc, scale):
    return loc + scale * np.sqrt(-2.0 * np.log1p(-q))


def _pareto(q, b, loc, scale):
    return loc + scale * np.power(1.0 - np.asarray(q), -1.0 / b)


def _chi2(q, df, loc, scale):
    return loc + scale * 2.0 * sp.gammaincinv(df / 2.0, q)


def _weibull_max(q, c, loc, scale):
    return loc - scale * np.power(-np.log(np.asarray(q)), 1.0 / c)


def _invweibull(q, c, loc, scale):
    return loc + scale * np.power(-np.log(np.asarray(q)), -1.0 / c)


def _halfnorm(q, loc, scale):
    return loc + scale * sp.ndtri(0.5 * (1.0 + np.asarray(q)))


def _halflogistic(q, loc, scale):
    q = np.asarray(q, dtype=np.float64)
    return loc + scale * np.log((1.0 + q) / (1.0 - q))


def _halfcauchy(q, loc, scale):
    return loc + scale * np.tan(0.5 * np.pi * np.asarray(q))


def _lomax(q, c, loc, scale):
    return loc + scale * (np.power(1.0 - np.asarray(q), -1.0 / c) - 1.0)


def _maxwell(q, loc, scale):
    return loc + scale * np.sqrt(2.0 * sp.gammaincinv(1.5, q))


def _fisk(q, c, loc, scale):
    q = np.asarray(q, dtype=np.float64)
    return loc + scale * np.power(q / (1.0 - q), 1.0 / c)


def _genpareto(q, c, loc, scale):
    q = np.asarray(q, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        if abs(c) < 1e-12:
            return loc - scale * np.log1p(-q)
        return loc + scale * (np.power(1.0 - q, -c) - 1.0) / c


_CLOSED_FORMS = {
    "norm": _norm,
    "expon": _expon,
    "uniform": _uniform,
    "lognorm": _lognorm,
    "gamma": _gamma,
    "beta": _beta,
    "weibull_min": _weibull_min,
    "gumbel_r": _gumbel_r,
    "gumbel_l": _gumbel_l,
    "logistic": _logistic,
    "laplace": _laplace,
    "cauchy": _cauchy,
    "rayleigh": _rayleigh,
    "pareto": _pareto,
    "chi2": _chi2,
    "weibull_max": _weibull_max,
    "invweibull": _invweibull,
    "halfnorm": _halfnorm,
    "halflogistic": _halflogistic,
    "halfcauchy": _halfcauchy,
    "lomax": _lomax,
    "maxwell": _maxwell,
    "fisk": _fisk,
    "genpareto": _genpareto,
}


def has_fast_ppf(dist_name: str) -> bool:
    return dist_name in _CLOSED_FORMS


def fast_ppf(dist_name: str, q, params) -> np.ndarray:
    """Evaluate the PPF via closed form when available, else through the
    registry distribution's (possibly numeric) ``ppf``."""
    q = np.asarray(q, dtype=np.float64)
    fn = _CLOSED_FORMS.get(dist_name)
    if fn is not None:
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            return np.asarray(fn(q, *params), dtype=np.float64)
    from spark_bestfit_spark.functions.distributions.registry import (
        get_distribution,
    )

    return np.asarray(get_distribution(dist_name).ppf(q, *params))


@lru_cache(maxsize=256)
def _trunc_band(dist_name: str, params: tuple, lb, ub) -> tuple:
    """(cdf(lb), cdf(ub)) for quantile remapping, cached per model."""
    from spark_bestfit_spark.functions.distributions.registry import (
        get_distribution,
    )

    dist = get_distribution(dist_name)
    qlo = float(dist.cdf(np.array([lb]), *params)[0]) if lb is not None else 0.0
    qhi = float(dist.cdf(np.array([ub]), *params)[0]) if ub is not None else 1.0
    if not np.isfinite(qlo):
        qlo = 0.0
    if not np.isfinite(qhi):
        qhi = 1.0
    if qhi <= qlo:  # empty truncation mass — degenerate band
        qhi = qlo
    return qlo, qhi


def truncated_ppf(
    dist_name: str, q, params, lower=None, upper=None
) -> np.ndarray:
    """PPF of the [lower, upper]-truncated distribution: remap the uniform
    into the retained CDF band, then invert with the fast path."""
    if lower is None and upper is None:
        return fast_ppf(dist_name, q, params)
    qlo, qhi = _trunc_band(dist_name, tuple(float(p) for p in params),
                           lower, upper)
    q = np.asarray(q, dtype=np.float64)
    out = fast_ppf(dist_name, qlo + q * (qhi - qlo), params)
    if lower is not None:
        out = np.maximum(out, lower)
    if upper is not None:
        out = np.minimum(out, upper)
    return out
