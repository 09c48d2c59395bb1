"""Distribution registry: filtering, exclusions, slow-set weighting, custom
distributions.

Re-expresses the behavior of the reference registry
(/root/reference/src/spark_bestfit/distributions.py:10-326): default
exclusions for pathological fitters, a slow set used for partition
weighting, a ``support_at_zero`` predicate (dist.a >= 0), and user-supplied
custom distribution registration.
"""

from __future__ import annotations

import numpy as np

from spark_bestfit_spark.functions.distributions.base import (
    ContinuousDistribution,
    DiscreteDistribution,
)
from spark_bestfit_spark.functions.distributions.continuous import CONTINUOUS
from spark_bestfit_spark.functions.distributions import (  # noqa: F401
    continuous_ext,  # registers the extended library into CONTINUOUS
)
from spark_bestfit_spark.functions.distributions.continuous_excluded import (  # noqa: F401,E501
    EXCLUDED_SET_NAMES,  # registers the excluded-set kernels into CONTINUOUS
)
from spark_bestfit_spark.functions.distributions.discrete import DISCRETE

# Distributions whose MLE is noticeably slower / less stable here; kept out
# of the default set (same role as the reference's DEFAULT_EXCLUSIONS).
# Every name remains registered and re-includable via
# ``DistributionRegistry(custom_exclusions=...)`` exactly like the
# reference (distributions.py:90-164).
DEFAULT_EXCLUSIONS: set = {
    "dpareto_lognorm",  # slow 3-shape MLE (also excluded by the reference)
} | EXCLUDED_SET_NAMES

# ~2-6x average fit cost — used for partition weighting (reference
# distributions.py:58-75). Measured on a 10k gamma sample with the
# engine's own kernels (see commit history for the timing table).
SLOW_DISTRIBUTIONS: set = {
    "alpha",          # ~190 ms
    "argus",          # ~160 ms
    "betaprime",      # ~160 ms
    "crystalball",    # ~300 ms
    "exponnorm",      # ~450 ms
    "exponweib",
    "f",              # ~290 ms
    "genexpon",       # ~140 ms
    "irwinhall",      # ~180 ms (profile MLE over candidate n)
    "landau",         # ~1 s one-time table build per worker, then ~30 ms
    "jf_skew_t",      # ~540 ms (betaincinv in the PPF/metrics path)
    "nct",            # ~1.5 s — see FIT_WEIGHTS (Lenth-series CDF)
    "johnsonsb",      # ~130 ms
    "johnsonsu",      # ~100 ms
    "loggamma",       # ~100 ms
    "norminvgauss",   # ~370 ms (quadrature CDF)
    "powerlognorm",   # ~1.7 s — see FIT_WEIGHTS
    "powernorm",      # ~360 ms
    "skewnorm",       # ~460 ms (Owen's T quadrature in the CDF)
    "trapezoid",      # ~100 ms
    "truncnorm",      # ~490 ms
    # excluded-set kernels (fit only on re-inclusion) — quadrature /
    # series numerics, measured on a 3k sample; without these weights a
    # single re-included straggler would serialize the whole fan-out wave
    "ncx2",               # ~3 s (Poisson-mixture series per NM iter)
    "ncf",                # ~9 s
    "ksone",              # ~3 s (Birnbaum-Tingey per-point sum)
    "geninvgauss",        # fast fit, slow metrics (quadrature CDF)
    "gausshyper",         # ~0.4 s
    "genhyperbolic",      # ~15 s (grid-interpolated Bessel K per eval)
    "studentized_range",  # ~17 s (double quadrature)
    "levy_stable",        # ~6 s (cf quadrature; Koutrouvelis fit)
    "tukeylambda",        # ~0.5 s (bisection CDF per eval)
}

# Per-distribution partition weights: default 1, slow set 3, plus
# measured outliers that dominate a task wave.
FIT_WEIGHTS: dict = {
    "powerlognorm": 8,
    "nct": 6,
    "ncx2": 6,
    "ncf": 12,
    "ksone": 6,
    "genhyperbolic": 16,
    "studentized_range": 18,
    "levy_stable": 8,
}


def get_continuous(name: str) -> ContinuousDistribution:
    return CONTINUOUS[name]


def get_discrete(name: str) -> DiscreteDistribution:
    return DISCRETE[name]


def get_distribution(name: str):
    """Look up a distribution (continuous first, then discrete, then custom)."""
    if name in CONTINUOUS:
        return CONTINUOUS[name]
    if name in DISCRETE:
        return DISCRETE[name]
    raise KeyError(f"unknown distribution: {name}")


class DistributionRegistry:
    """Filterable view over the distribution library."""

    ALL_CONTINUOUS = sorted(CONTINUOUS)
    ALL_DISCRETE = sorted(DISCRETE)
    DEFAULT_EXCLUSIONS = DEFAULT_EXCLUSIONS
    SLOW_DISTRIBUTIONS = SLOW_DISTRIBUTIONS

    def __init__(self, custom_exclusions: set | None = None):
        self._excluded = (
            set(custom_exclusions)
            if custom_exclusions is not None
            else set(DEFAULT_EXCLUSIONS)
        )
        self._custom: dict = {}

    # ------------------------------------------------------------ filtering
    def get_distributions(
        self,
        support_at_zero: bool = False,
        additional_exclusions: list | None = None,
        include_custom: bool = True,
    ) -> list:
        excluded = set(self._excluded)
        if additional_exclusions:
            excluded.update(additional_exclusions)
        names = [d for d in self.ALL_CONTINUOUS if d not in excluded]
        if include_custom:
            names += [n for n in self._custom if n not in excluded]
        if support_at_zero:
            names = [n for n in names if self._has_support_at_zero(n)]
        return names

    def get_discrete_distributions(
        self, additional_exclusions: list | None = None
    ) -> list:
        excluded = set(self._excluded)
        if additional_exclusions:
            excluded.update(additional_exclusions)
        return [d for d in self.ALL_DISCRETE if d not in excluded]

    def _has_support_at_zero(self, name: str) -> bool:
        try:
            dist = self.resolve(name)
        except KeyError:
            return False
        try:
            return float(dist.a) >= 0
        except (AttributeError, TypeError):
            return False

    def resolve(self, name: str):
        if name in self._custom:
            return self._custom[name]
        return get_distribution(name)

    # ----------------------------------------------------------- exclusions
    def add_exclusion(self, name: str) -> None:
        self._excluded.add(name)

    def remove_exclusion(self, name: str) -> None:
        self._excluded.discard(name)

    def get_exclusions(self) -> set:
        return set(self._excluded)

    def reset_exclusions(self) -> None:
        self._excluded = set(DEFAULT_EXCLUSIONS)

    # ------------------------------------------------------- custom support
    def register_distribution(self, name: str, dist, overwrite: bool = False):
        """Register a user-supplied distribution object.

        The object must expose ``fit(data)``, ``logpdf(x, *params)``,
        ``cdf(x, *params)`` and ``ppf(q, *params)`` with the
        ``(*shapes, loc, scale)`` convention (reference semantics:
        continuous_fitter.py:107-172).
        """
        if not name or not isinstance(name, str):
            raise ValueError("custom distribution needs a non-empty name")
        if not overwrite and (
            name in CONTINUOUS or name in DISCRETE or name in self._custom
        ):
            raise ValueError(f"distribution '{name}' already exists")
        for attr in ("fit", "cdf", "logpdf"):
            if not callable(getattr(dist, attr, None)):
                raise TypeError(f"custom distribution must define {attr}()")
        # smoke-validate on a tiny sample so bad objects fail at register time
        probe = np.array([0.5, 1.0, 1.5, 2.0, 2.5])
        try:
            params = dist.fit(probe)
            np.asarray(dist.cdf(probe, *params))
        except Exception as exc:  # noqa: BLE001
            raise ValueError(f"custom distribution '{name}' failed probe: {exc}")
        self._custom[name] = dist
        return dist

    def unregister_distribution(self, name: str) -> None:
        self._custom.pop(name, None)

    @property
    def custom_distributions(self) -> dict:
        return dict(self._custom)

    # ------------------------------------------------------------ weighting
    def effective_count(self, names: list) -> int:
        """Slow distributions count 3x (measured outliers more) for
        partition sizing (reference base_fitter.py:524-544)."""
        return sum(
            FIT_WEIGHTS.get(n, 3 if n in SLOW_DISTRIBUTIONS else 1)
            for n in names
        )

    @staticmethod
    def interleave(names: list) -> list:
        """Spread slow distributions among fast ones to avoid straggler
        clustering (reference core.py:31-67)."""
        slow = [n for n in names if n in SLOW_DISTRIBUTIONS]
        fast = [n for n in names if n not in SLOW_DISTRIBUTIONS]
        if not slow or not fast:
            return list(names)
        out = []
        step = max(len(fast) // len(slow), 1)
        fi = iter(fast)
        si = iter(slow)
        remaining_fast = len(fast)
        remaining_slow = len(slow)
        while remaining_fast or remaining_slow:
            for _ in range(step):
                if remaining_fast:
                    out.append(next(fi))
                    remaining_fast -= 1
            if remaining_slow:
                out.append(next(si))
                remaining_slow -= 1
        return out
