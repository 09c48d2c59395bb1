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

# Per-distribution weights for LPT bin-packing of the fit fan-out
# (operators/fit.py _lpt_bins): weight ~ measured kernel wall-time in
# 40 ms units (max over the o_totalprice / l_extendedprice 10k samples,
# warm workers). Unlisted names default to 1. The excluded-set kernels
# (fit only on re-inclusion) keep coarse estimates from their own
# measurements. The packing is only as good as this calibration — a
# 1 s kernel wrongly weighted 6 is what stretched the lazy-fit wave
# tail in round 3.
FIT_WEIGHTS: dict = {
    "nct": 46,               # ~1851 ms measured
    "beta": 20,              # ~803 ms measured
    "landau": 15,            # ~584 ms measured
    "f": 13,                 # ~502 ms measured
    "betaprime": 12,         # ~494 ms measured
    "gennorm": 12,           # ~467 ms measured
    "jf_skew_t": 10,         # ~415 ms measured
    "exponweib": 10,         # ~407 ms measured
    "norminvgauss": 10,      # ~390 ms measured
    "exponnorm": 9,         # ~362 ms measured
    "rdist": 9,             # ~343 ms measured
    "alpha": 8,             # ~334 ms measured
    "powerlognorm": 8,      # ~308 ms measured
    "halfgennorm": 7,       # ~290 ms measured
    "truncnorm": 6,         # ~245 ms measured
    "powernorm": 6,         # ~225 ms measured
    "crystalball": 5,       # ~211 ms measured
    "burr12": 5,            # ~208 ms measured
    "gengamma": 5,          # ~201 ms measured
    "argus": 5,             # ~190 ms measured
    "rice": 4,              # ~170 ms measured
    "genexpon": 4,          # ~156 ms measured
    "powerlaw": 4,          # ~150 ms measured
    "invgamma": 4,          # ~142 ms measured
    "truncweibull_min": 3,  # ~137 ms measured
    "loguniform": 3,        # ~136 ms measured
    "loggamma": 3,          # ~131 ms measured
    "gamma": 3,             # ~123 ms measured
    "chi2": 3,              # ~122 ms measured
    "reciprocal": 3,        # ~121 ms measured
    "erlang": 3,            # ~117 ms measured
    "kappa3": 3,            # ~116 ms measured
    "fisk": 3,              # ~111 ms measured
    "skewnorm": 3,          # ~107 ms measured
    "truncpareto": 3,       # ~106 ms measured
    "t": 3,                 # ~105 ms measured
    "invgauss": 3,          # ~103 ms measured
    "johnsonsb": 3,         # ~103 ms measured
    "bradford": 3,          # ~102 ms measured
    "burr": 2,              # ~100 ms measured
    "fatiguelife": 2,       # ~96 ms measured
    "lognorm": 2,           # ~95 ms measured
    "genlogistic": 2,       # ~95 ms measured
    "wrapcauchy": 2,        # ~94 ms measured
    "johnsonsu": 2,         # ~93 ms measured
    "genhalflogistic": 2,   # ~88 ms measured
    "loglaplace": 2,        # ~81 ms measured
    "invweibull": 2,        # ~75 ms measured
    "dgamma": 2,            # ~69 ms measured
    "trapezoid": 2,         # ~68 ms measured
    "triang": 2,            # ~64 ms measured
    "lomax": 2,             # ~64 ms measured
    "genpareto": 2,         # ~63 ms measured
    "foldnorm": 2,          # ~62 ms measured
    "irwinhall": 2,         # ~61 ms measured
    # excluded-set kernels (re-inclusion only), coarse estimates
    "ncx2": 75,
    "ncf": 225,
    "ksone": 75,
    "genhyperbolic": 375,
    "studentized_range": 425,
    "levy_stable": 150,
    "gausshyper": 10,
    "tukeylambda": 12,
    "kstwo": 3,
    "geninvgauss": 4,
    "dpareto_lognorm": 12,
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
    @staticmethod
    def weight(name: str) -> int:
        """Relative fit cost of one distribution kernel (1 = fast)."""
        return FIT_WEIGHTS.get(name, 3 if name in SLOW_DISTRIBUTIONS else 1)

    def effective_count(self, names: list) -> int:
        """Slow distributions count 3x (measured outliers more) for
        partition sizing (reference base_fitter.py:524-544)."""
        return sum(self.weight(n) for n in names)

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
