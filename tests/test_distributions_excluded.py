"""Excluded-set distribution kernels (continuous_excluded.py).

Mirrors the reference's re-inclusion contract
(/root/reference/src/spark_bestfit/distributions.py:33-164): the ~17
names its DEFAULT_EXCLUSIONS keeps out of the default set must still be
registered and fittable once the user passes
``DistributionRegistry(custom_exclusions=...)``.
"""

from __future__ import annotations

import numpy as np
import pytest

from spark_bestfit_spark.functions.distributions.continuous_excluded import (
    EXCLUDED_SET_NAMES,
)
from spark_bestfit_spark.functions.distributions.registry import (
    DistributionRegistry,
    get_distribution,
)

RNG = np.random.default_rng(1234)

# (name, standard-form shape params) — loc/scale appended in tests
CASES = [
    ("tukeylambda", (0.14,)),
    ("recipinvgauss", (0.7,)),
    ("vonmises_line", (2.0,)),
    ("vonmises", (2.0,)),
    ("exponpow", (1.7,)),
    ("mielke", (2.0, 3.0)),
    ("kstwobign", ()),
    ("kappa4", (0.3, 0.2)),
    ("ncx2", (4.0, 2.5)),
    ("ncf", (5.0, 9.0, 1.5)),
    ("ksone", (40.0,)),
    ("kstwo", (40.0,)),
    ("geninvgauss", (1.2, 1.5)),
    ("gausshyper", (2.0, 3.0, 1.0, 0.8)),
    ("genhyperbolic", (0.8, 1.6, 0.4)),
    ("studentized_range", (3.0, 10.0)),
    ("levy_stable", (1.6, 0.2)),
]


class TestRegistryMembership:
    def test_default_set_unchanged(self):
        # adding the excluded kernels must not grow the default set
        assert len(DistributionRegistry().get_distributions()) == 91

    def test_excluded_names_not_fitted_by_default(self):
        fitted = set(DistributionRegistry().get_distributions())
        assert not (EXCLUDED_SET_NAMES & fitted)

    def test_reinclusion_exposes_all(self):
        fitted = set(
            DistributionRegistry(custom_exclusions=set()).get_distributions()
        )
        assert EXCLUDED_SET_NAMES <= fitted

    def test_every_name_resolves(self):
        for name, _ in CASES:
            assert get_distribution(name).name == name

    def test_selective_reinclusion(self):
        # keep everything excluded except mielke — the reference's
        # custom_exclusions semantics (distributions.py:90-164)
        reg = DistributionRegistry()
        keep_out = set(DistributionRegistry.DEFAULT_EXCLUSIONS) - {"mielke"}
        reg2 = DistributionRegistry(custom_exclusions=keep_out)
        fitted = set(reg2.get_distributions())
        assert "mielke" in fitted
        assert "tukeylambda" not in fitted
        assert len(fitted) == len(set(reg.get_distributions())) + 1


class TestKernelSanity:
    @pytest.mark.parametrize("name,shapes", CASES)
    def test_cdf_monotone_and_normalized(self, name, shapes):
        d = get_distribution(name)
        lo, hi = d._get_support(*shapes)
        lo_f = lo if np.isfinite(lo) else -30.0
        hi_f = hi if np.isfinite(hi) else 30.0
        zg = np.linspace(lo_f + 1e-6, hi_f - 1e-6, 801)
        cdf = np.asarray(d._cdf(zg, *shapes), dtype=np.float64)
        assert np.all(np.diff(cdf) >= -1e-6), f"{name}: cdf not monotone"
        assert cdf[0] < 0.02 and cdf[-1] > 0.97

    @pytest.mark.parametrize("name,shapes", CASES)
    def test_pdf_integrates_to_one(self, name, shapes):
        d = get_distribution(name)
        lo, hi = d._get_support(*shapes)
        lo_f = lo if np.isfinite(lo) else -30.0
        hi_f = hi if np.isfinite(hi) else 30.0
        zg = np.linspace(lo_f + 1e-6, hi_f - 1e-6, 2001)
        with np.errstate(all="ignore"):
            pdf = np.exp(
                np.asarray(d._logpdf(zg, *shapes), dtype=np.float64)
            )
        pdf = np.nan_to_num(pdf)
        assert float(np.trapz(pdf, zg)) == pytest.approx(1.0, abs=0.02)

    @pytest.mark.parametrize(
        "name,shapes",
        [c for c in CASES if c[0] not in ("ksone", "studentized_range")],
    )
    def test_ppf_cdf_round_trip(self, name, shapes):
        d = get_distribution(name)
        q = np.array([0.05, 0.25, 0.5, 0.75, 0.95])
        z = np.asarray(d._ppf(q, *shapes), dtype=np.float64)
        back = np.asarray(d._cdf(z, *shapes), dtype=np.float64)
        np.testing.assert_allclose(back, q, atol=5e-3)


class TestLimits:
    def test_levy_stable_alpha2_is_gaussian(self):
        # alpha = 2 (beta irrelevant): N(0, 2) in standard form
        d = get_distribution("levy_stable")
        z = np.linspace(-4, 4, 41)
        pdf = d._pdf(z, 2.0, 0.0)
        ref = np.exp(-(z**2) / 4.0) / np.sqrt(4.0 * np.pi)
        np.testing.assert_allclose(pdf, ref, atol=2e-3)

    def test_levy_stable_alpha1_is_cauchy(self):
        d = get_distribution("levy_stable")
        z = np.linspace(-10, 10, 41)
        pdf = d._pdf(z, 1.0, 0.0)
        ref = 1.0 / (np.pi * (1.0 + z * z))
        np.testing.assert_allclose(pdf, ref, atol=2e-3)

    def test_kstwo_approaches_kstwobign(self):
        two = get_distribution("kstwo")
        lim = get_distribution("kstwobign")
        z = np.linspace(0.3, 2.0, 30)
        n = 5000.0
        # D_n ~ limit/sqrt(n): compare on the sqrt(n)-scaled axis
        cdf_two = two._cdf(z / np.sqrt(n), n)
        cdf_lim = lim._cdf(z)
        np.testing.assert_allclose(cdf_two, cdf_lim, atol=5e-3)

    def test_ksone_exact_vs_asymptotic(self):
        d = get_distribution("ksone")
        # Birnbaum-Tingey at n=500 vs the e^{-2nx^2} limit
        for x in (0.04, 0.06, 0.08):
            exact = 1.0 - float(d._cdf(np.array([x]), 500.0)[0])
            asym = float(np.exp(-2.0 * 500.0 * x * x))
            assert exact == pytest.approx(asym, rel=0.15)

    def test_vonmises_large_kappa_is_normal(self):
        # N(0, 1/kappa) limit holds to O(kappa z^4): keep |z| small
        d = get_distribution("vonmises_line")
        kappa = 50.0
        z = np.linspace(-0.2, 0.2, 31)
        with np.errstate(all="ignore"):
            pdf = np.exp(d._logpdf(z, kappa))
        ref = np.exp(-0.5 * kappa * z * z) * np.sqrt(kappa / (2 * np.pi))
        np.testing.assert_allclose(pdf, ref, rtol=0.02)

    def test_recipinvgauss_cdf_matches_quadrature(self):
        d = get_distribution("recipinvgauss")
        z = np.linspace(0.05, 8.0, 40)
        closed = d._cdf(z, 0.7)
        quad = d._cdf_quadrature(z, (0.7,), 1e-9, 40.0)
        np.testing.assert_allclose(closed, quad, atol=2e-3)


class TestFitRecovery:
    """MLE on synthetic data must reach (or beat) the truth's likelihood.
    Only the fast kernels run here; the quadrature-heavy ones
    (genhyperbolic, studentized_range, ncf) are covered by the sanity
    tests above to keep the suite wall-time bounded."""

    @pytest.mark.parametrize(
        "name,params",
        [
            ("tukeylambda", (0.14, 2.0, 3.0)),
            ("recipinvgauss", (0.7, 1.0, 2.0)),
            ("vonmises_line", (2.0, 0.5, 1.0)),
            ("exponpow", (1.7, -1.0, 2.0)),
            ("mielke", (2.0, 3.0, 0.0, 1.5)),
            ("kappa4", (0.3, 0.2, 1.0, 2.0)),
            ("kstwobign", (5.0, 2.0)),
            ("kstwo", (40.0, 0.0, 1.0)),
            ("geninvgauss", (1.2, 1.5, 0.0, 2.0)),
        ],
    )
    def test_fit_reaches_truth_likelihood(self, name, params):
        d = get_distribution(name)
        shapes = params[: d.numargs]
        loc, scale = params[-2], params[-1]
        u = RNG.uniform(1e-4, 1.0 - 1e-4, 2000)
        z = np.asarray(d._ppf(u, *shapes), dtype=np.float64)
        x = loc + scale * z
        x = x[np.isfinite(x)]
        fit = d.fit(x)
        ll_true = -d.nnlf(params, x)
        ll_fit = -d.nnlf(fit, x)
        assert ll_fit >= ll_true - 0.01 * abs(ll_true) - 5.0

    def test_levy_stable_koutrouvelis(self):
        # Chambers-Mallows-Stuck exact sampler (alpha != 1, beta = 0
        # symmetric case: X = sin(aV)/cos(V)^{1/a} (cos((1-a)V)/W)^{(1-a)/a})
        d = get_distribution("levy_stable")
        alpha_true = 1.6
        v = RNG.uniform(-np.pi / 2 + 1e-9, np.pi / 2 - 1e-9, 6000)
        w = RNG.exponential(1.0, 6000)
        z = (
            np.sin(alpha_true * v)
            / np.cos(v) ** (1.0 / alpha_true)
            * (np.cos((1.0 - alpha_true) * v) / w)
            ** ((1.0 - alpha_true) / alpha_true)
        )
        x = 1.0 + 2.0 * z
        alpha, beta, loc, scale = d.fit(x)
        assert alpha == pytest.approx(alpha_true, abs=0.15)
        assert abs(beta) < 0.35
        assert loc == pytest.approx(1.0, abs=0.5)
        assert scale == pytest.approx(2.0, rel=0.3)


class TestEndToEndReinclusion:
    def test_fitter_accepts_reincluded_names(self, spark):
        """The reference's user story: re-include excluded names and fit
        them through the engine (base_fitter accepts the registry)."""
        import pandas as pd

        from spark_bestfit_spark.fitter import DistributionFitter

        reg = DistributionRegistry(custom_exclusions=set())
        rng = np.random.default_rng(5)
        data = rng.gamma(2.0, 2.0, 4000) + 1.0
        df = spark.createDataFrame(pd.DataFrame({"v": data}))
        fitter = DistributionFitter(spark, registry=reg)
        res = fitter.fit(
            df,
            column="v",
            distributions=["mielke", "recipinvgauss", "exponpow", "gamma"],
        )
        rows = {r["distribution"]: r for r in res.df.collect()}
        assert set(rows) == {"mielke", "recipinvgauss", "exponpow", "gamma"}
        for r in rows.values():
            assert np.isfinite(r["sse"])


class TestKstwoDurbinSmallN:
    """The exact small-n branch: Durbin's recursion (Marsaglia-Tsang-
    Wang matrix form) replaces the Stephens limit below n=20, where the
    limit's documented tolerance breaks down."""

    def test_n1_closed_form(self):
        from spark_bestfit_spark.functions.distributions.continuous_excluded import (  # noqa: E501
            _durbin_ks_cdf,
        )

        # P(D_1 < d) = 2d - 1 on [1/2, 1], 0 below
        for d in (0.55, 0.6, 0.75, 0.9, 0.99):
            assert _durbin_ks_cdf(d, 1) == pytest.approx(2 * d - 1, abs=1e-12)
        assert _durbin_ks_cdf(0.3, 1) == 0.0
        assert _durbin_ks_cdf(1.2, 1) == 1.0

    def test_matches_monte_carlo(self):
        from spark_bestfit_spark.functions.distributions.continuous_excluded import (  # noqa: E501
            _durbin_ks_cdf,
        )

        rng = np.random.default_rng(7)
        for n in (3, 5, 8, 12):
            u = np.sort(rng.uniform(size=(200_000, n)), axis=1)
            i = np.arange(1, n + 1)
            D = np.maximum(
                (i / n - u).max(axis=1), (u - (i - 1) / n).max(axis=1)
            )
            for d in (0.2, 0.3, 0.45):
                mc = float((D < d).mean())
                assert _durbin_ks_cdf(d, n) == pytest.approx(mc, abs=4e-3)

    def test_dispatch_uses_durbin_below_threshold(self):
        from spark_bestfit_spark.functions.distributions.continuous_excluded import (  # noqa: E501
            _DURBIN_N_MAX,
            _durbin_ks_cdf,
        )

        d = get_distribution("kstwo")
        # integer n below the threshold: the class CDF is the exact
        # Durbin value (table interpolation error << 1e-6)
        for n in (2, 5, 9, 15, 19):
            assert n < _DURBIN_N_MAX
            for x in (0.1, 0.22, 0.37, 0.51):
                got = float(d._cdf(np.array([x]), float(n))[0])
                assert got == pytest.approx(
                    _durbin_ks_cdf(x, n), abs=1e-6
                ), (n, x)

    def test_durbin_vs_stephens_within_documented_band(self):
        """At the dispatch threshold the two branches must agree to the
        Stephens limit's documented accuracy in its valid regime (the
        body/upper tail); the left tail is why the exact branch exists."""
        from spark_bestfit_spark.functions.distributions.continuous_excluded import (  # noqa: E501
            _durbin_ks_cdf,
        )
        from spark_bestfit_spark.functions import special as sp

        d = get_distribution("kstwo")
        for n in (20, 25, 40):
            for x in (0.25, 0.3, 0.4):
                steph = float(
                    1.0
                    - np.asarray(
                        sp.kolmogorov_sf(np.array([x * d._stretch(n)]))
                    )[0]
                )
                assert abs(_durbin_ks_cdf(x, n) - steph) < 2e-3, (n, x)

    def test_fractional_n_interpolates_and_is_monotone(self):
        d = get_distribution("kstwo")
        xs = np.linspace(0.05, 0.95, 60)
        for n in (4.5, 7.25, 18.9):
            c = d._cdf(xs, n)
            assert np.all(np.diff(c) >= -1e-12)
            assert np.all((c >= 0.0) & (c <= 1.0))
            lo = d._cdf(xs, float(np.floor(n)))
            hi = d._cdf(xs, float(np.ceil(n)))
            assert np.all(c >= np.minimum(lo, hi) - 1e-12)
            assert np.all(c <= np.maximum(lo, hi) + 1e-12)

    def test_pdf_integrates_to_one_small_n(self):
        d = get_distribution("kstwo")
        xs = np.linspace(0.0, 1.0, 4001)
        for n in (3.0, 8.0, 15.0):
            pdf = d._pdf(xs, n)
            integral = float(np.trapz(pdf, xs))
            assert integral == pytest.approx(1.0, abs=5e-3), n


class TestLogKvLargeArgument:
    """The log-Bessel quadrature must stay accurate when the integrand
    narrows (width ~ 1/sqrt(w)): large w dispatches to Hankel's
    asymptotic expansion and the mid range scales its node count, so
    genhyperbolic/geninvgauss log-pdfs hold ~1e-5 accuracy everywhere
    (the former fixed 512-node grid degraded past w ~ a few hundred)."""

    @staticmethod
    def _ref_log_kv(nu, w):
        nu = abs(nu)
        t_peak = np.arcsinh(nu / w)
        t_max = t_peak + np.arccosh(1.0 + 745.0 / w) + 2.0
        t = np.linspace(0.0, t_max, 200001)
        ant = np.abs(nu * t)
        log_chn = ant - np.log(2.0) + np.log1p(np.exp(-2.0 * ant))
        expo = -w * (np.cosh(t) - 1.0) + log_chn
        m = expo.max()
        s = np.exp(expo - m)
        s[0] *= 0.5
        s[-1] *= 0.5
        return m + np.log(s.sum() * (t[1] - t[0])) - w

    def test_accuracy_across_regimes(self):
        from spark_bestfit_spark.functions.distributions.continuous_excluded import (  # noqa: E501
            _log_kv,
        )

        for nu in (0.0, 0.5, 2.0, 7.3, 25.0):
            for w in (0.5, 50.0, 500.0, 2000.0, 3999.0, 4001.0, 1e5):
                got = float(_log_kv(nu, np.array([w]))[0])
                assert got == pytest.approx(
                    self._ref_log_kv(nu, w), abs=5e-5
                ), (nu, w)

    def test_known_half_order_value(self):
        # K_{1/2}(w) = sqrt(pi/(2w)) e^{-w} exactly
        from spark_bestfit_spark.functions.distributions.continuous_excluded import (  # noqa: E501
            _log_kv,
        )

        for w in (1.0, 10.0, 333.0, 5e4):
            expect = 0.5 * np.log(np.pi / (2.0 * w)) - w
            assert float(_log_kv(0.5, np.array([w]))[0]) == pytest.approx(
                expect, abs=2e-5
            ), w
