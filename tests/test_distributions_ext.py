"""Tests for the extended distribution library (parity batch to ~82
continuous distributions). Every new distribution gets: CDF/PPF
round-trip, PDF = d(CDF)/dx, and MLE recovery (fit log-likelihood not
materially worse than the truth)."""

from __future__ import annotations

import numpy as np
import pytest

from spark_bestfit_spark.functions.distributions.registry import (
    CONTINUOUS,
    get_continuous,
)

NEW_CASES = [
    ("argus", (2.0, 0.0, 1.0)),
    ("crystalball", (1.5, 3.0, 0.0, 1.0)),
    ("exponnorm", (1.5, 0.0, 1.0)),
    ("fatiguelife", (0.5, 0.0, 1.0)),
    ("genhalflogistic", (0.5, 0.0, 1.0)),
    ("halfgennorm", (1.5, 0.0, 1.0)),
    ("invgamma", (3.0, 0.0, 1.0)),
    ("kappa3", (2.0, 0.0, 1.0)),
    ("laplace_asymmetric", (1.5, 0.0, 1.0)),
    ("levy_l", (0.0, 1.0)),
    ("loguniform", (1.0, 8.0, 0.0, 1.0)),
    ("moyal", (0.0, 1.0)),
    ("pearson3", (1.0, 0.0, 1.0)),
    ("pearson3", (-1.0, 0.0, 1.0)),  # negative-skew branch
    ("powernorm", (2.0, 0.0, 1.0)),
    ("rdist", (3.0, 0.0, 1.0)),
    ("reciprocal", (1.0, 8.0, 0.0, 1.0)),
    ("skewcauchy", (0.5, 0.0, 1.0)),
    ("skewcauchy", (-0.5, 0.0, 1.0)),
    ("skewnorm", (3.0, 0.0, 1.0)),
    ("skewnorm", (-3.0, 0.0, 1.0)),
    ("trapezoid", (0.2, 0.7, 0.0, 1.0)),
    ("truncnorm", (-1.0, 2.0, 0.0, 1.0)),
    ("truncpareto", (1.8, 5.0, 0.0, 1.0)),
    ("wrapcauchy", (0.5, 0.0, 1.0)),
]

Q = np.array([0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99])


class TestExtendedLibrary:
    def test_registry_size(self):
        assert len(CONTINUOUS) >= 82

    @pytest.mark.parametrize("name,params", NEW_CASES)
    def test_cdf_ppf_roundtrip(self, name, params):
        d = get_continuous(name)
        x = d.ppf(Q, *params)
        assert np.all(np.isfinite(x)), x
        assert np.allclose(d.cdf(x, *params), Q, atol=2e-4)

    @pytest.mark.parametrize("name,params", NEW_CASES)
    def test_pdf_is_cdf_derivative(self, name, params):
        d = get_continuous(name)
        m = d.ppf(np.array([0.4]), *params)[0]
        h = 1e-5 * max(abs(m), 1.0)
        num = (
            d.cdf(np.array([m + h]), *params)[0]
            - d.cdf(np.array([m - h]), *params)[0]
        ) / (2 * h)
        pdfv = d.pdf(np.array([m]), *params)[0]
        assert abs(num - pdfv) < 5e-3 * max(pdfv, 1e-6)

    @pytest.mark.parametrize("name,params", NEW_CASES)
    def test_cdf_monotone_in_support(self, name, params):
        d = get_continuous(name)
        x = d.ppf(np.linspace(0.02, 0.98, 49), *params)
        c = d.cdf(x, *params)
        assert np.all(np.diff(c) >= -1e-12)

    @pytest.mark.parametrize("name,params", NEW_CASES)
    def test_fit_recovery(self, name, params):
        d = get_continuous(name)
        s = d.rvs(params, 4000, np.random.default_rng(42))
        assert np.all(np.isfinite(s))
        fitted = d.fit(s)
        ll_true = -d.nnlf(params, s)
        ll_fit = -d.nnlf(fitted, s)
        assert np.isfinite(ll_fit)
        assert ll_fit > ll_true - 0.05 * abs(ll_true) - 50.0

    def test_pearson3_support_sides(self):
        d = get_continuous("pearson3")
        # positive skew: bounded below; negative skew: bounded above
        lo, hi = d.support(1.0, 0.0, 1.0)
        assert np.isfinite(lo) and not np.isfinite(hi)
        lo, hi = d.support(-1.0, 0.0, 1.0)
        assert not np.isfinite(lo) and np.isfinite(hi)

    def test_truncnorm_respects_bounds(self):
        d = get_continuous("truncnorm")
        s = d.rvs((-1.0, 2.0, 10.0, 3.0), 2000, np.random.default_rng(0))
        assert s.min() >= 10.0 - 3.0 - 1e-9
        assert s.max() <= 10.0 + 6.0 + 1e-9

    def test_loguniform_log_is_uniform(self):
        d = get_continuous("loguniform")
        s = d.rvs((1.0, 100.0, 0.0, 1.0), 20_000, np.random.default_rng(1))
        logs = np.log(s)
        hist, _ = np.histogram(logs, bins=10, range=(0, np.log(100)))
        assert hist.std() / hist.mean() < 0.12  # near-flat

    def test_skewnorm_zero_skew_limit_matches_normal(self):
        d = get_continuous("skewnorm")
        norm = get_continuous("norm")
        x = np.linspace(-3, 3, 31)
        a_small = d.cdf(x, 1e-6, 0.0, 1.0)
        assert np.allclose(a_small, norm.cdf(x, 0.0, 1.0), atol=1e-5)

    def test_fitter_runs_full_library(self, spark, lineitem):
        from spark_bestfit_spark.fitter import DistributionFitter

        res = DistributionFitter(spark).fit(
            lineitem.limit(2000), column="l_extendedprice",
            lazy_metrics=True,
        )
        # most of the 80+ distributions should produce non-sentinel fits
        assert res.count() >= 55


class TestParityBatch3:
    """gengamma / truncweibull_min / jf_skew_t / rice / norminvgauss
    (reference default-set stragglers needing Bessel/betainc machinery)."""

    NEW = {
        "gengamma": (2.0, 1.5, 0.0, 1.0),
        "truncweibull_min": (1.7, 0.1, 2.0, 0.0, 1.0),
        "jf_skew_t": (2.0, 4.0, 0.0, 1.0),
        "rice": (1.5, 0.0, 1.0),
        "norminvgauss": (1.5, 0.5, 0.0, 1.0),
    }

    def test_pdf_integrates_to_one(self):
        for name, params in self.NEW.items():
            d = get_continuous(name)
            lo, hi = d.support(*params)
            x = np.linspace(
                lo + 1e-9 if np.isfinite(lo) else -50.0,
                hi if np.isfinite(hi) else 50.0,
                100_001,
            )
            total = np.trapz(d.pdf(x, *params), x)
            assert abs(total - 1.0) < 1e-3, (name, total)

    def test_ppf_cdf_roundtrip(self):
        q = np.array([0.01, 0.1, 0.5, 0.9, 0.99])
        for name, params in self.NEW.items():
            d = get_continuous(name)
            rt = d.cdf(d.ppf(q, *params), *params)
            assert np.allclose(rt, q, atol=1e-6), (name, rt)

    def test_rice_zero_b_is_rayleigh(self):
        x = np.linspace(0.01, 8, 100)
        rice = get_continuous("rice").pdf(x, 0.0, 0.0, 1.0)
        ray = get_continuous("rayleigh").pdf(x, 0.0, 1.0)
        assert np.allclose(rice, ray, atol=1e-12)

    def test_rice_large_b_quadrature_path(self):
        d = get_continuous("rice")
        q = np.array([0.05, 0.5, 0.95])
        rt = d.cdf(d.ppf(q, 40.0, 0.0, 1.0), 40.0, 0.0, 1.0)
        assert np.allclose(rt, q, atol=1e-6)

    def test_gengamma_c1_is_gamma(self):
        x = np.linspace(0.01, 10, 100)
        gg = get_continuous("gengamma").pdf(x, 2.5, 1.0, 0.0, 1.0)
        ga = get_continuous("gamma").pdf(x, 2.5, 0.0, 1.0)
        assert np.allclose(gg, ga, atol=1e-12)

    def test_jf_skew_t_symmetric_is_student_t(self):
        x = np.linspace(-6, 6, 100)
        jf = get_continuous("jf_skew_t").pdf(x, 3.0, 3.0, 0.0, 1.0)
        tt = get_continuous("t").pdf(x, 6.0, 0.0, 1.0)
        assert np.allclose(jf, tt, atol=1e-12)

    def test_norminvgauss_symmetric_and_skewed(self):
        d = get_continuous("norminvgauss")
        x = np.linspace(-5, 5, 101)
        sym = d.pdf(x, 2.0, 0.0, 0.0, 1.0)
        assert np.allclose(sym, sym[::-1], atol=1e-10)
        skew = d.pdf(x, 2.0, 1.0, 0.0, 1.0)
        m = np.trapz(x * skew, x)
        assert m > 0.1  # positive b -> right shift

    def test_fit_recovery(self):
        rng = np.random.default_rng(7)
        for name, true in [
            ("gengamma", (2.0, 1.5, 10.0, 5.0)),
            ("rice", (2.0, 0.0, 3.0)),
            ("norminvgauss", (1.5, 0.5, 10.0, 4.0)),
            ("jf_skew_t", (2.0, 5.0, 0.0, 2.0)),
        ]:
            d = get_continuous(name)
            data = d.rvs(true, 5000, random_state=rng)
            fitted = d.fit(data)
            xs = np.sort(data)
            c = d.cdf(xs, *fitted)
            n = len(xs)
            ks = max(
                np.max(np.arange(1, n + 1) / n - c),
                np.max(c - np.arange(0, n) / n),
            )
            assert ks < 0.05, (name, ks, fitted)


class TestIrwinHall:
    def test_small_n_closed_forms(self):
        d = get_continuous("irwinhall")
        # n=1 is U(0,1); n=2 is triangular on [0,2]
        assert np.allclose(
            d.cdf(np.array([0.25, 0.5, 0.75]), 1.0, 0.0, 1.0),
            [0.25, 0.5, 0.75],
        )
        assert np.allclose(d.pdf(np.array([1.0]), 2.0, 0.0, 1.0), [1.0])
        assert np.allclose(d.cdf(np.array([1.0]), 2.0, 0.0, 1.0), [0.5])

    def test_large_n_stable(self):
        # the alternating-binomial formula is unusable here; the
        # de Boor evaluation must stay exact-ish
        d = get_continuous("irwinhall")
        n = 40.0
        grid = np.linspace(0.0, 40.0, 40001)
        p = d.pdf(grid, n, 0.0, 1.0)
        assert np.all(p >= 0)
        assert abs(np.trapz(p, grid) - 1.0) < 1e-6
        assert abs(d.cdf(np.array([20.0]), n, 0.0, 1.0)[0] - 0.5) < 1e-12
        c = d.cdf(grid, n, 0.0, 1.0)
        assert np.all(np.diff(c) >= -1e-12)

    def test_fit_recovers_uniform_and_quality(self):
        d = get_continuous("irwinhall")
        rng = np.random.default_rng(11)
        flat = rng.uniform(5.0, 9.0, 3000)
        n_, loc, scale = d.fit(flat)
        assert n_ == 1.0
        assert abs(loc - 5.0) < 0.1 and abs(scale - 4.0) < 0.2
        data = d.rvs((6.0, 2.0, 3.0), 3000, random_state=rng)
        fit = d.fit(data)
        xs = np.sort(data)
        c = d.cdf(xs, *fit)
        n = len(xs)
        ks = max(
            np.max(np.arange(1, n + 1) / n - c),
            np.max(c - np.arange(0, n) / n),
        )
        assert ks < 0.05


class TestRelBreitwigner:
    def test_normalization_and_cdf(self):
        d = get_continuous("rel_breitwigner")
        for rho in (0.8, 3.0, 15.0):
            grid = np.linspace(0.0, 400.0 * max(1.0, rho / 3.0), 400001)
            p = d.pdf(grid, rho, 0.0, 1.0)
            assert abs(np.trapz(p, grid) - 1.0) < 2e-3
            pts = np.array([0.5 * rho, rho, 3.0 * rho])
            cq = [np.trapz(p[grid <= t], grid[grid <= t]) for t in pts]
            assert np.allclose(d.cdf(pts, rho, 0.0, 1.0), cq, atol=1e-5)
        assert d.cdf(np.array([1e9]), 3.0, 0.0, 1.0)[0] == 1.0

    def test_roundtrip_and_fit(self):
        d = get_continuous("rel_breitwigner")
        q = np.array([0.05, 0.5, 0.95])
        rt = d.cdf(d.ppf(q, 4.0, 0.0, 1.0), 4.0, 0.0, 1.0)
        assert np.allclose(rt, q, atol=1e-9)
        rng = np.random.default_rng(5)
        data = d.rvs((3.0, 0.0, 2.0), 4000, random_state=rng)
        rho, loc, scale = d.fit(data)
        assert abs(rho - 3.0) < 0.5 and abs(scale - 2.0) < 0.4


class TestLandau:
    # ground truth from two independent exact representations (the
    # defining sin-integral at dt=5e-5 and the Bromwich steepest-descent
    # contour) agreeing to 9 digits
    def test_known_values(self):
        d = get_continuous("landau")
        for x, truth in [
            (0.0, 0.17885416),
            (-1.0, 0.15139191),
            (-3.5, 7.1518499e-06),
        ]:
            got = d.pdf(np.array([x]), 0.0, 1.0)[0]
            assert abs(got - truth) / truth < 1e-4, (x, got)

    def test_mode_and_median(self):
        d = get_continuous("landau")
        grid = np.linspace(-2.0, 2.0, 40001)
        p = d.pdf(grid, 0.0, 1.0)
        assert abs(grid[np.argmax(p)] + 0.2228) < 2e-3
        assert abs(d.ppf(np.array([0.5]), 0.0, 1.0)[0] - 1.35578) < 1e-3

    def test_mass_and_tail(self):
        d = get_continuous("landau")
        big = np.linspace(-16.0, 2000.0, 1_000_000)
        mass = np.trapz(d.pdf(big, 0.0, 1.0), big) + (
            1.0 - d.cdf(np.array([2000.0]), 0.0, 1.0)[0]
        )
        assert abs(mass - 1.0) < 1e-4
        # survival beyond the table follows c/x
        s5k = 1.0 - d.cdf(np.array([5000.0]), 0.0, 1.0)[0]
        assert 1.5e-4 < s5k < 3e-4
        q = np.array([1e-6, 0.01, 0.5, 0.99, 0.9999])
        rt = d.cdf(d.ppf(q, 0.0, 1.0), 0.0, 1.0)
        assert np.allclose(rt, q, atol=1e-12)

    def test_fit_recovery(self):
        d = get_continuous("landau")
        rng = np.random.default_rng(2)
        data = d.rvs((5.0, 2.0), 4000, random_state=rng)
        loc, scale = d.fit(data)
        assert abs(loc - 5.0) < 0.2 and abs(scale - 2.0) < 0.2


class TestDParetoLognorm:
    def test_pdf_cdf_consistency(self):
        d = get_continuous("dpareto_lognorm")
        grid = np.linspace(1e-9, 200.0, 2_000_001)
        p = d.pdf(grid, 2.0, 3.0, 0.5, 0.0, 1.0)
        pts = np.array([0.3, 1.0, 4.0])
        cq = [np.trapz(p[grid <= t], grid[grid <= t]) for t in pts]
        cd = d.cdf(pts, 2.0, 3.0, 0.5, 0.0, 1.0)
        assert np.allclose(cq, cd, atol=1e-4)

    def test_excluded_by_default_but_registered(self):
        from spark_bestfit_spark.functions.distributions.registry import (
            DEFAULT_EXCLUSIONS,
            DistributionRegistry,
        )
        assert "dpareto_lognorm" in DEFAULT_EXCLUSIONS
        assert "dpareto_lognorm" not in DistributionRegistry().get_distributions()
        reg = DistributionRegistry(custom_exclusions=set())
        assert "dpareto_lognorm" in reg.get_distributions()

    def test_fit_recovery(self):
        d = get_continuous("dpareto_lognorm")
        rng = np.random.default_rng(9)
        data = d.rvs((2.5, 1.5, 0.4, 0.0, 3.0), 4000, random_state=rng)
        fit = d.fit(data)
        xs = np.sort(data)
        c = d.cdf(xs, *fit)
        n = len(xs)
        ks = max(
            np.max(np.arange(1, n + 1) / n - c),
            np.max(c - np.arange(0, n) / n),
        )
        assert ks < 0.05


class TestNCT:
    def test_zero_noncentrality_is_student_t(self):
        d = get_continuous("nct")
        t = get_continuous("t")
        x = np.linspace(-6, 6, 101)
        assert np.allclose(
            d.pdf(x, 5.0, 0.0, 0.0, 1.0), t.pdf(x, 5.0, 0.0, 1.0),
            atol=1e-14,
        )
        assert np.allclose(
            d.cdf(x, 5.0, 0.0, 0.0, 1.0), t.cdf(x, 5.0, 0.0, 1.0),
            atol=1e-14,
        )

    def test_pdf_integrates_and_matches_cdf(self):
        d = get_continuous("nct")
        grid = np.linspace(-40, 60, 200001)
        for df_, nc in [(4.0, 1.5), (8.0, -2.0)]:
            p = d.pdf(grid, df_, nc, 0.0, 1.0)
            assert abs(np.trapz(p, grid) - 1.0) < 1e-3
            pts = np.array([-2.0, 0.0, 3.0])
            cq = [np.trapz(p[grid <= pt], grid[grid <= pt]) for pt in pts]
            cd = d.cdf(pts, df_, nc, 0.0, 1.0)
            assert np.allclose(cq, cd, atol=1e-5)

    def test_roundtrip_and_fit(self):
        d = get_continuous("nct")
        q = np.array([0.05, 0.5, 0.95])
        rt = d.cdf(d.ppf(q, 4.0, 1.5, 0.0, 1.0), 4.0, 1.5, 0.0, 1.0)
        assert np.allclose(rt, q, atol=1e-9)
        rng = np.random.default_rng(3)
        data = d.rvs((5.0, 1.0, 10.0, 4.0), 4000, random_state=rng)
        fit = d.fit(data)
        xs = np.sort(data)
        c = d.cdf(xs, *fit)
        n = len(xs)
        ks = max(
            np.max(np.arange(1, n + 1) / n - c),
            np.max(c - np.arange(0, n) / n),
        )
        assert ks < 0.05
