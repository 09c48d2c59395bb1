"""Accuracy tests for the NumPy special-function layer."""

from __future__ import annotations

import math

import numpy as np
import pytest

from spark_bestfit_spark.functions import special as sp


class TestErf:
    def test_matches_math_erf(self):
        xs = np.linspace(-6, 6, 101)
        ours = sp.erf(xs)
        theirs = np.array([math.erf(v) for v in xs])
        np.testing.assert_allclose(ours, theirs, atol=1e-14)

    def test_erfc_tail_relative_accuracy(self):
        # erfc(5) = 1.5374597944280349e-12 (known value)
        val = sp.erfc(np.array([5.0]))[0]
        assert val == pytest.approx(1.5374597944280349e-12, rel=1e-10)

    def test_erfc_negative(self):
        xs = np.linspace(-4, 4, 41)
        np.testing.assert_allclose(
            sp.erfc(xs) + sp.erf(xs), np.ones_like(xs), atol=1e-13
        )


class TestGammaln:
    def test_matches_math_lgamma(self):
        xs = [0.1, 0.5, 1.0, 1.5, 2.0, 3.7, 10.0, 100.5, 1e4]
        for x in xs:
            assert sp.gammaln(x) == pytest.approx(math.lgamma(x), rel=1e-12)

    def test_reflection_negative(self):
        assert sp.gammaln(-0.5) == pytest.approx(math.lgamma(-0.5), rel=1e-10)

    def test_poles(self):
        assert np.isinf(sp.gammaln(0.0))
        assert np.isinf(sp.gammaln(-2.0))


class TestGammainc:
    def test_exponential_identity(self):
        # P(1, x) = 1 - exp(-x)
        x = np.linspace(0.01, 30, 60)
        np.testing.assert_allclose(
            sp.gammainc(1.0, x), 1.0 - np.exp(-x), atol=1e-13
        )

    def test_complement(self):
        a = np.array([0.3, 1.0, 2.5, 10.0, 100.0])
        x = np.array([0.1, 1.0, 3.0, 9.0, 110.0])
        np.testing.assert_allclose(
            sp.gammainc(a, x) + sp.gammaincc(a, x), np.ones(5), atol=1e-13
        )

    def test_inverse_roundtrip(self):
        a = np.array([0.5, 1.0, 2.5, 10.0, 100.0])
        p = np.array([0.01, 0.25, 0.5, 0.9, 0.999])
        x = sp.gammaincinv(a, p)
        np.testing.assert_allclose(sp.gammainc(a, x), p, atol=1e-10)

    def test_edges(self):
        assert sp.gammainc(2.0, 0.0) == 0.0
        assert sp.gammaincinv(2.0, 0.0) == 0.0
        assert np.isinf(sp.gammaincinv(2.0, 1.0))


class TestBetainc:
    def test_uniform_identity(self):
        x = np.linspace(0, 1, 21)
        np.testing.assert_allclose(sp.betainc(1.0, 1.0, x), x, atol=1e-14)

    def test_polynomial_identity(self):
        # I_x(2,2) = 3x^2 - 2x^3
        x = np.linspace(0, 1, 21)
        np.testing.assert_allclose(
            sp.betainc(2.0, 2.0, x), 3 * x**2 - 2 * x**3, atol=1e-13
        )

    def test_symmetry(self):
        x = np.linspace(0.01, 0.99, 20)
        np.testing.assert_allclose(
            sp.betainc(2.5, 4.0, x),
            1.0 - sp.betainc(4.0, 2.5, 1.0 - x),
            atol=1e-13,
        )

    def test_inverse_roundtrip(self):
        p = np.linspace(0.001, 0.999, 30)
        x = sp.betaincinv(2.0, 5.0, p)
        np.testing.assert_allclose(sp.betainc(2.0, 5.0, x), p, atol=1e-10)


class TestNdtr:
    def test_known_values(self):
        assert sp.ndtr(np.array([0.0]))[0] == pytest.approx(0.5, abs=1e-15)
        assert sp.ndtr(np.array([1.959963984540054]))[0] == pytest.approx(
            0.975, abs=1e-12
        )

    def test_ndtri_roundtrip(self):
        p = np.array([1e-12, 1e-6, 0.01, 0.3, 0.5, 0.7, 0.99, 1 - 1e-9])
        z = sp.ndtri(p)
        np.testing.assert_allclose(sp.ndtr(z), p, rtol=1e-10)

    def test_ndtri_known(self):
        assert sp.ndtri(np.array([0.975]))[0] == pytest.approx(
            1.959963984540054, abs=1e-12
        )

    def test_log_ndtr_deep_tail(self):
        # log Phi(-30) = -0.5*900 - log(sqrt(2pi)) - log(30) + log(series)
        v = sp.log_ndtr(np.array([-30.0]))[0]
        assert v == pytest.approx(-454.32121, abs=1e-3)

    def test_symmetry(self):
        z = np.linspace(-8, 8, 33)
        np.testing.assert_allclose(
            sp.ndtr(z) + sp.ndtr(-z), np.ones_like(z), atol=1e-13
        )


class TestDigamma:
    def test_known_values(self):
        euler = 0.5772156649015329
        assert sp.digamma(1.0) == pytest.approx(-euler, abs=1e-8)
        # psi(2) = 1 - gamma
        assert sp.digamma(2.0) == pytest.approx(1 - euler, abs=1e-8)
        # psi(1/2) = -gamma - 2 ln 2
        assert sp.digamma(0.5) == pytest.approx(
            -euler - 2 * math.log(2), abs=1e-8
        )


class TestKolmogorov:
    def test_known_quantile(self):
        # classical critical value: sf(1.36) ~ 0.049
        assert sp.kolmogorov_sf(1.36) == pytest.approx(0.049, abs=5e-4)

    def test_limits(self):
        assert sp.kolmogorov_sf(0.0) == 1.0
        assert sp.kolmogorov_sf(5.0) == pytest.approx(0.0, abs=1e-10)

    def test_series_continuity_at_switch(self):
        lo = sp.kolmogorov_sf(1.1799)
        hi = sp.kolmogorov_sf(1.1801)
        assert abs(lo - hi) < 1e-3


class TestBessel:
    """A&S 9.8 modified Bessel approximations vs published table values."""

    GOLDEN = [
        ("i0", 1.0, 1.2660658777520084),
        ("i0", 5.0, 27.239871823604442),
        ("i1", 1.0, 0.5651591039924851),
        ("i1", 5.0, 24.33564214245053),
        ("k0", 1.0, 0.42102443824070823),
        ("k0", 5.0, 0.003691098334042594),
        ("k1", 1.0, 0.6019072301972346),
        ("k1", 5.0, 0.004044613445452164),
    ]

    def test_golden_values(self):
        for name, x, want in self.GOLDEN:
            got = float(np.asarray(getattr(sp, name)(x)).ravel()[0])
            assert abs(got - want) / want < 5e-7, (name, x, got, want)

    def test_log_variants_match_linear_in_range(self):
        x = np.linspace(0.1, 20.0, 50)
        assert np.allclose(
            np.asarray(sp.log_i0(x)), np.log(np.asarray(sp.i0(x))), rtol=1e-9
        )
        assert np.allclose(
            np.asarray(sp.log_k1(x)), np.log(np.asarray(sp.k1(x))), rtol=1e-6
        )

    def test_log_variants_no_overflow(self):
        big = np.asarray(sp.log_i0(np.array([800.0])))
        assert np.isfinite(big).all() and big[0] > 700
        small = np.asarray(sp.log_k1(np.array([800.0])))
        assert np.isfinite(small).all() and small[0] < -700

    def test_i1_odd_k_positive(self):
        x = np.linspace(0.1, 10, 20)
        assert np.allclose(np.asarray(sp.i1(-x)), -np.asarray(sp.i1(x)))
        assert (np.asarray(sp.k0(x)) > 0).all()
        assert (np.asarray(sp.k1(x)) > 0).all()
