"""Tests for copula / multivariate-normal / Gaussian-mixture models."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.models import (
    GaussianCopula,
    GaussianMixtureFitter,
    MultivariateNormalFitter,
    MultivariateNormalResult,
)
from spark_bestfit_spark.models.copula import spearman_correlation


@pytest.fixture(scope="module")
def corr_df(spark):
    """Two strongly correlated columns + one independent."""
    rng = np.random.default_rng(42)
    n = 4000
    x = rng.normal(50, 10, n)
    y = 2.0 * x + rng.normal(0, 5, n)   # strong positive
    z = rng.exponential(5, n)           # independent
    return spark.createDataFrame(pd.DataFrame({"x": x, "y": y, "z": z}))


class TestSpearman:
    def test_known_structure(self, corr_df):
        corr = spearman_correlation(corr_df, ["x", "y", "z"])
        assert corr.shape == (3, 3)
        assert np.allclose(np.diag(corr), 1.0)
        assert corr[0, 1] > 0.9
        assert abs(corr[0, 2]) < 0.1

    def test_null_rows_skipped(self, spark):
        pdf = pd.DataFrame({"a": [1.0, 2.0, None, 4.0], "b": [2.0, 4.0, 6.0, 8.0]})
        corr = spearman_correlation(spark.createDataFrame(pdf), ["a", "b"])
        assert abs(corr[0, 1] - 1.0) < 1e-9


@pytest.fixture(scope="module")
def fitted_copula(spark, corr_df):
    from spark_bestfit_spark.fitter import DistributionFitter

    results = DistributionFitter(spark).fit(
        corr_df, columns=["x", "y", "z"],
        distributions=["norm", "gamma", "lognorm", "expon", "uniform"],
    )
    return GaussianCopula.fit(results, corr_df, metric="sse")


class TestCopula:
    def test_fit_shape(self, fitted_copula):
        c = fitted_copula
        assert c.column_names == ["x", "y", "z"]
        assert c.correlation.shape == (3, 3)
        assert set(c.marginals) == {"x", "y", "z"}

    def test_local_sample_preserves_correlation(self, fitted_copula):
        out = fitted_copula.sample(5000, seed=1)
        sx, sy = out["x"], out["y"]
        r = np.corrcoef(sx, sy)[0, 1]
        assert r > 0.8, f"copula lost correlation: {r}"
        assert abs(np.mean(sx) - 50.0) < 2.0

    def test_distributed_sample(self, spark, fitted_copula):
        df = fitted_copula.sample_distributed(spark, 8000, num_partitions=4)
        assert df.columns == ["x", "y", "z"]
        pdf = df.toPandas()
        assert len(pdf) == 8000
        r = np.corrcoef(pdf["x"], pdf["y"])[0, 1]
        assert r > 0.8

    def test_distributed_deterministic(self, spark, fitted_copula):
        a = fitted_copula.sample_distributed(spark, 1000, num_partitions=4, seed=5)
        b = fitted_copula.sample_distributed(spark, 1000, num_partitions=4, seed=5)
        pa = np.sort(a.toPandas()["x"].to_numpy())
        pb = np.sort(b.toPandas()["x"].to_numpy())
        assert np.allclose(pa, pb)

    def test_return_uniform(self, fitted_copula):
        u = fitted_copula.sample(2000, seed=3, return_uniform=True)
        for c in ("x", "y", "z"):
            assert u[c].min() >= 0.0 and u[c].max() <= 1.0
            assert abs(u[c].mean() - 0.5) < 0.05

    def test_serialization_roundtrip(self, fitted_copula, tmp_path):
        p = str(tmp_path / "copula.json")
        fitted_copula.save(p)
        loaded = GaussianCopula.load(p)
        assert loaded.column_names == fitted_copula.column_names
        assert np.allclose(loaded.correlation, fitted_copula.correlation)
        a = loaded.sample(100, seed=9)
        b = fitted_copula.sample(100, seed=9)
        for c in loaded.column_names:
            assert np.allclose(a[c], b[c])

    def test_requires_two_columns(self, spark, corr_df):
        from spark_bestfit_spark.fitter import DistributionFitter

        res = DistributionFitter(spark).fit(
            corr_df, column="x", distributions=["norm"]
        )
        with pytest.raises(ValueError):
            GaussianCopula.fit(res, corr_df, columns=["x"])


class TestMultivariateNormal:
    def test_fit_recovers_moments(self, spark, corr_df):
        res = MultivariateNormalFitter(spark).fit(corr_df, ["x", "y"])
        assert abs(res.mean[0] - 50.0) < 1.0
        assert abs(res.mean[1] - 100.0) < 2.0
        # var(x) ~ 100; cov(x,y) ~ 200; var(y) ~ 425
        assert abs(res.cov[0, 0] - 100.0) < 15.0
        assert abs(res.cov[0, 1] - 200.0) < 25.0

    def test_matches_numpy_cov_exactly(self, spark):
        rng = np.random.default_rng(0)
        pdf = pd.DataFrame(rng.normal(0, 1, (500, 3)), columns=["a", "b", "c"])
        res = MultivariateNormalFitter(spark).fit(
            spark.createDataFrame(pdf), ["a", "b", "c"]
        )
        np_cov = np.cov(pdf.to_numpy().T, ddof=1)
        assert np.allclose(res.cov, np_cov, rtol=1e-8)
        assert np.allclose(res.mean, pdf.mean().to_numpy(), rtol=1e-10)

    def test_sample_local_and_distributed(self, spark, corr_df):
        res = MultivariateNormalFitter(spark).fit(corr_df, ["x", "y"])
        local = res.sample(5000, seed=2)
        assert abs(np.corrcoef(local[:, 0], local[:, 1])[0, 1] - 0.97) < 0.05
        dist = res.sample_distributed(spark, 5000, num_partitions=4)
        pdf = dist.toPandas()
        assert len(pdf) == 5000
        assert abs(pdf["x"].mean() - res.mean[0]) < 1.0

    def test_pdf_integrates_sanely(self, spark, corr_df):
        res = MultivariateNormalFitter(spark).fit(corr_df, ["x", "y"])
        p_at_mean = res.pdf(res.mean[None, :])[0]
        p_far = res.pdf((res.mean + 50)[None, :])[0]
        assert p_at_mean > p_far

    def test_serialization_roundtrip(self, spark, corr_df, tmp_path):
        res = MultivariateNormalFitter(spark).fit(corr_df, ["x", "y"])
        p = str(tmp_path / "mvn.json")
        res.save(p)
        loaded = MultivariateNormalResult.load(p)
        assert np.allclose(loaded.cov, res.cov)
        assert np.allclose(loaded.sample(50, seed=1), res.sample(50, seed=1))


class TestGaussianMixture:
    @pytest.fixture(scope="class")
    def bimodal(self):
        rng = np.random.default_rng(42)
        return np.concatenate(
            [rng.normal(-5, 1, 2000), rng.normal(5, 1, 3000)]
        )

    def test_recovers_two_modes(self, bimodal):
        res = GaussianMixtureFitter(n_components=2, n_init=2).fit(bimodal)
        means = sorted(res.means.ravel())
        assert abs(means[0] - (-5)) < 0.5
        assert abs(means[1] - 5) < 0.5
        w = sorted(res.weights)
        assert abs(w[0] - 0.4) < 0.05 and abs(w[1] - 0.6) < 0.05
        assert res.converged

    def test_aic_bic_prefer_right_k(self, bimodal):
        r1 = GaussianMixtureFitter(n_components=1).fit(bimodal)
        r2 = GaussianMixtureFitter(n_components=2, n_init=2).fit(bimodal)
        assert r2.bic < r1.bic
        assert r2.aic < r1.aic

    def test_predict_separates_modes(self, bimodal):
        res = GaussianMixtureFitter(n_components=2, n_init=2).fit(bimodal)
        lab_lo = res.predict(np.array([[-5.0]]))[0]
        lab_hi = res.predict(np.array([[5.0]]))[0]
        assert lab_lo != lab_hi
        proba = res.predict_proba(np.array([[-5.0]]))
        assert proba.shape == (1, 2)
        assert abs(proba.sum() - 1.0) < 1e-9

    def test_sample_roundtrip(self, bimodal):
        res = GaussianMixtureFitter(n_components=2, n_init=2).fit(bimodal)
        s = res.sample(5000, seed=3).ravel()
        # refit on the sample recovers the same modes
        res2 = GaussianMixtureFitter(n_components=2, n_init=2).fit(s)
        assert np.allclose(
            sorted(res.means.ravel()), sorted(res2.means.ravel()), atol=0.5
        )

    def test_multivariate_fit(self):
        rng = np.random.default_rng(1)
        a = rng.multivariate_normal([0, 0], np.eye(2), 1500)
        b = rng.multivariate_normal([8, 8], np.eye(2), 1500)
        res = GaussianMixtureFitter(n_components=2, n_init=2).fit(
            np.vstack([a, b])
        )
        got = sorted(res.means[:, 0])
        assert abs(got[0]) < 0.5 and abs(got[1] - 8) < 0.5

    def test_distributed_fit(self, spark, corr_df):
        res = GaussianMixtureFitter(n_components=2, max_iter=30).fit_distributed(
            corr_df, ["x", "y"]
        )
        assert res.n_components == 2
        assert res.means.shape == (2, 2)
        assert res.n_samples == 4000
        s = res.sample(100, seed=1)
        assert s.shape == (100, 2)

    def test_serialization_roundtrip(self, bimodal, tmp_path):
        res = GaussianMixtureFitter(n_components=2).fit(bimodal)
        p = str(tmp_path / "gmm.json")
        res.save(p)
        from spark_bestfit_spark.models import GaussianMixtureResult

        loaded = GaussianMixtureResult.load(p)
        assert np.allclose(loaded.weights, res.weights)
        assert np.allclose(loaded.means, res.means)
        assert abs(loaded.bic - res.bic) < 1e-9
