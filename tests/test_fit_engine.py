"""End-to-end engine tests: DistributionFitter + FitResults."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.fitter import DistributionFitter
from spark_bestfit_spark.plans.config import FitterConfig
from spark_bestfit_spark.results import DistributionFitResult

CORE = ["norm", "expon", "gamma", "lognorm", "uniform"]


@pytest.fixture(scope="module")
def fitter(spark):
    return DistributionFitter(spark)


@pytest.fixture(scope="module")
def normal_results(spark):
    data = np.random.default_rng(42).normal(50.0, 10.0, 10_000)
    df = spark.createDataFrame(pd.DataFrame({"value": data}))
    return DistributionFitter(spark).fit(
        df, column="value", distributions=CORE
    )


class TestFitHappyPath:
    def test_norm_wins_on_normal_data(self, normal_results):
        best = normal_results.best(1, metric="ks_statistic")
        assert best.distribution == "norm"
        assert best.parameters[0] == pytest.approx(50.0, rel=0.05)
        assert best.parameters[1] == pytest.approx(10.0, rel=0.05)
        assert best.ks_statistic < 0.02

    def test_result_count(self, normal_results):
        assert normal_results.count() == len(CORE)

    def test_metrics_populated(self, normal_results):
        best = normal_results.best(1, metric="aic")
        assert np.isfinite(best.aic) and np.isfinite(best.bic)
        assert best.pvalue is not None
        assert best.ad_statistic is not None
        assert best.data_count == 10_000

    def test_best_n_ordering(self, normal_results):
        top = normal_results.best(3, metric="sse")
        sses = [r.sse for r in top]
        assert sses == sorted(sses)

    def test_invalid_metric_raises(self, normal_results):
        with pytest.raises(ValueError, match="invalid metric"):
            normal_results.best(1, metric="bogus")

    def test_model_roundtrip(self, normal_results):
        best = normal_results.best(1, metric="ks_statistic")
        x = best.sample(1000, random_state=7)
        assert x.mean() == pytest.approx(50.0, abs=2.0)
        q = best.cdf(best.ppf(np.array([0.25, 0.5, 0.75])))
        np.testing.assert_allclose(q, [0.25, 0.5, 0.75], atol=1e-9)


class TestResultsQueries:
    def test_filter_thresholds(self, normal_results):
        ks_best = normal_results.best(1, metric="ks_statistic").ks_statistic
        filtered = normal_results.filter(max_ks_statistic=ks_best + 1e-12)
        assert filtered.count() >= 1
        assert filtered.count() < len(CORE)

    def test_for_column(self, normal_results):
        sub = normal_results.for_column("value")
        assert sub.count() == normal_results.count()
        assert normal_results.for_column("nope").count() == 0

    def test_summary_shape(self, normal_results):
        s = normal_results.summary()
        assert s["n_fits"] == len(CORE)
        assert s["n_columns"] == 1
        assert s["sse"]["min"] <= s["sse"]["mean"] <= s["sse"]["max"]

    def test_quality_report(self, normal_results):
        rep = normal_results.quality_report(n=3)
        assert len(rep["top_fits"]) >= 2
        assert rep["n_acceptable"] >= 1
        assert rep["summary"]["n_fits"] == len(CORE)

    def test_columns_listing(self, normal_results):
        assert normal_results.columns() == ["value"]


class TestMultiColumn:
    def test_two_columns_one_fit(self, spark):
        rng = np.random.default_rng(42)
        pdf = pd.DataFrame(
            {"a": rng.normal(0, 1, 4000), "b": rng.exponential(2.0, 4000)}
        )
        df = spark.createDataFrame(pdf)
        res = DistributionFitter(spark).fit(df, columns=["a", "b"], distributions=CORE)
        assert sorted(res.columns()) == ["a", "b"]
        per = res.best_per_column(1, metric="ks_statistic")
        assert per["a"][0].distribution == "norm"
        assert per["b"][0].distribution in ("expon", "gamma")

    def test_best_per_column_rank_width(self, spark):
        rng = np.random.default_rng(1)
        pdf = pd.DataFrame({"a": rng.normal(0, 1, 2000)})
        df = spark.createDataFrame(pdf)
        res = DistributionFitter(spark).fit(df, column="a", distributions=CORE)
        per = res.best_per_column(3, metric="aic")
        assert len(per["a"]) == 3


class TestEdgeCases:
    def test_missing_column_raises(self, spark, fitter):
        df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0]}))
        with pytest.raises(ValueError, match="not found"):
            fitter.fit(df, column="y", distributions=CORE)

    def test_non_numeric_column_raises(self, spark, fitter):
        df = spark.createDataFrame(pd.DataFrame({"s": ["a", "b"]}))
        with pytest.raises(TypeError, match="non-numeric"):
            fitter.fit(df, column="s", distributions=CORE)

    def test_all_nan_column_empty_results(self, spark, fitter):
        pdf = pd.DataFrame({"v": np.full(100, np.nan)})
        df = spark.createDataFrame(pdf)
        res = fitter.fit(df, column="v", distributions=CORE)
        assert res.count() == 0

    def test_constant_column_does_not_raise(self, spark, fitter):
        df = spark.createDataFrame(pd.DataFrame({"v": [5.0] * 500}))
        res = fitter.fit(df, column="v", distributions=CORE)
        # degenerate single-bin histogram; fits may fail -> sentinel-filtered
        assert res.count() >= 0

    def test_nan_mixed_column(self, spark, fitter):
        rng = np.random.default_rng(3)
        vals = rng.normal(10, 2, 1000)
        vals[::10] = np.nan
        df = spark.createDataFrame(pd.DataFrame({"v": vals}))
        res = fitter.fit(df, column="v", distributions=CORE)
        best = res.best(1, metric="ks_statistic")
        assert best.distribution == "norm"
        assert best.data_count == 900

    def test_lazy_metrics_nulls(self, spark, fitter):
        rng = np.random.default_rng(4)
        df = spark.createDataFrame(
            pd.DataFrame({"v": rng.normal(0, 1, 2000)})
        )
        res = fitter.fit(
            df, column="v", distributions=CORE, lazy_metrics=True
        )
        row = res.df.filter("distribution = 'norm'").first()
        assert row["ks_statistic"] is None
        assert np.isfinite(row["aic"])


class TestSerialization:
    def test_json_roundtrip(self, normal_results, tmp_path):
        best = normal_results.best(1, metric="sse")
        p = str(tmp_path / "model.json")
        best.save(p, format="json")
        loaded = DistributionFitResult.load(p)
        assert loaded.distribution == best.distribution
        assert loaded.parameters == pytest.approx(best.parameters)
        assert loaded.sse == pytest.approx(best.sse)

    def test_pickle_roundtrip(self, normal_results, tmp_path):
        best = normal_results.best(1, metric="sse")
        p = str(tmp_path / "model.pkl")
        best.save(p, format="pickle")
        loaded = DistributionFitResult.load(p, format="pickle")
        assert loaded.distribution == best.distribution

    def test_bad_format_raises(self, normal_results, tmp_path):
        best = normal_results.best(1, metric="sse")
        with pytest.raises(ValueError, match="unknown format"):
            best.save(str(tmp_path / "x"), format="yaml")

    def test_load_v10_fixture(self, tmp_path):
        """Schema v1.0 artifact (pre-1.1: no lower/upper_bound keys —
        reference serialization.py:21-22) must load and be usable."""
        import json

        v10 = {
            "schema_version": "1.0",
            "column_name": "v",
            "distribution": "norm",
            "parameters": [2.0, 3.0],
            "sse": 0.0125,
            "aic": 110.5,
            "bic": 115.25,
            "ks_statistic": 0.04,
            "pvalue": 0.61,
        }
        p = str(tmp_path / "v10.json")
        with open(p, "w") as f:
            json.dump(v10, f)
        m = DistributionFitResult.load(p)
        assert m.distribution == "norm"
        assert m.lower_bound is None and m.upper_bound is None
        assert m.sse == pytest.approx(0.0125)
        # the model must be executable, not just parseable
        assert m.cdf(2.0) == pytest.approx(0.5)
        assert m.ppf(0.5) == pytest.approx(2.0)

    def test_load_nested_metrics_layout(self, tmp_path):
        """The reference's nested {"metrics": {...}} JSON layout
        (serialization.py:85-140 supports both) must load too."""
        import json

        nested = {
            "schema_version": "1.1",
            "distribution": "expon",
            "parameters": [0.0, 2.0],
            "metrics": {"sse": 0.002, "aic": 90.0, "ks_statistic": 0.03},
            "data_min": 0.001,
            "data_max": 14.2,
        }
        p = str(tmp_path / "nested.json")
        with open(p, "w") as f:
            json.dump(nested, f)
        m = DistributionFitResult.load(p)
        assert m.aic == pytest.approx(90.0)
        assert m.ks_statistic == pytest.approx(0.03)
        assert m.column_name is None
        assert m.cdf(0.0) == pytest.approx(0.0)

    def test_load_future_schema_ignores_unknown_fields(self, tmp_path):
        """Forward compatibility: a newer-schema payload with unknown
        fields loads, keeping every known field."""
        import json

        future = {
            "schema_version": "9.9",
            "column_name": "x",
            "distribution": "uniform",
            "parameters": [0.0, 1.0],
            "sse": 0.1,
            "brand_new_field": {"anything": [1, 2, 3]},
            "another_unknown": "zzz",
        }
        p = str(tmp_path / "future.json")
        with open(p, "w") as f:
            json.dump(future, f)
        m = DistributionFitResult.load(p)
        assert m.distribution == "uniform"
        assert m.sse == pytest.approx(0.1)

    def test_load_missing_required_raises(self, tmp_path):
        import json

        p = str(tmp_path / "bad.json")
        with open(p, "w") as f:
            json.dump({"schema_version": "1.1", "distribution": "norm"}, f)
        with pytest.raises(ValueError, match="required"):
            DistributionFitResult.load(p)


class TestPandasInput:
    """Duck-typed input contract (reference base_fitter.py:560-611):
    pandas DataFrames are accepted directly and converted internally."""

    def test_pandas_input_end_to_end(self, spark):
        data = np.random.default_rng(7).normal(20.0, 4.0, 5_000)
        pdf = pd.DataFrame({"value": data})
        res = DistributionFitter(spark).fit(
            pdf, column="value", distributions=CORE
        )
        rows = {r["distribution"]: r for r in res.df.collect()}
        assert set(rows) == set(CORE)
        # the normal row recovers the generating parameters; the overall
        # winner may be lognorm (a high-loc lognorm mimics a normal)
        norm_row = rows["norm"]
        assert norm_row["parameters"][0] == pytest.approx(20.0, rel=0.05)
        assert norm_row["parameters"][1] == pytest.approx(4.0, rel=0.05)
        assert norm_row["ks_statistic"] < 0.02

    def test_pandas_input_discrete(self, spark):
        from spark_bestfit_spark.fitter import DiscreteDistributionFitter

        data = np.random.default_rng(8).poisson(6.0, 4_000)
        pdf = pd.DataFrame({"k": data})
        res = DiscreteDistributionFitter(spark).fit(
            pdf, column="k", distributions=["poisson", "geom"]
        )
        rows = {r["distribution"] for r in res.df.collect()}
        assert rows == {"poisson", "geom"}

    def test_rejects_unknown_input_type(self, spark):
        with pytest.raises(TypeError, match="Spark or pandas"):
            DistributionFitter(spark).fit(
                {"value": [1, 2, 3]}, column="value"
            )
