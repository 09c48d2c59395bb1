"""Tests for the discrete fitter (phase 7): empirical PMF, optimizer MLE,
discrete metrics, end-to-end recovery of known distributions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.fitter import DiscreteDistributionFitter
from spark_bestfit_spark.operators.discrete_fit import empirical_pmf


class TestEmpiricalPmf:
    def test_known_counts(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"v": [0, 0, 1, 1, 1, 2, 5]})
        )
        x, p = empirical_pmf(df, "v")
        assert list(x) == [0.0, 1.0, 2.0, 5.0]
        assert np.allclose(p, [2 / 7, 3 / 7, 1 / 7, 1 / 7])
        assert p.sum() == pytest.approx(1.0)

    def test_nulls_dropped(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"v": [1.0, None, 2.0, float("nan")]})
        )
        x, p = empirical_pmf(df, "v")
        assert list(x) == [1.0, 2.0]
        assert np.allclose(p, [0.5, 0.5])


class TestDiscreteFitter:
    def test_recovers_poisson(self, spark):
        rng = np.random.default_rng(42)
        df = spark.createDataFrame(
            pd.DataFrame({"v": rng.poisson(4.0, 8000).astype(float)})
        )
        res = DiscreteDistributionFitter(spark).fit(
            df, column="v", distributions=["poisson", "geom", "randint"]
        )
        best = res.best(1, metric="sse")
        assert best.distribution == "poisson"
        assert abs(best.parameters[0] - 4.0) < 0.15

    def test_recovers_geometric(self, spark):
        rng = np.random.default_rng(42)
        df = spark.createDataFrame(
            pd.DataFrame({"v": rng.geometric(0.3, 8000).astype(float)})
        )
        res = DiscreteDistributionFitter(spark).fit(
            df, column="v", distributions=["geom", "poisson"]
        )
        best = res.best(1, metric="sse")
        assert best.distribution == "geom"
        assert abs(best.parameters[0] - 0.3) < 0.05

    def test_recovers_binomial_shape(self, spark):
        rng = np.random.default_rng(42)
        df = spark.createDataFrame(
            pd.DataFrame({"v": rng.binomial(20, 0.4, 8000).astype(float)})
        )
        res = DiscreteDistributionFitter(spark).fit(
            df, column="v", distributions=["binom", "poisson"]
        )
        best = res.best(1, metric="sse")
        # binomial should beat poisson on under-dispersed data
        assert best.distribution == "binom"

    def test_full_registry_on_part_sizes(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
        res = DiscreteDistributionFitter(spark).fit(df, column="p_size")
        assert res.count() >= 5
        best = res.best(1, metric="sse")
        assert best.sse is not None and np.isfinite(best.sse)
        # ks present for eager discrete fits
        assert best.ks_statistic is not None

    def test_lazy_metrics_skips_ks(self, spark):
        rng = np.random.default_rng(0)
        df = spark.createDataFrame(
            pd.DataFrame({"v": rng.poisson(3.0, 3000).astype(float)})
        )
        res = DiscreteDistributionFitter(spark).fit(
            df, column="v", distributions=["poisson", "geom"],
            lazy_metrics=True,
        )
        rows = res.df.select("ks_statistic").collect()
        assert all(r.ks_statistic is None for r in rows)

    def test_multi_column(self, spark):
        rng = np.random.default_rng(1)
        df = spark.createDataFrame(pd.DataFrame({
            "a": rng.poisson(2.0, 2000).astype(float),
            "b": rng.geometric(0.5, 2000).astype(float),
        }))
        res = DiscreteDistributionFitter(spark).fit(
            df, columns=["a", "b"], distributions=["poisson", "geom"]
        )
        per = res.best_per_column(1, metric="sse")
        assert set(per) == {"a", "b"}

    def test_new_discrete_distributions_roundtrip(self):
        import numpy as np

        from spark_bestfit_spark.functions.distributions.registry import (
            DISCRETE,
            get_discrete,
        )

        assert len(DISCRETE) >= 16
        rng = np.random.default_rng(42)
        cases = {
            "boltzmann": (0.35, 12.0, 0.0),
            "nhypergeom": (30.0, 20.0, 5.0, 0.0),
            "zipfian": (1.8, 50.0, 0.0),
        }
        for name, params in cases.items():
            d = get_discrete(name)
            lo, hi = d._get_support(*params[:-1])
            ks = np.arange(int(lo), int(hi) + 1)
            total = float(np.sum(d.pmf(ks, *params)))
            assert total == pytest.approx(1.0, abs=1e-6), name
            cdf = d.cdf(ks, *params)
            assert np.all(np.diff(cdf) >= -1e-12), name
            s = d.rvs(params, 3000, rng)
            assert s.min() >= lo and s.max() <= hi
            fitted = d.fit(s)
            # fitted likelihood within a whisker of the truth
            assert d.nnlf(fitted, s) <= d.nnlf(params, s) + 25.0, name

    def test_fitter_with_boltzmann_and_zipfian(self, spark):
        import numpy as np

        from spark_bestfit_spark.functions.distributions.registry import (
            get_discrete,
        )

        rng = np.random.default_rng(0)
        s = get_discrete("zipfian").rvs((1.5, 30.0, 0.0), 4000, rng)
        df = spark.createDataFrame(
            pd.DataFrame({"v": s.astype(float)})
        )
        res = DiscreteDistributionFitter(spark).fit(
            df, column="v", distributions=["zipfian", "geom", "poisson"]
        )
        best = res.best(1, metric="sse")
        assert best.distribution == "zipfian"

    def test_sentinel_on_empty(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"v": [float("nan")] * 10})
        )
        res = DiscreteDistributionFitter(spark).fit(
            df, column="v", distributions=["poisson"]
        )
        assert res.count() == 0


class TestDiscreteGroupedFitting:
    def test_each_group_recovers_its_family(self, spark):
        import pandas as pd

        from spark_bestfit_spark.fitter import DiscreteDistributionFitter

        rng = np.random.default_rng(4)
        pdf = pd.DataFrame(
            {
                "g": ["a"] * 3000 + ["b"] * 3000,
                "v": np.concatenate(
                    [rng.poisson(4.0, 3000), rng.integers(0, 10, 3000)]
                ).astype(float),
            }
        )
        df = spark.createDataFrame(pdf)
        res = DiscreteDistributionFitter(spark).fit_grouped(
            df, "v", "g", distributions=["poisson", "randint", "geom"]
        )
        best = res.best_per_column(n=1, metric="sse")
        assert best["v[a]"][0].distribution == "poisson"
        assert best["v[b]"][0].distribution == "randint"

    def test_small_groups_match_separate_fits(self, spark):
        import pandas as pd
        import pyspark.sql.functions as F

        from spark_bestfit_spark.fitter import DiscreteDistributionFitter

        rng = np.random.default_rng(5)
        pdf = pd.DataFrame(
            {
                "g": ["x"] * 800 + ["y"] * 900,
                "v": np.concatenate(
                    [rng.poisson(2.0, 800), rng.poisson(9.0, 900)]
                ).astype(float),
            }
        )
        df = spark.createDataFrame(pdf)
        f = DiscreteDistributionFitter(spark)
        dists = ["poisson", "geom"]
        grouped = {
            (r["column_name"], r["distribution"]): r
            for r in f.fit_grouped(df, "v", "g", distributions=dists)
            .df.collect()
        }
        for g in ("x", "y"):
            solo = f.fit(
                df.filter(F.col("g") == g), column="v",
                distributions=dists,
            )
            for r in solo.df.collect():
                gr = grouped[(f"v[{g}]", r["distribution"])]
                assert gr["parameters"] == r["parameters"], (g, r)
                assert gr["sse"] == r["sse"]

    def test_null_groups_and_cap_and_validation(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.fitter import DiscreteDistributionFitter

        f = DiscreteDistributionFitter(spark)
        df = spark.createDataFrame(
            [(None, 1.0), ("a", 2.0), ("a", 3.0), ("a", 2.0)] * 10,
            "g string, v double",
        )
        res = f.fit_grouped(df, "v", "g", distributions=["poisson"])
        assert {r["column_name"] for r in res.df.collect()} == {"v[a]"}
        wide = spark.range(300).select(
            F.col("id").cast("string").alias("g"),
            (F.col("id") % 7).cast("double").alias("v"),
        )
        with pytest.raises(ValueError, match="max_groups"):
            f.fit_grouped(wide, "v", "g", distributions=["poisson"])
        with pytest.raises(ValueError, match="not found"):
            f.fit_grouped(df, "v", "nope")
        empty = spark.createDataFrame([], "g string, v double")
        assert f.fit_grouped(empty, "v", "g").count() == 0
