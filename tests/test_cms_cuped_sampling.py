"""Count-Min sketch / exact-k weighted sampling / CUPED — round-8
fourth wave.

Load-bearing properties: CMS never undercounts and is exact when the
width eliminates collisions; the E-S sample has exactly k rows and is
partitioning/rerun-deterministic; CUPED removes variance in proportion
to the covariate correlation and degrades to the plain Welch test when
the covariate is constant.
"""

import random

import numpy as np
import pyspark.sql.functions as F
import pytest

from spark_bestfit_spark.operators.curation import weighted_sample_exact
from spark_bestfit_spark.operators.frequency import cms_token_counts
from spark_bestfit_spark.operators.stats import ab_test, cuped_ab_test


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestCountMin:
    def test_never_undercounts(self, spark):
        rng = random.Random(3)
        vocab = [f"tok{i}" for i in range(200)]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(50))
            for _ in range(40)
        ]
        out = cms_token_counts(
            _docs(spark, texts), "text", width=64, depth=3, k=20
        ).collect()
        assert len(out) == 20
        assert all(r.overcount >= 0 for r in out)
        # width 64 on 200 tokens: collisions must actually occur
        assert any(r.overcount > 0 for r in out)

    def test_exact_when_wide(self, spark):
        texts = ["a a a b b c"] * 10
        out = cms_token_counts(
            _docs(spark, texts), "text", width=4096, depth=4, k=3
        ).collect()
        got = {r.token: (r.exact_count, r.cms_estimate) for r in out}
        assert got == {"a": (30, 30), "b": (20, 20), "c": (10, 10)}

    def test_partitioning_invariance(self, spark):
        rng = random.Random(5)
        texts = [
            " ".join(rng.choice("abcdefgh") for _ in range(30))
            for _ in range(30)
        ]
        df = _docs(spark, texts)
        a = sorted(map(tuple, cms_token_counts(df, "text", width=16, depth=2).collect()))
        b = sorted(map(tuple, cms_token_counts(df.repartition(11), "text", width=16, depth=2).collect()))
        assert a == b

    def test_validation(self, spark):
        df = _docs(spark, ["a"])
        with pytest.raises(ValueError):
            cms_token_counts(df, "text", width=4)
        with pytest.raises(ValueError):
            cms_token_counts(df, "text", depth=0)


class TestWeightedSampleExact:
    def _df(self, spark, weights):
        return spark.createDataFrame(
            [
                (i, None if w is None else float(w))
                for i, w in enumerate(weights)
            ],
            "doc_id long, w double",
        )

    def test_exactly_k_rows(self, spark):
        df = self._df(spark, [1.0 + i % 7 for i in range(500)])
        out = weighted_sample_exact(df, "w", k=50)
        assert out.count() == 50

    def test_deterministic_across_partitioning(self, spark):
        df = self._df(spark, [1.0 + i % 7 for i in range(500)])
        a = sorted(r.doc_id for r in weighted_sample_exact(df, "w", 40).collect())
        b = sorted(
            r.doc_id
            for r in weighted_sample_exact(df.repartition(13), "w", 40).collect()
        )
        assert a == b

    def test_huge_weight_always_sampled(self, spark):
        df = self._df(spark, [1e12] + [1.0] * 400)
        got = {r.doc_id for r in weighted_sample_exact(df, "w", 10).collect()}
        assert 0 in got

    def test_invalid_weights_excluded(self, spark):
        df = self._df(spark, [0.0, -1.0, None, 5.0, 5.0])
        got = {r.doc_id for r in weighted_sample_exact(df, "w", 10).collect()}
        assert got == {3, 4}

    def test_weighting_shifts_inclusion_rates(self, spark):
        # weight 10 vs 1: across many seeds the heavy half must be
        # sampled far more often
        df = self._df(spark, [10.0] * 100 + [1.0] * 100)
        heavy = light = 0
        for seed in range(20):
            got = {
                r.doc_id
                for r in weighted_sample_exact(df, "w", 40, seed=seed).collect()
            }
            heavy += sum(1 for i in got if i < 100)
            light += sum(1 for i in got if i >= 100)
        assert heavy > 2.5 * light

    def test_validation(self, spark):
        df = self._df(spark, [1.0])
        with pytest.raises(ValueError):
            weighted_sample_exact(df, "w", k=0)


class TestCuped:
    def _df(self, spark, rho, n=4000):
        rng = np.random.default_rng(6)
        x = rng.normal(10, 3, n)
        noise = rng.normal(0, np.sqrt(max(1e-9, 1 - rho**2)), n)
        arm = np.array(["c", "t"])[rng.integers(0, 2, n)]
        lift = (arm == "t") * 0.2
        y = rho * (x - 10) / 3 + noise + lift
        return spark.createDataFrame(
            [
                (str(a), float(yy), float(xx))
                for a, yy, xx in zip(arm, y, x)
            ],
            "arm string, y double, x double",
        )

    def test_variance_reduction_tracks_correlation(self, spark):
        df = self._df(spark, rho=0.8)
        (r,) = cuped_ab_test(df, "arm", "y", "x", "c", "t").collect()
        # rho^2 = 0.64 of the variance is explained
        assert 0.5 < r.var_reduction < 0.75
        # adjusted t should exceed the raw Welch t
        (raw,) = ab_test(df, "arm", "y", "c", "t").collect()
        assert abs(r.t_stat) > abs(raw.t_stat)
        # the lift estimate stays unbiased (0.2 planted)
        assert r.diff == pytest.approx(0.2, abs=0.08)

    def test_constant_covariate_degrades_to_welch(self, spark):
        rng = np.random.default_rng(7)
        rows = [
            (rng.choice(["c", "t"]).item(), float(v), 1.0)
            for v in rng.normal(0, 1, 1000)
        ]
        df = spark.createDataFrame(rows, "arm string, y double, x double")
        (r,) = cuped_ab_test(df, "arm", "y", "x", "c", "t").collect()
        (w,) = ab_test(df, "arm", "y", "c", "t").collect()
        assert r.theta == 0.0
        assert r.var_reduction == 0.0
        assert r.t_stat == w.t_stat
        assert r.se == w.se
        assert r.dof == w.dof

    def test_theta_matches_numpy(self, spark):
        df = self._df(spark, rho=0.5)
        (r,) = cuped_ab_test(df, "arm", "y", "x", "c", "t").collect()
        pdf = df.toPandas()
        theta = np.cov(pdf.x, pdf.y, bias=True)[0, 1] / np.var(pdf.x)
        assert r.theta == pytest.approx(theta, abs=2e-6)
