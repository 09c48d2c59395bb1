"""HLL sketch / Brier decomposition / Cochran-Armitage / silhouette —
round-8 third wave.

Load-bearing properties: the white-box HLL estimate must be accurate
(~1.04/sqrt(m) relative error) and partitioning-invariant (registers
merge by max); the Murphy decomposition must satisfy its identity
brier = rel - res + unc + within_bin and match a numpy replica;
Cochran-Armitage must detect a planted monotone rate trend and stay
centered under no trend; silhouette must rank separable labels above
shuffled ones.
"""

import math
import random

import numpy as np
import pyspark.sql.functions as F
import pytest

from spark_bestfit_spark.operators.similarity import silhouette_score
from spark_bestfit_spark.operators.stats import (
    brier_decomposition,
    cochran_armitage,
    hll_distinct,
)


class TestHllDistinct:
    def test_accuracy_within_sketch_error(self, spark):
        n = 20_000
        df = spark.range(n).select(
            (F.col("id") * 7 + 13).alias("v")
        )
        (r,) = hll_distinct(df, "v", p=12).collect()
        assert r.exact_distinct == n
        # standard error 1.04/sqrt(4096) ~ 1.6%; allow 5%
        assert r.rel_error < 0.05
        assert r.hll_estimate == pytest.approx(n, rel=0.05)

    def test_partitioning_invariance(self, spark):
        df = spark.range(5000).select(F.col("id").alias("v"))
        a = hll_distinct(df, "v").collect()
        b = hll_distinct(df.repartition(17), "v").collect()
        assert a == b

    def test_duplicates_do_not_inflate(self, spark):
        df = spark.range(50_000).select(
            (F.col("id") % 100).alias("v")
        )
        (r,) = hll_distinct(df, "v", p=12).collect()
        assert r.exact_distinct == 100
        # linear-counting regime: tiny cardinality is near-exact
        assert abs(r.hll_estimate - 100) < 3

    def test_validation(self, spark):
        df = spark.range(5).select(F.col("id").alias("v"))
        with pytest.raises(ValueError):
            hll_distinct(df, "v", p=2)


class TestBrierDecomposition:
    def test_identity_and_numpy_replica(self, spark):
        rng = np.random.default_rng(4)
        p = np.round(rng.uniform(0, 1, 2000), 3)
        y = (rng.uniform(0, 1, 2000) < p).astype(float)  # calibrated
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(p, y)],
            "p double, y double",
        )
        (r,) = brier_decomposition(df, "p", "y", bins=10).collect()
        # identity
        assert r.brier == pytest.approx(
            r.reliability - r.resolution + r.uncertainty + r.within_bin,
            abs=5e-6,
        )
        # numpy replica
        bk = np.minimum((p * 10).astype(int), 9)
        n = len(p)
        brier = ((p - y) ** 2).mean()
        ybar = y.mean()
        rel = sum(
            (bk == k).sum()
            * (p[bk == k].mean() - y[bk == k].mean()) ** 2
            for k in range(10)
            if (bk == k).any()
        ) / n
        res = sum(
            (bk == k).sum() * (y[bk == k].mean() - ybar) ** 2
            for k in range(10)
            if (bk == k).any()
        ) / n
        assert r.brier == pytest.approx(brier, abs=2e-6)
        assert r.reliability == pytest.approx(rel, abs=2e-6)
        assert r.resolution == pytest.approx(res, abs=2e-6)
        assert r.uncertainty == pytest.approx(ybar * (1 - ybar), abs=2e-6)
        # calibrated forecasts: tiny reliability
        assert r.reliability < 0.01

    def test_miscalibrated_forecast_flagged(self, spark):
        # constant 0.9 forecast on a 10% rate: huge reliability
        rows = [(0.9, 1.0 if i % 10 == 0 else 0.0) for i in range(1000)]
        df = spark.createDataFrame(rows, "p double, y double")
        (r,) = brier_decomposition(df, "p", "y").collect()
        assert r.reliability > 0.5
        assert r.resolution == 0.0

    def test_validation(self, spark):
        df = spark.createDataFrame([(0.5, 1.0)], "p double, y double")
        with pytest.raises(ValueError):
            brier_decomposition(df, "p", "y", bins=1)


class TestCochranArmitage:
    def _df(self, spark, rates, n_per=500):
        rng = random.Random(11)
        rows = []
        for g, rate in enumerate(rates, start=1):
            for _ in range(n_per):
                rows.append((g, 1 if rng.random() < rate else 0))
        return spark.createDataFrame(rows, "g int, y int")

    def test_planted_trend_detected(self, spark):
        df = self._df(spark, [0.1, 0.2, 0.3, 0.4, 0.5])
        (r,) = cochran_armitage(df, "g", "y").collect()
        assert r.z > 5
        assert r.chi2 == pytest.approx(r.z * r.z, abs=1e-4)
        assert r.k_groups == 5

    def test_no_trend_centered(self, spark):
        df = self._df(spark, [0.3, 0.3, 0.3, 0.3])
        (r,) = cochran_armitage(df, "g", "y").collect()
        assert abs(r.z) < 3

    def test_hand_computed(self, spark):
        # groups 1,2 with n=(4,4), d=(1,3)
        rows = [(1, 1), (1, 0), (1, 0), (1, 0),
                (2, 1), (2, 1), (2, 1), (2, 0)]
        df = spark.createDataFrame(rows, "g int, y int")
        (r,) = cochran_armitage(df, "g", "y").collect()
        n, d = 8, 4
        pbar = 0.5
        t = (1 * 1 + 2 * 3) - pbar * (1 * 4 + 2 * 4)
        var = pbar * 0.5 * ((1 * 4 + 4 * 4) - (1 * 4 + 2 * 4) ** 2 / 8)
        assert r.z == round(t / math.sqrt(var), 6)

    def test_degenerate_null(self, spark):
        df = spark.createDataFrame([(1, 1), (1, 0)], "g int, y int")
        (r,) = cochran_armitage(df, "g", "y").collect()
        assert r.z is None  # single group -> zero score variance


class TestSilhouette:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )

    def test_separated_labels_score_high(self, spark):
        rng = np.random.default_rng(8)
        rows = []
        centers = {0: [10.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0]}
        i = 0
        for lbl, c in centers.items():
            for _ in range(30):
                v = (np.array(c) + rng.normal(0, 0.1, 3)).tolist()
                rows.append((i, v, lbl))
                i += 1
        out = {r.label: r for r in silhouette_score(self._emb(spark, rows)).collect()}
        assert out[0].avg_silhouette > 0.9
        assert out[1].avg_silhouette > 0.9
        assert out[0].n_points == 30

    def test_shuffled_labels_score_low(self, spark):
        rng = np.random.default_rng(15)
        rows = [
            (i, rng.normal(0, 1, 4).tolist(), int(i % 3))
            for i in range(90)
        ]
        out = silhouette_score(self._emb(spark, rows)).collect()
        assert all(abs(r.avg_silhouette) < 0.3 for r in out)

    def test_single_label_null(self, spark):
        rows = [(i, [1.0, float(i)], 0) for i in range(5)]
        out = silhouette_score(self._emb(spark, rows)).collect()
        assert out[0].avg_silhouette is None


from spark_bestfit_spark.operators.stats import (  # noqa: E402
    cliffs_delta,
    mann_whitney_u,
    proportions_ztest,
    qini_curve,
)


class TestCliffsDelta:
    def test_perfect_separation(self, spark):
        rows = [("a", float(100 + i)) for i in range(30)] + [
            ("b", float(i)) for i in range(30)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        (r,) = cliffs_delta(df, "v", "g", "a", "b").collect()
        assert r.delta == 1.0 and r.magnitude == "large"

    def test_identical_groups_negligible(self, spark):
        rows = [(g, float(i % 10)) for g in ("a", "b") for i in range(50)]
        df = spark.createDataFrame(rows, "g string, v double")
        (r,) = cliffs_delta(df, "v", "g", "a", "b").collect()
        assert r.delta == 0.0 and r.magnitude == "negligible"

    def test_consistent_with_mann_whitney(self, spark):
        import random

        rng = random.Random(3)
        rows = [
            (rng.choice("ab"), round(rng.uniform(0, 10), 2))
            for _ in range(200)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        (d,) = cliffs_delta(df, "v", "g", "a", "b").collect()
        (m,) = mann_whitney_u(df, "v", "g", "a", "b").collect()
        assert d.delta == round(2 * m.auc - 1, 6)


class TestProportionsZtest:
    def test_hand_computed(self, spark):
        # a: 30/100, b: 20/100
        rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 20 + [
            ("b", 0)
        ] * 80
        df = spark.createDataFrame(rows, "g string, y int")
        (r,) = proportions_ztest(df, "g", "y", "a", "b").collect()
        assert (r.p_a, r.p_b, r.diff) == (0.3, 0.2, 0.1)
        import math

        pool = 0.25
        z = 0.1 / math.sqrt(pool * 0.75 * (0.01 + 0.01))
        assert r.z == round(z, 6)
        # Wilson interval contains the point estimate
        assert r.a_lo < 0.3 < r.a_hi
        assert r.b_lo < 0.2 < r.b_hi
        # Wilson stays inside [0, 1] even near the edge
        assert 0 <= r.b_lo and r.a_hi <= 1

    def test_degenerate_rate_null_z(self, spark):
        rows = [("a", 0)] * 10 + [("b", 0)] * 10
        df = spark.createDataFrame(rows, "g string, y int")
        (r,) = proportions_ztest(df, "g", "y", "a", "b").collect()
        assert r.z is None
        assert r.p_a == 0.0


class TestQiniCurve:
    def test_informative_score_targets_uplift(self, spark):
        import random

        rng = random.Random(5)
        rows = []
        for i in range(4000):
            score = rng.uniform(0, 1)
            treated = rng.randint(0, 1)
            # uplift exists ONLY where the score is high
            base_rate = 0.1
            rate = base_rate + (0.4 if (treated and score > 0.7) else 0)
            rows.append(
                (score, treated, 1 if rng.random() < rate else 0)
            )
        df = spark.createDataFrame(rows, "s double, t int, y int")
        out = {r.bin: r for r in qini_curve(df, "s", "t", "y", 10).collect()}
        assert len(out) == 10
        # top deciles (high score) carry the uplift
        assert out[0].uplift > 0.2
        assert abs(out[9].uplift) < 0.15
        # qini accumulates: final value positive and >= early values
        assert out[9].qini_cum > out[0].qini_cum > 0

    def test_matches_pandas_replica(self, spark):
        import random

        import pandas as pd

        rng = random.Random(9)
        rows = [
            (
                round(rng.uniform(0, 1), 3),
                rng.randint(0, 1),
                rng.randint(0, 1),
            )
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "s double, t int, y int")
        got = {
            r.bin: (r.n_treated, r.n_control, r.qini_cum)
            for r in qini_curve(df, "s", "t", "y", 5).collect()
        }
        pdf = pd.DataFrame(rows, columns=["s", "t", "y"])
        pr = pdf.s.rank(method="min").sub(1).div(len(pdf) - 1)
        pdf["bin"] = ((1.0 - pr) * 5).astype(int).clip(upper=4)
        want = {}
        cyt = cyc = cnt = cnc = 0
        for b in sorted(pdf.bin.unique()):
            sub = pdf[pdf.bin == b]
            nt = int(sub.t.sum())
            nc = len(sub) - nt
            cyt += float(sub[sub.t == 1].y.sum())
            cyc += float(sub[sub.t == 0].y.sum())
            cnt += nt
            cnc += nc
            want[b] = (nt, nc, round(cyt - cyc * cnt / cnc, 6))
        assert got == want

    def test_validation(self, spark):
        df = spark.createDataFrame([(0.5, 1, 1)], "s double, t int, y int")
        with pytest.raises(ValueError):
            qini_curve(df, "s", "t", "y", n_bins=1)


from spark_bestfit_spark.operators.similarity import (  # noqa: E402
    embedding_cross_gram,
    procrustes_align,
)
from spark_bestfit_spark.operators.stats import (  # noqa: E402
    ips_policy_value,
)


class TestIpsPolicyValue:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "a string, p double, r double, pol string"
        )

    def test_hand_computed(self, spark):
        rows = [
            ("x", 0.5, 1.0, "x"),   # match, w = 2
            ("x", 0.5, 0.0, "y"),   # no match
            ("y", 0.25, 1.0, "y"),  # match, w = 4
            ("y", 0.25, 0.0, "x"),  # no match
        ]
        (o,) = ips_policy_value(
            self._df(spark, rows), "a", "p", "r", "pol"
        ).collect()
        assert o.n == 4 and o.n_matched == 2
        assert o.ips == round((2 * 1 + 4 * 1) / 4, 6)  # 1.5
        assert o.snips == 1.0  # (2+4)/(2+4)
        assert o.ess == round(36 / 20, 6)  # (2+4)^2/(4+16)
        assert o.mean_logged_reward == 0.5

    def test_fixed_policy_recovers_counterfactual_value(self, spark):
        import random

        rng = random.Random(8)
        acts = ["a", "b", "c"]
        shares = {"a": 0.5, "b": 0.3, "c": 0.2}
        rates = {"a": 0.2, "b": 0.5, "c": 0.8}
        rows = []
        for _ in range(8000):
            a = rng.choices(acts, weights=[shares[x] for x in acts])[0]
            r = 1.0 if rng.random() < rates[a] else 0.0
            rows.append((a, shares[a], r, "c"))  # policy: always 'c'
        (o,) = ips_policy_value(
            self._df(spark, rows), "a", "p", "r", "pol"
        ).collect()
        # the "always c" policy's true value is E[r | c] = 0.8 —
        # far from the logged mean (~0.35); both estimators must
        # recover it from the reweighted matches alone
        assert abs(o.ips - 0.8) < 0.08
        assert abs(o.snips - 0.8) < 0.08
        assert o.n_matched < o.n  # only the 'c' rows match
        assert o.ess < o.n  # reweighting costs effective sample

    def test_clip_and_support_filtering(self, spark):
        rows = [("x", 0.001, 1.0, "x"), ("y", None, 1.0, "y"),
                ("z", 0.0, 1.0, "z"), ("w", 0.5, 1.0, "w")]
        (o,) = ips_policy_value(
            self._df(spark, rows), "a", "p", "r", "pol", clip=10.0
        ).collect()
        assert o.n == 2  # null/zero propensities excluded
        assert o.ips == round((10.0 + 2.0) / 2, 6)  # 1000 clipped to 10
        with pytest.raises(ValueError):
            ips_policy_value(self._df(spark, rows), "a", "p", "r", "pol", clip=0)


class TestProcrustes:
    def _pairs(self, spark, A, B):
        rows = [(a.tolist(), b.tolist()) for a, b in zip(A, B)]
        return spark.createDataFrame(
            rows, "emb_a array<double>, emb_b array<double>"
        )

    def test_cross_gram_matches_numpy(self, spark):
        rng = np.random.default_rng(3)
        A = rng.normal(0, 1, (50, 5))
        B = rng.normal(0, 1, (50, 5))
        got = {
            (r.i, r.j): r.gram
            for r in embedding_cross_gram(self._pairs(spark, A, B)).collect()
        }
        M = A.T @ B
        for i in range(5):
            for j in range(5):
                assert got[(i, j)] == pytest.approx(M[i, j], abs=2e-6)

    def test_recovers_planted_rotation(self, spark):
        rng = np.random.default_rng(11)
        A = rng.normal(0, 1, (200, 4))
        q, _ = np.linalg.qr(rng.normal(0, 1, (4, 4)))
        B = A @ q
        rot, summary = procrustes_align(self._pairs(spark, A, B))
        assert np.allclose(rot, q, atol=1e-4)
        (s,) = summary.collect()
        assert s.disparity == pytest.approx(0.0, abs=1e-4)
        assert s.n_pairs == 200

    def test_noise_raises_disparity(self, spark):
        rng = np.random.default_rng(13)
        A = rng.normal(0, 1, (200, 4))
        B = rng.normal(0, 1, (200, 4))  # unrelated
        rot, summary = procrustes_align(self._pairs(spark, A, B))
        (s,) = summary.collect()
        assert s.disparity > 0.5
        # rotation is still orthogonal
        assert np.allclose(rot @ rot.T, np.eye(4), atol=1e-8)

    def test_empty_pairs(self, spark):
        df = spark.createDataFrame(
            [], "emb_a array<double>, emb_b array<double>"
        )
        rot, summary = procrustes_align(df)
        assert rot is None
        (s,) = summary.collect()
        assert s.n_pairs == 0 and s.disparity is None


from spark_bestfit_spark.operators.stats import (  # noqa: E402
    dr_policy_value,
)


class TestDrPolicyValue:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "a string, p double, r double, pol string, "
            "qp double, ql double",
        )

    def test_perfect_model_gives_model_value(self, spark):
        # if q is exactly E[r | a], the correction term has mean ~0
        rows = [
            ("x", 0.5, 1.0, "x", 1.0, 1.0),
            ("x", 0.5, 1.0, "y", 0.0, 1.0),
            ("y", 0.5, 0.0, "y", 0.0, 0.0),
            ("y", 0.5, 0.0, "x", 1.0, 0.0),
        ]
        (o,) = dr_policy_value(
            self._df(spark, rows), "a", "p", "r", "pol", "qp", "ql"
        ).collect()
        # q matches rewards exactly -> r - q(a) = 0 -> DR = model
        assert o.dr == o.model_value == 0.5

    def test_dr_beats_both_when_one_leg_works(self, spark):
        import random

        rng = random.Random(21)
        rows = []
        rates = {"a": 0.2, "b": 0.8}
        for _ in range(8000):
            a = "a" if rng.random() < 0.7 else "b"
            r = 1.0 if rng.random() < rates[a] else 0.0
            # correct propensities, BIASED model (+0.3 everywhere)
            q = {"a": 0.5, "b": 1.1}
            rows.append(
                (a, 0.7 if a == "a" else 0.3, r, "b", q["b"], q[a])
            )
        (o,) = dr_policy_value(
            self._df(spark, rows), "a", "p", "r", "pol", "qp", "ql"
        ).collect()
        # true value of "always b" = 0.8; the biased model says 1.1,
        # but correct propensities repair it
        assert abs(o.dr - 0.8) < 0.08
        assert abs(o.model_value - 1.1) < 0.01

    def test_validation(self, spark):
        df = self._df(spark, [("x", 0.5, 1.0, "x", 1.0, 1.0)])
        with pytest.raises(ValueError):
            dr_policy_value(
                df, "a", "p", "r", "pol", "qp", "ql", clip=-1
            )


from spark_bestfit_spark.operators.stats import (  # noqa: E402
    hll_distinct_by_group,
)


class TestHllByGroup:
    def test_per_group_accuracy_and_independence(self, spark):
        df = spark.range(30_000).select(
            (F.col("id") % 3).cast("string").alias("g"),
            F.col("id").alias("v"),
        )
        out = {
            r.g: r for r in hll_distinct_by_group(df, "v", "g").collect()
        }
        assert len(out) == 3
        for g, r in out.items():
            assert r.exact_distinct == 10_000
            assert r.rel_error < 0.05

    def test_matches_global_on_single_group(self, spark):
        from spark_bestfit_spark.operators.stats import hll_distinct

        df = spark.range(7000).select(
            F.lit("only").alias("g"), F.col("id").alias("v")
        )
        (grouped,) = hll_distinct_by_group(df, "v", "g").collect()
        (g,) = hll_distinct(df, "v").collect()
        assert grouped.hll_estimate == g.hll_estimate

    def test_partitioning_invariance(self, spark):
        df = spark.range(5000).select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.col("id").alias("v"),
        )
        a = sorted(map(tuple, hll_distinct_by_group(df, "v", "g").collect()))
        b = sorted(
            map(
                tuple,
                hll_distinct_by_group(
                    df.repartition(19), "v", "g"
                ).collect(),
            )
        )
        assert a == b


from spark_bestfit_spark.operators.similarity import (  # noqa: E402
    embedding_drift,
)


class TestEmbeddingDrift:
    def _emb(self, spark, mat):
        return spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(mat)],
            "vec_id long, embedding array<double>",
        )

    def test_planted_axis_shift_localized(self, spark):
        rng = np.random.default_rng(5)
        a = rng.normal(0, 1, (400, 6))
        b = rng.normal(0, 1, (400, 6))
        b[:, 2] += 1.5  # shift ONLY dimension 2
        out = {
            r.dim: r
            for r in embedding_drift(
                self._emb(spark, a), self._emb(spark, b)
            ).collect()
        }
        assert out[2].drifted is True and out[2].z > 10
        assert sum(1 for r in out.values() if r.drifted) == 1

    def test_identical_snapshots_quiet(self, spark):
        rng = np.random.default_rng(6)
        a = rng.normal(0, 1, (300, 4))
        out = embedding_drift(
            self._emb(spark, a), self._emb(spark, a)
        ).collect()
        assert all(r.z == 0.0 and r.drifted is False for r in out)


from spark_bestfit_spark.operators.stats import (  # noqa: E402
    hedges_g,
    weighted_quantiles,
)


class TestHedgesG:
    def test_hand_computed(self, spark):
        import math

        a = [1.0, 2.0, 3.0, 4.0]
        b = [3.0, 4.0, 5.0, 6.0]
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        (r,) = hedges_g(df, "v", "g", "a", "b").collect()
        import statistics

        sp2 = (3 * statistics.variance(a) + 3 * statistics.variance(b)) / 6
        d = (statistics.mean(b) - statistics.mean(a)) / math.sqrt(sp2)
        g = d * (1 - 3 / (4 * 8 - 9))
        assert r.cohens_d == round(d, 6)
        assert r.hedges_g == round(g, 6)
        assert r.magnitude == "large"

    def test_identical_groups_negligible(self, spark):
        rows = [(g, float(i % 7)) for g in "ab" for i in range(60)]
        df = spark.createDataFrame(rows, "g string, v double")
        (r,) = hedges_g(df, "v", "g", "a", "b").collect()
        assert r.hedges_g == 0.0 and r.magnitude == "negligible"

    def test_degenerate_null(self, spark):
        rows = [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        (r,) = hedges_g(df, "v", "g", "a", "b").collect()
        assert r.cohens_d is None and r.magnitude is None


class TestWeightedQuantiles:
    def test_hand_computed(self, spark):
        # values 1..4 with weights 1,1,1,7 -> W=10
        rows = [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0)]
        df = spark.createDataFrame(rows, "v double, w double")
        out = {
            r.q: r.value
            for r in weighted_quantiles(
                df, "v", "w", qs=(0.1, 0.3, 0.5, 0.95)
            ).collect()
        }
        assert out == {0.1: 1.0, 0.3: 3.0, 0.5: 4.0, 0.95: 4.0}

    def test_matches_numpy_on_unit_weights(self, spark):
        # with all weights 1 the weighted quantile is the lower-edge
        # order statistic: value at index ceil(q n) - 1
        import numpy as np

        rng = np.random.default_rng(7)
        vals = np.round(rng.uniform(0, 100, 501), 3)
        df = spark.createDataFrame(
            [(float(v), 1.0) for v in vals], "v double, w double"
        )
        out = {
            r.q: r.value
            for r in weighted_quantiles(
                df, "v", "w", qs=(0.25, 0.5, 0.75)
            ).collect()
        }
        s = np.sort(vals)
        for q, got in out.items():
            assert got == float(s[int(np.ceil(q * len(s))) - 1])

    def test_heavy_weight_dominates(self, spark):
        rows = [(float(i), 1.0) for i in range(100)] + [(42.0, 1e6)]
        df = spark.createDataFrame(rows, "v double, w double")
        out = {
            r.q: r.value
            for r in weighted_quantiles(df, "v", "w", qs=(0.5,)).collect()
        }
        assert out[0.5] == 42.0

    def test_validation_and_empty(self, spark):
        df = spark.createDataFrame([(1.0, 0.0)], "v double, w double")
        assert weighted_quantiles(df, "v", "w").count() == 0
        with pytest.raises(ValueError):
            weighted_quantiles(df, "v", "w", qs=(0.0,))
