"""Graph operators (triangles / degrees) and the categorical stats
wave (QQ drift, Cramér's V, entropy) — cross-checked against
brute-force / numpy recomputation."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.operators.graph import degree_stats, triangle_count
from spark_bestfit_spark.operators.stats import (
    categorical_entropy,
    cramers_v,
    qq_drift,
)


def _random_graph(n=40, p=0.15, seed=7):
    rng = np.random.default_rng(seed)
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if rng.random() < p
    ]
    return edges


def _brute_triangles(edges):
    es = {frozenset(e) for e in edges}
    verts = sorted({v for e in edges for v in e})
    return sum(
        1
        for a, b, c in itertools.combinations(verts, 3)
        if {a, b} in es and {a, c} in es and {b, c} in es
    )


class TestTriangleCount:
    def test_matches_brute_force(self, spark):
        edges = _random_graph()
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        r = triangle_count(df).first()
        assert r["n_triangles"] == _brute_triangles(edges)
        assert r["n_edges"] == len(edges)
        assert r["n_vertices"] == len({v for e in edges for v in e})

    def test_dedup_orientation_and_loops(self, spark):
        # duplicated edges, reversed orientation, and a self-loop must
        # all collapse; K4 has exactly 4 triangles
        k4 = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
              (3, 4), (2, 2)]
        df = spark.createDataFrame(k4, "id_a long, id_b long")
        r = triangle_count(df).first()
        assert r["n_triangles"] == 4
        assert r["n_edges"] == 6
        assert r["n_vertices"] == 4

    def test_hub_graph_star_has_no_triangles(self, spark):
        star = [(0, i) for i in range(1, 50)]
        df = spark.createDataFrame(star, "id_a long, id_b long")
        assert triangle_count(df).first()["n_triangles"] == 0

    def test_degree_stats(self, spark):
        edges = _random_graph(seed=13)
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["vertex"]: r["degree"]
            for r in degree_stats(df).collect()
        }
        exp: dict = {}
        for a, b in edges:
            exp[a] = exp.get(a, 0) + 1
            exp[b] = exp.get(b, 0) + 1
        assert got == exp


class TestPagerank:
    def test_matches_numpy_power_iteration(self, spark):
        from spark_bestfit_spark.operators.graph import pagerank

        edges = _random_graph(n=30, p=0.2, seed=37)
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["vertex"]: r["rank"]
            for r in pagerank(df, iterations=6, damping=0.85).collect()
        }
        verts = sorted({v for e in edges for v in e})
        idx = {v: i for i, v in enumerate(verts)}
        n = len(verts)
        A = np.zeros((n, n))
        for a, b in set(map(lambda e: tuple(sorted(e)), edges)):
            A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
        deg = A.sum(1)
        r = np.full(n, 1.0 / n)
        for _ in range(6):
            r = (1 - 0.85) / n + 0.85 * (A.T @ (r / deg))
        assert len(got) == n
        for v in verts:
            assert got[v] == pytest.approx(
                round(r[idx[v]], 6), abs=2e-6
            ), v
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-3)

    def test_hub_ranks_highest_and_validation(self, spark):
        from spark_bestfit_spark.operators.graph import pagerank

        star = [(0, i) for i in range(1, 20)]
        df = spark.createDataFrame(star, "id_a long, id_b long")
        got = {
            r["vertex"]: r["rank"] for r in pagerank(df, iterations=8).collect()
        }
        assert got[0] == max(got.values())
        assert got[0] > 5 * got[1]
        with pytest.raises(ValueError, match="iterations"):
            pagerank(df, iterations=0)
        with pytest.raises(ValueError, match="damping"):
            pagerank(df, damping=1.5)


class TestQQDrift:
    def test_matches_numpy_percentiles(self, spark):
        rng = np.random.default_rng(19)
        a = rng.normal(10, 3, 4000).round(4)
        b = (a + 2.5).round(4)  # pure shift
        da = spark.createDataFrame(pd.DataFrame({"v": a}))
        db = spark.createDataFrame(pd.DataFrame({"v": b}))
        rows = {r["q"]: r for r in qq_drift(da, db, "v").collect()}
        for q, r in rows.items():
            ea = round(np.percentile(a, 100 * q, method="linear"), 6)
            eb = round(np.percentile(b, 100 * q, method="linear"), 6)
            assert r["quantile_a"] == pytest.approx(ea, abs=1e-6)
            assert r["quantile_b"] == pytest.approx(eb, abs=1e-6)
            assert r["shift"] == pytest.approx(2.5, abs=1e-3)

    def test_validation(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"v": [1.0]}))
        with pytest.raises(ValueError, match="fractions"):
            qq_drift(df, df, "v", fractions=[1.5])


class TestCramersV:
    def test_matches_hand_chi2(self, spark):
        rng = np.random.default_rng(23)
        # dependent pair: b correlates with a
        a = rng.choice(["x", "y", "z"], 3000)
        flip = rng.random(3000) < 0.3
        b = np.where(flip, rng.choice(["p", "q"], 3000), np.where(a == "x", "p", "q"))
        df = spark.createDataFrame(pd.DataFrame({"a": a, "b": b}))
        r = cramers_v(df, "a", "b").first()
        ct = pd.crosstab(pd.Series(a), pd.Series(b)).values
        n = ct.sum()
        exp = np.outer(ct.sum(1), ct.sum(0)) / n
        chi2 = ((ct - exp) ** 2 / exp).sum()
        v = np.sqrt(chi2 / (n * (min(ct.shape) - 1)))
        assert r["n"] == n
        assert r["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
        assert r["chi2"] == pytest.approx(round(chi2, 6), abs=1e-4)
        assert r["v"] == pytest.approx(round(v, 6), abs=1e-6)
        assert r["v"] > 0.5  # genuinely associated

    def test_independent_columns_near_zero(self, spark):
        rng = np.random.default_rng(29)
        df = spark.createDataFrame(pd.DataFrame({
            "a": rng.choice(["x", "y"], 5000),
            "b": rng.choice(["p", "q", "r"], 5000),
        }))
        assert cramers_v(df, "a", "b").first()["v"] < 0.05


class TestWeightedStats:
    def test_matches_numpy(self, spark):
        from spark_bestfit_spark.operators.stats import weighted_stats

        rng = np.random.default_rng(59)
        pdf = pd.DataFrame({
            "g": rng.choice(["a", "b"], 2000),
            "v": rng.lognormal(1.0, 0.7, 2000).round(4),
            "w": rng.integers(1, 50, 2000).astype("float64"),
        })
        df = spark.createDataFrame(pdf)
        got = {
            r["g"]: r
            for r in weighted_stats(df, "v", "w", group_col="g").collect()
        }
        for g, grp in pdf.groupby("g"):
            v, w = grp["v"].values, grp["w"].values
            wmean = (v * w).sum() / w.sum()
            order = np.argsort(v, kind="stable")
            cw = np.cumsum(w[order])
            wmed = v[order][np.searchsorted(cw, w.sum() / 2)]
            r = got[g]
            assert r["n"] == len(grp)
            assert r["total_weight"] == pytest.approx(w.sum())
            assert r["wmean"] == pytest.approx(round(wmean, 6), abs=1e-6)
            assert r["wmedian"] == pytest.approx(wmed)

    def test_nonpositive_weights_excluded(self, spark):
        from spark_bestfit_spark.operators.stats import weighted_stats

        df = spark.createDataFrame(
            pd.DataFrame({"v": [1.0, 2.0, 3.0], "w": [1.0, 0.0, -2.0]})
        )
        r = weighted_stats(df, "v", "w").first()
        assert r["n"] == 1 and r["wmedian"] == 1.0


class TestGini:
    def test_matches_direct_formula(self, spark):
        from spark_bestfit_spark.operators.stats import gini_coefficient

        rng = np.random.default_rng(61)
        pdf = pd.DataFrame({
            "g": rng.choice(["s1", "s2"], 3000),
            "v": rng.pareto(1.5, 3000).round(5),
        })
        df = spark.createDataFrame(pdf)
        got = {
            r["g"]: r
            for r in gini_coefficient(df, "v", group_col="g").collect()
        }
        for g, grp in pdf.groupby("g"):
            x = np.sort(grp["v"].values)
            n = len(x)
            gini = (2 * np.sum(np.arange(1, n + 1) * x)) / (
                n * x.sum()
            ) - (n + 1) / n
            assert got[g]["gini"] == pytest.approx(
                round(gini, 6), abs=1e-6
            )
        # heavy-tailed -> strongly concentrated
        assert all(r["gini"] > 0.4 for r in got.values())

    def test_even_and_degenerate(self, spark):
        from spark_bestfit_spark.operators.stats import gini_coefficient

        even = spark.createDataFrame(pd.DataFrame({"v": [5.0] * 40}))
        assert gini_coefficient(even, "v").first()["gini"] == 0.0
        zero = spark.createDataFrame(pd.DataFrame({"v": [0.0] * 5}))
        assert gini_coefficient(zero, "v").first()["gini"] is None


class TestAutocorrelation:
    def test_matches_pandas_autocorr(self, spark):
        from spark_bestfit_spark.operators.stats import autocorrelation

        rng = np.random.default_rng(67)
        frames = []
        for uid in range(4):
            n = 200
            # AR(1)-ish so the ACF is meaningfully nonzero
            v = np.zeros(n)
            for i in range(1, n):
                v[i] = 0.7 * v[i - 1] + rng.normal(0, 1)
            frames.append(pd.DataFrame({
                "u": uid, "t": np.arange(n), "v": v.round(5),
                "rid": np.arange(n) + uid * 1000,
            }))
        pdf = pd.concat(frames)
        df = spark.createDataFrame(pdf)
        got = {
            (r["u"], r["lag"]): r
            for r in autocorrelation(
                df, "v", "t", "u", max_lag=3, tiebreak_col="rid"
            ).collect()
        }
        for uid, grp in pdf.groupby("u"):
            s = grp.sort_values("t")["v"]
            for k in (1, 2, 3):
                r = got[(uid, k)]
                assert r["n_pairs"] == len(s) - k
                assert r["acf"] == pytest.approx(
                    round(s.autocorr(lag=k), 6), abs=2e-6
                ), (uid, k)
        assert all(
            got[(u, 1)]["acf"] > 0.4 for u in range(4)
        )  # AR(1) signal visible

    def test_validation(self, spark):
        from spark_bestfit_spark.operators.stats import autocorrelation

        df = spark.createDataFrame(pd.DataFrame({
            "u": [1], "t": [1], "v": [1.0]
        }))
        with pytest.raises(ValueError, match="max_lag"):
            autocorrelation(df, "v", "t", "u", max_lag=0)


class TestCategoricalEntropy:
    def test_matches_numpy(self, spark):
        rng = np.random.default_rng(31)
        pdf = pd.DataFrame({
            "g": rng.choice(["d1", "d2"], 4000),
            "lang": rng.choice(["en", "de", "fr", "ja"], 4000,
                               p=[0.7, 0.15, 0.1, 0.05]),
        })
        df = spark.createDataFrame(pdf)
        got = {
            r["g"]: r
            for r in categorical_entropy(df, "lang", "g").collect()
        }
        for g, grp in pdf.groupby("g"):
            p = grp["lang"].value_counts(normalize=True).values
            h = float(-(p * np.log(p)).sum())
            assert got[g]["n"] == len(grp)
            assert got[g]["n_levels"] == grp["lang"].nunique()
            assert got[g]["entropy"] == pytest.approx(
                round(h, 6), abs=1e-6
            )
        glob = categorical_entropy(df, "lang").first()
        p = pdf["lang"].value_counts(normalize=True).values
        assert glob["entropy"] == pytest.approx(
            round(float(-(p * np.log(p)).sum()), 6), abs=1e-6
        )

    def test_constant_column_zero_entropy(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"c": ["k"] * 10}))
        r = categorical_entropy(df, "c").first()
        assert r["entropy"] == 0.0 and r["n_levels"] == 1


class TestGroupedOls:
    def test_matches_numpy_polyfit(self, spark):
        from spark_bestfit_spark.operators.stats import grouped_ols

        rng = np.random.default_rng(83)
        pdf = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], 3000),
            "x": rng.uniform(0, 100, 3000).round(3),
        })
        pdf["y"] = (
            2.5 * pdf["x"]
            + pdf["g"].map({"a": 10.0, "b": -4.0, "c": 0.0})
            + rng.normal(0, 5, 3000)
        ).round(4)
        df = spark.createDataFrame(pdf)
        got = {
            r["g"]: r
            for r in grouped_ols(df, "y", "x", group_col="g").collect()
        }
        for g, grp in pdf.groupby("g"):
            b, a = np.polyfit(grp["x"], grp["y"], 1)
            r2 = np.corrcoef(grp["x"], grp["y"])[0, 1] ** 2
            r = got[g]
            assert r["n"] == len(grp)
            assert r["slope"] == pytest.approx(b, abs=1e-5)
            assert r["intercept"] == pytest.approx(a, abs=1e-4)
            assert r["r2"] == pytest.approx(r2, abs=1e-6)

    def test_global_and_expression_x(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.stats import grouped_ols

        pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0],
                            "y": [2.0, 4.0, 6.0, 8.0]})
        r = grouped_ols(
            spark.createDataFrame(pdf), "y", F.col("x") * 2
        ).first()
        # y = 1.0 * (2x): slope halves under the doubled regressor
        assert r["slope"] == pytest.approx(1.0)
        assert r["intercept"] == pytest.approx(0.0)
        assert r["r2"] == pytest.approx(1.0)

    def test_degenerate_x_yields_nulls(self, spark):
        from spark_bestfit_spark.operators.stats import grouped_ols

        pdf = pd.DataFrame({"x": [5.0] * 8, "y": range(8)})
        r = grouped_ols(spark.createDataFrame(pdf), "y", "x").first()
        assert r["n"] == 8
        assert r["slope"] is None and r["r2"] is None

    def test_nulls_and_nans_excluded(self, spark):
        from spark_bestfit_spark.operators.stats import grouped_ols

        pdf = pd.DataFrame({
            "x": [1.0, 2.0, np.nan, 4.0, None],
            "y": [1.0, None, 3.0, 4.0, 5.0],
        })
        r = grouped_ols(spark.createDataFrame(pdf), "y", "x").first()
        assert r["n"] == 2  # only (1,1) and (4,4) survive


class TestMutualInformation:
    @staticmethod
    def _mi_numpy(a, b):
        ct = pd.crosstab(pd.Series(a), pd.Series(b)).values.astype(float)
        n = ct.sum()
        pj = ct / n

        def h(p):
            p = p[p > 0]
            return float(-(p * np.log(p)).sum())

        ha, hb, hab = h(pj.sum(1)), h(pj.sum(0)), h(pj.ravel())
        return n, ha, hb, hab, max(ha + hb - hab, 0.0)

    def test_matches_numpy(self, spark):
        from spark_bestfit_spark.operators.stats import mutual_information

        rng = np.random.default_rng(101)
        a = rng.choice(["x", "y", "z"], 4000)
        flip = rng.random(4000) < 0.25
        b = np.where(
            flip, rng.choice(["p", "q"], 4000), np.where(a == "x", "p", "q")
        )
        df = spark.createDataFrame(pd.DataFrame({"a": a, "b": b}))
        r = mutual_information(df, "a", "b").first()
        n, ha, hb, hab, mi = self._mi_numpy(a, b)
        assert r["n"] == n
        assert r["h_a"] == pytest.approx(ha, abs=1e-6)
        assert r["h_b"] == pytest.approx(hb, abs=1e-6)
        assert r["h_ab"] == pytest.approx(hab, abs=1e-6)
        assert r["mi"] == pytest.approx(mi, abs=1e-6)
        assert r["nmi"] == pytest.approx(mi / np.sqrt(ha * hb), abs=1e-6)
        assert r["mi"] > 0.1  # genuinely dependent

    def test_independent_near_zero(self, spark):
        from spark_bestfit_spark.operators.stats import mutual_information

        rng = np.random.default_rng(107)
        df = spark.createDataFrame(pd.DataFrame({
            "a": rng.choice(["x", "y"], 6000),
            "b": rng.choice(["p", "q", "r"], 6000),
        }))
        assert mutual_information(df, "a", "b").first()["mi"] < 0.005

    def test_identical_columns_nmi_one(self, spark):
        from spark_bestfit_spark.operators.stats import mutual_information

        rng = np.random.default_rng(109)
        a = rng.choice(["x", "y", "z"], 2000)
        df = spark.createDataFrame(pd.DataFrame({"a": a, "b": a}))
        r = mutual_information(df, "a", "b").first()
        assert r["nmi"] == pytest.approx(1.0)
        assert r["mi"] == pytest.approx(r["h_a"], abs=1e-6)

    def test_constant_marginal_null_nmi(self, spark):
        from spark_bestfit_spark.operators.stats import mutual_information

        df = spark.createDataFrame(
            pd.DataFrame({"a": ["k"] * 9, "b": list("pqr") * 3})
        )
        r = mutual_information(df, "a", "b").first()
        assert r["mi"] == 0.0 and r["nmi"] is None


class TestCusumChangepoint:
    @staticmethod
    def _np_cusum(x):
        x = np.asarray(x, dtype=float)
        n = len(x)
        s = np.cumsum(x - x.mean())
        sd = x.std()  # population
        if sd == 0:
            return None, None
        z = np.round(np.abs(s) / (sd * np.sqrt(n)), 6)
        return z.max(), int(np.argmax(z)) + 1  # earliest argmax, 1-based

    def test_matches_numpy_and_finds_shift(self, spark):
        from spark_bestfit_spark.operators.stats import cusum_changepoint

        rng = np.random.default_rng(5)
        series = {}
        rows = []
        for e in range(6):
            cp = rng.integers(20, 80)
            x = np.concatenate([
                rng.normal(0, 1, cp), rng.normal(3, 1, 100 - cp)
            ])
            series[e] = (x, cp)
            rows += [(e, i, float(v)) for i, v in enumerate(x)]
        df = spark.createDataFrame(
            rows, "e int, t int, v double"
        ).repartition(7)
        got = {
            r.e: r
            for r in cusum_changepoint(df, "e", "t", "v").collect()
        }
        for e, (x, cp) in series.items():
            stat, idx = self._np_cusum(x)
            assert got[e].cusum_stat == pytest.approx(stat, abs=1e-9)
            assert got[e].cp_index == idx
            assert got[e].n == 100
            # the scan localizes a 3-sigma shift within a few samples
            assert abs(got[e].cp_index - cp) <= 5
            assert got[e].cusum_stat > 1.36  # 5% Kolmogorov band
            assert got[e].cp_order == idx - 1  # t is the 0-based order

    def test_no_shift_stays_small_and_constant_is_null(self, spark):
        from spark_bestfit_spark.operators.stats import cusum_changepoint

        rng = np.random.default_rng(9)
        rows = [(0, i, float(v)) for i, v in enumerate(rng.normal(0, 1, 200))]
        rows += [(1, i, 5.0) for i in range(50)]
        df = spark.createDataFrame(rows, "e int, t int, v double")
        got = {r.e: r for r in cusum_changepoint(df, "e", "t", "v").collect()}
        stat, idx = self._np_cusum(
            [v for e, t, v in rows if e == 0]
        )
        assert got[0].cusum_stat == pytest.approx(stat, abs=1e-9)
        assert got[1].cusum_stat is None and got[1].cp_index is None

    def test_single_exchange_plan(self, spark):
        from spark_bestfit_spark.operators.stats import cusum_changepoint

        df = spark.createDataFrame(
            [(0, 1, 1.0), (0, 2, 2.0)], "e int, t int, v double"
        )
        plan = (
            cusum_changepoint(df, "e", "t", "v")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "SinglePartition" not in plan


class TestKaplanMeier:
    @staticmethod
    def _ref(durs, events):
        import collections

        per = collections.defaultdict(lambda: [0, 0])
        for d, e in zip(durs, events):
            per[d][0] += e
            per[d][1] += 1
        total, cum, s, out = len(durs), 0, 1.0, {}
        for t in sorted(per):
            d, c = per[t]
            n = total - cum
            s = 0.0 if d >= n else s * (1 - d / n)
            out[t] = (n, d, c - d, round(s, 6))
            cum += c
        return out

    def test_matches_reference_with_censoring(self, spark):
        from spark_bestfit_spark.operators.stats import kaplan_meier

        rng = np.random.default_rng(17)
        durs = rng.integers(1, 30, 500).tolist()
        events = rng.integers(0, 2, 500).tolist()
        df = spark.createDataFrame(
            list(zip(durs, events)), "t int, e int"
        ).repartition(8)
        got = {
            r.t: (r.n_risk, r.n_events, r.n_censored, r.survival)
            for r in kaplan_meier(df, "t", "e").collect()
        }
        assert got == self._ref(durs, events)

    def test_absorbed_zero_and_groups(self, spark):
        from spark_bestfit_spark.operators.stats import kaplan_meier

        rows = [
            # group A: everyone dies at t=2 -> S(2)=0 exactly
            ("A", 1, 1), ("A", 2, 1), ("A", 2, 1),
            # group B: all censored -> S stays 1
            ("B", 1, 0), ("B", 5, 0),
        ]
        df = spark.createDataFrame(rows, "g string, t int, e int")
        got = {
            (r.g, r.t): r.survival
            for r in kaplan_meier(df, "t", "e", "g").collect()
        }
        assert got[("A", 1)] == round(1 - 1 / 3, 6)
        assert got[("A", 2)] == 0.0
        assert got[("B", 1)] == 1.0 and got[("B", 5)] == 1.0

    def test_single_exchange(self, spark):
        from spark_bestfit_spark.operators.stats import kaplan_meier

        df = spark.createDataFrame(
            [("g", 1, 1), ("g", 2, 0)], "g string, t int, e int"
        )
        plan = (
            kaplan_meier(df, "t", "e", "g")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # per-time (g, t) aggregation exchange + ONE group exchange
        # shared by every window — nothing else, no single partition
        assert plan.count("Exchange hashpartitioning") == 2, plan
        assert "SinglePartition" not in plan


class TestAbTest:
    def test_matches_scipy_free_welch(self, spark):
        from spark_bestfit_spark.operators.stats import ab_test

        rng = np.random.default_rng(23)
        a = rng.normal(10, 2, 300)
        b = rng.normal(10.5, 3, 200)
        rows = [("c", float(x)) for x in a] + [("t", float(x)) for x in b]
        df = spark.createDataFrame(rows, "arm string, v double").repartition(6)
        r = ab_test(df, "arm", "v", "c", "t").first()
        # numpy reference (Welch)
        va, vb = a.var(ddof=1), b.var(ddof=1)
        ra, rb = va / len(a), vb / len(b)
        se = np.sqrt(ra + rb)
        t = (b.mean() - a.mean()) / se
        dof = (ra + rb) ** 2 / (ra**2 / (len(a) - 1) + rb**2 / (len(b) - 1))
        assert r.n_c == 300 and r.n_t == 200
        assert r.mean_c == round(float(a.mean()), 6)
        assert r.t_stat == pytest.approx(t, abs=1e-5)
        assert r.dof == pytest.approx(dof, abs=1e-4)
        assert r.lift == pytest.approx(
            (b.mean() - a.mean()) / a.mean(), abs=1e-6
        )

    def test_binary_conversion_and_degenerate(self, spark):
        from spark_bestfit_spark.operators.stats import ab_test

        rows = [("c", 1.0)] * 20 + [("c", 0.0)] * 80 + \
               [("t", 1.0)] * 30 + [("t", 0.0)] * 70
        df = spark.createDataFrame(rows, "arm string, v double")
        r = ab_test(df, "arm", "v", "c", "t").first()
        assert r.mean_c == 0.2 and r.mean_t == 0.3
        assert r.t_stat is not None and r.t_stat > 1.5  # directional
        # degenerate: constant metric in both arms
        flat = spark.createDataFrame(
            [("c", 5.0), ("c", 5.0), ("t", 5.0), ("t", 5.0)],
            "arm string, v double",
        )
        r2 = ab_test(flat, "arm", "v", "c", "t").first()
        assert r2.t_stat is None and r2.dof is None
        # other variants are excluded entirely
        extra = spark.createDataFrame(
            rows + [("x", 999.0)] * 50, "arm string, v double"
        )
        r3 = ab_test(extra, "arm", "v", "c", "t").first()
        assert (r3.n_c, r3.n_t) == (100, 100)

    def test_one_scan_plan(self, spark):
        from spark_bestfit_spark.operators.stats import ab_test

        df = spark.createDataFrame([("c", 1.0)], "arm string, v double")
        plan = (
            ab_test(df, "arm", "v", "c", "t")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Scan") == 1, plan
        assert "Join" not in plan


class TestRocAuc:
    @staticmethod
    def _ref_auc(scores, labels):
        # rank-sum with average ranks (half tie credit)
        import collections

        per = collections.defaultdict(lambda: [0, 0])
        for s, y in zip(scores, labels):
            per[s][1 if y else 0] += 1
        below = 0
        num = 0.0
        for s in sorted(per):
            neg, pos = per[s][0], per[s][1]
            num += pos * (below + 0.5 * neg)
            below += neg
        P = sum(labels)
        N = len(labels) - P
        return round(num / (P * N), 6)

    def test_matches_reference_with_heavy_ties(self, spark):
        from spark_bestfit_spark.operators.stats import roc_auc

        rng = np.random.default_rng(31)
        # quantized scores -> heavy ties; informative signal
        labels = rng.integers(0, 2, 3000).tolist()
        scores = [
            float(np.round(rng.normal(1.0 * y, 1.5), 1))
            for y in labels
        ]
        df = spark.createDataFrame(
            list(zip(scores, labels)), "s double, y int"
        ).repartition(8)
        r = roc_auc(df, "s", "y").first()
        assert r.auc == self._ref_auc(scores, labels)
        assert r.gini == round(2 * r.auc - 1, 6)
        assert r.n_pos == sum(labels)
        assert 0.6 < r.auc < 0.8  # signal present but noisy

    def test_perfect_constant_and_empty_class(self, spark):
        from spark_bestfit_spark.operators.stats import roc_auc

        perfect = spark.createDataFrame(
            [(float(i), 1 if i >= 5 else 0) for i in range(10)],
            "s double, y int",
        )
        assert roc_auc(perfect, "s", "y").first().auc == 1.0
        tied = spark.createDataFrame(
            [(1.0, 0), (1.0, 1)], "s double, y int"
        )
        r = roc_auc(tied, "s", "y").first()
        assert r.auc == 0.5 and r.gini == 0.0
        onecls = spark.createDataFrame(
            [(1.0, 1), (2.0, 1)], "s double, y int"
        )
        r2 = roc_auc(onecls, "s", "y").first()
        assert r2.auc is None and r2.n_neg == 0


class TestCalibrationCurve:
    def test_matches_pandas_binning(self, spark):
        from spark_bestfit_spark.operators.stats import calibration_curve

        rng = np.random.default_rng(41)
        probs = rng.random(4000)
        labels = (rng.random(4000) < probs).astype(int)  # calibrated
        df = spark.createDataFrame(
            list(zip(probs.tolist(), labels.tolist())), "p double, y int"
        )
        got = {
            r.bin: r for r in calibration_curve(df, "p", "y", 10).collect()
        }
        binned = np.minimum((probs * 10).astype(int), 9)
        for b in range(10):
            m = binned == b
            assert got[b].n == int(m.sum())
            assert got[b].mean_pred == round(float(probs[m].mean()), 6)
            assert got[b].frac_pos == round(float(labels[m].mean()), 6)
            assert got[b].gap < 0.1  # calibrated by construction
        assert got[9].p_lo == 0.9 and got[9].p_hi == 1.0

    def test_p_one_lands_in_last_bin_and_validation(self, spark):
        from spark_bestfit_spark.operators.stats import calibration_curve

        df = spark.createDataFrame(
            [(1.0, 1), (0.0, 0), (1.5, 1)], "p double, y int"
        )
        rows = {r.bin: r for r in calibration_curve(df, "p", "y", 5).collect()}
        assert rows[4].n == 1          # p=1.0 clamped into [0.8, 1.0]
        assert rows[0].n == 1
        assert sum(r.n for r in rows.values()) == 2  # 1.5 excluded
        with pytest.raises(ValueError, match="bins"):
            calibration_curve(df, "p", "y", 1)


class TestQualityChecks:
    def test_all_rule_types(self, spark):
        from spark_bestfit_spark.operators.stats import quality_checks

        rows = [
            (1, 5.0, "a", "x1"),
            (2, 50.0, "b", "x2"),      # in_range max violation
            (2, None, "c", "zz"),      # not_null + matches violations
            (3, -1.0, "a", "x3"),      # in_range min violation
            (3, 1.0, "q", "x4"),       # in_set violation
        ]
        df = spark.createDataFrame(rows, "id int, v double, s string, code string")
        rules = [
            {"type": "not_null", "column": "v"},
            {"type": "in_range", "column": "v", "min": 0.0, "max": 10.0},
            {"type": "in_set", "column": "s", "values": ["a", "b", "c"]},
            {"type": "matches", "column": "code", "pattern": "^x[0-9]$"},
            {"type": "unique", "column": "id"},
        ]
        got = {
            (r.rule, r.column): (r.n_rows, r.n_violations, r.violation_frac)
            for r in quality_checks(df, rules).collect()
        }
        assert got[("not_null", "v")] == (5, 1, 0.2)
        assert got[("in_range", "v")] == (5, 2, 0.4)   # 50 and -1
        assert got[("in_set", "s")] == (5, 1, 0.2)
        assert got[("matches", "code")] == (5, 1, 0.2)
        # ids: 1,2,2,3,3 -> 2 rows beyond first occurrences
        assert got[("unique", "id")] == (5, 2, 0.4)

    def test_one_scan_for_row_rules_and_validation(self, spark):
        from spark_bestfit_spark.operators.stats import quality_checks

        df = spark.createDataFrame([(1, 2.0)], "id int, v double")
        rules = [
            {"type": "not_null", "column": "v"},
            {"type": "in_range", "column": "v", "min": 0},
            {"type": "not_null", "column": "id"},
        ]
        plan = (
            quality_checks(df, rules)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # all three row-level rules share one aggregation over one scan
        assert plan.count("Scan") == 1, plan
        import pytest

        with pytest.raises(ValueError, match="rules"):
            quality_checks(df, [])
        with pytest.raises(ValueError, match="unknown"):
            quality_checks(df, [{"type": "nope", "column": "v"}])


class TestBenford:
    def test_benford_data_conforms_and_uniform_fails(self, spark):
        from spark_bestfit_spark.operators.stats import benford_test

        rng = np.random.default_rng(71)
        # log-uniform over several decades: exactly Benford
        benford = np.exp(rng.uniform(np.log(1e-2), np.log(1e5), 20000))
        # uniform [1, 2): every leading digit is 1
        uniform = rng.uniform(1.0, 2.0, 5000)
        rows = [("b", float(v)) for v in benford] + [
            ("u", float(v)) for v in uniform
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {r.g: r for r in benford_test(df, "v", "g").collect()}
        assert got["b"].chi2 < 30  # conforming (8 dof, 5% crit ~15.5)
        assert got["u"].p1 == 1.0 and got["u"].chi2 > 1000
        assert got["b"].p1 == pytest.approx(0.30103, abs=0.02)

    def test_digit_extraction_and_exclusions(self, spark):
        from spark_bestfit_spark.operators.stats import benford_test

        rows = [
            (123.0,), (-0.00456,), (9.99,), (0.0,), (None,),
            (float("inf"),),
        ]
        df = spark.createDataFrame(rows, "v double")
        r = benford_test(df, "v").first()
        # digits: 1 (123), 4 (0.00456), 9 (9.99); zero/null/inf excluded
        assert r.n == 3
        assert r.p1 == pytest.approx(round(1 / 3, 6))


class TestConformalInterval:
    def test_exact_order_statistic(self, spark):
        from spark_bestfit_spark.operators.stats import conformal_interval

        rng = np.random.default_rng(73)
        y = rng.normal(0, 1, 997)
        yhat = y + rng.normal(0, 0.5, 997)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(y, yhat)],
            "y double, yhat double",
        ).repartition(8)
        r = conformal_interval(df, "y", "yhat", alpha=0.1).first()
        res = np.sort(np.abs(y - yhat))
        k = int(np.ceil((997 + 1) * 0.9))
        assert r.n == 997 and r.k == k
        assert r.qhat == round(float(res[k - 1]), 6)
        assert r.coverage >= 0.9
        assert r.coverage == round(float((res <= res[k - 1]).mean()), 6)

    def test_ties_and_degenerate(self, spark):
        from spark_bestfit_spark.operators.stats import conformal_interval

        # heavy ties: residuals all in {0, 1}
        rows = [(0.0, 0.0)] * 7 + [(1.0, 0.0)] * 3
        df = spark.createDataFrame(rows, "y double, yhat double")
        r = conformal_interval(df, "y", "yhat", alpha=0.2).first()
        # k = ceil(11 * 0.8) = 9 -> 9th smallest residual = 1.0
        assert r.k == 9 and r.qhat == 1.0 and r.coverage == 1.0
        flat = spark.createDataFrame([(1.0, 1.0)] * 5, "y double, yhat double")
        r2 = conformal_interval(flat, "y", "yhat").first()
        assert r2.qhat == 0.0 and r2.coverage == 1.0
        import pytest as _pt

        with _pt.raises(ValueError, match="alpha"):
            conformal_interval(df, "y", "yhat", alpha=0.0)


class TestLaggedCrosscorr:
    def test_detects_known_lead(self, spark):
        from spark_bestfit_spark.operators.stats import lagged_crosscorr

        rng = np.random.default_rng(79)
        x = rng.normal(0, 1, 300)
        y = np.roll(x, 3) + rng.normal(0, 0.1, 300)  # y lags x by 3
        rows = [
            (i, float(a), float(b))
            for i, (a, b) in enumerate(zip(x, y))
        ]
        df = spark.createDataFrame(rows, "t long, x double, y double")
        got = {
            r.lag: r.xcorr
            for r in lagged_crosscorr(df, "t", "x", "y", 5).collect()
        }
        assert max(got, key=lambda k: got[k]) == 3
        assert got[3] > 0.95 and abs(got[0]) < 0.3
        # reference check vs numpy at the peak (ignoring roll wrap)
        want = np.corrcoef(x[: 300 - 3], y[3:])[0, 1]
        assert got[3] == pytest.approx(round(float(want), 6), abs=1e-6)

    def test_pair_counts_and_validation(self, spark):
        from spark_bestfit_spark.operators.stats import lagged_crosscorr

        rows = [("e", i, float(i), float(i * 2)) for i in range(10)]
        df = spark.createDataFrame(rows, "g string, t long, x double, y double")
        got = {
            r.lag: r
            for r in lagged_crosscorr(
                df, "t", "x", "y", 2, entity_col="g"
            ).collect()
        }
        assert got[0].n_pairs == 10 and got[2].n_pairs == 8
        assert got[-2].n_pairs == 8
        assert got[0].xcorr == 1.0  # perfectly linear
        import pytest as _pt

        with _pt.raises(ValueError, match="max_lag"):
            lagged_crosscorr(df, "t", "x", "y", 0)


class TestGreenwoodSe:
    def test_matches_reference(self, spark):
        from spark_bestfit_spark.operators.stats import kaplan_meier

        import collections
        import math

        rng = np.random.default_rng(83)
        durs = rng.integers(1, 15, 200).tolist()
        events = rng.integers(0, 2, 200).tolist()
        df = spark.createDataFrame(list(zip(durs, events)), "t int, e int")
        got = {r.t: r.greenwood_se for r in kaplan_meier(df, "t", "e").collect()}
        per = collections.defaultdict(lambda: [0, 0])
        for d, e in zip(durs, events):
            per[d][0] += e
            per[d][1] += 1
        total, cum, s, gw = len(durs), 0, 1.0, 0.0
        for t in sorted(per):
            d, c = per[t]
            n = total - cum
            if d >= n:
                s = 0.0
                want = None
            else:
                s *= 1 - d / n
                gw += d / (n * (n - d))
                want = round(s * math.sqrt(gw), 6)
            assert got[t] == want, t
            cum += c


class TestSimpsonsCheck:
    def test_detects_reversal(self, spark):
        from spark_bestfit_spark.operators.stats import simpsons_check

        rng = np.random.default_rng(89)
        rows = []
        # within each group y DECREASES in x, but group means line up
        # so the pooled trend INCREASES
        for g, (x0, y0) in enumerate([(0, 0), (5, 10), (10, 20)]):
            x = x0 + rng.uniform(0, 2, 200)
            y = y0 - 1.5 * (x - x0) + rng.normal(0, 0.2, 200)
            rows += [(str(g), float(a), float(b)) for a, b in zip(x, y)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        got = {r.g: r for r in simpsons_check(df, "x", "y", "g").collect()}
        for g in ("0", "1", "2"):
            assert got[g].corr_group < -0.9
            assert got[g].corr_pooled > 0.9
            assert got[g].sign_flip is True

    def test_degenerate_group_never_flags(self, spark):
        from spark_bestfit_spark.operators.stats import simpsons_check

        rows = [("a", 1.0, 2.0), ("a", 2.0, 4.0), ("b", 5.0, 5.0)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        got = {r.g: r for r in simpsons_check(df, "x", "y", "g").collect()}
        assert got["b"].corr_group is None and got["b"].sign_flip is False


class TestMixShiftDecomposition:
    def test_effects_sum_to_overall_change(self, spark):
        from spark_bestfit_spark.operators.stats import (
            mix_shift_decomposition,
        )

        rng = np.random.default_rng(91)
        old_rows, new_rows = [], []
        for g, (n_o, n_n, m_o, m_n) in {
            "a": (300, 100, 10.0, 11.0),
            "b": (100, 300, 20.0, 19.0),
            "gone": (50, 0, 5.0, None),
            "born": (0, 50, None, 30.0),
        }.items():
            old_rows += [
                (g, float(m_o + rng.normal(0, 1))) for _ in range(n_o)
            ] if n_o else []
            new_rows += [
                (g, float(m_n + rng.normal(0, 1))) for _ in range(n_n)
            ] if n_n else []
        old = spark.createDataFrame(old_rows, "g string, v double")
        new = spark.createDataFrame(new_rows, "g string, v double")
        out = mix_shift_decomposition(old, new, "g", "v").collect()
        import pandas as pd

        po = pd.DataFrame(old_rows, columns=["g", "v"])
        pn = pd.DataFrame(new_rows, columns=["g", "v"])
        delta = pn.v.mean() - po.v.mean()
        total = sum(r.total_effect for r in out)
        assert total == pytest.approx(delta, abs=2e-5)
        byg = {r.g: r for r in out}
        assert byg["gone"].share_new == 0.0
        assert byg["gone"].rate_effect == 0.0
        assert byg["gone"].mix_effect < 0  # departure drags the mean
        assert byg["born"].mix_effect > 0
        # rate effect sign matches the group's mean move
        assert byg["a"].rate_effect > 0 and byg["b"].rate_effect < 0


class TestGroupedConformal:
    def test_matches_per_group_order_stat(self, spark):
        from spark_bestfit_spark.operators.stats import (
            grouped_conformal_interval,
        )

        rng = np.random.default_rng(101)
        rows = []
        ref = {}
        for g, (n, scale) in {"a": (500, 1.0), "b": (200, 5.0)}.items():
            r = np.abs(rng.normal(0, scale, n))
            k = int(np.ceil((n + 1) * 0.9))
            ref[g] = (n, k, round(float(np.sort(r)[k - 1]), 6))
            rows += [(g, float(v), 0.0) for v in r]
        df = spark.createDataFrame(rows, "g string, y double, yhat double")
        got = {
            r.g: (r.n, r.k, r.qhat)
            for r in grouped_conformal_interval(
                df, "y", "yhat", "g", alpha=0.1
            ).collect()
        }
        assert got == ref
        # per-group widths reflect per-group scales
        assert got["b"][2] > 3 * got["a"][2]

    def test_tiny_group_returns_null(self, spark):
        from spark_bestfit_spark.operators.stats import (
            grouped_conformal_interval,
        )

        # n=3, alpha=0.1 -> k = ceil(4*0.9) = 4 > 3: the group cannot
        # certify 90% coverage, so qhat is null (no silent clamp)
        df = spark.createDataFrame(
            [("t", float(i), 0.0) for i in range(3)],
            "g string, y double, yhat double",
        )
        r = grouped_conformal_interval(df, "y", "yhat", "g").first()
        assert r.qhat is None and r.k == 4 and r.n == 3


class TestSpearmanCorr:
    @staticmethod
    def _avg_ranks(v):
        import collections

        order = sorted(v)
        first = {}
        cnt = collections.Counter(v)
        pos = 1
        for x in order:
            if x not in first:
                first[x] = pos
            pos += 1
        return [first[x] + (cnt[x] - 1) / 2 for x in v]

    def test_matches_reference_with_ties(self, spark):
        from spark_bestfit_spark.operators.stats import spearman_corr

        rng = np.random.default_rng(103)
        # heavy ties: integer-quantized values
        x = rng.integers(0, 20, 800).astype(float)
        y = (x + rng.integers(0, 10, 800)).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x double, y double",
        ).repartition(6)
        r = spearman_corr(df, "x", "y").first()
        rx = np.array(self._avg_ranks(list(x)))
        ry = np.array(self._avg_ranks(list(y)))
        want = round(float(np.corrcoef(rx, ry)[0, 1]), 6)
        assert r.rho == pytest.approx(want, abs=1e-6)
        assert r.n == 800

    def test_monotone_nonlinear_is_one_and_groups(self, spark):
        from spark_bestfit_spark.operators.stats import spearman_corr

        rows = [("g1", float(i), float(2 ** i)) for i in range(20)]
        rows += [("g2", float(i), float(-i)) for i in range(20)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        got = {
            r.g: r.rho
            for r in spearman_corr(df, "x", "y", "g").collect()
        }
        assert got == {"g1": 1.0, "g2": -1.0}


class TestOverlapCoefficient:
    def test_matches_numpy_binned_overlap(self, spark):
        from spark_bestfit_spark.operators.stats import overlap_coefficient

        rng = np.random.default_rng(107)
        a = rng.normal(0, 1, 2000)
        b = rng.normal(1.5, 1.2, 1500)
        da = spark.createDataFrame([(float(v),) for v in a], "v double")
        db = spark.createDataFrame([(float(v),) for v in b], "v double")
        r = overlap_coefficient(da, db, "v", bins=32).first()
        lo, hi = min(a.min(), b.min()), max(a.max(), b.max())
        # width_bucket semantics: bucket i for [lo + i*w, lo + (i+1)*w)
        w = (hi - lo) / 32
        ba = np.clip(((a - lo) / w).astype(int) + 1, 1, 33)
        bb = np.clip(((b - lo) / w).astype(int) + 1, 1, 33)
        pa = np.bincount(ba, minlength=34) / len(a)
        pb = np.bincount(bb, minlength=34) / len(b)
        want = round(float(np.minimum(pa, pb).sum()), 6)
        assert r.ovl == pytest.approx(want, abs=2e-6)
        assert r.tv == pytest.approx(round(1 - want, 6), abs=2e-6)
        assert r.n_a == 2000 and r.n_b == 1500

    def test_disjoint_and_identical(self, spark):
        from spark_bestfit_spark.operators.stats import overlap_coefficient

        a = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
        b = spark.createDataFrame(
            [(float(i + 1000),) for i in range(100)], "v double"
        )
        r = overlap_coefficient(a, b, "v").first()
        assert r.ovl == 0.0 and r.tv == 1.0
        same = overlap_coefficient(a, a, "v").first()
        assert same.ovl == 1.0
        import pytest as _pt

        with _pt.raises(ValueError, match="bins"):
            overlap_coefficient(a, b, "v", bins=1)


class TestMannWhitney:
    def test_matches_reference_with_ties(self, spark):
        from spark_bestfit_spark.operators.stats import mann_whitney_u

        rng = np.random.default_rng(109)
        a = np.round(rng.normal(0, 1, 300), 1)   # quantized -> ties
        b = np.round(rng.normal(0.4, 1, 250), 1)
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        r = mann_whitney_u(df, "v", "g", "a", "b").first()
        # reference U via midranks
        import collections

        per = collections.defaultdict(lambda: [0, 0])
        for v in a:
            per[v][0] += 1
        for v in b:
            per[v][1] += 1
        below_b = 0.0
        uval = 0.0
        tt = 0.0
        for v in sorted(per):
            ca, cb = per[v]
            uval += ca * (below_b + 0.5 * cb)
            t = ca + cb
            tt += t * (t * t - 1)
            below_b += cb
        n = len(a) + len(b)
        mu = len(a) * len(b) / 2
        var = len(a) * len(b) / 12 * ((n + 1) - tt / (n * (n - 1)))
        z = (uval - mu) / var ** 0.5
        assert r.u == round(uval, 6)
        assert r.z == pytest.approx(round(z, 6), abs=1e-6)
        assert abs(r.z) > 2  # the 0.4 shift is detectable

    def test_degenerate(self, spark):
        from spark_bestfit_spark.operators.stats import mann_whitney_u

        tied = spark.createDataFrame(
            [("a", 1.0)] * 5 + [("b", 1.0)] * 5, "g string, v double"
        )
        r = mann_whitney_u(tied, "v", "g", "a", "b").first()
        assert r.auc == 0.5 and r.z is None
        one = spark.createDataFrame([("a", 1.0)], "g string, v double")
        r2 = mann_whitney_u(one, "v", "g", "a", "b").first()
        assert r2.u is None and r2.n_b == 0


class TestHellinger:
    def test_matches_numpy_and_bounds(self, spark):
        from spark_bestfit_spark.operators.stats import hellinger_distance

        rng = np.random.default_rng(127)
        a = rng.normal(0, 1, 3000)
        b = rng.normal(2, 1, 2500)
        da = spark.createDataFrame([(float(v),) for v in a], "v double")
        db = spark.createDataFrame([(float(v),) for v in b], "v double")
        r = hellinger_distance(da, db, "v", bins=32).first()
        lo, hi = min(a.min(), b.min()), max(a.max(), b.max())
        w = (hi - lo) / 32
        pa = np.bincount(
            np.clip(((a - lo) / w).astype(int) + 1, 1, 33), minlength=34
        ) / len(a)
        pb = np.bincount(
            np.clip(((b - lo) / w).astype(int) + 1, 1, 33), minlength=34
        ) / len(b)
        bc = float(np.sqrt(pa * pb).sum())
        assert r.bc == pytest.approx(round(bc, 6), abs=2e-6)
        assert r.hellinger == pytest.approx(
            round(float(np.sqrt(1 - bc)), 6), abs=2e-6
        )
        assert 0 < r.hellinger < 1
        same = hellinger_distance(da, da, "v").first()
        assert same.hellinger == 0.0 and same.bc == 1.0

    def test_one_side_empty_null_row(self, spark):
        from spark_bestfit_spark.operators.stats import hellinger_distance

        da = spark.createDataFrame(
            [(1.0,), (2.0,), (3.0,)], "v double"
        )
        empty = spark.createDataFrame([], "v double")
        r = hellinger_distance(da, empty, "v", bins=8).first()
        assert r.n_a == 3 and r.n_b == 0
        assert r.bc is None and r.hellinger is None
        r2 = hellinger_distance(empty, da, "v", bins=8).first()
        assert r2.n_a == 0 and r2.n_b == 3
        assert r2.bc is None and r2.hellinger is None
        r3 = hellinger_distance(empty, empty, "v", bins=8).first()
        assert r3.bc is None and r3.hellinger is None


class TestCramerVonMises:
    @staticmethod
    def _ref(a, b):
        import numpy as np

        pooled = np.concatenate([a, b])
        na, nb = len(a), len(b)
        sa, sb = np.sort(a), np.sort(b)
        fa = np.searchsorted(sa, pooled, side="right") / na
        fb = np.searchsorted(sb, pooled, side="right") / nb
        return round(
            float(na * nb / (na + nb) ** 2 * ((fa - fb) ** 2).sum()), 6
        )

    def test_matches_reference(self, spark):
        from spark_bestfit_spark.operators.stats import cramer_von_mises

        rng = np.random.default_rng(131)
        a = np.round(rng.normal(0, 1, 800), 2)
        b = np.round(rng.normal(0.3, 1.3, 700), 2)
        da = spark.createDataFrame([(float(v),) for v in a], "v double")
        db = spark.createDataFrame([(float(v),) for v in b], "v double")
        r = cramer_von_mises(da, db, "v").first()
        assert r.cvm == pytest.approx(self._ref(a, b), abs=1e-6)
        assert r.n_a == 800 and r.n_b == 700
        same = cramer_von_mises(da, da, "v").first()
        assert same.cvm == 0.0


class TestTheilsU:
    def test_deterministic_function_is_asymmetric(self, spark):
        from spark_bestfit_spark.operators.stats import theils_u

        # b = f(a) (a determines b) but a is NOT a function of b:
        # U(B|A) = 1, U(A|B) = MI/H(A) < 1.
        rows = [
            ("a1", "x"), ("a1", "x"), ("a2", "y"), ("a2", "y"),
            ("a3", "x"), ("a3", "x"), ("a4", "y"),
        ]
        df = spark.createDataFrame(rows, "a string, b string")
        r = theils_u(df, "a", "b").first()
        assert r.u_b_given_a == pytest.approx(1.0, abs=1e-6)
        assert r.u_a_given_b < 1.0
        # U(A|B) = MI / H(A) by definition
        assert r.u_a_given_b == pytest.approx(
            round(r.mi / r.h_a, 6), abs=2e-6
        )

    def test_independent_and_constant(self, spark):
        from spark_bestfit_spark.operators.stats import theils_u

        # perfectly balanced independent pair: MI = 0, U = 0 both ways
        rows = [(a, b) for a in "pq" for b in "uv" for _ in range(5)]
        df = spark.createDataFrame(rows, "a string, b string")
        r = theils_u(df, "a", "b").first()
        assert r.u_a_given_b == pytest.approx(0.0, abs=1e-6)
        assert r.u_b_given_a == pytest.approx(0.0, abs=1e-6)
        # constant marginal: the corresponding U is null, not a 0/0
        const = spark.createDataFrame(
            [("k", "x"), ("k", "y"), ("k", "x")], "a string, b string"
        )
        rc = theils_u(const, "a", "b").first()
        assert rc.u_a_given_b is None
        assert rc.u_b_given_a == pytest.approx(0.0, abs=1e-6)


class TestBinnedMI:
    def test_parabola_beats_pearson(self, spark):
        from spark_bestfit_spark.operators.stats import binned_mi

        rng = np.random.default_rng(211)
        x = rng.uniform(-1, 1, 4000)
        y = x * x + rng.normal(0, 0.01, 4000)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x double, y double",
        )
        r = binned_mi(df, "x", "y", 16, 16).first()
        # Pearson corr of a symmetric parabola ~ 0; binned MI is large
        assert abs(float(np.corrcoef(x, y)[0, 1])) < 0.05
        assert r.mi > 0.5
        assert 0 < r.nmi <= 1

    def test_matches_numpy_histogram2d(self, spark):
        from spark_bestfit_spark.operators.stats import binned_mi

        rng = np.random.default_rng(212)
        x = rng.normal(0, 1, 2000)
        y = 0.7 * x + rng.normal(0, 0.5, 2000)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x double, y double",
        )
        bx, by = 8, 8
        r = binned_mi(df, "x", "y", bx, by).first()
        # replicate width_bucket semantics: bucket i covers
        # [lo + (i-1)w, lo + iw), max value lands in bucket bins+1
        def buckets(v, bins):
            lo, hi = v.min(), v.max()
            w = (hi - lo) / bins
            b = np.floor((v - lo) / w).astype(int) + 1
            return np.minimum(b, bins + 1)

        ix, iy = buckets(x, bx), buckets(y, by)
        joint = np.zeros((bx + 2, by + 2))
        for a, b in zip(ix, iy):
            joint[a, b] += 1
        p = joint / joint.sum()
        px, py = p.sum(axis=1), p.sum(axis=0)
        nz = p > 0
        mi = float(
            (p[nz] * np.log(p[nz] / np.outer(px, py)[nz])).sum()
        )
        assert r.mi == pytest.approx(round(mi, 6), abs=2e-6)
        assert r.n == 2000

    def test_empty_and_validation(self, spark):
        from spark_bestfit_spark.operators.stats import binned_mi

        empty = spark.createDataFrame([], "x double, y double")
        r = binned_mi(empty, "x", "y").first()
        assert r.n == 0 and r.mi is None
        df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
        with pytest.raises(ValueError, match="bins"):
            binned_mi(df, "x", "y", 1, 8)


class TestJSDivergence:
    def test_matches_numpy_and_bounds(self, spark):
        from spark_bestfit_spark.operators.stats import js_divergence

        rng = np.random.default_rng(311)
        a = rng.normal(0, 1, 3000)
        b = rng.normal(1.5, 1.2, 2500)
        da = spark.createDataFrame([(float(v),) for v in a], "v double")
        db = spark.createDataFrame([(float(v),) for v in b], "v double")
        bins = 32
        r = js_divergence(da, db, "v", bins=bins).first()
        lo, hi = min(a.min(), b.min()), max(a.max(), b.max())
        w = (hi - lo) / bins

        def hist(v):
            bk = np.minimum(
                np.floor((v - lo) / w).astype(int) + 1, bins + 1
            )
            return np.bincount(bk, minlength=bins + 2) / len(v)

        p, q = hist(a), hist(b)
        m = (p + q) / 2
        kl = lambda u: float(
            (u[u > 0] * np.log(u[u > 0] / m[u > 0])).sum()
        )
        jsd = 0.5 * kl(p) + 0.5 * kl(q)
        assert r.jsd == pytest.approx(round(jsd, 6), abs=2e-6)
        assert 0 <= r.jsd <= np.log(2) + 1e-9
        assert r.jsd_norm == pytest.approx(
            round(jsd / np.log(2), 6), abs=2e-6
        )
        same = js_divergence(da, da, "v", bins=bins).first()
        assert same.jsd == 0.0 and same.jsd_norm == 0.0

    def test_disjoint_supports_hit_ln2(self, spark):
        from spark_bestfit_spark.operators.stats import js_divergence

        da = spark.createDataFrame(
            [(float(v),) for v in np.linspace(0, 1, 50)], "v double"
        )
        db = spark.createDataFrame(
            [(float(v),) for v in np.linspace(100, 101, 50)], "v double"
        )
        r = js_divergence(da, db, "v", bins=64).first()
        assert r.jsd == pytest.approx(round(float(np.log(2)), 6), abs=1e-6)
        assert r.jsd_norm == pytest.approx(1.0, abs=1e-6)

    def test_empty_sides_null(self, spark):
        from spark_bestfit_spark.operators.stats import js_divergence

        da = spark.createDataFrame([(1.0,), (2.0,)], "v double")
        empty = spark.createDataFrame([], "v double")
        assert js_divergence(da, empty, "v").first().jsd is None
        assert js_divergence(empty, da, "v").first().jsd is None
        with pytest.raises(ValueError, match="bins"):
            js_divergence(da, da, "v", bins=1)


class TestEnergyDistance:
    def test_matches_bruteforce(self, spark):
        from spark_bestfit_spark.operators.stats import energy_distance

        rng = np.random.default_rng(501)
        a = np.round(rng.normal(0, 1, 600), 2)
        b = np.round(rng.normal(0.5, 1.4, 500), 2)
        da = spark.createDataFrame([(float(v),) for v in a], "v double")
        db = spark.createDataFrame([(float(v),) for v in b], "v double")
        r = energy_distance(da, db, "v").first()
        exy = float(np.abs(a[:, None] - b[None, :]).mean())
        exx = float(np.abs(a[:, None] - a[None, :]).mean())
        eyy = float(np.abs(b[:, None] - b[None, :]).mean())
        assert r.e_xy == pytest.approx(round(exy, 6), abs=2e-6)
        assert r.e_xx == pytest.approx(round(exx, 6), abs=2e-6)
        assert r.e_yy == pytest.approx(round(eyy, 6), abs=2e-6)
        dsq = 2 * exy - exx - eyy
        assert r.dsq == pytest.approx(round(dsq, 6), abs=5e-6)
        assert r.d == pytest.approx(round(np.sqrt(dsq), 6), abs=5e-6)

    def test_identical_and_degenerate(self, spark):
        from spark_bestfit_spark.operators.stats import energy_distance

        da = spark.createDataFrame(
            [(float(v),) for v in range(50)], "v double"
        )
        same = energy_distance(da, da, "v").first()
        assert same.dsq == pytest.approx(0.0, abs=1e-9)
        assert same.d == pytest.approx(0.0, abs=1e-6)
        const = spark.createDataFrame([(3.0,)] * 10, "v double")
        r = energy_distance(const, const, "v").first()
        assert r.d == 0.0 and r.e_xy == 0.0
        empty = spark.createDataFrame([], "v double")
        r2 = energy_distance(da, empty, "v").first()
        assert r2.d is None and r2.n_b == 0


class TestKruskalWallis:
    @staticmethod
    def _ref_h(groups):
        allv = np.concatenate(groups)
        order = np.argsort(allv, kind="stable")
        ranks = np.empty(len(allv))
        sv = allv[order]
        i, pos = 0, 1
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (pos + pos + (j - i) - 1) / 2.0
            pos += j - i
            i = j
        N = len(allv)
        bounds = np.cumsum([0] + [len(g) for g in groups])
        H = 12.0 / (N * (N + 1)) * sum(
            ranks[bounds[i]:bounds[i + 1]].sum() ** 2 / len(g)
            for i, g in enumerate(groups)
        ) - 3 * (N + 1)
        _, t = np.unique(allv, return_counts=True)
        C = 1 - float((t.astype(float) ** 3 - t).sum()) / (N ** 3 - N)
        return H, H / C

    def test_matches_reference_with_ties(self, spark):
        from spark_bestfit_spark.operators.stats import kruskal_wallis

        rng = np.random.default_rng(502)
        gs = [
            np.round(rng.normal(m, 1, n), 1)
            for m, n in [(0, 300), (0.3, 250), (-0.2, 200)]
        ]
        rows = [
            (chr(97 + i), float(v))
            for i, g in enumerate(gs)
            for v in g
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r = kruskal_wallis(df, "v", "g").first()
        H, Hadj = self._ref_h(gs)
        assert r.h == pytest.approx(round(H, 6), abs=2e-6)
        assert r.h_adj == pytest.approx(round(Hadj, 6), abs=2e-6)
        assert r.k == 3 and r.n == 750

    def test_degenerate(self, spark):
        from spark_bestfit_spark.operators.stats import kruskal_wallis

        # all values tie -> h = 0, adj null
        const = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("b", 1.0)], "g string, v double"
        )
        r = kruskal_wallis(const, "v", "g").first()
        assert r.h == 0.0 and r.h_adj is None
        # single group -> h null
        one = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0)], "g string, v double"
        )
        r2 = kruskal_wallis(one, "v", "g").first()
        assert r2.h is None and r2.k == 1
        empty = spark.createDataFrame([], "g string, v double")
        r3 = kruskal_wallis(empty, "v", "g").first()
        assert r3.n == 0 and r3.h is None


class TestLeveneTest:
    def test_matches_reference(self, spark):
        from spark_bestfit_spark.operators.stats import levene_test

        rng = np.random.default_rng(503)
        gs = [
            rng.normal(0, s, n)
            for s, n in [(1.0, 300), (1.5, 250), (0.7, 200)]
        ]
        rows = [
            (chr(97 + i), float(v))
            for i, g in enumerate(gs)
            for v in g
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r = levene_test(df, "v", "g").first()
        zs = [np.abs(g - np.median(g)) for g in gs]
        N, k = 750, 3
        zbar = np.concatenate(zs).mean()
        between = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs)
        within = sum(((z - z.mean()) ** 2).sum() for z in zs)
        W = (N - k) / (k - 1) * between / within
        assert r.w == pytest.approx(round(float(W), 6), abs=2e-6)
        assert r.k == 3 and r.n == 750
        # strongly unequal variances must score much higher than equal
        assert r.w > 10

    def test_degenerate(self, spark):
        from spark_bestfit_spark.operators.stats import levene_test

        const = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)],
            "g string, v double",
        )
        assert levene_test(const, "v", "g").first().w is None
        tiny = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0), ("b", 5.0)], "g string, v double"
        )
        assert levene_test(tiny, "v", "g").first().w is None


class TestFdrCorrect:
    def test_matches_manual_bh(self, spark):
        from spark_bestfit_spark.operators.stats import fdr_correct

        ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074,
              0.205, 0.212, 0.216, 0.222, 0.251, 0.269, 0.275, 0.34]
        df = spark.createDataFrame(
            [(f"t{i:02d}", p) for i, p in enumerate(ps)],
            "test string, p double",
        )
        out = fdr_correct(df, "p", alpha=0.05).orderBy("p_rank").collect()
        m = len(ps)
        raw = [p * m / (i + 1) for i, p in enumerate(sorted(ps))]
        want_q = [round(min(min(raw[i:]), 1.0), 6) for i in range(m)]
        assert [r.q_value for r in out] == want_q
        assert [r.test for r in out if r.reject] == ["t00"]
        # monotone non-decreasing q along the rank order
        qs = [r.q_value for r in out]
        assert qs == sorted(qs)

    def test_caps_at_one_and_validation(self, spark):
        from spark_bestfit_spark.operators.stats import fdr_correct

        df = spark.createDataFrame(
            [("a", 0.9), ("b", 0.95), ("c", None)], "t string, p double"
        )
        out = fdr_correct(df, "p").collect()
        assert len(out) == 2  # null p excluded
        assert all(r.q_value <= 1.0 for r in out)
        with pytest.raises(ValueError, match="alpha"):
            fdr_correct(df, "p", alpha=1.5)


class TestIsotonicCalibration:
    @staticmethod
    def _minimax(ns, fp):
        W = np.concatenate([[0.0], np.cumsum(ns.astype(float))])
        P = np.concatenate([[0.0], np.cumsum(ns * fp)])
        m = len(ns)
        out = []
        for i in range(m):
            best = -np.inf
            for j in range(i + 1):
                mn = min(
                    (P[k + 1] - P[j]) / (W[k + 1] - W[j])
                    for k in range(i, m)
                )
                best = max(best, mn)
            out.append(round(float(best), 6))
        return out

    def test_matches_minimax_and_monotone(self, spark):
        from spark_bestfit_spark.operators.stats import (
            isotonic_calibration,
        )

        rng = np.random.default_rng(71)
        s = rng.uniform(0, 1, 4000)
        p = 1 / (1 + np.exp(-(4 * s - 2)))
        y = rng.random(4000) < p
        df = spark.createDataFrame(
            [(float(a), bool(b)) for a, b in zip(s, y)],
            "score double, y boolean",
        )
        out = isotonic_calibration(df, "score", "y", bins=16).collect()
        cal = [r.calibrated for r in out]
        assert cal == sorted(cal)
        ns = np.array([r.n for r in out])
        fp = np.array([r.frac_pos for r in out])
        ref = self._minimax(ns, fp)
        assert all(abs(a - b) < 2e-6 for a, b in zip(cal, ref))
        # pooled positive rate preserved by the fit
        assert (ns * np.array(cal)).sum() / ns.sum() == pytest.approx(
            (ns * fp).sum() / ns.sum(), abs=1e-5
        )

    def test_already_monotone_is_identity(self, spark):
        from spark_bestfit_spark.operators.stats import (
            isotonic_calibration,
        )

        rows = []
        for b, frac in [(0.1, 0.2), (0.5, 0.5), (0.9, 0.8)]:
            rows += [(b, True)] * int(frac * 10) + [(b, False)] * (
                10 - int(frac * 10)
            )
        df = spark.createDataFrame(rows, "score double, y boolean")
        out = isotonic_calibration(df, "score", "y", bins=4).collect()
        for r in out:
            assert r.calibrated == pytest.approx(r.frac_pos, abs=1e-6)

    def test_degenerate(self, spark):
        from spark_bestfit_spark.operators.stats import (
            isotonic_calibration,
        )

        const = spark.createDataFrame(
            [(1.0, True), (1.0, False)], "score double, y boolean"
        )
        r = isotonic_calibration(const, "score", "y").collect()
        assert len(r) == 1 and r[0].calibrated == 0.5
        empty = spark.createDataFrame([], "score double, y boolean")
        assert isotonic_calibration(empty, "score", "y").count() == 0
        with pytest.raises(ValueError, match="bins"):
            isotonic_calibration(const, "score", "y", bins=1)


class TestLinearFit:
    def test_matches_numpy_lstsq(self, spark):
        from spark_bestfit_spark.operators.stats import linear_fit

        rng = np.random.default_rng(91)
        n = 3000
        x1 = rng.uniform(0, 10, n)
        x2 = rng.normal(5, 2, n)
        y = 3.0 + 2.5 * x1 - 1.2 * x2 + rng.normal(0, 0.5, n)
        df = spark.createDataFrame(
            [tuple(map(float, t)) for t in zip(y, x1, x2)],
            "y double, x1 double, x2 double",
        )
        out = {r.term: r for r in linear_fit(df, "y", ["x1", "x2"]).collect()}
        X = np.column_stack([np.ones(n), x1, x2])
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        for term, want in zip(["intercept", "x1", "x2"], beta):
            assert out[term].coef == pytest.approx(
                round(float(want), 6), abs=1e-5
            )
        resid = y - X @ beta
        r2 = 1 - (resid ** 2).sum() / ((y - y.mean()) ** 2).sum()
        assert out["x1"].r2 == pytest.approx(round(float(r2), 6), abs=1e-5)
        assert out["x1"].rmse == pytest.approx(
            round(float(np.sqrt((resid ** 2).mean())), 6), abs=1e-5
        )
        assert out["x1"].n == n

    def test_many_predictors_numpy_path(self, spark):
        from spark_bestfit_spark.operators.stats import linear_fit

        rng = np.random.default_rng(92)
        n = 2000
        X = rng.normal(0, 1, (n, 4))
        beta_true = [1.0, -2.0, 0.5, 3.0]
        y = 0.7 + X @ beta_true + rng.normal(0, 0.2, n)
        df = spark.createDataFrame(
            [tuple(map(float, [y[i], *X[i]])) for i in range(n)],
            "y double, a double, b double, c double, d double",
        )
        out = {
            r.term: r.coef
            for r in linear_fit(df, "y", ["a", "b", "c", "d"]).collect()
        }
        Xd = np.column_stack([np.ones(n), X])
        beta = np.linalg.lstsq(Xd, y, rcond=None)[0]
        for term, want in zip(["intercept", "a", "b", "c", "d"], beta):
            assert out[term] == pytest.approx(
                round(float(want), 6), abs=1e-5
            )

    def test_singular_ridge_and_validation(self, spark):
        from spark_bestfit_spark.operators.stats import linear_fit

        df = spark.createDataFrame(
            [(float(i), float(i % 7), float(i % 7)) for i in range(50)],
            "y double, x double, x2 double",
        )
        # duplicate predictor: singular -> nulls; ridge -> finite
        s0 = linear_fit(df, "y", ["x", "x2"]).collect()
        assert all(r.coef is None for r in s0)
        s1 = linear_fit(df, "y", ["x", "x2"], ridge=1.0).collect()
        assert all(r.coef is not None for r in s1)
        empty = spark.createDataFrame([], "y double, x double")
        e = linear_fit(empty, "y", ["x"]).collect()
        assert len(e) == 2 and all(r.coef is None for r in e)
        with pytest.raises(ValueError, match="x_cols"):
            linear_fit(df, "y", [])
        with pytest.raises(ValueError, match="ridge"):
            linear_fit(df, "y", ["x"], ridge=-1)


class TestPartialCorrelation:
    def test_confounder_netted_out(self, spark):
        from spark_bestfit_spark.operators.stats import (
            partial_correlation,
        )

        rng = np.random.default_rng(93)
        n = 4000
        z = rng.normal(0, 1, n)
        a = 2 * z + rng.normal(0, 1, n)
        b = 3 * z + rng.normal(0, 1, n)
        df = spark.createDataFrame(
            [tuple(map(float, t)) for t in zip(a, b, z)],
            "a double, b double, z double",
        )
        r = partial_correlation(df, "a", "b", "z").first()
        rxy = float(np.corrcoef(a, b)[0, 1])
        rxz = float(np.corrcoef(a, z)[0, 1])
        ryz = float(np.corrcoef(b, z)[0, 1])
        want = (rxy - rxz * ryz) / np.sqrt(
            (1 - rxz ** 2) * (1 - ryz ** 2)
        )
        assert r.r_xy == pytest.approx(round(rxy, 6), abs=2e-6)
        assert r.r_xy_z == pytest.approx(round(float(want), 6), abs=2e-6)
        # the marginal correlation is strong, the partial ~0
        assert abs(r.r_xy) > 0.7 and abs(r.r_xy_z) < 0.05

    def test_degenerate_null(self, spark):
        from spark_bestfit_spark.operators.stats import (
            partial_correlation,
        )

        # y == z: conditioning correlation is exactly 1 -> null
        df = spark.createDataFrame(
            [(1.0, 2.0, 2.0), (2.0, 5.0, 5.0), (3.0, 1.0, 1.0)],
            "x double, y double, z double",
        )
        r = partial_correlation(df, "x", "y", "z").first()
        assert r.r_xy_z is None
        tiny = spark.createDataFrame(
            [(1.0, 2.0, 3.0), (2.0, 1.0, 0.0)], "x double, y double, z double"
        )
        assert partial_correlation(tiny, "x", "y", "z").first().r_xy_z is None


class TestCohenKappa:
    def test_matches_hand_computation(self, spark):
        from spark_bestfit_spark.operators.stats import cohen_kappa

        # classic 2x2 example: a=20 agree-yes, d=15 agree-no,
        # b=5 (A yes, B no), c=10 (A no, B yes)
        rows = (
            [("y", "y")] * 20 + [("n", "n")] * 15
            + [("y", "n")] * 5 + [("n", "y")] * 10
        )
        df = spark.createDataFrame(rows, "a string, b string")
        r = cohen_kappa(df, "a", "b").first()
        n = 50
        po = 35 / n
        pe = (25 / n) * (30 / n) + (25 / n) * (20 / n)
        want = (po - pe) / (1 - pe)
        assert r.n == n
        assert r.p_observed == pytest.approx(round(po, 6))
        assert r.p_expected == pytest.approx(round(pe, 6), abs=1e-6)
        assert r.kappa == pytest.approx(round(want, 6), abs=2e-6)

    def test_perfect_and_constant(self, spark):
        from spark_bestfit_spark.operators.stats import cohen_kappa

        same = spark.createDataFrame(
            [("x", "x"), ("y", "y"), ("z", "z"), ("x", "x")],
            "a string, b string",
        )
        r = cohen_kappa(same, "a", "b").first()
        assert r.kappa == 1.0 and r.p_observed == 1.0
        # both raters constant: p_e = 1 -> null kappa
        const = spark.createDataFrame(
            [("k", "k")] * 5, "a string, b string"
        )
        assert cohen_kappa(const, "a", "b").first().kappa is None
        # nulls excluded
        mixed = spark.createDataFrame(
            [("x", "x"), ("y", None), (None, "y"), ("x", "y")],
            "a string, b string",
        )
        assert cohen_kappa(mixed, "a", "b").first().n == 2


class TestMahalanobisOutliers:
    def test_matches_numpy_and_flags_ridge_outlier(self, spark):
        from spark_bestfit_spark.operators.stats import (
            mahalanobis_outliers,
        )

        rng = np.random.default_rng(131)
        n = 1500
        cov = np.array([[2.0, 1.5], [1.5, 2.0]])
        pts = rng.multivariate_normal([5, -3], cov, n)
        # inside both marginal ranges, far off the joint ridge
        pts[0] = [5 + 4, -3 - 4]
        df = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(pts)],
            "id long, x double, y double",
        )
        out = {r.id: r for r in mahalanobis_outliers(df, "x", "y").collect()}
        mu = pts.mean(axis=0)
        Si = np.linalg.inv(np.cov(pts.T, bias=True))
        dref = np.sqrt(
            np.einsum("ij,jk,ik->i", pts - mu, Si, pts - mu)
        )
        for i in range(0, n, 100):
            assert out[i].maha_d == pytest.approx(
                round(float(dref[i]), 6), abs=2e-6
            )
        assert out[0].is_outlier
        # marginal z-scores of the planted point are unremarkable
        zx = abs(pts[0, 0] - mu[0]) / pts[:, 0].std()
        assert zx < 3

    def test_singular_and_nulls(self, spark):
        from spark_bestfit_spark.operators.stats import (
            mahalanobis_outliers,
        )

        # perfectly collinear -> singular -> null d, never a crash
        df = spark.createDataFrame(
            [(float(i), float(2 * i)) for i in range(20)],
            "x double, y double",
        )
        out = mahalanobis_outliers(df, "x", "y").collect()
        assert all(r.maha_d is None for r in out)
        assert all(r.is_outlier is False for r in out)
        withnull = spark.createDataFrame(
            [(1.0, 2.0), (None, 3.0), (2.0, 1.0), (3.0, 4.0)],
            "x double, y double",
        )
        assert mahalanobis_outliers(withnull, "x", "y").count() == 3


class TestGroupedLinearFit:
    def test_matches_per_group_lstsq(self, spark):
        from spark_bestfit_spark.operators.stats import (
            grouped_linear_fit,
        )

        rng = np.random.default_rng(151)
        rows = []
        betas = {"a": (1.0, 2.0, -1.0), "b": (-3.0, 0.5, 4.0)}
        data = {}
        for g, (b0, b1, b2) in betas.items():
            x1 = rng.uniform(0, 5, 800)
            x2 = rng.normal(0, 1, 800)
            y = b0 + b1 * x1 + b2 * x2 + rng.normal(0, 0.3, 800)
            data[g] = (x1, x2, y)
            rows += [
                (g, float(yy), float(a), float(b))
                for yy, a, b in zip(y, x1, x2)
            ]
        df = spark.createDataFrame(
            rows, "g string, y double, x1 double, x2 double"
        )
        out = grouped_linear_fit(df, "y", ["x1", "x2"], "g")
        got = {
            (r["g"], r.term): r.coef for r in out.collect()
        }
        for g, (x1, x2, y) in data.items():
            X = np.column_stack([np.ones(len(y)), x1, x2])
            beta = np.linalg.lstsq(X, y, rcond=None)[0]
            for t, want in zip(["intercept", "x1", "x2"], beta):
                assert got[(g, t)] == pytest.approx(
                    round(float(want), 6), abs=1e-5
                )

    def test_singular_group_and_guard(self, spark):
        from spark_bestfit_spark.operators.stats import (
            grouped_linear_fit,
        )

        rows = [("ok", float(i), float(i % 5)) for i in range(40)]
        rows += [("flat", float(i), 2.0) for i in range(40)]
        df = spark.createDataFrame(rows, "g string, y double, x double")
        out = {(r["g"], r.term): r.coef
               for r in grouped_linear_fit(df, "y", ["x"], "g").collect()}
        assert out[("ok", "x")] is not None
        assert out[("flat", "x")] is None  # constant predictor
        with pytest.raises(ValueError, match="groups"):
            grouped_linear_fit(df, "y", ["x"], "g", max_groups=1)


class TestMcNemar:
    def test_matches_hand_computation(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.stats import mcnemar_test

        rows = (
            [(True, True)] * 40 + [(False, False)] * 20
            + [(True, False)] * 15 + [(False, True)] * 5
        )
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        r = mcnemar_test(df, "a", "b").first()
        assert (r.n, r.both_right, r.both_wrong) == (80, 40, 20)
        assert (r.a_only, r.b_only) == (15, 5)
        want = (abs(15 - 5) - 1) ** 2 / (15 + 5)
        assert r.chi2 == pytest.approx(round(want, 6))
        # column-expression form
        df2 = df.withColumn("ai", F.col("a").cast("int"))
        r2 = mcnemar_test(df2, F.col("ai") == 1, "b").first()
        assert r2.chi2 == r.chi2

    def test_no_discordant_and_nulls(self, spark):
        from spark_bestfit_spark.operators.stats import mcnemar_test

        same = spark.createDataFrame(
            [(True, True), (False, False)], "a boolean, b boolean"
        )
        r = mcnemar_test(same, "a", "b").first()
        assert r.chi2 is None and r.a_only == 0
        withnull = spark.createDataFrame(
            [(True, None), (True, False), (None, True)],
            "a boolean, b boolean",
        )
        assert mcnemar_test(withnull, "a", "b").first().n == 1


class TestNelsonAalen:
    def test_matches_reference_implementation(self, spark):
        from spark_bestfit_spark.operators.stats import nelson_aalen

        rng = np.random.default_rng(171)
        dur = np.round(rng.exponential(10, 400), 0) + 1
        ev = (rng.random(400) < 0.7).astype(int)
        df = spark.createDataFrame(
            [(float(d), int(e)) for d, e in zip(dur, ev)],
            "d double, e int",
        )
        out = nelson_aalen(df, "d", "e").orderBy("t").collect()
        # hand NA estimator
        order = np.argsort(dur, kind="stable")
        ts = sorted(set(dur))
        H, V = 0.0, 0.0
        by_t = {r.t: r for r in out}
        for t in ts:
            n_risk = int((dur >= t).sum())
            d = int(ev[dur == t].sum())
            H += d / n_risk
            V += d / n_risk ** 2
            r = by_t[t]
            assert r.n_risk == n_risk and r.n_events == d
            assert r.cum_hazard == pytest.approx(round(H, 6), abs=2e-6)
            assert r.hazard_se == pytest.approx(
                round(float(np.sqrt(V)), 6), abs=2e-6
            )
            assert r.survival_fh == pytest.approx(
                round(float(np.exp(-H)), 6), abs=2e-6
            )
        # FH survival upper-bounds KM everywhere (standard relation)
        from spark_bestfit_spark.operators.stats import kaplan_meier

        km = {r.t: r.survival for r in kaplan_meier(df, "d", "e").collect()}
        for t in ts:
            if km[t] is not None and km[t] > 0:
                assert by_t[t].survival_fh >= km[t] - 1e-9

    def test_grouped_and_all_censored(self, spark):
        from spark_bestfit_spark.operators.stats import nelson_aalen

        rows = [("a", 1.0, 1), ("a", 2.0, 0), ("b", 1.0, 0)]
        df = spark.createDataFrame(rows, "g string, d double, e int")
        out = {(r.g, r.t): r for r in nelson_aalen(df, "d", "e", "g").collect()}
        assert out[("a", 1.0)].cum_hazard == 0.5
        assert out[("a", 2.0)].cum_hazard == 0.5  # censored adds 0
        assert out[("b", 1.0)].cum_hazard == 0.0
        assert out[("b", 1.0)].survival_fh == 1.0


class TestFdrBY:
    def test_by_matches_manual_and_is_more_conservative(self, spark):
        from spark_bestfit_spark.operators.stats import fdr_correct

        ps = [0.001, 0.008, 0.02, 0.04, 0.06, 0.2, 0.5, 0.9]
        df = spark.createDataFrame(
            [(f"t{i}", p) for i, p in enumerate(ps)],
            "test string, p double",
        )
        m = len(ps)
        cm = sum(1.0 / i for i in range(1, m + 1))
        raw = [p * m * cm / (i + 1) for i, p in enumerate(sorted(ps))]
        want = [round(min(min(raw[i:]), 1.0), 6) for i in range(m)]
        out = (
            fdr_correct(df, "p", method="by")
            .orderBy("p_rank")
            .collect()
        )
        assert [r.q_value for r in out] == want
        bh = (
            fdr_correct(df, "p", method="bh")
            .orderBy("p_rank")
            .collect()
        )
        for b, y in zip(bh, out):
            assert y.q_value >= b.q_value - 1e-12
        with pytest.raises(ValueError, match="method"):
            fdr_correct(df, "p", method="holm")
