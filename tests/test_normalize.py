"""Normalization / winsorization / quantile-rank operators, the
equi-depth histogram, and the bigram LM scorer — cross-checked against
numpy/pandas recomputation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import pyspark.sql.functions as F

from spark_bestfit_spark.operators.histogram import equidepth_histogram
from spark_bestfit_spark.operators.normalize import (
    normalize_column,
    quantile_rank,
    winsorize,
)
from spark_bestfit_spark.operators.textstats import bigram_logprob


def _pdf(n=1200, seed=31):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "rid": np.arange(n),
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.lognormal(1.0, 0.8, n).round(4),
        }
    )


class TestNormalizeColumn:
    def test_zscore_grouped_matches_pandas(self, spark):
        pdf = _pdf()
        df = spark.createDataFrame(pdf)
        got = {
            r["rid"]: r["v_norm"]
            for r in normalize_column(df, "v", group_col="g").collect()
        }
        for g, grp in pdf.groupby("g"):
            m, s = grp["v"].mean(), grp["v"].std(ddof=1)
            for rid, v in zip(grp["rid"], grp["v"]):
                assert got[rid] == pytest.approx(
                    round((v - m) / s, 6), abs=1e-6
                )

    def test_minmax_and_robust_global(self, spark):
        pdf = _pdf(500, seed=5)
        df = spark.createDataFrame(pdf)
        mm = {
            r["rid"]: r["v_norm"]
            for r in normalize_column(df, "v", method="minmax").collect()
        }
        lo, hi = pdf["v"].min(), pdf["v"].max()
        for rid, v in zip(pdf["rid"], pdf["v"]):
            assert mm[rid] == pytest.approx(
                round((v - lo) / (hi - lo), 6), abs=1e-6
            )
        rb = {
            r["rid"]: r["v_norm"]
            for r in normalize_column(df, "v", method="robust").collect()
        }
        med = np.percentile(pdf["v"], 50, method="linear")
        iqr = np.percentile(pdf["v"], 75) - np.percentile(pdf["v"], 25)
        for rid, v in list(zip(pdf["rid"], pdf["v"]))[:50]:
            assert rb[rid] == pytest.approx(
                round((v - med) / iqr, 6), abs=1e-5
            )

    def test_degenerate_scale_yields_null(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"g": ["a", "a", "b"], "v": [2.0, 2.0, 5.0]})
        )
        rows = normalize_column(df, "v", group_col="g").collect()
        assert all(r["v_norm"] is None for r in rows)

    def test_validation_and_nan_exclusion(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"g": ["a"] * 4, "v": [1.0, 2.0, np.nan, np.inf]})
        )
        with pytest.raises(ValueError, match="method"):
            normalize_column(df, "v", method="log")
        assert normalize_column(df, "v", group_col="g").count() == 2


class TestWinsorize:
    def test_clip_grouped_matches_numpy(self, spark):
        pdf = _pdf(900, seed=13)
        df = spark.createDataFrame(pdf)
        got = {
            r["rid"]: r["v_wins"]
            for r in winsorize(
                df, "v", group_col="g", lower=0.05, upper=0.95
            ).collect()
        }
        for g, grp in pdf.groupby("g"):
            lo = np.percentile(grp["v"], 5, method="linear")
            hi = np.percentile(grp["v"], 95, method="linear")
            for rid, v in zip(grp["rid"], grp["v"]):
                assert got[rid] == pytest.approx(
                    min(max(v, lo), hi), abs=1e-9
                ), rid

    def test_filter_mode_and_validation(self, spark):
        pdf = _pdf(400, seed=17)
        df = spark.createDataFrame(pdf)
        with pytest.raises(ValueError, match="lower"):
            winsorize(df, "v", lower=0.9, upper=0.1)
        with pytest.raises(ValueError, match="mode"):
            winsorize(df, "v", mode="trim")
        kept = winsorize(
            df, "v", lower=0.1, upper=0.9, mode="filter"
        ).toPandas()
        lo = np.percentile(pdf["v"], 10)
        hi = np.percentile(pdf["v"], 90)
        exp = pdf[(pdf["v"] >= lo) & (pdf["v"] <= hi)]
        assert set(kept["rid"]) == set(exp["rid"])


class TestQuantileRank:
    def test_global_matches_numpy_percent_rank(self, spark):
        pdf = _pdf(1000, seed=41)
        # inject ties to pin the shared-rank semantics
        pdf.loc[::7, "v"] = 3.5
        df = spark.createDataFrame(pdf).repartition(8)
        got = {
            r["rid"]: r["v_qrank"]
            for r in quantile_rank(df, "v").collect()
        }
        v = pdf["v"].values
        n = len(v)
        for rid, x in zip(pdf["rid"], v):
            exp = (v < x).sum() / (n - 1)
            assert got[rid] == pytest.approx(round(exp, 6), abs=1e-6), rid

    def test_grouped_matches_global_semantics(self, spark):
        pdf = _pdf(600, seed=43)
        df = spark.createDataFrame(pdf)
        got = {
            r["rid"]: r["v_qrank"]
            for r in quantile_rank(df, "v", group_col="g").collect()
        }
        for g, grp in pdf.groupby("g"):
            v = grp["v"].values
            for rid, x in zip(grp["rid"], v):
                exp = (v < x).sum() / (len(v) - 1)
                assert got[rid] == pytest.approx(
                    round(exp, 6), abs=1e-6
                ), rid

    def test_all_ties_and_plan(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"v": [4.0] * 10})
        ).repartition(4)
        rows = quantile_rank(df, "v").collect()
        assert [r["v_qrank"] for r in rows] == [0.0] * 10
        pdf = _pdf(300)
        plan = (
            quantile_rank(spark.createDataFrame(pdf), "v")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the global rank must NOT be a single-partition global sort
        assert "SinglePartition" not in plan


class TestEquidepthHistogram:
    def test_balanced_counts_and_coverage(self, spark):
        pdf = _pdf(2000, seed=47)
        df = spark.createDataFrame(pdf)
        out = equidepth_histogram(df, "v", bins=10).toPandas()
        assert out["n_rows"].sum() == len(pdf)
        assert len(out) == 10
        # equi-depth: every bin within a few percent of n/bins
        assert out["n_rows"].max() <= 1.25 * len(pdf) / 10
        assert out["n_rows"].min() >= 0.75 * len(pdf) / 10
        o = out.sort_values("bin_id")
        # bins tile the value axis in order
        assert (o["lo"].values[1:] > o["hi"].values[:-1]).all()

    def test_matches_numpy_binning(self, spark):
        pdf = _pdf(800, seed=53)
        df = spark.createDataFrame(pdf)
        bins = 5
        out = {
            r["bin_id"]: r
            for r in equidepth_histogram(df, "v", bins=bins).collect()
        }
        edges = np.round(
            np.percentile(
                pdf["v"], [100 * i / bins for i in range(1, bins)],
                method="linear",
            ),
            6,
        )
        exp_bin = (pdf["v"].values[:, None] > edges[None, :]).sum(axis=1)
        for b in range(bins):
            sel = pdf["v"].values[exp_bin == b]
            assert out[b]["n_rows"] == len(sel)
            assert out[b]["lo"] == pytest.approx(sel.min())
            assert out[b]["hi"] == pytest.approx(sel.max())
            assert out[b]["mean"] == pytest.approx(
                round(sel.mean(), 6), abs=1e-6
            )

    def test_validation(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"v": [1.0, 2.0]}))
        with pytest.raises(ValueError, match="bins"):
            equidepth_histogram(df, "v", bins=1)


class TestBigramLogprob:
    def test_matches_hand_computation(self, spark):
        docs = [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "dog"),  # single token: no bigram, drops out
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: r for r in bigram_logprob(df).collect()
        }
        assert set(got) == {1, 2}
        # corpus: bigrams (the,cat)x2 (cat,sat) (cat,ran); contexts
        # the->2 cat->2; vocab V = 5 (the cat sat ran dog)
        V = 5.0
        p_the_cat = (2 + 1) / (2 + V)
        p_cat_sat = (1 + 1) / (2 + V)
        p_cat_ran = (1 + 1) / (2 + V)
        exp1 = round(np.mean([np.log(p_the_cat), np.log(p_cat_sat)]), 6)
        exp2 = round(np.mean([np.log(p_the_cat), np.log(p_cat_ran)]), 6)
        assert got[1]["n_bigrams"] == 2
        assert got[1]["mean_bigram_logprob"] == pytest.approx(exp1)
        assert got[2]["mean_bigram_logprob"] == pytest.approx(exp2)

    def test_boilerplate_scores_higher(self, spark):
        rows = [(i, "all work and no play makes jack a dull boy")
                for i in range(20)]
        rows.append((99, "colorless green ideas sleep furiously today"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["mean_bigram_logprob"]
               for r in bigram_logprob(df).collect()}
        assert out[0] > out[99]  # repeated phrasing -> higher logprob


class TestQuantileNormalize:
    def test_groups_converge_to_pooled_marginal(self, spark):
        import numpy as np

        from spark_bestfit_spark.operators.normalize import (
            quantile_normalize,
        )

        rng = np.random.default_rng(21)
        # same shape, very different scales per group
        a = rng.normal(0, 1, 400)
        b = rng.normal(100, 25, 400)
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "g string, v double").repartition(8)
        out = quantile_normalize(df, "v", "g").toPandas()
        qa = out[out.g == "a"].v_qnorm.quantile([0.25, 0.5, 0.75]).values
        qb = out[out.g == "b"].v_qnorm.quantile([0.25, 0.5, 0.75]).values
        # after normalization the group marginals coincide
        assert np.allclose(qa, qb, rtol=0.02, atol=0.2)
        pooled = np.concatenate([a, b])
        # and match the pooled distribution's quartiles
        assert np.allclose(
            qa, np.quantile(pooled, [0.25, 0.5, 0.75]), rtol=0.05,
            atol=0.5,
        )

    def test_hand_interpolation_and_determinism(self, spark):
        from spark_bestfit_spark.operators.normalize import (
            quantile_normalize,
        )

        # group g1 = {1,2,3}: percent ranks 0, .5, 1
        # pooled = {1,2,3,10}: grid=3 -> q = [1, 2.5, 10] (type-7)
        rows = [("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g2", 10.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            (r.g, r.v): (r.p_rank, r.v_qnorm)
            for r in quantile_normalize(df, "v", "g", grid=3).collect()
        }
        assert got[("g1", 1.0)] == (0.0, 1.0)
        assert got[("g1", 2.0)] == (0.5, 2.5)
        assert got[("g1", 3.0)] == (1.0, 10.0)
        assert got[("g2", 10.0)] == (0.0, 1.0)  # single-row group -> p 0

    def test_approx_tracks_exact(self, spark):
        import numpy as np

        from spark_bestfit_spark.operators.normalize import (
            quantile_normalize,
        )

        rng = np.random.default_rng(4)
        rows = [
            ("g", float(v)) for v in rng.lognormal(0, 1, 2000)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        exact = quantile_normalize(df, "v", "g", grid=101).toPandas()
        appr = quantile_normalize(
            df, "v", "g", grid=101, approx=True
        ).toPandas()
        m = exact.merge(appr, on="v", suffixes=("_e", "_a"))
        rel = np.abs(m.v_qnorm_e - m.v_qnorm_a) / (
            np.abs(m.v_qnorm_e) + 1e-9
        )
        assert rel.median() < 0.01

    def test_validation(self, spark):
        import pytest

        from spark_bestfit_spark.operators.normalize import (
            quantile_normalize,
        )

        df = spark.createDataFrame([("g", 1.0)], "g string, v double")
        with pytest.raises(ValueError, match="grid"):
            quantile_normalize(df, "v", "g", grid=1)


class TestTargetEncode:
    def test_smooth_and_loo_match_reference(self, spark):
        import numpy as np

        from spark_bestfit_spark.operators.normalize import target_encode

        rng = np.random.default_rng(53)
        cats = rng.choice(["a", "b", "c", "solo"], 300,
                          p=[0.45, 0.35, 0.19, 0.01]).tolist()
        ys = rng.normal(0, 1, 300).round(3).tolist()
        df = spark.createDataFrame(
            list(zip(cats, ys)), "c string, y double"
        )
        prior = float(np.mean(ys))
        sums, ns = {}, {}
        for c, y in zip(cats, ys):
            sums[c] = sums.get(c, 0.0) + y
            ns[c] = ns.get(c, 0) + 1
        sm = {
            r.c: r.c_enc
            for r in target_encode(df, "c", "y", "smooth", 10).collect()
        }
        for c in set(cats):
            want = round((sums[c] + prior * 10) / (ns[c] + 10), 6)
            assert sm[c] == pytest.approx(want, abs=1e-6), c
        loo = target_encode(df, "c", "y", "loo").collect()
        for r in loo:
            if ns[r.c] == 1:
                assert r.c_enc is None
            else:
                want = round((sums[r.c] - r.y) / (ns[r.c] - 1), 6)
                assert r.c_enc == pytest.approx(want, abs=1e-6)

    def test_validation(self, spark):
        import pytest as _pt

        from spark_bestfit_spark.operators.normalize import target_encode

        df = spark.createDataFrame([("a", 1.0)], "c string, y double")
        with _pt.raises(ValueError, match="method"):
            target_encode(df, "c", "y", method="kfold")


class TestWoeIV:
    def test_matches_hand_computation(self, spark):
        import math

        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.normalize import woe_iv

        rows = (
            [("a", 1)] * 8 + [("a", 0)] * 2
            + [("b", 1)] * 3 + [("b", 0)] * 7
            + [("c", 1)] * 5 + [("c", 0)] * 5
        )
        df = spark.createDataFrame(rows, "cat string, y int")
        out = {
            r.cat: r
            for r in woe_iv(df, "cat", F.col("y") == 1, laplace=0.5)
            .collect()
        }
        tp, tn, g, s = 16, 14, 3, 0.5
        for cat, (np_, nn_) in {
            "a": (8, 2), "b": (3, 7), "c": (5, 5)
        }.items():
            pp = (np_ + s) / (tp + g * s)
            pn = (nn_ + s) / (tn + g * s)
            woe = math.log(pp / pn)
            r = out[cat]
            assert r.n == np_ + nn_
            assert r.n_pos == np_ and r.n_neg == nn_
            assert r.woe == pytest.approx(round(woe, 6), abs=1e-6)
            assert r.iv_term == pytest.approx(
                round((pp - pn) * woe, 6), abs=1e-6
            )

    def test_single_class_category_stays_finite(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.normalize import woe_iv

        rows = [("only_pos", 1)] * 5 + [("only_neg", 0)] * 5
        df = spark.createDataFrame(rows, "cat string, y int")
        out = woe_iv(df, "cat", F.col("y") == 1).collect()
        for r in out:
            assert r.woe is not None and abs(r.woe) < 100
            assert r.iv_term is not None and r.iv_term >= 0

    def test_string_label_col_and_null_exclusion(self, spark):
        from spark_bestfit_spark.operators.normalize import woe_iv

        rows = [("a", True), ("a", False), ("a", None), (None, True)]
        df = spark.createDataFrame(rows, "cat string, y boolean")
        out = woe_iv(df, "cat", "y").collect()
        assert len(out) == 1
        assert out[0].n == 2  # null label and null category excluded
