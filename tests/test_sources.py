"""Tests for sources/sinks: table readers, results persistence
round-trip, model artifact store dispatch."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.sources import (
    collect_column,
    create_distribution_table,
    load_model,
    read_results,
    read_table,
    register_tables,
    save_model,
    write_results,
)

SF_DIR = "/root/testdata/sf0.001"


class TestTableSources:
    def test_read_parquet_with_projection(self, spark):
        df = read_table(
            spark, f"{SF_DIR}/lineitem.parquet",
            columns=["l_extendedprice", "l_quantity"],
        )
        assert df.columns == ["l_extendedprice", "l_quantity"]
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "l_orderkey" not in plan  # pruned at the scan

    def test_read_csv_roundtrip(self, spark, tmp_path):
        pdf = pd.DataFrame({"a": [1.5, 2.5], "b": ["x", "y"]})
        src = str(tmp_path / "t.csv")
        pdf.to_csv(src, index=False)
        df = read_table(spark, src, fmt="csv")
        rows = sorted(tuple(r) for r in df.collect())
        assert rows == [(1.5, "x"), (2.5, "y")]

    def test_unknown_format_rejected(self, spark):
        with pytest.raises(ValueError):
            read_table(spark, "/tmp/x", fmt="avro")

    def test_register_tables(self, spark):
        out = register_tables(spark, SF_DIR, ["region", "nation"])
        assert set(out) == {"region", "nation"}
        n = spark.sql("SELECT count(*) AS c FROM region").first().c
        assert n == out["region"].count()

    def test_distribution_table(self, spark):
        df = create_distribution_table(spark, ["norm", "gamma"], 2)
        assert df.columns == ["distribution_name"]
        assert {r.distribution_name for r in df.collect()} == {"norm", "gamma"}

    def test_collect_column(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"v": [3.0, 1.0, 2.0]}))
        arr = collect_column(df, "v")
        assert sorted(arr) == [1.0, 2.0, 3.0]


class TestResultsSink:
    @pytest.fixture(scope="class")
    def results(self, spark):
        from spark_bestfit_spark.fitter import DistributionFitter

        rng = np.random.default_rng(42)
        df = spark.createDataFrame(
            pd.DataFrame({"v": rng.normal(10, 2, 3000)})
        )
        return DistributionFitter(spark).fit(
            df, column="v", distributions=["norm", "gamma", "expon"]
        )

    @pytest.mark.parametrize("fmt", ["parquet", "json"])
    def test_roundtrip(self, spark, results, tmp_path, fmt):
        path = str(tmp_path / f"results_{fmt}")
        write_results(results, path, fmt=fmt)
        loaded = read_results(spark, path, fmt=fmt)
        assert loaded.count() == results.count()
        a = loaded.best(1, metric="sse")
        b = results.best(1, metric="sse")
        assert a.distribution == b.distribution
        assert a.parameters == pytest.approx(b.parameters)
        # reloaded model objects are fully usable
        assert np.isfinite(a.pdf(np.array([10.0]))[0])

    def test_queryable_after_reload(self, spark, results, tmp_path):
        path = str(tmp_path / "results_rq")
        write_results(results, path)
        loaded = read_results(spark, path)
        summ = loaded.summary()
        assert summ["n_fits"] == results.count()
        assert loaded.for_column("v").count() == results.count()


class TestModelStore:
    def test_fit_result_dispatch(self, spark, tmp_path):
        from spark_bestfit_spark.fitter import DistributionFitter

        rng = np.random.default_rng(0)
        df = spark.createDataFrame(pd.DataFrame({"v": rng.normal(5, 1, 2000)}))
        best = DistributionFitter(spark).fit(
            df, column="v", distributions=["norm"]
        ).best(1, metric="sse")
        p = str(tmp_path / "fit.json")
        save_model(best, p)
        loaded = load_model(p)
        assert loaded.distribution == "norm"
        assert loaded.parameters == pytest.approx(best.parameters)

    def test_copula_dispatch(self, tmp_path):
        from spark_bestfit_spark.models.copula import GaussianCopula, _Marginal

        cop = GaussianCopula(
            ["a", "b"],
            {c: _Marginal("norm", (0.0, 1.0)) for c in ("a", "b")},
            np.array([[1.0, 0.5], [0.5, 1.0]]),
        )
        p = str(tmp_path / "copula.json")
        save_model(cop, p)
        loaded = load_model(p)
        assert isinstance(loaded, GaussianCopula)
        assert np.allclose(loaded.correlation, cop.correlation)

    def test_mvn_and_gmm_dispatch(self, tmp_path):
        from spark_bestfit_spark.models.mixture import GaussianMixtureFitter
        from spark_bestfit_spark.models.multivariate import (
            MultivariateNormalResult,
        )

        mvn = MultivariateNormalResult(
            ["x", "y"], np.zeros(2), np.eye(2), n_samples=10
        )
        p1 = str(tmp_path / "mvn.json")
        save_model(mvn, p1)
        assert isinstance(load_model(p1), MultivariateNormalResult)

        rng = np.random.default_rng(1)
        gmm = GaussianMixtureFitter(n_components=2).fit(
            np.concatenate([rng.normal(-3, 1, 500), rng.normal(3, 1, 500)])
        )
        p2 = str(tmp_path / "gmm.json")
        save_model(gmm, p2)
        loaded = load_model(p2)
        assert loaded.n_components == 2

    def test_unknown_type_rejected(self, tmp_path):
        p = str(tmp_path / "bad.json")
        with open(p, "w") as f:
            f.write('{"model_type": "mystery"}')
        with pytest.raises(ValueError, match="mystery"):
            load_model(p)

    def test_unsupported_object_rejected(self, tmp_path):
        with pytest.raises(TypeError):
            save_model(object(), str(tmp_path / "x.json"))


class TestGroupedResultsRoundTrip:
    def test_grouped_fit_survives_sink_round_trip(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.fitter import DistributionFitter
        from spark_bestfit_spark.sources.sinks import (
            read_results,
            write_results,
        )

        df = spark.createDataFrame(
            [("a", float(v % 7) + 0.5) for v in range(200)]
            + [("b", float(v % 13) + 2.0) for v in range(200)],
            "g string, v double",
        )
        res = DistributionFitter(spark).fit_grouped(
            df, "v", "g", distributions=["norm", "uniform"]
        )
        path = str(tmp_path / "grouped_results")
        write_results(res, path)
        back = read_results(spark, path)
        orig = sorted(
            (r["column_name"], r["distribution"], r["sse"])
            for r in res.df.collect()
        )
        loaded = sorted(
            (r["column_name"], r["distribution"], r["sse"])
            for r in back.df.collect()
        )
        assert orig == loaded
        # the loaded relation keeps the per-group query surface
        per = back.best_per_column(n=1, metric="sse")
        assert set(per) == {"v[a]", "v[b]"}
