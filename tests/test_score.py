"""Row-level model scoring: values match driver-side kernels; outlier
flags match tail probabilities; truncated models score consistently."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.functions.distributions.registry import (
    get_continuous,
)
from spark_bestfit_spark.operators.score import (
    flag_outliers,
    score_column,
    score_result,
)


@pytest.fixture(scope="module")
def values_df(spark):
    rng = np.random.default_rng(11)
    return spark.createDataFrame(
        pd.DataFrame({"v": rng.normal(50.0, 10.0, 3000)})
    ).cache()


class TestScoreColumn:
    @pytest.mark.parametrize("mode", ["logpdf", "pdf", "cdf", "sf"])
    def test_matches_driver_kernel(self, spark, values_df, mode):
        out = (
            score_column(values_df, "v", "norm", (50.0, 10.0), mode=mode)
            .toPandas()
        )
        d = get_continuous("norm")
        want = np.asarray(
            getattr(d, mode)(out["v"].to_numpy(), 50.0, 10.0)
        )
        np.testing.assert_allclose(
            out[f"v_{mode}"].to_numpy(), want, rtol=1e-12, atol=1e-300
        )

    def test_gamma_scoring(self, spark, values_df):
        out = score_column(
            values_df, "v", "gamma", (25.0, 0.0, 2.0), mode="cdf"
        ).toPandas()
        d = get_continuous("gamma")
        want = np.asarray(d.cdf(out["v"].to_numpy(), 25.0, 0.0, 2.0))
        np.testing.assert_allclose(
            out["v_cdf"].to_numpy(), want, rtol=1e-10
        )

    def test_truncated_scoring_bounded(self, spark, values_df):
        out = score_column(
            values_df, "v", "norm", (50.0, 10.0), mode="cdf",
            lower_bound=40.0, upper_bound=60.0,
        ).toPandas()
        inside = out[(out.v >= 40.0) & (out.v <= 60.0)]
        assert (inside["v_cdf"] >= 0.0).all()
        assert (inside["v_cdf"] <= 1.0).all()
        # cdf must hit 0/1 at the bounds, not the untruncated values
        below = out[out.v < 40.0]
        assert (below["v_cdf"] == 0.0).all()

    def test_bad_mode_rejected(self, spark, values_df):
        with pytest.raises(ValueError, match="mode"):
            score_column(values_df, "v", "norm", (0, 1), mode="quantile")

    def test_score_result_roundtrip(self, spark, values_df):
        from spark_bestfit_spark.fitter import DistributionFitter

        res = DistributionFitter(spark).fit(
            values_df, column="v", distributions=["norm", "gamma"]
        )
        best = res.best(1, metric="sse")
        out = score_result(values_df, best, column="v", mode="logpdf")
        assert out.filter(f"v_logpdf is null").count() == 0


class TestFlagOutliers:
    def test_tail_fraction_close_to_2alpha(self, spark, values_df):
        out = flag_outliers(
            values_df, "v", "norm", (50.0, 10.0), alpha=0.01
        )
        frac = out.filter("is_outlier").count() / out.count()
        assert 0.005 < frac < 0.04  # ~2 alpha with sampling noise

    def test_extreme_value_flagged(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"v": [50.0, 51.0, 49.0, 500.0]})
        )
        out = flag_outliers(df, "v", "norm", (50.0, 10.0), alpha=0.001)
        got = {r.v: r.is_outlier for r in out.collect()}
        assert got[500.0] is True
        assert got[50.0] is False

    def test_bad_alpha(self, spark, values_df):
        with pytest.raises(ValueError, match="alpha"):
            flag_outliers(values_df, "v", "norm", (0, 1), alpha=0.7)


class TestSqlFunctions:
    def test_registration_and_constant_model(self, spark):
        import numpy as np

        from spark_bestfit_spark.operators.score import (
            register_sql_functions,
        )

        names = register_sql_functions(spark)
        assert names == ["bf_logpdf", "bf_pdf", "bf_cdf", "bf_sf", "bf_ppf"]
        row = spark.sql(
            "SELECT bf_logpdf('norm', array(0.0D, 1.0D), 0.0D) AS lp,"
            "       bf_cdf('norm', array(0.0D, 1.0D), 0.0D) AS c,"
            "       bf_ppf('norm', array(0.0D, 1.0D), 0.5D) AS q"
        ).first()
        assert row.lp == pytest.approx(-0.5 * np.log(2 * np.pi), abs=1e-9)
        assert row.c == pytest.approx(0.5, abs=1e-9)
        assert row.q == pytest.approx(0.0, abs=1e-9)

    def test_mixed_models_in_one_batch(self, spark):
        import numpy as np

        from spark_bestfit_spark.operators.score import (
            register_sql_functions,
        )

        register_sql_functions(spark)
        df = spark.createDataFrame(
            [("norm", [0.0, 1.0], 1.0), ("expon", [0.0, 2.0], 1.0)],
            "d string, p array<double>, x double",
        )
        df.createOrReplaceTempView("mixed_models")
        rows = spark.sql(
            "SELECT d, bf_pdf(d, p, x) AS v FROM mixed_models"
        ).collect()
        got = {r.d: r.v for r in rows}
        assert got["norm"] == pytest.approx(
            np.exp(-0.5) / np.sqrt(2 * np.pi), rel=1e-9
        )
        assert got["expon"] == pytest.approx(0.5 * np.exp(-0.5), rel=1e-9)

    def test_null_model_gives_null(self, spark):
        from spark_bestfit_spark.operators.score import (
            register_sql_functions,
        )

        register_sql_functions(spark)
        row = spark.sql(
            "SELECT bf_pdf(CAST(NULL AS STRING), array(0.0D, 1.0D), 1.0D)"
            " AS v"
        ).first()
        assert row.v is None or (row.v != row.v)  # NULL or NaN sentinel
