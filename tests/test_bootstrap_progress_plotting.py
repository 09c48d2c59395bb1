"""Tests for bootstrap CIs (distributed + local), progress tracking, and
headless plotting helpers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark import plotting
from spark_bestfit_spark.operators.bootstrap import (
    bootstrap_ci,
    bootstrap_ci_local,
)
from spark_bestfit_spark.progress import ProgressTracker


class TestBootstrapCI:
    @pytest.fixture(scope="class")
    def normal_sample(self):
        return np.random.default_rng(42).normal(50.0, 10.0, 2000)

    def test_distributed_ci_covers_sample_estimate(self, spark, normal_sample):
        ci = bootstrap_ci(
            spark, "norm", normal_sample, n_resamples=200, seed=42
        )
        assert set(ci) == {"loc", "scale"}
        lo, hi = ci["loc"]
        # percentile bootstrap brackets the point estimate (sample mean)
        assert lo < normal_sample.mean() < hi
        assert hi - lo < 2.0  # tight at n=2000
        lo_s, hi_s = ci["scale"]
        assert lo_s < normal_sample.std() < hi_s

    def test_local_matches_distributed_shape(self, normal_sample):
        ci = bootstrap_ci_local("norm", normal_sample, n_resamples=50)
        assert set(ci) == {"loc", "scale"}
        lo, hi = ci["loc"]
        assert lo < hi

    def test_deterministic_given_seed(self, spark, normal_sample):
        a = bootstrap_ci(spark, "norm", normal_sample, n_resamples=100, seed=7)
        b = bootstrap_ci(spark, "norm", normal_sample, n_resamples=100, seed=7)
        assert a == b

    def test_confidence_width_ordering(self, normal_sample):
        narrow = bootstrap_ci_local(
            "norm", normal_sample, n_resamples=100, confidence=0.5
        )
        wide = bootstrap_ci_local(
            "norm", normal_sample, n_resamples=100, confidence=0.99
        )
        assert (
            wide["loc"][1] - wide["loc"][0]
            > narrow["loc"][1] - narrow["loc"][0]
        )

    def test_rejects_degenerate_input(self):
        with pytest.raises(ValueError):
            bootstrap_ci_local("norm", np.array([1.0]))

    def test_result_method_end_to_end(self, spark):
        from spark_bestfit_spark.fitter import DistributionFitter

        rng = np.random.default_rng(42)
        df = spark.createDataFrame(
            pd.DataFrame({"v": rng.normal(20.0, 4.0, 3000)})
        )
        best = DistributionFitter(spark).fit(
            df, column="v", distributions=["norm"]
        ).best(1, metric="sse")
        ci = best.confidence_intervals(spark, n_resamples=100)
        assert ci["loc"][0] < 20.0 < ci["loc"][1]
        ci_local = best.confidence_intervals(n_resamples=50)
        assert ci_local["loc"][0] < ci_local["loc"][1]


class TestProgressTracker:
    def test_callback_sees_completion(self, spark):
        seen = []

        def cb(completed, total, elapsed):
            seen.append((completed, total))

        tracker = ProgressTracker(spark, callback=cb, poll_interval=0.02)
        with tracker.track("test job"):
            spark.range(0, 1_000_000, 1, 8).selectExpr(
                "sum(id)"
            ).collect()
        # polling is best-effort; job may finish before first poll,
        # but tracker must stop cleanly and never raise
        assert tracker._thread is None
        for completed, total in seen:
            assert 0 <= completed <= total

    def test_start_stop_idempotent(self, spark):
        t = ProgressTracker(spark)
        t.start()
        t.stop()
        t.stop()  # second stop is a no-op


class TestPlottingHelpers:
    @pytest.fixture(scope="class")
    def fitted(self, spark):
        from spark_bestfit_spark.fitter import DistributionFitter

        rng = np.random.default_rng(42)
        self_data = rng.normal(0.0, 1.0, 4000)
        df = spark.createDataFrame(pd.DataFrame({"v": self_data}))
        res = DistributionFitter(spark).fit(
            df, column="v", distributions=["norm"]
        ).best(1, metric="sse")
        return res, self_data

    def test_blom_positions(self):
        p = plotting.blom_positions(10)
        assert p.shape == (10,)
        assert 0 < p[0] < p[-1] < 1
        assert np.allclose(p[0], 0.625 / 10.25)

    def test_qq_data_near_diagonal(self, fitted):
        res, data = fitted
        theo, ordered = qq = plotting.qq_data(res, data)
        # middle quantiles should sit near the diagonal for a good fit
        mid = slice(len(theo) // 4, 3 * len(theo) // 4)
        assert np.corrcoef(theo[mid], ordered[mid])[0, 1] > 0.99

    def test_pp_data_in_unit_square(self, fitted):
        res, data = fitted
        theo, emp = plotting.pp_data(res, data)
        assert theo.min() >= 0 and theo.max() <= 1
        assert np.max(np.abs(theo - emp)) < 0.05

    def test_residual_data_small_for_good_fit(self, fitted, spark):
        res, data = fitted
        density, edges = np.histogram(data, bins=40, density=True)
        resid = plotting.residual_data(res, density, edges)
        assert resid.shape == (40,)
        assert np.max(np.abs(resid)) < 0.08

    def test_cdf_comparison_data(self, fitted):
        res, data = fitted
        grid, model, ex, ey = plotting.cdf_comparison_data(res, data)
        assert np.all(np.diff(model) >= 0)
        assert ey[-1] == pytest.approx(1.0)

    def test_plot_functions_gated_without_mpl(self, fitted):
        res, data = fitted
        if plotting._HAS_MPL:
            ax = plotting.plot_qq(res, data)
            assert ax is not None
        else:
            with pytest.raises(ImportError, match="matplotlib"):
                plotting.plot_qq(res, data)
            with pytest.raises(ImportError, match="matplotlib"):
                plotting.plot_diagnostics(res, data)


@pytest.mark.skipif(
    not plotting._HAS_MPL,
    reason="matplotlib not installed — rendering tests activate wherever "
    "it exists (mirrors the PIL gate in multimodal)",
)
class TestPlottingRendered:
    """Figure-rendering coverage, auto-skipped without matplotlib: every
    figure function must produce a non-empty Agg canvas (reference ships
    8 rendered-figure functions, plotting.py:281-1127)."""

    @pytest.fixture(scope="class")
    def fitted(self, spark):
        from spark_bestfit_spark.fitter import DistributionFitter

        rng = np.random.default_rng(42)
        data = rng.normal(0.0, 1.0, 4000)
        df = spark.createDataFrame(pd.DataFrame({"v": data}))
        res = DistributionFitter(spark).fit(
            df, column="v", distributions=["norm"]
        ).best(1, metric="sse")
        return res, data

    def _png_bytes(self, fig):
        import io

        buf = io.BytesIO()
        fig.savefig(buf, format="png")
        return buf.getvalue()

    def test_each_figure_renders_to_png(self, fitted):
        import matplotlib.pyplot as plt

        res, data = fitted
        density, edges = np.histogram(data, bins=40, density=True)
        axes = [
            plotting.plot_distribution(res, data),
            plotting.plot_qq(res, data),
            plotting.plot_pp(res, data),
            plotting.plot_cdf_comparison(res, data),
            plotting.plot_residual_histogram(res, density, edges),
        ]
        for ax in axes:
            png = self._png_bytes(ax.figure)
            assert png[:8] == b"\x89PNG\r\n\x1a\n" and len(png) > 1000
        plt.close("all")

    def test_diagnostics_panel_has_four_axes(self, fitted):
        import matplotlib.pyplot as plt

        res, data = fitted
        fig = plotting.plot_diagnostics(res, data)
        assert len(fig.get_axes()) == 4
        assert len(self._png_bytes(fig)) > 1000
        plt.close("all")
