"""spark-bestfit-spark: a PySpark-native distribution-fitting analytics engine.

A from-scratch rebuild of the capabilities of ``dwsmith1983/spark-bestfit``
(reference studied read-only at /root/reference) expressed Spark-first:

- distributed histogram / stats aggregation (``width_bucket`` + ``groupBy``)
- broadcast + pandas-UDF parallel fitting of a library of probability
  distributions to numeric DataFrame columns
- goodness-of-fit ranking (SSE / AIC / BIC / K-S / A-D)
- a fluent results query surface (``best``, ``filter``, ``for_column``,
  ``summary``, ``quality_report``)
- synthetic-data generation (univariate, Gaussian copula, MVN, GMM) via
  ``mapInPandas``
- large-scale training-data pipeline operators (dedup, similarity search,
  text statistics) over document/embedding tables.

Everything numeric is pure NumPy (this environment has no SciPy): the
``functions.special`` module implements the classic special functions
(Lanczos log-gamma, incomplete gamma/beta, inverse normal CDF, ...) the
distribution library needs.
"""

__version__ = "0.2.0"

from spark_bestfit_spark.session import get_spark  # noqa: F401

__all__ = [
    "get_spark",
    "DistributionFitter",
    "DiscreteDistributionFitter",
    "FitterConfig",
    "FitResults",
    "DistributionFitResult",
    "GaussianCopula",
    "MultivariateNormalFitter",
    "GaussianMixtureFitter",
    "generate_samples",
    "sample_distribution",
    "bootstrap_ci",
    "ProgressTracker",
    "DriftMonitor",
]


def __getattr__(name):
    """Lazy top-level exports (keeps bare ``import spark_bestfit_spark``
    fast and avoids importing pyspark.ml for users who don't need it)."""
    if name in ("DistributionFitter", "DiscreteDistributionFitter"):
        from spark_bestfit_spark import fitter

        return getattr(fitter, name)
    if name in ("FitResults", "DistributionFitResult"):
        from spark_bestfit_spark import results

        return getattr(results, name)
    if name == "FitterConfig":
        from spark_bestfit_spark.plans.config import FitterConfig

        return FitterConfig
    if name in (
        "GaussianCopula", "MultivariateNormalFitter",
        "MultivariateNormalResult", "GaussianMixtureFitter",
        "GaussianMixtureResult",
    ):
        from spark_bestfit_spark import models

        return getattr(models, name)
    if name in ("generate_samples", "sample_distribution", "sample_best_fit"):
        from spark_bestfit_spark.operators import generate

        return getattr(generate, name)
    if name in ("bootstrap_ci", "bootstrap_ci_local"):
        from spark_bestfit_spark.operators import bootstrap

        return getattr(bootstrap, name)
    if name in ("ProgressTracker", "console_progress"):
        from spark_bestfit_spark import progress

        return getattr(progress, name)
    if name in ("DriftMonitor", "ks_drift_score", "w1_drift_score"):
        from spark_bestfit_spark import streaming

        return getattr(streaming, name)
    raise AttributeError(f"module 'spark_bestfit_spark' has no attribute {name!r}")
