"""Fitted model objects built on top of fit results: Gaussian copula,
multivariate normal, Gaussian mixture (reference copula.py /
multivariate.py / mixture.py capabilities, Spark-first execution)."""

from spark_bestfit_spark.models.copula import GaussianCopula
from spark_bestfit_spark.models.mixture import (
    GaussianMixtureFitter,
    GaussianMixtureResult,
)
from spark_bestfit_spark.models.multivariate import (
    MultivariateNormalFitter,
    MultivariateNormalResult,
)

__all__ = [
    "GaussianCopula",
    "GaussianMixtureFitter",
    "GaussianMixtureResult",
    "MultivariateNormalFitter",
    "MultivariateNormalResult",
]
