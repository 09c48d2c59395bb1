"""Results and model sinks (SURVEY S4-S5).

The fit-results relation round-trips through parquet (or json) with its
schema intact, so results can be persisted from one session and queried
in another. Model artifacts (single fits, copulas, MVNs, GMMs) share a
dispatching JSON store keyed by ``model_type``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from spark_bestfit_spark.functions.distributions.registry import (
    DistributionRegistry,
)
from spark_bestfit_spark.operators.fit import FIT_RESULT_SCHEMA
from spark_bestfit_spark.results import DistributionFitResult, FitResults

__all__ = ["write_results", "read_results", "save_model", "load_model"]


def write_results(
    results: FitResults, path: str, fmt: str = "parquet", mode: str = "error"
) -> None:
    """Persist the fit-results relation (SURVEY S4 sink)."""
    if fmt not in ("parquet", "json"):
        raise ValueError("fmt must be parquet|json")
    results.df.write.format(fmt).mode(mode).save(path)


def read_results(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    registry: DistributionRegistry | None = None,
) -> FitResults:
    """Reload a persisted results relation as a queryable FitResults.

    Reloaded results have no cached fitting samples, so lazy-metric
    recomputation is unavailable — persist eager (materialized) results
    for cross-session querying.
    """
    if fmt == "parquet":
        df = spark.read.schema(FIT_RESULT_SCHEMA).parquet(path)
    elif fmt == "json":
        df = spark.read.schema(FIT_RESULT_SCHEMA).json(path)
    else:
        raise ValueError("fmt must be parquet|json")
    return FitResults(df, registry=registry)


# ------------------------------------------------------------ model store
def _model_dict(model) -> dict:
    if isinstance(model, DistributionFitResult):
        d = model.to_dict()
        d["model_type"] = "distribution_fit"
        return d
    to_dict = getattr(model, "to_dict", None)
    if callable(to_dict):
        d = to_dict()
        if "model_type" not in d:
            raise TypeError(
                f"{type(model).__name__}.to_dict() lacks model_type"
            )
        return d
    raise TypeError(f"unsupported model object {type(model).__name__}")


def save_model(model, path: str) -> None:
    """Write any serializable model (fit result, copula, MVN, GMM) as a
    self-describing JSON artifact."""
    with open(path, "w") as f:
        json.dump(_model_dict(model), f, indent=2)


def load_model(path: str):
    """Load a model artifact, dispatching on its ``model_type``."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with open(path) as f:
        d = json.load(f)
    kind = d.get("model_type", "distribution_fit")
    if kind == "distribution_fit":
        d.pop("model_type", None)
        return DistributionFitResult.from_dict(d)
    if kind == "gaussian_copula":
        from spark_bestfit_spark.models.copula import GaussianCopula

        return GaussianCopula.from_dict(d)
    if kind == "multivariate_normal":
        from spark_bestfit_spark.models.multivariate import (
            MultivariateNormalResult,
        )

        return MultivariateNormalResult.from_dict(d)
    if kind == "gaussian_mixture":
        from spark_bestfit_spark.models.mixture import GaussianMixtureResult

        return GaussianMixtureResult.from_dict(d)
    raise ValueError(f"unknown model_type {kind!r} in {path}")
