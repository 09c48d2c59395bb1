"""Multivariate normal fit/sample (reference multivariate.py capability).

The fit is a single distributed aggregation: per-column sums and pairwise
product sums in one ``agg`` (k + k(k+1)/2 terms — Catalyst collapses them
into one scan with map-side partial aggregation), assembled into mean and
ddof-corrected covariance on the driver. Nothing but the k x k matrix
ever reaches the driver, so the fit scales to any row count.

Sampling uses the cached Cholesky factor: local ndarray for small n, or
``generate_samples``/``mapInPandas`` for distributed output.
"""

from __future__ import annotations

import json
import warnings
from dataclasses import dataclass, field

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spark_bestfit_spark.operators.generate import generate_samples

SCHEMA_VERSION = "1.1"
_CONDITION_WARN = 1e10

__all__ = ["MultivariateNormalFitter", "MultivariateNormalResult"]


@dataclass
class MultivariateNormalResult:
    column_names: list
    mean: np.ndarray
    cov: np.ndarray
    n_samples: int = 0
    _cholesky: np.ndarray = field(default=None, repr=False, compare=False)

    def __post_init__(self):
        self.mean = np.asarray(self.mean, dtype=np.float64)
        self.cov = np.asarray(self.cov, dtype=np.float64)
        cond = np.linalg.cond(self.cov)
        if cond > _CONDITION_WARN:
            warnings.warn(
                f"covariance condition number {cond:.2e} > {_CONDITION_WARN:.0e}; "
                "sampling may be numerically unstable", stacklevel=2
            )
        if self._cholesky is None:
            jitter = 0.0
            for _ in range(8):
                try:
                    self._cholesky = np.linalg.cholesky(
                        self.cov + jitter * np.eye(self.cov.shape[0])
                    )
                    break
                except np.linalg.LinAlgError:
                    jitter = max(jitter * 10.0, 1e-12)
            else:
                raise np.linalg.LinAlgError("covariance not factorizable")

    # ------------------------------------------------------------- sampling
    def sample(self, n: int, seed: int = 42) -> np.ndarray:
        rng = np.random.default_rng(seed)
        z = rng.standard_normal((n, len(self.mean)))
        return self.mean + z @ self._cholesky.T

    def sample_distributed(
        self,
        spark: SparkSession,
        n: int,
        num_partitions: int | None = None,
        seed: int = 42,
    ) -> DataFrame:
        cols = list(self.column_names)
        mean, chol = self.mean, self._cholesky
        k = len(cols)

        def gen(rng: np.random.Generator, n_rows: int):
            z = rng.standard_normal((n_rows, k))
            x = mean + z @ chol.T
            return {c: x[:, j] for j, c in enumerate(cols)}

        return generate_samples(
            spark, n, gen, cols, num_partitions=num_partitions, seed=seed
        )

    def pdf(self, x) -> np.ndarray:
        x = np.atleast_2d(np.asarray(x, dtype=np.float64))
        k = len(self.mean)
        diff = x - self.mean
        sol = np.linalg.solve(self.cov, diff.T).T
        maha = np.sum(diff * sol, axis=1)
        _, logdet = np.linalg.slogdet(self.cov)
        log_pdf = -0.5 * (k * np.log(2.0 * np.pi) + logdet + maha)
        return np.exp(log_pdf)

    # -------------------------------------------------------- serialization
    def to_dict(self) -> dict:
        return {
            "schema_version": SCHEMA_VERSION,
            "model_type": "multivariate_normal",
            "column_names": list(self.column_names),
            "mean": self.mean.tolist(),
            "cov": self.cov.tolist(),
            "n_samples": int(self.n_samples),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "MultivariateNormalResult":
        return cls(
            list(d["column_names"]),
            np.asarray(d["mean"]),
            np.asarray(d["cov"]),
            int(d.get("n_samples", 0)),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "MultivariateNormalResult":
        with open(path) as f:
            return cls.from_dict(json.load(f))


class MultivariateNormalFitter:
    """Distributed MVN fit: one agg job for all first and second moments."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark

    def fit(
        self, df: DataFrame, columns: list, ddof: int = 1
    ) -> MultivariateNormalResult:
        columns = list(columns)
        k = len(columns)
        if k < 2:
            raise ValueError("need >= 2 columns")
        clean = df.select(*columns).na.drop()
        aggs = [F.count(F.lit(1)).alias("_n")]
        for i, c in enumerate(columns):
            aggs.append(F.sum(F.col(c).cast("double")).alias(f"_s{i}"))
        for i in range(k):
            for j in range(i, k):
                aggs.append(
                    F.sum(
                        F.col(columns[i]).cast("double")
                        * F.col(columns[j]).cast("double")
                    ).alias(f"_p{i}_{j}")
                )
        row = clean.agg(*aggs).first()
        n = int(row["_n"])
        if n <= ddof:
            raise ValueError(f"not enough rows ({n}) for ddof={ddof}")
        mean = np.array([row[f"_s{i}"] / n for i in range(k)])
        cov = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                # E[xy] - mx*my, ddof-corrected: (Sxy - n mx my) / (n - ddof)
                sxy = row[f"_p{i}_{j}"]
                cov[i, j] = cov[j, i] = (
                    (sxy - n * mean[i] * mean[j]) / (n - ddof)
                )
        return MultivariateNormalResult(columns, mean, cov, n_samples=n)
