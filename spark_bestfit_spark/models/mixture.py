"""Gaussian mixture model: EM fit + model surface (reference mixture.py
capability — weights/means/covariances, AIC/BIC, sample/pdf/predict).

Two fit paths:

- ``GaussianMixtureFitter.fit(data)``: numpy EM on a driver-side sample
  (k-means++-style init, log-sum-exp E-step, ``n_init`` restarts,
  ``reg_covar`` diagonal loading) — the right tool once the data has been
  reduced to the <=10k fitting sample, identical in spirit to every other
  kernel in this engine.
- ``GaussianMixtureFitter.fit_distributed(df, columns)``: delegates to
  ``pyspark.ml.clustering.GaussianMixture`` (distributed EM over the full
  table) and converts the Spark model into the same result dataclass, so
  the 100 TB path and the sample path return interchangeable objects.
"""

from __future__ import annotations

import json
import warnings
from dataclasses import dataclass, field

import numpy as np

SCHEMA_VERSION = "1.1"

__all__ = ["GaussianMixtureFitter", "GaussianMixtureResult"]


def _logsumexp(a: np.ndarray, axis=None) -> np.ndarray:
    m = np.max(a, axis=axis, keepdims=True)
    out = np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True)) + m
    return np.squeeze(out, axis=axis) if axis is not None else float(out)


@dataclass
class GaussianMixtureResult:
    weights: np.ndarray          # (k,)
    means: np.ndarray            # (k, d)
    covariances: np.ndarray      # (k, d, d)
    converged: bool = False
    n_iter: int = 0
    log_likelihood: float = float("nan")
    n_samples: int = 0
    column_names: list = field(default_factory=list)

    def __post_init__(self):
        self.weights = np.asarray(self.weights, dtype=np.float64)
        self.means = np.atleast_2d(np.asarray(self.means, dtype=np.float64))
        self.covariances = np.asarray(self.covariances, dtype=np.float64)
        if self.covariances.ndim == 2:  # (k, d) diagonal shorthand
            self.covariances = np.stack(
                [np.diag(c) for c in self.covariances]
            )

    @property
    def n_components(self) -> int:
        return len(self.weights)

    @property
    def n_features(self) -> int:
        return self.means.shape[1]

    @property
    def n_parameters(self) -> int:
        k, d = self.n_components, self.n_features
        return (k - 1) + k * d + k * d * (d + 1) // 2

    @property
    def aic(self) -> float:
        return 2.0 * self.n_parameters - 2.0 * self.log_likelihood

    @property
    def bic(self) -> float:
        return (
            self.n_parameters * np.log(max(self.n_samples, 1))
            - 2.0 * self.log_likelihood
        )

    # --------------------------------------------------------------- scoring
    def _component_logpdf(self, x: np.ndarray) -> np.ndarray:
        """(n, k) per-component log density."""
        x = np.atleast_2d(np.asarray(x, dtype=np.float64))
        n, d = x.shape
        out = np.empty((n, self.n_components))
        for j in range(self.n_components):
            diff = x - self.means[j]
            cov = self.covariances[j]
            sol = np.linalg.solve(cov, diff.T).T
            maha = np.sum(diff * sol, axis=1)
            _, logdet = np.linalg.slogdet(cov)
            out[:, j] = -0.5 * (d * np.log(2.0 * np.pi) + logdet + maha)
        return out

    def logpdf(self, x) -> np.ndarray:
        lp = self._component_logpdf(x) + np.log(self.weights)
        return _logsumexp(lp, axis=1)

    def pdf(self, x) -> np.ndarray:
        return np.exp(self.logpdf(x))

    def predict_proba(self, x) -> np.ndarray:
        lp = self._component_logpdf(x) + np.log(self.weights)
        return np.exp(lp - _logsumexp(lp, axis=1)[:, None])

    def predict(self, x) -> np.ndarray:
        return np.argmax(self.predict_proba(x), axis=1)

    def sample(self, n: int, seed: int = 42) -> np.ndarray:
        rng = np.random.default_rng(seed)
        counts = rng.multinomial(n, self.weights)
        parts = []
        for j, c in enumerate(counts):
            if c == 0:
                continue
            chol = np.linalg.cholesky(self.covariances[j])
            z = rng.standard_normal((c, self.n_features))
            parts.append(self.means[j] + z @ chol.T)
        out = np.vstack(parts)
        rng.shuffle(out)
        return out

    # ----------------------------------------------------------- serialization
    def to_dict(self) -> dict:
        return {
            "schema_version": SCHEMA_VERSION,
            "model_type": "gaussian_mixture",
            "weights": self.weights.tolist(),
            "means": self.means.tolist(),
            "covariances": self.covariances.tolist(),
            "converged": bool(self.converged),
            "n_iter": int(self.n_iter),
            "log_likelihood": float(self.log_likelihood),
            "n_samples": int(self.n_samples),
            "column_names": list(self.column_names),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "GaussianMixtureResult":
        return cls(
            np.asarray(d["weights"]),
            np.asarray(d["means"]),
            np.asarray(d["covariances"]),
            bool(d.get("converged", False)),
            int(d.get("n_iter", 0)),
            float(d.get("log_likelihood", float("nan"))),
            int(d.get("n_samples", 0)),
            list(d.get("column_names", [])),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "GaussianMixtureResult":
        with open(path) as f:
            return cls.from_dict(json.load(f))


class GaussianMixtureFitter:
    """EM with k-means++-style seeding and restarts."""

    def __init__(
        self,
        n_components: int = 2,
        max_iter: int = 100,
        tol: float = 1e-4,
        n_init: int = 1,
        reg_covar: float = 1e-6,
        seed: int = 42,
    ):
        if n_components < 1:
            raise ValueError("n_components must be >= 1")
        self.n_components = n_components
        self.max_iter = max_iter
        self.tol = tol
        self.n_init = n_init
        self.reg_covar = reg_covar
        self.seed = seed

    # ----------------------------------------------------------------- init
    def _init_means(self, x: np.ndarray, rng: np.random.Generator):
        """k-means++ seeding: spread initial means by D^2 weighting."""
        n = x.shape[0]
        means = [x[rng.integers(n)]]
        for _ in range(1, self.n_components):
            d2 = np.min(
                [np.sum((x - m) ** 2, axis=1) for m in means], axis=0
            )
            total = d2.sum()
            if total <= 0:
                means.append(x[rng.integers(n)])
                continue
            means.append(x[rng.choice(n, p=d2 / total)])
        return np.array(means)

    def _em_once(self, x: np.ndarray, rng: np.random.Generator):
        n, d = x.shape
        k = self.n_components
        means = self._init_means(x, rng)
        global_cov = np.cov(x.T, ddof=0) if d > 1 else np.array(
            [[np.var(x)]]
        )
        global_cov = np.atleast_2d(global_cov) + self.reg_covar * np.eye(d)
        covs = np.stack([global_cov.copy() for _ in range(k)])
        weights = np.full(k, 1.0 / k)
        prev_ll = -np.inf
        converged = False
        it = 0
        result = GaussianMixtureResult(weights, means, covs)
        for it in range(1, self.max_iter + 1):
            # E-step
            result.weights, result.means, result.covariances = (
                weights, means, covs
            )
            lp = result._component_logpdf(x) + np.log(weights)
            norm = _logsumexp(lp, axis=1)
            ll = float(np.sum(norm))
            resp = np.exp(lp - norm[:, None])
            # M-step
            nk = resp.sum(axis=0) + 1e-12
            weights = nk / n
            means = (resp.T @ x) / nk[:, None]
            for j in range(k):
                diff = x - means[j]
                covs[j] = (
                    (resp[:, j][:, None] * diff).T @ diff
                ) / nk[j] + self.reg_covar * np.eye(d)
            if abs(ll - prev_ll) < self.tol * max(abs(prev_ll), 1.0):
                converged = True
                prev_ll = ll
                break
            prev_ll = ll
        return GaussianMixtureResult(
            weights, means, covs,
            converged=converged, n_iter=it,
            log_likelihood=prev_ll, n_samples=n,
        )

    # ------------------------------------------------------------------ fit
    def fit(self, data, column_names: list | None = None) -> GaussianMixtureResult:
        x = np.asarray(data, dtype=np.float64)
        if x.ndim == 1:
            x = x[:, None]
        x = x[np.all(np.isfinite(x), axis=1)]
        if x.shape[0] < self.n_components:
            raise ValueError("fewer valid rows than components")
        rng = np.random.default_rng(self.seed)
        best = None
        for _ in range(max(1, self.n_init)):
            res = self._em_once(x, rng)
            if best is None or res.log_likelihood > best.log_likelihood:
                best = res
        if not best.converged:
            warnings.warn(
                f"GMM EM did not converge in {self.max_iter} iterations",
                stacklevel=2,
            )
        best.column_names = list(column_names or [])
        return best

    def fit_distributed(self, df, columns: list) -> GaussianMixtureResult:
        """Distributed EM via pyspark.ml over the full table — the scale
        path when the mixture must see every row."""
        from pyspark.ml.clustering import GaussianMixture as SparkGMM
        from pyspark.ml.feature import VectorAssembler

        columns = list(columns)
        assembler = VectorAssembler(
            inputCols=columns, outputCol="_gmm_vec", handleInvalid="skip"
        )
        vec_df = assembler.transform(df.select(*columns))
        model = SparkGMM(
            k=self.n_components,
            maxIter=self.max_iter,
            tol=self.tol,
            seed=self.seed,
            featuresCol="_gmm_vec",
        ).fit(vec_df)
        gauss = model.gaussiansDF.collect()
        means = np.array([g["mean"].toArray() for g in gauss])
        covs = np.stack([g["cov"].toArray() for g in gauss])
        n = vec_df.count()
        ll = model.summary.logLikelihood
        return GaussianMixtureResult(
            np.asarray(model.weights), means, covs,
            converged=True, n_iter=self.max_iter,
            log_likelihood=float(ll), n_samples=int(n),
            column_names=columns,
        )
