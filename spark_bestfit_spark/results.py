"""Fit-results relation + fluent query surface (SURVEY §1.3, §2.5, §2.12).

``FitResults`` wraps the cached results DataFrame and exposes the
reference's query API (collection.py:51-1175) as thin, deterministic
DataFrame operations:

- ``best``: orderBy(metric ASC NULLS LAST, distribution) + limit — the
  tie-breaker makes top-k reproducible (oracle-checkable);
- ``best_per_column``: Window.partitionBy + row_number (idiomatic Spark
  for per-group top-k, replacing the reference's driver loop);
- ``filter``: chained metric threshold predicates;
- ``summary`` / ``quality_report``: single-pass multi-stat aggregation.
"""

from __future__ import annotations

import json
import pickle
import warnings
from dataclasses import dataclass, field

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from spark_bestfit_spark.functions.distributions.registry import (
    DistributionRegistry,
)

VALID_METRICS = (
    "sse",
    "aic",
    "bic",
    "ks_statistic",
    "pvalue",
    "ad_statistic",
    "ad_pvalue",
)

SCHEMA_VERSION = "1.1"


@dataclass
class DistributionFitResult:
    """One (column, distribution) fit — a serializable model object
    (reference storage.py:240-709)."""

    column_name: str
    distribution: str
    parameters: tuple
    sse: float = float("nan")
    aic: float = float("nan")
    bic: float = float("nan")
    ks_statistic: float | None = None
    pvalue: float | None = None
    ad_statistic: float | None = None
    ad_pvalue: float | None = None
    data_min: float = float("nan")
    data_max: float = float("nan")
    data_mean: float = float("nan")
    data_stddev: float = float("nan")
    data_count: float = float("nan")
    data_kurtosis: float = float("nan")
    data_skewness: float = float("nan")
    lower_bound: float | None = None
    upper_bound: float | None = None
    _registry: DistributionRegistry | None = field(
        default=None, repr=False, compare=False
    )
    _sample: np.ndarray | None = field(default=None, repr=False, compare=False)

    # ------------------------------------------------------------ model ops
    def _dist(self):
        reg = self._registry or DistributionRegistry()
        return reg.resolve(self.distribution)

    def _bounded(self) -> bool:
        def _set(v):
            return v is not None and np.isfinite(v)

        return _set(self.lower_bound) or _set(self.upper_bound)

    def _truncated_view(self):
        """Truncation-wrapped frozen model for bounded fits (reference
        storage.py:368-432: model ops on a bounded result go through
        TruncatedFrozenDist, not the raw distribution)."""
        from spark_bestfit_spark.functions.truncated import (
            TruncatedDistribution,
        )

        return TruncatedDistribution(
            self._dist(), tuple(self.parameters),
            self.lower_bound, self.upper_bound,
        )

    def pdf(self, x):
        x = np.asarray(x, dtype=np.float64)
        if self._bounded():
            return self._truncated_view().pdf(x)
        return self._dist().pdf(x, *self.parameters)

    def cdf(self, x):
        x = np.asarray(x, dtype=np.float64)
        if self._bounded():
            return self._truncated_view().cdf(x)
        return self._dist().cdf(x, *self.parameters)

    def ppf(self, q):
        q = np.asarray(q, dtype=np.float64)
        if self._bounded():
            return self._truncated_view().ppf(q)
        return self._dist().ppf(q, *self.parameters)

    def sample(self, size: int = 1, random_state=None):
        if self._bounded():
            return self._truncated_view().rvs(size, random_state)
        return self._dist().rvs(tuple(self.parameters), size, random_state)

    def get_param_names(self) -> list:
        return self._dist().param_names()

    def confidence_intervals(
        self,
        spark=None,
        n_resamples: int = 1000,
        confidence: float = 0.95,
        seed: int = 42,
    ) -> dict:
        """Percentile-bootstrap CIs for the fitted parameters, using the
        cached fitting sample. With a SparkSession the resamples fan out
        over the cluster; without one a smaller driver-local bootstrap
        runs (SURVEY F19)."""
        if self._sample is None:
            raise ValueError(
                "no cached fitting sample on this result; refit and query "
                "through FitResults to attach one"
            )
        from spark_bestfit_spark.operators import bootstrap as B

        if spark is not None:
            return B.bootstrap_ci(
                spark, self.distribution, self._sample,
                n_resamples=n_resamples, confidence=confidence, seed=seed,
                registry=self._registry,
            )
        return B.bootstrap_ci_local(
            self.distribution, self._sample,
            n_resamples=min(n_resamples, 200), confidence=confidence,
            seed=seed, registry=self._registry,
        )

    # -------------------------------------------------------- serialization
    def to_dict(self) -> dict:
        d = {
            "schema_version": SCHEMA_VERSION,
            "column_name": self.column_name,
            "distribution": self.distribution,
            "parameters": [float(p) for p in self.parameters],
        }
        for k in (
            "sse", "aic", "bic", "ks_statistic", "pvalue", "ad_statistic",
            "ad_pvalue", "data_min", "data_max", "data_mean", "data_stddev",
            "data_count", "data_kurtosis", "data_skewness", "lower_bound",
            "upper_bound",
        ):
            v = getattr(self, k)
            d[k] = None if v is None else float(v)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "DistributionFitResult":
        """Schema-versioned load (reference serialization.py:21-23,
        85-140): accepts v1.0 payloads (no ``lower_bound`` /
        ``upper_bound`` — added in 1.1), the reference's NESTED
        ``{"metrics": {...}}`` layout as well as the flat layout, and
        ignores unknown fields so newer-schema artifacts still load
        (forward compatibility). ``distribution`` and ``parameters``
        are required."""
        if "distribution" not in d or "parameters" not in d:
            raise ValueError(
                "model payload missing required fields "
                "'distribution'/'parameters'"
            )
        merged = dict(d)
        # nested-metrics layout: lift into the flat namespace
        metrics = merged.pop("metrics", None)
        if isinstance(metrics, dict):
            for k, v in metrics.items():
                merged.setdefault(k, v)
        known = {
            "column_name", "distribution", "parameters", "sse", "aic",
            "bic", "ks_statistic", "pvalue", "ad_statistic", "ad_pvalue",
            "data_min", "data_max", "data_mean", "data_stddev",
            "data_count", "data_kurtosis", "data_skewness",
            "lower_bound", "upper_bound",
        }
        kept = {k: v for k, v in merged.items() if k in known}
        kept["parameters"] = tuple(kept.get("parameters", ()))
        kept.setdefault("column_name", None)
        return cls(**kept)

    def save(self, path: str, format: str = "json") -> None:
        if format == "json":
            with open(path, "w") as f:
                json.dump(self.to_dict(), f, indent=2)
        elif format == "pickle":
            with open(path, "wb") as f:
                pickle.dump(self, f)
        else:
            raise ValueError(f"unknown format {format!r} (json|pickle)")

    @classmethod
    def load(cls, path: str, format: str = "json") -> "DistributionFitResult":
        if format == "json":
            with open(path) as f:
                return cls.from_dict(json.load(f))
        if format == "pickle":
            with open(path, "rb") as f:
                obj = pickle.load(f)  # noqa: S301 — user-owned artifact
            if not isinstance(obj, cls):
                raise TypeError(f"{path} does not contain a {cls.__name__}")
            return obj
        raise ValueError(f"unknown format {format!r} (json|pickle)")


_ROW_FIELDS = [
    "column_name", "distribution", "parameters", "sse", "aic", "bic",
    "ks_statistic", "pvalue", "ad_statistic", "ad_pvalue", "data_min",
    "data_max", "data_mean", "data_stddev", "data_count", "data_kurtosis",
    "data_skewness", "lower_bound", "upper_bound",
]


class FitResults:
    """Query surface over the cached fit-results relation."""

    def __init__(
        self,
        df: DataFrame,
        registry: DistributionRegistry | None = None,
        samples: dict | None = None,
        cache: bool = True,
        broadcasts: list | None = None,
        source: tuple | None = None,
        deferred_metrics: bool | None = None,
    ):
        self._df = df.cache() if cache else df
        self._registry = registry or DistributionRegistry()
        self._samples = samples or {}
        self._sorted_samples: dict = {}
        self._broadcasts = broadcasts or []
        # True/False when the creator knows whether KS/AD were skipped
        # at fit time (lazy_metrics); None = unknown -> probe the
        # relation once and cache (loaded results, external relations)
        self._deferred_metrics = deferred_metrics
        self._deferred_probe: dict = {}
        # (source DataFrame, FitterConfig) for deterministic sample
        # recreation (reference SA5: same df + seed => same sample)
        self._source = source

    # ------------------------------------------------------------- plumbing
    @property
    def df(self) -> DataFrame:
        return self._df

    def count(self) -> int:
        return self._df.count()

    def unpersist(self, blocking: bool = False) -> None:
        """Release the cached relation AND the fan-out's broadcast
        variables (reference O2: broadcasts cleaned up explicitly)."""
        self._df.unpersist(blocking)
        for b in self._broadcasts:
            try:
                b.unpersist(blocking)
            except Exception:  # noqa: BLE001 — already released / sc gone
                pass
        self._broadcasts = []

    def columns(self) -> list:
        """Distinct source column names (SURVEY P5)."""
        rows = (
            self._df.select("column_name")
            .filter(F.col("column_name").isNotNull())
            .distinct()
            .orderBy("column_name")
            .collect()
        )
        return [r["column_name"] for r in rows]

    def _hydrate(self, row) -> DistributionFitResult:
        d = row.asDict()
        kwargs = {k: d.get(k) for k in _ROW_FIELDS}
        kwargs["parameters"] = tuple(kwargs["parameters"] or ())
        return DistributionFitResult(
            **kwargs,
            _registry=self._registry,
            _sample=self._samples.get(d.get("column_name")),
        )

    @staticmethod
    def _check_metric(metric: str) -> None:
        if metric not in VALID_METRICS:
            raise ValueError(
                f"invalid metric {metric!r}; choose from {VALID_METRICS}"
            )

    def _ordered(self, metric: str) -> DataFrame:
        """Deterministic ranking: ascending metric (nulls last) with
        (column_name, distribution) tie-breakers.

        For pvalue/ad_pvalue larger is better, so order descending.
        """
        col = F.col(metric)
        key = (
            col.desc_nulls_last()
            if metric in ("pvalue", "ad_pvalue")
            else col.asc_nulls_last()
        )
        return self._df.orderBy(key, F.col("column_name"), F.col("distribution"))

    # --------------------------------------------------------- lazy metrics
    _LAZY_METRICS = ("ks_statistic", "pvalue", "ad_statistic", "ad_pvalue")

    def _metric_is_deferred(self, metric: str) -> bool:
        """True when the requested metric was skipped at fit time
        (lazy_metrics=True) and must be recomputed from the sample.

        The fitter stamps ``deferred_metrics`` at construction so the
        common path costs NO Spark job; only results of unknown
        provenance (loads, external relations) probe the relation, and
        that probe runs once per metric (one combined aggregate job,
        cached)."""
        if metric not in self._LAZY_METRICS:
            return False
        if self._deferred_metrics is not None:
            return self._deferred_metrics
        cached = self._deferred_probe.get(metric)
        if cached is None:
            row = self._df.agg(
                F.count(F.col(metric)).alias("have"),
                F.count("*").alias("n"),
            ).first()
            cached = row["have"] == 0 and row["n"] > 0
            self._deferred_probe[metric] = cached
        return cached

    def _get_sample(self, column: str):
        """Cached fitting sample, or a deterministic recreation from the
        source relation (same df + seed => same sample, reference
        SA5/collection.py:173-228)."""
        sample = self._samples.get(column)
        if sample is not None:
            return sample
        if self._source is None:
            raise ValueError(
                f"no cached sample for column {column!r} and no source "
                "relation attached; lazy metrics need the originating "
                "fit's sample (refit with lazy_metrics=False or keep "
                "the results object)"
            )
        src_df, config = self._source
        try:
            from spark_bestfit_spark.operators.sampling import (
                build_fitting_sample,
            )
            from spark_bestfit_spark.operators.stats import column_stats

            stats = column_stats(src_df, column)
            sample = build_fitting_sample(
                src_df, column, config, int(stats["count"])
            )
        except Exception as exc:  # noqa: BLE001
            raise ValueError(
                f"could not recreate the fitting sample for {column!r} "
                f"from the source relation (source unpersisted or session "
                f"gone?): {exc}"
            ) from exc
        self._samples[column] = sample
        return sample

    def _get_sorted_sample(self, column: str):
        """Sorted view of the fitting sample, cached per column: every
        lazy-metric recompute over the same column shares one sort
        instead of re-sorting per candidate distribution."""
        cached = self._sorted_samples.get(column)
        if cached is None:
            cached = np.sort(
                np.asarray(self._get_sample(column), dtype=np.float64)
            )
            self._sorted_samples[column] = cached
        return cached

    def _recompute_metrics(self, result: DistributionFitResult) -> None:
        """Fill KS/AD (+p-values) in place from the cached fitting sample
        (reference lazy path: collection.py:1008-1120, metrics.py:325-382).

        One model-CDF evaluation per candidate over the shared
        pre-sorted sample serves both statistics — the CDF (often a
        quadrature-backed kernel) dominates this path, so the batched
        form halves the recompute cost vs separate KS and AD passes."""
        sample = self._get_sorted_sample(result.column_name)
        from spark_bestfit_spark.functions import metrics as M

        dist = self._registry.resolve(result.distribution)
        params = tuple(result.parameters)
        truncated = (
            result.lower_bound is not None or result.upper_bound is not None
        )
        if truncated:
            from spark_bestfit_spark.functions.truncated import (
                TruncatedDistribution,
            )

            dist = TruncatedDistribution(
                dist, params, result.lower_bound, result.upper_bound
            )
        ks, p, ad = M.compute_ks_and_ad(dist, params, sample)
        result.ks_statistic = ks if np.isfinite(ks) else None
        result.pvalue = p if np.isfinite(p) else None
        result.ad_statistic = ad if np.isfinite(ad) else None
        result.ad_pvalue = (
            None if truncated
            else M.compute_ad_pvalue(ad, result.distribution, sample.size)
        )

    def _best_lazy(self, n: int, metric: str):
        """AIC-proxy candidate selection, driver recompute, re-sort —
        avoids computing O(n·D) metrics for a top-n query."""
        candidates = [
            self._hydrate(r)
            for r in self._ordered("aic").limit(n * 3 + 5).collect()
        ]
        for r in candidates:
            self._recompute_metrics(r)
        reverse = metric in ("pvalue", "ad_pvalue")
        sentinel = float("-inf") if reverse else float("inf")
        candidates.sort(
            key=lambda r: (
                getattr(r, metric) if getattr(r, metric) is not None
                else sentinel,
                r.column_name,
                r.distribution,
            ),
            reverse=reverse,
        )
        return candidates[:n]

    def materialize(self) -> "FitResults":
        """Eagerly fill deferred KS/AD for every row, returning a new
        results object backed by a local-relation DataFrame."""
        results = [self._hydrate(r) for r in self._df.collect()]
        for r in results:
            if r.ks_statistic is None:
                self._recompute_metrics(r)
        spark = self._df.sparkSession
        from spark_bestfit_spark.operators.fit import FIT_RESULT_SCHEMA

        rows = [
            tuple(
                list(getattr(r, f) or ()) if f == "parameters"
                else getattr(r, f)
                for f in _ROW_FIELDS
            )
            for r in results
        ]
        new_df = spark.createDataFrame(rows, schema=FIT_RESULT_SCHEMA)
        return FitResults(
            new_df, registry=self._registry, samples=self._samples,
            deferred_metrics=False,
        )

    # -------------------------------------------------------------- queries
    def best(self, n: int = 1, metric: str = "sse"):
        """Top-n fits by metric (SURVEY T1). Returns result records
        (n=1 returns the single record). When the metric was deferred
        (lazy_metrics=True), candidates are pre-selected by AIC and the
        metric is computed on the driver for candidates only."""
        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
        self._check_metric(metric)
        if self._metric_is_deferred(metric):
            results = self._best_lazy(n, metric)
        else:
            rows = self._ordered(metric).limit(n).collect()
            results = [self._hydrate(r) for r in rows]
        if results and metric in ("sse", "aic", "bic", "ks_statistic"):
            v = getattr(results[0], metric)
            if v is not None and np.isfinite(v) and metric == "ks_statistic" and v > 0.5:
                warnings.warn(
                    f"best fit has poor K-S statistic ({v:.3f}); "
                    "data may not match any library distribution",
                    stacklevel=2,
                )
        if n == 1:
            return results[0] if results else None
        return results

    def best_df(self, n: int, metric: str = "sse") -> DataFrame:
        """Lazy top-n relation (for oracle checks / composition)."""
        self._check_metric(metric)
        return self._ordered(metric).limit(n)

    def best_per_column(self, n: int = 1, metric: str = "sse") -> dict:
        """Per-group top-k via Window + row_number — one distributed job
        for all columns (SURVEY T2, replacing the reference's per-column
        loop)."""
        self._check_metric(metric)
        col = F.col(metric)
        key = (
            col.desc_nulls_last()
            if metric in ("pvalue", "ad_pvalue")
            else col.asc_nulls_last()
        )
        w = Window.partitionBy("column_name").orderBy(key, F.col("distribution"))
        rows = (
            self._df.withColumn("_rank", F.row_number().over(w))
            .filter(F.col("_rank") <= n)
            .orderBy("column_name", "_rank")
            .drop("_rank")
            .collect()
        )
        out: dict = {}
        for r in rows:
            out.setdefault(r["column_name"], []).append(self._hydrate(r))
        return out

    # ------------------------------------------------------ instant plotting
    def _plot_target(self, result, metric: str):
        """Resolve (result, cached sample) for the plot wrappers: the
        cached fitting sample is hit first (NO Spark job — reference
        'instant plotting', continuous_fitter.py:648-871); results of
        lazy provenance recreate it deterministically via _get_sample."""
        if result is None:
            result = self.best(metric=metric)
            if result is None:
                raise ValueError("no fit results to plot")
        return result, self._get_sample(result.column_name)

    def plot(self, result=None, metric: str = "sse", **kwargs):
        """Histogram + fitted-PDF overlay from the CACHED sample — no
        DAG recompute. ``result`` defaults to ``best(metric=...)``."""
        from spark_bestfit_spark import plotting as P

        result, data = self._plot_target(result, metric)
        return P.plot_distribution(result, data, **kwargs)

    def plot_comparison(
        self, n: int = 3, metric: str = "sse",
        column: str | None = None, **kwargs,
    ):
        """Top-n fits overlaid on one histogram (reference
        plot_comparison) from the cached sample.

        With ``column=None`` on a multi-column result the overlay is
        restricted to the TOP result's source column — fits of other
        columns never share the histogram (they'd be overlaid on the
        wrong sample); pass ``column=`` explicitly to pick another."""
        from spark_bestfit_spark import plotting as P

        res = self if column is None else self.for_column(column)
        results = res.best(n=max(n, 2), metric=metric)[:n]
        if not results:
            raise ValueError("no fit results to plot")
        if column is None:
            top_col = results[0].column_name
            results = [r for r in results if r.column_name == top_col]
            if len(results) < min(n, 2):
                # the head of the global ranking mixed columns — rank
                # within the top column instead so the overlay stays
                # a real comparison
                results = self.for_column(top_col).best(
                    n=max(n, 2), metric=metric
                )[:n]
        data = self._get_sample(results[0].column_name)
        return P.plot_comparison(results, data, **kwargs)

    def plot_qq(self, result=None, metric: str = "sse", **kwargs):
        from spark_bestfit_spark import plotting as P

        result, data = self._plot_target(result, metric)
        return P.plot_qq(result, data, **kwargs)

    def plot_pp(self, result=None, metric: str = "sse", **kwargs):
        from spark_bestfit_spark import plotting as P

        result, data = self._plot_target(result, metric)
        return P.plot_pp(result, data, **kwargs)

    def plot_diagnostics(self, result=None, metric: str = "sse", **kwargs):
        from spark_bestfit_spark import plotting as P

        result, data = self._plot_target(result, metric)
        return P.plot_diagnostics(result, data, **kwargs)

    def for_column(self, column: str) -> "FitResults":
        """Restrict to one source column (SURVEY P4)."""
        return FitResults(
            self._df.filter(F.col("column_name") == F.lit(column)),
            registry=self._registry,
            samples=self._samples,
            cache=False,
            source=self._source,
            deferred_metrics=self._deferred_metrics,
        )

    def filter(
        self,
        max_sse: float | None = None,
        max_aic: float | None = None,
        max_bic: float | None = None,
        max_ks_statistic: float | None = None,
        min_pvalue: float | None = None,
        max_ad_statistic: float | None = None,
    ) -> "FitResults":
        """Threshold filter over the metric columns (SURVEY P3)."""
        df = self._df
        if max_sse is not None:
            df = df.filter(F.col("sse") <= max_sse)
        if max_aic is not None:
            df = df.filter(F.col("aic") <= max_aic)
        if max_bic is not None:
            df = df.filter(F.col("bic") <= max_bic)
        if max_ks_statistic is not None:
            df = df.filter(F.col("ks_statistic") <= max_ks_statistic)
        if min_pvalue is not None:
            df = df.filter(F.col("pvalue") >= min_pvalue)
        if max_ad_statistic is not None:
            df = df.filter(F.col("ad_statistic") <= max_ad_statistic)
        return FitResults(
            df, registry=self._registry, samples=self._samples, cache=False,
            source=self._source,
            deferred_metrics=self._deferred_metrics,
        )

    def summary(self) -> dict:
        """min/mean/max of each metric + counts in ONE aggregation job
        (SURVEY A9)."""
        aggs = [F.count("*").alias("n_fits")]
        for m in ("sse", "aic", "bic", "ks_statistic", "pvalue"):
            aggs += [
                F.min(m).alias(f"{m}_min"),
                F.mean(m).alias(f"{m}_mean"),
                F.max(m).alias(f"{m}_max"),
            ]
        row = self._df.agg(*aggs).first().asDict()
        out: dict = {"n_fits": row["n_fits"], "n_columns": len(self.columns())}
        for m in ("sse", "aic", "bic", "ks_statistic", "pvalue"):
            out[m] = {
                "min": row[f"{m}_min"],
                "mean": row[f"{m}_mean"],
                "max": row[f"{m}_max"],
            }
        return out

    def n_acceptable(
        self,
        min_pvalue: float = 0.05,
        max_ks_statistic: float | None = None,
    ) -> int:
        """Count of fits passing quality thresholds (SURVEY A10)."""
        df = self._df.filter(F.col("pvalue") >= min_pvalue)
        if max_ks_statistic is not None:
            df = df.filter(F.col("ks_statistic") <= max_ks_statistic)
        return df.count()

    def quality_report(self, n: int = 3, min_pvalue: float = 0.05) -> dict:
        """Top fits + summary + acceptability (SURVEY quality_report,
        collection.py:640-741)."""
        top = self.best(max(n, 2), metric="sse")
        summary = self.summary()
        n_ok = self.n_acceptable(min_pvalue=min_pvalue)
        warnings_list = []
        if summary["n_fits"] == 0:
            warnings_list.append("no successful fits")
        elif n_ok == 0:
            warnings_list.append(
                f"no fits pass pvalue >= {min_pvalue}; interpret with caution"
            )
        return {
            "top_fits": [
                {
                    "column": r.column_name,
                    "distribution": r.distribution,
                    "sse": r.sse,
                    "ks_statistic": r.ks_statistic,
                    "pvalue": r.pvalue,
                }
                for r in (top or [])
            ],
            "summary": summary,
            "n_acceptable": n_ok,
            "warnings": warnings_list,
        }
