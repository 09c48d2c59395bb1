"""Discrete distribution fitting (SURVEY §7.2 phase 7; reference
discrete_fitter.py / discrete_fitting.py capabilities).

Same spine as the continuous engine: the column is reduced to a
distributed empirical PMF (one ``groupBy(col).count()`` — map-side
combined, ~cardinality rows to the driver) plus a <=10k fitting sample,
then D optimizer-MLE fits fan out over the cluster. Discrete SSE is
computed against the PMF, K-S against the ECDF with jump handling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spark_bestfit_spark.functions import metrics as M
from spark_bestfit_spark.functions.distributions.registry import (
    DistributionRegistry,
)
from spark_bestfit_spark.operators.fit import (
    FIT_RESULT_SCHEMA,
    _sentinel_row,
    compute_data_stats,
)
from spark_bestfit_spark.plans.config import FitterConfig

__all__ = [
    "empirical_pmf",
    "fit_single_discrete",
    "parallel_fit_discrete_column",
]


def empirical_pmf(df: DataFrame, column: str) -> tuple:
    """(x_values, pmf) from a distributed groupBy — the discrete
    histogram IR (reference discrete_fitting.py:127-149, distributed
    as SURVEY A5 recommends)."""
    rows = (
        df.filter(F.col(column).isNotNull() & ~F.isnan(F.col(column)))
        .groupBy(F.floor(F.col(column)).alias("_k"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("_k")
        .collect()
    )
    if not rows:
        return np.array([]), np.array([])
    x = np.array([float(r["_k"]) for r in rows])
    counts = np.array([float(r["cnt"]) for r in rows])
    return x, counts / counts.sum()


def empirical_pmfs_multi(df: DataFrame, columns: list) -> dict:
    """Empirical PMFs for MANY columns in ONE scan: per-column floored
    values are stacked into (column_name, k) rows and aggregated
    together (map-side combined). Same one-scan pattern as the
    continuous engine's compute_histograms_multi."""
    stack_args = []
    for c in columns:
        col = F.col(c)
        cond = col.isNotNull()
        if dict(df.dtypes)[c] in ("float", "double"):
            cond = cond & ~F.isnan(col)
        stack_args += [F.lit(c), F.when(cond, F.floor(col))]
    rows = (
        df.select(
            F.stack(F.lit(len(columns)), *stack_args).alias(
                "column_name", "_k"
            )
        )
        .filter(F.col("_k").isNotNull())
        .groupBy("column_name", "_k")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    grouped: dict = {c: [] for c in columns}
    for r in rows:
        grouped[r["column_name"]].append((float(r["_k"]), float(r["cnt"])))
    out = {}
    for c, pairs in grouped.items():
        if not pairs:
            out[c] = (np.array([]), np.array([]))
            continue
        pairs.sort()
        x = np.array([p[0] for p in pairs])
        counts = np.array([p[1] for p in pairs])
        out[c] = (x, counts / counts.sum())
    return out


def fit_single_discrete(
    dist_name: str,
    data: np.ndarray,
    x_values: np.ndarray,
    pmf: np.ndarray,
    column: str,
    stats: dict,
    config: FitterConfig,
    registry: DistributionRegistry,
) -> dict:
    """Fit one discrete distribution; never raises (sentinel on failure)."""
    try:
        dist = registry.resolve(dist_name)
        params = tuple(float(p) for p in dist.fit(data))
        sse = M.compute_discrete_sse(dist, params, x_values, pmf)
        if not np.isfinite(sse):
            return _sentinel_row(column, dist_name, stats, (None, None))
        aic, bic = M.compute_discrete_information_criteria(dist, params, data)
        row = {
            "column_name": column,
            "distribution": dist_name,
            "parameters": list(params),
            "sse": sse,
            "aic": aic,
            "bic": bic,
            "ks_statistic": None,
            "pvalue": None,
            "ad_statistic": None,
            "ad_pvalue": None,
            **stats,
            "lower_bound": None,
            "upper_bound": None,
        }
        if not config.lazy_metrics:
            ks, p = M.compute_discrete_ks(dist, params, data)
            row["ks_statistic"] = ks if np.isfinite(ks) else None
            row["pvalue"] = p if np.isfinite(p) else None
        return row
    except Exception:  # noqa: BLE001
        return _sentinel_row(column, dist_name, stats, (None, None))


def parallel_fit_discrete_column(
    spark: SparkSession,
    dist_names: list,
    data: np.ndarray,
    x_values: np.ndarray,
    pmf: np.ndarray,
    column: str,
    config: FitterConfig,
    registry: DistributionRegistry,
) -> DataFrame:
    """Distribution-name fan-out for discrete fits (same partitioning
    heuristics as the continuous engine)."""
    stats = compute_data_stats(data)
    names = registry.interleave(dist_names)

    sc = spark.sparkContext
    cores = sc.defaultParallelism
    n_parts = max(
        1, min(len(names), cores * config.partition_multiplier)
    )
    b_data = sc.broadcast((data, x_values, pmf))
    cfg = config

    from spark_bestfit_spark.operators.fit import _lpt_bins, _packed_fanout

    bins = _lpt_bins(
        [(n,) for n in names], lambda t: registry.weight(t[0]), n_parts
    )

    def fit_bin(items):
        reg = DistributionRegistry(custom_exclusions=set())
        sample, xs, ps = b_data.value
        return [
            fit_single_discrete(
                name, sample, xs, ps, column, stats, cfg, reg
            )
            for (name,) in items
        ]

    result = _packed_fanout(spark, bins, fit_bin, FIT_RESULT_SCHEMA)
    return result.filter(F.col("sse") < F.lit(float("inf")))


def parallel_fit_discrete_columns(
    spark: SparkSession,
    plans: dict,
    config: FitterConfig,
    registry: DistributionRegistry,
) -> DataFrame:
    """ONE (column, distribution) fan-out for many discrete columns
    (mirror of the continuous parallel_fit_columns)."""
    per_col_names = {
        c: registry.interleave(p["names"]) for c, p in plans.items()
    }
    pairs = []
    idx = 0
    while True:
        emitted = False
        for c, names in per_col_names.items():
            if idx < len(names):
                pairs.append((c, names[idx]))
                emitted = True
        if not emitted:
            break
        idx += 1

    sc = spark.sparkContext
    cores = sc.defaultParallelism
    n_parts = max(
        1, min(len(pairs), cores * config.partition_multiplier)
    )
    b_plans = sc.broadcast(
        {
            c: (
                p["sample"], p["x_values"], p["pmf"],
                compute_data_stats(p["sample"]),
            )
            for c, p in plans.items()
        }
    )
    cfg = config

    from spark_bestfit_spark.operators.fit import _lpt_bins, _packed_fanout

    pair_bins = _lpt_bins(pairs, lambda t: registry.weight(t[1]), n_parts)

    def fit_bin(items):
        reg = DistributionRegistry(custom_exclusions=set())
        artifacts = b_plans.value
        rows = []
        for col, name in items:
            sample, xs, ps, stats = artifacts[col]
            rows.append(
                fit_single_discrete(
                    name, sample, xs, ps, col, stats, cfg, reg
                )
            )
        return rows

    result = _packed_fanout(spark, pair_bins, fit_bin, FIT_RESULT_SCHEMA)
    return result.filter(F.col("sse") < F.lit(float("inf")))
