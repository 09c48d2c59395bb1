"""Distributed histogram: the keystone aggregate of the engine (SURVEY A4).

Semantics match the reference (/root/reference/src/spark_bestfit/
histogram.py:51-132 + backends/spark.py:373-427):

- Rice rule when requested: bins = ceil(count^(1/3)) * 2, min 2.
- min == max  ->  degenerate single-bin histogram ([1.0], [value]).
- top edge gets +epsilon so the max value falls in the last bin.
- missing bins zero-filled; density normalized so the area is 1.

Spark-first implementation: ``width_bucket`` (JVM, whole-stage codegen)
+ ``groupBy(bucket).count()`` — a single scan with map-side partial
aggregation; only ~n_bins rows are collected. At 100 TB this is the only
full-data pass the fit needs, and it scales linearly with executors.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from spark_bestfit_spark.operators.stats import column_stats, valid_column


def histogram_df(
    df: DataFrame, column: str, bin_edges: np.ndarray
) -> DataFrame:
    """Lazy DataFrame of (bin_id, bin_count) for explicit, equi-width bin
    edges. bin_id is 1-based like ``width_bucket``; callers zero-fill."""
    lo = float(bin_edges[0])
    hi = float(bin_edges[-1])
    n_bins = len(bin_edges) - 1
    return (
        valid_column(df, column)
        .filter((F.col(column) >= F.lit(lo)) & (F.col(column) < F.lit(hi)))
        .select(
            F.width_bucket(F.col(column), F.lit(lo), F.lit(hi), F.lit(n_bins)).alias(
                "bin_id"
            )
        )
        .groupBy("bin_id")
        .agg(F.count("*").alias("bin_count"))
        .orderBy("bin_id")
    )


def compute_histogram(
    df: DataFrame,
    column: str,
    bins: int | np.ndarray = 50,
    use_rice_rule: bool = False,
    approx_count: int | None = None,
    stats: dict | None = None,
):
    """Compute (density, bin_edges) without collecting raw data.

    Returns the same IR the reference builds: density has n_bins values,
    bin_edges n_bins + 1 (degenerate case: ([1.0], [v])).
    """
    if stats is None:
        stats = column_stats(df, column)
    if stats["min"] is None or stats["max"] is None or stats["count"] == 0:
        raise ValueError(
            f"Cannot compute histogram: column '{column}' has no valid values"
        )
    if use_rice_rule:
        count = approx_count if approx_count is not None else int(stats["count"])
        bins = max(int(np.ceil(count ** (1.0 / 3.0)) * 2), 2)
    if isinstance(bins, (int, np.integer)):
        bins = max(int(bins), 2)
        min_val = float(stats["min"])
        max_val = float(stats["max"])
        if min_val == max_val:
            return np.array([1.0]), np.array([min_val])
        epsilon = (max_val - min_val) * 1e-10
        bin_edges = np.linspace(min_val, max_val + epsilon, bins + 1)
    else:
        bin_edges = np.asarray(bins, dtype=np.float64)

    n_bins = len(bin_edges) - 1
    rows = histogram_df(df, column, bin_edges).collect()
    counts = np.zeros(n_bins, dtype=np.float64)
    for r in rows:
        b = int(r["bin_id"])
        if 1 <= b <= n_bins:
            counts[b - 1] = float(r["bin_count"])
    total = counts.sum()
    widths = np.diff(bin_edges)
    density = counts / (total * widths) if total > 0 else counts
    return density, bin_edges


def discrete_pmf(df: DataFrame, column: str):
    """Distributed empirical PMF: groupBy(value).count(), normalized
    (SURVEY A5 — the distributed version of the reference's sample-side
    np.unique)."""
    rows = (
        valid_column(df, column)
        .groupBy(column)
        .agg(F.count("*").alias("cnt"))
        .orderBy(column)
        .collect()
    )
    if not rows:
        raise ValueError(f"column '{column}' has no valid values")
    x = np.array([float(r[column]) for r in rows])
    counts = np.array([float(r["cnt"]) for r in rows])
    return x, counts / counts.sum()
