"""Single-pass column statistics aggregations (SURVEY §2.3 A1-A3, A11-A12).

All statistics are computed JVM-side with built-in aggregate functions in
ONE job per call — no raw rows reach the driver. At 100 TB this is a single
scan with partial aggregation (map-side combine) and a ~bytes-sized shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def valid_column(df: DataFrame, column: str):
    """Non-null, non-NaN, finite values of a column (reference P6 cleaning:
    backends/local.py:273-277)."""
    c = F.col(column)
    cond = c.isNotNull()
    # isnan only applies to float/double columns
    if dict(df.dtypes)[column] in ("float", "double"):
        cond = cond & ~F.isnan(c) & (F.abs(c) != float("inf"))
    return df.filter(cond)


def column_stats(df: DataFrame, column: str) -> dict:
    """min / max / count of valid values in a single aggregation
    (reference backends/spark.py:238-264)."""
    row = (
        valid_column(df, column)
        .agg(
            F.min(column).alias("min"),
            F.max(column).alias("max"),
            F.count(column).alias("count"),
        )
        .first()
    )
    return {"min": row["min"], "max": row["max"], "count": row["count"]}


def _valid_cond(df: DataFrame, column: str):
    c = F.col(column)
    cond = c.isNotNull()
    if dict(df.dtypes)[column] in ("float", "double"):
        cond = cond & ~F.isnan(c) & (F.abs(c) != float("inf"))
    return cond


def multi_column_stats(df: DataFrame, columns: list) -> dict:
    """Per-column min/max/count of VALID values for many columns in ONE
    aggregation job (conditional aggregates) — at 100 TB this is one scan
    instead of C scans."""
    aggs = []
    for c in columns:
        v = F.when(_valid_cond(df, c), F.col(c))
        aggs.append(F.min(v).alias(f"{c}__min"))
        aggs.append(F.max(v).alias(f"{c}__max"))
        aggs.append(F.count(v).alias(f"{c}__count"))
    row = df.agg(*aggs).first()
    return {
        c: {
            "min": row[f"{c}__min"],
            "max": row[f"{c}__max"],
            "count": row[f"{c}__count"],
        }
        for c in columns
    }


def multi_column_minmax(df: DataFrame, columns: list) -> dict:
    """Batched per-column min/max for bounds auto-detection (reference
    base_fitter.py:189-217) — one job for all columns."""
    aggs = []
    for c in columns:
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
    row = df.agg(*aggs).first()
    return {
        c: (row[f"{c}__min"], row[f"{c}__max"]) for c in columns
    }


def column_moments(df: DataFrame, column: str) -> dict:
    """Distributed moment statistics in one pass: count, mean, stddev,
    skewness, kurtosis, min, max (reference A11/A12 computes these on a
    sample; Spark has exact distributed aggregates)."""
    row = (
        valid_column(df, column)
        .agg(
            F.count(column).alias("count"),
            F.mean(column).alias("mean"),
            F.stddev_pop(column).alias("stddev"),
            F.skewness(column).alias("skewness"),
            F.kurtosis(column).alias("kurtosis"),
            F.min(column).alias("min"),
            F.max(column).alias("max"),
        )
        .first()
    )
    return {k: row[k] for k in row.asDict()}


def approx_quantiles(
    df: DataFrame, column: str, probabilities: list, relative_error: float = 0.01
) -> list:
    """Greenwald-Khanna approximate quantiles (reference A6,
    base_fitter.py:435-446). Distributed, single pass, mergeable sketches."""
    return df.approxQuantile(column, list(probabilities), relative_error)
