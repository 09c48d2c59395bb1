"""As-of (point-in-time) join — a time-series operator Spark lacks
natively, composed from built-in DataFrame ops (no UDFs).

``asof_join(left, right, ...)`` attaches to each left row the most
recent right row at-or-before its timestamp (per key). The plan is the
classic union-and-carry-forward construction:

    tag sources -> unionByName -> Window(partitionBy keys,
    orderBy (time, src)) last(right columns, ignorenulls) -> keep left

Shuffle profile: ONE shuffle on the key columns (the window), identical
to what any join on those keys would pay — no range-explosion, no
per-row Python, and whole-stage codegen end to end. Skewed keys can be
pre-salted upstream; tolerance filtering is a map-side predicate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: list | None = None,
    value_cols: list | None = None,
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join (inclusive): latest right row with
    ``right.time <= left.time`` per ``by`` group.

    value_cols: right columns to carry (default: all non-key,
    non-time columns). tolerance: max allowed ``left.time -
    right.time`` (same units as the column); matches older than that
    become nulls.
    """
    by = list(by or [])
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in by and c != time_col
        ]
    carried = [f"{c}{suffix}" for c in value_cols]
    matched_time = f"{time_col}{suffix}"

    lhs = left
    for c in carried + [matched_time]:
        lhs = lhs.withColumn(c, F.lit(None))
    lhs = lhs.withColumn("_src", F.lit(1))

    rhs = right.select(
        *by,
        F.col(time_col),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn(matched_time, F.col(time_col)).withColumn(
        "_src", F.lit(0)
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    rhs = rhs.select(*lhs.columns)

    unioned = lhs.unionByName(rhs)
    # right rows sort before left rows at equal timestamps, so an
    # exactly-simultaneous right row matches (inclusive backward join)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col).asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            if c in carried + [matched_time]
            else F.col(c)
            for c in unioned.columns
        ]
    )
    out = filled.filter(F.col("_src") == 1).drop("_src")
    if tolerance is not None:
        stale = (
            F.col(matched_time).isNull()
            | (F.col(time_col) - F.col(matched_time) > tolerance)
        )
        for c in carried + [matched_time]:
            out = out.withColumn(
                c, F.when(stale, F.lit(None)).otherwise(F.col(c))
            )
    return out
