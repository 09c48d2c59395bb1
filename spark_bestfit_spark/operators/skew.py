"""Skew-handling aggregation helpers.

At 100 TB, a ``groupBy`` over keys with power-law cardinality puts one
hot key's entire partition on one reducer. ``salted_aggregate`` runs the
classic two-phase plan: a salted partial aggregation fans each hot key
over ``salt`` reducers (map-side combine still applies), then a final
aggregation merges the partials. Correct for any algebraic aggregate
expressed as (partial, merge) pairs; sum/count/min/max helpers included.

AQE's skew-join handling covers joins, not aggregations — this operator
fills that gap declaratively (no RDDs, stays in whole-stage codegen).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["salted_aggregate", "salted_count", "salted_sum"]


def salted_aggregate(
    df: DataFrame,
    keys: list,
    partial_aggs: list,
    merge_aggs: list,
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation with key salting.

    ``partial_aggs``: aggregate Columns for phase 1 (over
    keys + salt); their aliases are the intermediate column names.
    ``merge_aggs``: aggregate Columns over those intermediates for
    phase 2 (over keys alone).
    """
    if salt < 2:
        raise ValueError("salt must be >= 2")
    salted = df.withColumn(
        "_salt", (F.rand(seed=0) * salt).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_count(df: DataFrame, keys: list, salt: int = 16) -> DataFrame:
    """Skew-safe ``groupBy(keys).count()`` -> (keys..., cnt)."""
    return salted_aggregate(
        df, keys,
        [F.count(F.lit(1)).alias("_partial_cnt")],
        [F.sum("_partial_cnt").alias("cnt")],
        salt=salt,
    )


def salted_sum(
    df: DataFrame, keys: list, value_col: str, salt: int = 16
) -> DataFrame:
    """Skew-safe ``groupBy(keys).sum(value)`` -> (keys..., total)."""
    return salted_aggregate(
        df, keys,
        [F.sum(value_col).alias("_partial_sum")],
        [F.sum("_partial_sum").alias("total")],
        salt=salt,
    )
