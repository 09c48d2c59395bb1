"""Bucketed tables for co-located (exchange-free) joins.

At 100 TB, two fact tables repeatedly joined on the same key should be
written bucketed on that key: both sides land in matching bucket files,
so the join (and any groupBy on the key) runs without a shuffle — the
sort-merge join reads co-located buckets directly.

``write_bucketed`` persists a DataFrame as a bucketed managed table;
``bucketed_join`` joins two bucketed tables and (optionally) verifies
the physical plan contains no Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join", "plan_has_exchange"]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list,
    num_buckets: int = 16,
    sort_cols: list | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets lets the sort-merge join skip its sort
    step too."""
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key — shuffle-free when
    both were written with the same bucket count on the join key."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)


def plan_has_exchange(df: DataFrame) -> bool:
    """True when the physical plan contains a shuffle Exchange
    (broadcast exchanges don't count — they're the cheap kind)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        line.strip().lstrip("+-: ").startswith("Exchange")
        for line in plan.splitlines()
    )
