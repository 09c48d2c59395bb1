"""Table sources (SURVEY S1-S3).

``read_table`` keeps the scan pushdown-friendly: an explicit column
projection lands in the parquet ``ReadSchema`` and user filters reach
``PushedFilters`` — at 100 TB the difference between scanning 2 columns
and 16 is the job.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_table",
    "register_tables",
    "create_distribution_table",
    "collect_column",
]

_FORMATS = {"parquet", "orc", "json", "csv"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    columns: list | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Read a table with optional column projection (pruned at the scan).

    CSV defaults to header + schema inference unless a schema is given
    (inference costs an extra pass — pass ``schema`` at scale).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "true")
    df = reader.options(**options).format(fmt).load(path)
    if columns:
        df = df.select(*columns)
    return df


def register_tables(
    spark: SparkSession, base_dir: str, names: list, fmt: str = "parquet"
) -> dict:
    """Register ``{base_dir}/{name}.{fmt}`` as temp views; returns the
    DataFrames by name."""
    out = {}
    for name in names:
        df = read_table(spark, f"{base_dir}/{name}.{fmt}", fmt)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def create_distribution_table(
    spark: SparkSession, names: list, num_partitions: int | None = None
) -> DataFrame:
    """The distribution-name driving table for fit fan-outs (SURVEY S2)."""
    df = spark.createDataFrame(
        [(str(n),) for n in names], "distribution_name string"
    )
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def collect_column(df: DataFrame, column: str) -> np.ndarray:
    """One column to a driver ndarray (SURVEY S3) — only for relations
    already reduced to driver scale; large tables should go through the
    sampling operators instead."""
    pdf = df.select(column).toPandas()
    return pdf[column].to_numpy()
