"""Tests for bucketed tables: the join on the bucket key must run
without a shuffle exchange, and results must match the plain join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.sources.bucketed import (
    bucketed_join,
    plan_has_exchange,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    rng = np.random.default_rng(42)
    orders = pd.DataFrame({
        "custkey": rng.integers(0, 500, 5000),
        "amount": rng.uniform(1, 100, 5000).round(2),
    })
    customers = pd.DataFrame({
        "custkey": np.arange(500),
        "segment": [f"seg{i % 5}" for i in range(500)],
    })
    write_bucketed(
        spark.createDataFrame(orders), "b_orders", ["custkey"],
        num_buckets=8, sort_cols=["custkey"],
    )
    write_bucketed(
        spark.createDataFrame(customers), "b_customers", ["custkey"],
        num_buckets=8, sort_cols=["custkey"],
    )
    yield "b_orders", "b_customers"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customers")


class TestBucketedJoin:
    def test_join_has_no_shuffle(self, spark, bucketed_tables):
        left, right = bucketed_tables
        # disable broadcast so the co-located sort-merge path is chosen
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, left, right, on=["custkey"])
            assert not plan_has_exchange(joined), (
                "bucketed join should not shuffle:\n"
                + joined._jdf.queryExecution().executedPlan().toString()
            )
            assert joined.count() == 5000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_unbucketed_join_does_shuffle(self, spark, bucketed_tables):
        """Control: the same join on plain DataFrames has an Exchange."""
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = spark.table(bucketed_tables[0]).repartition(4)
            b = spark.table(bucketed_tables[1]).repartition(4)
            joined = a.join(b, on=["custkey"])
            assert plan_has_exchange(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_results_match_plain_join(self, spark, bucketed_tables):
        left, right = bucketed_tables
        bucketed = bucketed_join(spark, left, right, on=["custkey"])
        plain = spark.table(left).join(spark.table(right), on=["custkey"])
        b = sorted(map(tuple, bucketed.collect()))
        p = sorted(map(tuple, plain.collect()))
        assert b == p

    def test_groupby_on_bucket_key_no_shuffle(self, spark, bucketed_tables):
        import pyspark.sql.functions as F

        agg = (
            spark.table(bucketed_tables[0])
            .groupBy("custkey")
            .agg(F.sum("amount").alias("total"))
        )
        assert not plan_has_exchange(agg)
