"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship fit at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY §2); each
callable takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL for the deterministic relational
operators. Fit queries (float-heavy, optimizer-dependent) are rows-only
checked and intentionally have no oracle entry.

Determinism rules used throughout (FIXTURES.md §G):
- every ORDER BY / LIMIT carries a full tie-breaker;
- money sums are cast to DECIMAL(18,2) so aggregation is exact and
  order-independent in both engines;
- histogram buckets use identical floor-arithmetic in both engines
  (DuckDB has no width_bucket);
- floats in declared outputs are rounded to 6 decimals.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _register(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Fit the distribution library to lineitem.l_extendedprice (sf0.001)
    and return the top-5 fits by K-S as a DataFrame."""
    from spark_bestfit_spark.fitter import DistributionFitter

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    results = DistributionFitter(spark).fit(
        df, column="l_extendedprice", max_distributions=24
    )
    return results.best_df(5, metric="ks_statistic")


# ---------------------------------------------------------------------------
# deterministic relational operators (oracle-checked)
# ---------------------------------------------------------------------------
def _q_column_stats(spark, sf_dir):
    """A1: single-pass min/max/count through the stats operator."""
    import pyspark.sql.functions as F

    from spark_bestfit_spark.operators.stats import valid_column

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return valid_column(df, "l_extendedprice").agg(
        F.round(F.min("l_extendedprice"), 6).alias("min_price"),
        F.round(F.max("l_extendedprice"), 6).alias("max_price"),
        F.count("l_extendedprice").alias("cnt"),
    )


def _q_multi_minmax(spark, sf_dir):
    """A3: batched bounds detection for four columns in one aggregation."""
    import pyspark.sql.functions as F

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    aggs = []
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        aggs.append(F.round(F.min(c), 6).alias(f"{c}_min"))
        aggs.append(F.round(F.max(c), 6).alias(f"{c}_max"))
    return df.agg(*aggs)


_HIST_SQL = """
WITH stats AS (
  SELECT min(l_extendedprice) AS lo,
         max(l_extendedprice) + (max(l_extendedprice) - min(l_extendedprice)) * 1e-10 AS hi
  FROM lineitem
),
bucketed AS (
  SELECT CAST(floor((l_extendedprice - lo) / ((hi - lo) / 50)) AS BIGINT) + 1 AS bin_id
  FROM lineitem, stats
  WHERE l_extendedprice >= lo AND l_extendedprice < hi
)
SELECT bin_id, count(*) AS bin_count
FROM bucketed
GROUP BY bin_id
"""


def _q_histogram_price(spark, sf_dir):
    """A4: the engine's keystone aggregate — 50-bin histogram of
    l_extendedprice. Floor-arithmetic buckets (identical expression in the
    DuckDB oracle)."""
    _register(spark, sf_dir)
    return spark.sql(_HIST_SQL)


def _q_discrete_pmf(spark, sf_dir):
    """A5: distributed empirical PMF of part.p_size."""
    import pyspark.sql.functions as F

    df = spark.read.parquet(f"{sf_dir}/part.parquet")
    total = df.count()
    return (
        df.groupBy("p_size")
        .agg(F.count("*").alias("cnt"))
        .withColumn("pmf", F.round(F.col("cnt") / F.lit(total), 6))
    )


def _q_quantiles(spark, sf_dir):
    """A6: exact quantiles of l_extendedprice (engine uses approxQuantile
    at scale; the declared query uses exact percentile for determinism)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT round(percentile(l_extendedprice, 0.1), 6) AS q10,
               round(percentile(l_extendedprice, 0.25), 6) AS q25,
               round(percentile(l_extendedprice, 0.5), 6) AS q50,
               round(percentile(l_extendedprice, 0.75), 6) AS q75,
               round(percentile(l_extendedprice, 0.9), 6) AS q90
        FROM lineitem
        """
    )


def _q_topk(spark, sf_dir):
    """T1: deterministic top-k with tie-breakers — top 10 order-spend
    customers (DECIMAL sums: exact, order-independent)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                               AS DECIMAL(38,2)) AS total_spend
        FROM orders
        GROUP BY o_custkey
        ORDER BY total_spend DESC, o_custkey
        LIMIT 10
        """
    )


def _q_topk_per_group(spark, sf_dir):
    """T2: per-group top-k via window + row_number (idiomatic Spark version
    of the reference's best_per_column loop)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, l_partkey, sum_qty, rnk
        FROM (
          SELECT l_returnflag, l_linestatus, l_partkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
                 row_number() OVER (
                   PARTITION BY l_returnflag, l_linestatus
                   ORDER BY sum(CAST(l_quantity AS DECIMAL(18,2))) DESC, l_partkey
                 ) AS rnk
          FROM lineitem
          GROUP BY l_returnflag, l_linestatus, l_partkey
        )
        WHERE rnk <= 2
        """
    )


def _q_summary(spark, sf_dir):
    """A9: one-pass multi-stat summary over a derived metric relation."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        WITH metrics AS (
          SELECT l_partkey,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue
          FROM lineitem GROUP BY l_partkey
        )
        SELECT count(*) AS n_parts,
               CAST(min(revenue) AS DECIMAL(38,2)) AS rev_min,
               CAST(round(avg(revenue), 2) AS DOUBLE) AS rev_mean,
               CAST(max(revenue) AS DECIMAL(38,2)) AS rev_max
        FROM metrics
        """
    )


def _q_distinct(spark, sf_dir):
    """P5: distinct non-null projection."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT DISTINCT l_returnflag, l_linestatus
        FROM lineitem
        WHERE l_returnflag IS NOT NULL
        """
    )


def _q_threshold_filter(spark, sf_dir):
    """P3 + A10: chained metric thresholds -> acceptability count."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT count(*) AS n_acceptable
        FROM lineitem
        WHERE l_discount <= 0.06 AND l_tax >= 0.02 AND l_quantity < 30
        """
    )


def _q_union(spark, sf_dir):
    """J1: union of per-source relations (cardinality check)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT src, count(*) AS cnt FROM (
          SELECT 'orders' AS src, CAST(o_totalprice AS DOUBLE) AS v FROM orders
          UNION ALL
          SELECT 'lineitem' AS src, CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        ) GROUP BY src
        """
    )


def _q_stratum_counts(spark, sf_dir):
    """A7: stratified-sampling stratum counts (decile buckets over
    o_totalprice, floor-arithmetic identical to the oracle)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        WITH stats AS (
          SELECT min(o_totalprice) AS lo,
                 max(o_totalprice) + (max(o_totalprice) - min(o_totalprice)) * 1e-10 AS hi
          FROM orders
        )
        SELECT CAST(floor((o_totalprice - lo) / ((hi - lo) / 10)) AS BIGINT) + 1 AS stratum,
               count(*) AS cnt
        FROM orders, stats
        GROUP BY stratum
        """
    )


def _q_moments(spark, sf_dir):
    """A11/A12: exact distributed moments (centered, two-phase) —
    skewness/kurtosis computed with the same expression in both engines."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        WITH m AS (SELECT avg(l_extendedprice) AS mu FROM lineitem),
        c AS (
          SELECT count(*) AS n,
                 avg(power(l_extendedprice - mu, 2)) AS m2,
                 avg(power(l_extendedprice - mu, 3)) AS m3,
                 avg(power(l_extendedprice - mu, 4)) AS m4
          FROM lineitem, m
        )
        SELECT n,
               round((SELECT mu FROM m), 4) AS mean_price,
               round(sqrt(m2), 4) AS stddev_price,
               round(m3 / power(m2, 1.5), 6) AS skewness_price,
               round(m4 / power(m2, 2) - 3.0, 6) AS kurtosis_price
        FROM c
        """
    )


def _q_failed_fit_filter(spark, sf_dir):
    """P2 analogue on a declared relation: drop rows failing a sentinel
    predicate, count survivors per group."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n_ok
        FROM lineitem
        WHERE l_extendedprice < 100000.0
        GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# fit queries (rows-only checks — float/optimizer-dependent by nature)
# ---------------------------------------------------------------------------
def _q_fit_price(spark, sf_dir):
    from spark_bestfit_spark.fitter import DistributionFitter

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    res = DistributionFitter(spark).fit(
        df, column="l_extendedprice", max_distributions=20
    )
    return res.best_df(10, metric="ks_statistic").select(
        "column_name", "distribution", "ks_statistic", "aic"
    )


def _q_fit_multi(spark, sf_dir):
    from spark_bestfit_spark.fitter import DistributionFitter

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    res = DistributionFitter(spark).fit(
        df, columns=["l_quantity", "l_discount"], max_distributions=12
    )
    return res.df.select("column_name", "distribution", "sse", "aic")


def _q_fit_lazy(spark, sf_dir):
    from spark_bestfit_spark.fitter import DistributionFitter

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    res = DistributionFitter(spark).fit(
        df, column="o_totalprice", lazy_metrics=True, max_distributions=15
    )
    return res.df.select("column_name", "distribution", "aic", "bic")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "column_stats": _q_column_stats,
        "multi_minmax": _q_multi_minmax,
        "histogram_price": _q_histogram_price,
        "discrete_pmf_psize": _q_discrete_pmf,
        "quantiles_price": _q_quantiles,
        "topk_customers": _q_topk,
        "topk_per_group": _q_topk_per_group,
        "summary_metrics": _q_summary,
        "distinct_flags": _q_distinct,
        "threshold_filter": _q_threshold_filter,
        "union_counts": _q_union,
        "stratum_counts": _q_stratum_counts,
        "moments_price": _q_moments,
        "failed_fit_filter": _q_failed_fit_filter,
        "fit_price": _q_fit_price,
        "fit_multi": _q_fit_multi,
        "fit_lazy": _q_fit_lazy,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "column_stats": """
            SELECT round(min(l_extendedprice), 6) AS min_price,
                   round(max(l_extendedprice), 6) AS max_price,
                   count(l_extendedprice) AS cnt
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL AND isfinite(l_extendedprice)
        """,
        "multi_minmax": """
            SELECT round(min(l_quantity), 6) AS l_quantity_min,
                   round(max(l_quantity), 6) AS l_quantity_max,
                   round(min(l_extendedprice), 6) AS l_extendedprice_min,
                   round(max(l_extendedprice), 6) AS l_extendedprice_max,
                   round(min(l_discount), 6) AS l_discount_min,
                   round(max(l_discount), 6) AS l_discount_max,
                   round(min(l_tax), 6) AS l_tax_min,
                   round(max(l_tax), 6) AS l_tax_max
            FROM lineitem
        """,
        "histogram_price": _HIST_SQL,
        "discrete_pmf_psize": """
            SELECT p_size, count(*) AS cnt,
                   round(count(*) * 1.0 / (SELECT count(*) FROM part), 6) AS pmf
            FROM part GROUP BY p_size
        """,
        "quantiles_price": """
            SELECT round(quantile_cont(l_extendedprice, 0.1), 6) AS q10,
                   round(quantile_cont(l_extendedprice, 0.25), 6) AS q25,
                   round(quantile_cont(l_extendedprice, 0.5), 6) AS q50,
                   round(quantile_cont(l_extendedprice, 0.75), 6) AS q75,
                   round(quantile_cont(l_extendedprice, 0.9), 6) AS q90
            FROM lineitem
        """,
        "topk_customers": """
            SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                                   AS DECIMAL(38,2)) AS total_spend
            FROM orders
            GROUP BY o_custkey
            ORDER BY total_spend DESC, o_custkey
            LIMIT 10
        """,
        "topk_per_group": """
            SELECT l_returnflag, l_linestatus, l_partkey, sum_qty, rnk
            FROM (
              SELECT l_returnflag, l_linestatus, l_partkey,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
                     row_number() OVER (
                       PARTITION BY l_returnflag, l_linestatus
                       ORDER BY sum(CAST(l_quantity AS DECIMAL(18,2))) DESC, l_partkey
                     ) AS rnk
              FROM lineitem
              GROUP BY l_returnflag, l_linestatus, l_partkey
            )
            WHERE rnk <= 2
        """,
        "summary_metrics": """
            WITH metrics AS (
              SELECT l_partkey,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue
              FROM lineitem GROUP BY l_partkey
            )
            SELECT count(*) AS n_parts,
                   CAST(min(revenue) AS DECIMAL(38,2)) AS rev_min,
                   CAST(round(avg(revenue), 2) AS DOUBLE) AS rev_mean,
                   CAST(max(revenue) AS DECIMAL(38,2)) AS rev_max
            FROM metrics
        """,
        "distinct_flags": """
            SELECT DISTINCT l_returnflag, l_linestatus
            FROM lineitem
            WHERE l_returnflag IS NOT NULL
        """,
        "threshold_filter": """
            SELECT count(*) AS n_acceptable
            FROM lineitem
            WHERE l_discount <= 0.06 AND l_tax >= 0.02 AND l_quantity < 30
        """,
        "union_counts": """
            SELECT src, count(*) AS cnt FROM (
              SELECT 'orders' AS src, CAST(o_totalprice AS DOUBLE) AS v FROM orders
              UNION ALL
              SELECT 'lineitem' AS src, CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
            ) GROUP BY src
        """,
        "stratum_counts": """
            WITH stats AS (
              SELECT min(o_totalprice) AS lo,
                     max(o_totalprice) + (max(o_totalprice) - min(o_totalprice)) * 1e-10 AS hi
              FROM orders
            )
            SELECT CAST(floor((o_totalprice - lo) / ((hi - lo) / 10)) AS BIGINT) + 1 AS stratum,
                   count(*) AS cnt
            FROM orders, stats
            GROUP BY stratum
        """,
        "moments_price": """
            WITH m AS (SELECT avg(l_extendedprice) AS mu FROM lineitem),
            c AS (
              SELECT count(*) AS n,
                     avg(power(l_extendedprice - mu, 2)) AS m2,
                     avg(power(l_extendedprice - mu, 3)) AS m3,
                     avg(power(l_extendedprice - mu, 4)) AS m4
              FROM lineitem, m
            )
            SELECT n,
                   round((SELECT mu FROM m), 4) AS mean_price,
                   round(sqrt(m2), 4) AS stddev_price,
                   round(m3 / power(m2, 1.5), 6) AS skewness_price,
                   round(m4 / power(m2, 2) - 3.0, 6) AS kurtosis_price
            FROM c
        """,
        "failed_fit_filter": """
            SELECT l_returnflag, count(*) AS n_ok
            FROM lineitem
            WHERE l_extendedprice < 100000.0
            GROUP BY l_returnflag
        """,
    }
