"""DistributionFitter — the engine's main entry point (SURVEY §3.1).

Query lifecycle per fitted column:

1. validate (catalog only)                      — driver
2. df.count()                                   — job 1 (shared by columns)
3. histogram: width_bucket + groupBy            — job 2 (the only full scan)
4. fitting sample (<= 10k rows)                 — job 3
5. prefilter + interleave distribution list     — driver
6. parallel_fit fan-out (mapInPandas)           — job 4
7. union + cache                                — job 5

Steps 3-6 run per column; everything the executors need is broadcast
(~KBs), so the fit cost is independent of table size beyond the scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import NumericType

from spark_bestfit_spark.functions.distributions.registry import (
    DistributionRegistry,
)
from spark_bestfit_spark.operators.fit import (
    parallel_fit_column,
    union_results,
)
from spark_bestfit_spark.operators.histogram import compute_histogram
from spark_bestfit_spark.operators.sampling import build_fitting_sample
from spark_bestfit_spark.operators.stats import column_stats
from spark_bestfit_spark.plans.config import FitterConfig
from spark_bestfit_spark.results import FitResults

# Prefilter: distributions needing strictly-positive support can be skipped
# for columns with non-positive values, etc. (reference prefilter layer,
# continuous_fitter.py:966-1063 — ours is support-based, conservative).


class DistributionFitter:
    """Fits a library of continuous distributions to numeric columns."""

    def __init__(
        self,
        spark: SparkSession,
        registry: DistributionRegistry | None = None,
    ):
        self.spark = spark
        self.registry = registry or DistributionRegistry()

    # ------------------------------------------------------------ plumbing
    def register_distribution(self, name: str, dist, overwrite: bool = False):
        return self.registry.register_distribution(name, dist, overwrite)

    def _validate(self, df: DataFrame, columns: list, config: FitterConfig):
        config.validate()
        schema = {f.name: f.dataType for f in df.schema.fields}
        for c in columns:
            if c not in schema:
                raise ValueError(f"column {c!r} not found in DataFrame")
            if not isinstance(schema[c], NumericType):
                raise TypeError(
                    f"column {c!r} has non-numeric type {schema[c].simpleString()}"
                )

    def _select_distributions(
        self, config: FitterConfig, data: np.ndarray
    ) -> list:
        names = self.registry.get_distributions(
            support_at_zero=config.support_at_zero,
            additional_exclusions=list(config.additional_exclusions),
        )
        if config.max_distributions is not None:
            names = names[: config.max_distributions]
        return names

    # ---------------------------------------------------------------- fit
    def fit(
        self,
        df: DataFrame,
        column: str | None = None,
        columns: list | None = None,
        distributions: list | None = None,
        config: FitterConfig | None = None,
        **kwargs,
    ) -> FitResults:
        """Fit distributions to one or more numeric columns.

        kwargs are FitterConfig overrides (bins=, lazy_metrics=, ...).
        """
        if column is None and columns is None:
            raise ValueError("provide column= or columns=")
        cols = list(columns) if columns else [column]
        config = (config or FitterConfig()).with_(**kwargs) if kwargs else (
            config or FitterConfig()
        )
        self._validate(df, cols, config)

        per_column_dfs = []
        samples: dict = {}
        for c in cols:
            # one stats job per column gives min/max/count; the valid-row
            # count also drives the sampling plan (no separate count job)
            stats = column_stats(df, c)
            if stats["count"] == 0:
                continue  # all-null column -> contributes no rows
            density, edges = compute_histogram(
                df,
                c,
                bins=config.bins,
                use_rice_rule=config.use_rice_rule,
                stats=stats,
            )
            sample = build_fitting_sample(df, c, config, int(stats["count"]))
            if sample.size < 2:
                continue
            samples[c] = sample
            names = distributions or self._select_distributions(config, sample)
            per_column_dfs.append(
                parallel_fit_column(
                    self.spark,
                    names,
                    sample,
                    density,
                    edges,
                    c,
                    config,
                    self.registry,
                    bounds=(config.lower_bound, config.upper_bound),
                )
            )
        if not per_column_dfs:
            from spark_bestfit_spark.operators.fit import FIT_RESULT_SCHEMA

            empty = self.spark.createDataFrame([], schema=FIT_RESULT_SCHEMA)
            return FitResults(empty, registry=self.registry, cache=False)
        result_df = union_results(per_column_dfs)
        return FitResults(result_df, registry=self.registry, samples=samples)
