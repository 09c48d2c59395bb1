"""Row-level scoring of DataFrame columns under fitted models.

The fit side reduces data to models; this is the other direction — apply
a fitted distribution to every row at scale (reference storage.py
pdf/cdf evaluation surface, lifted from driver ndarrays to the cluster):

- ``score_column``: adds logpdf / pdf / cdf / survival scores for a
  column under a (distribution, params) model. Arrow-batched pandas UDF
  over the NumPy kernels — map-only, no shuffle, pipelines with scans.
- ``flag_outliers``: tail-probability outlier flag — True when the
  two-sided tail mass min(cdf, sf) falls below alpha. At 100 TB this is
  the streaming-friendly "score every row against last night's model"
  pattern; the model ships in the closure (a few floats), never a join.

Truncated models score through the same ``TruncatedDistribution``
wrapper the fitter used, so bounded fits stay consistent end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

__all__ = ["score_column", "flag_outliers", "register_sql_functions"]

_MODES = ("logpdf", "pdf", "cdf", "sf")
_SQL_MODES = ("logpdf", "pdf", "cdf", "sf", "ppf")


def _scorer(dist_name: str, params: tuple, mode: str, bounds):
    """Build the Arrow-batched scoring UDF (closure ships a few floats)."""

    @pandas_udf("double")
    def score(s: pd.Series) -> pd.Series:
        from spark_bestfit_spark.functions.distributions.registry import (
            get_distribution,
        )

        dist = get_distribution(dist_name)
        if bounds[0] is not None or bounds[1] is not None:
            from spark_bestfit_spark.functions.truncated import (
                TruncatedDistribution,
            )

            model = TruncatedDistribution(dist, params, bounds[0], bounds[1])
            fn = getattr(model, mode)
            vals = fn(s.to_numpy(dtype=np.float64))
        else:
            fn = getattr(dist, mode)
            vals = fn(s.to_numpy(dtype=np.float64), *params)
        return pd.Series(np.asarray(vals, dtype=np.float64))

    return score


def score_column(
    df: DataFrame,
    column: str,
    distribution: str,
    params,
    mode: str = "logpdf",
    output_col: str | None = None,
    lower_bound: float | None = None,
    upper_bound: float | None = None,
) -> DataFrame:
    """Adds ``output_col`` (default ``<column>_<mode>``) scoring each row
    under the model. ``distribution``/``params`` typically come from a
    ``DistributionFitResult`` (``r.distribution``, ``r.parameters``)."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    params = tuple(float(p) for p in params)
    out = output_col or f"{column}_{mode}"
    udf = _scorer(distribution, params, mode, (lower_bound, upper_bound))
    return df.withColumn(out, udf(F.col(column).cast("double")))


def score_result(
    df: DataFrame,
    result,
    column: str | None = None,
    mode: str = "logpdf",
    output_col: str | None = None,
) -> DataFrame:
    """score_column driven by a DistributionFitResult (uses its stored
    column name, params and truncation bounds)."""
    return score_column(
        df,
        column or result.column_name,
        result.distribution,
        tuple(result.parameters),
        mode=mode,
        output_col=output_col,
        lower_bound=result.lower_bound,
        upper_bound=result.upper_bound,
    )


def register_sql_functions(spark, prefix: str = "bf_") -> list:
    """Register the model-evaluation surface as Spark SQL functions so
    pure-SQL pipelines can score rows against fitted models:

        SELECT bf_logpdf('norm', array(25.0, 14.0), l_quantity) ...

    One function per mode — ``bf_logpdf`` / ``bf_pdf`` / ``bf_cdf`` /
    ``bf_sf`` / ``bf_ppf`` — each ``(dist STRING, params ARRAY<DOUBLE>,
    x DOUBLE) -> DOUBLE``. Arrow-batched pandas UDFs: rows are grouped
    by (dist, params) inside each batch and evaluated vectorized, so
    the usual constant-model query costs one NumPy call per batch.
    Returns the registered names.
    """
    from spark_bestfit_spark.functions.distributions.registry import (
        get_distribution,
    )

    def make(mode: str):
        @pandas_udf("double")
        def evaluate(
            dist: pd.Series, params: pd.Series, x: pd.Series
        ) -> pd.Series:
            xv = x.to_numpy(dtype=np.float64)
            out = np.full(len(xv), np.nan)
            keys = pd.Series(
                [
                    (d, tuple(p) if p is not None else None)
                    for d, p in zip(dist, params)
                ]
            )
            for (dname, p), idx in keys.groupby(keys).groups.items():
                if dname is None or p is None:
                    continue
                fn = getattr(get_distribution(dname), mode)
                ii = np.asarray(idx, dtype=np.int64)
                with np.errstate(all="ignore"):
                    out[ii] = np.asarray(
                        fn(xv[ii], *[float(v) for v in p]),
                        dtype=np.float64,
                    )
            return pd.Series(out)

        return evaluate

    names = []
    for mode in _SQL_MODES:
        name = f"{prefix}{mode}"
        spark.udf.register(name, make(mode))
        names.append(name)
    return names


def flag_outliers(
    df: DataFrame,
    column: str,
    distribution: str,
    params,
    alpha: float = 0.001,
    output_col: str = "is_outlier",
    lower_bound: float | None = None,
    upper_bound: float | None = None,
) -> DataFrame:
    """True when the row's two-sided tail mass min(cdf, 1-cdf) < alpha
    under the model — i.e. the value sits further out than the model
    puts (2*alpha) of its probability."""
    if not 0.0 < alpha < 0.5:
        raise ValueError("alpha must be in (0, 0.5)")
    scored = score_column(
        df, column, distribution, params, mode="cdf",
        output_col="_cdf", lower_bound=lower_bound,
        upper_bound=upper_bound,
    )
    tail = F.least(F.col("_cdf"), 1.0 - F.col("_cdf"))
    return scored.withColumn(output_col, tail < F.lit(alpha)).drop("_cdf")
