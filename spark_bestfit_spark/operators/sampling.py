"""Input-side sampling operators (SURVEY §2.7 SA1-SA5).

Strategy re-expressed from the reference (base_fitter.py:243-522):

- below ``sample_threshold`` rows: sample just enough for the fitting
  sample;
- above it: pilot-skewness decides UNIFORM vs STRATIFIED;
- stratified: approxQuantile splits -> width_bucket strata ->
  ``sampleBy`` with boosted tail fractions (>= tail_min_rows per tail
  stratum).

Everything stays declarative (``sample`` / ``sampleBy`` are pushed into
the scan stage by Catalyst); only <= fitting_sample_size rows ever reach
the driver.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from spark_bestfit_spark.operators.stats import valid_column
from spark_bestfit_spark.plans.config import FitterConfig

PILOT_SIZE = 5_000
SKEW_STRATIFIED = 0.5
SKEW_MORE_BINS = 2.0
SKEW_WARN = 5.0


def pilot_skewness(df: DataFrame, column: str, config: FitterConfig) -> float:
    """Skewness of a small pilot sample — one cheap job (reference
    base_fitter.py:311-364 collects <= 5k rows; we use the distributed
    aggregate on a sampled fraction instead, nothing is collected)."""
    # a fixed small fraction is fine for a pilot — skew estimate only
    row = (
        df.sample(fraction=0.01, seed=config.random_seed)
        .agg(F.skewness(column).alias("skew"))
        .first()
    )
    val = row["skew"]
    return float(val) if val is not None else 0.0


def choose_sampling_mode(skew: float) -> tuple:
    """(mode, n_bins) from pilot skewness (reference ADR-0004)."""
    if abs(skew) < SKEW_STRATIFIED:
        return "uniform", 0
    return "stratified", (10 if abs(skew) >= SKEW_MORE_BINS else 5)


def stratified_sample(
    df: DataFrame,
    column: str,
    fraction: float,
    config: FitterConfig,
    n_strata: int = 5,
) -> DataFrame:
    """Quantile-bucketed ``sampleBy`` with tail boost (reference
    base_fitter.py:388-477)."""
    probs = list(np.linspace(0.0, 1.0, n_strata + 1))
    splits = df.approxQuantile(column, probs, 0.01)
    splits = sorted(set(splits))
    if len(splits) < 3:
        return df.sample(fraction=fraction, seed=config.random_seed)
    lo, hi = splits[0], splits[-1]
    eps = (hi - lo) * 1e-10 if hi > lo else 1.0
    n_buckets = len(splits) - 1
    bucketed = df.withColumn(
        "_stratum",
        F.width_bucket(F.col(column), F.lit(lo), F.lit(hi + eps), F.lit(n_buckets)),
    )
    counts = {
        r["_stratum"]: r["cnt"]
        for r in bucketed.groupBy("_stratum").agg(F.count("*").alias("cnt")).collect()
    }
    fractions = {}
    for b, cnt in counts.items():
        if b is None:
            continue
        f_b = fraction
        # boost sparse tail strata so each contributes >= tail_min_rows
        if cnt * f_b < config.tail_min_rows:
            f_b = min(1.0, config.tail_min_rows / max(cnt, 1))
        fractions[b] = f_b
    sampled = bucketed.stat.sampleBy(
        "_stratum", fractions=fractions, seed=config.random_seed
    )
    return sampled.drop("_stratum")


def build_fitting_samples_multi(
    df: DataFrame,
    columns: list,
    config: FitterConfig,
    counts: dict,
) -> dict:
    """Fitting samples for MANY columns in ONE collect job.

    Rows are sampled jointly (the per-column marginals are unchanged);
    each column then drops its own non-finite values and subsamples to
    ``fitting_sample_size``. Falls back to per-column jobs when valid
    counts are so imbalanced that a joint sample would over-collect."""
    target = config.fitting_sample_size
    pos_counts = [counts[c] for c in columns if counts[c] > 0]
    if not pos_counts:
        return {c: np.empty(0) for c in columns}
    min_count, max_count = min(pos_counts), max(pos_counts)
    # imbalance guard: a joint fraction sized for the sparsest column
    # would collect frac * max_count rows of the densest
    frac = min(1.0, (target * 1.3) / max(min_count, 1))
    if frac * max_count > 8.0 * target:
        return {
            c: build_fitting_sample(df, c, config, int(counts[c]))
            for c in columns
        }
    proj = df.select(*columns)
    if max_count <= target:
        pdf = proj.toPandas()
    else:
        pdf = proj.sample(fraction=frac, seed=config.random_seed).toPandas()
    out = {}
    for c in columns:
        arr = pdf[c].to_numpy(dtype=np.float64)
        arr = arr[np.isfinite(arr)]
        if arr.size > target:
            rng = np.random.default_rng(config.random_seed)
            arr = rng.choice(arr, size=target, replace=False)
        out[c] = arr
    return out


def build_censored_sample(
    df: DataFrame,
    column: str,
    censor_column: str,
    config: FitterConfig,
    total_count: int,
):
    """(values, observed_mask) fitting sample for survival fitting — the
    value and its event indicator must travel together, so this samples
    rows of both columns in one pass."""
    clean = (
        valid_column(df, column)
        .filter(F.col(censor_column).isNotNull())
        .select(F.col(column), F.col(censor_column).cast("boolean").alias("_obs"))
    )
    target = config.fitting_sample_size
    if total_count <= target:
        pdf = clean.toPandas()
    else:
        frac = min(1.0, (target * 1.3) / total_count)
        pdf = (
            clean.sample(fraction=frac, seed=config.random_seed)
            .limit(target * 2)
            .toPandas()
        )
    values = pdf[column].to_numpy(dtype=np.float64)
    mask = pdf["_obs"].to_numpy(dtype=bool)
    finite = np.isfinite(values)
    values, mask = values[finite], mask[finite]
    if values.size > target:
        rng = np.random.default_rng(config.random_seed)
        idx = rng.choice(values.size, size=target, replace=False)
        values, mask = values[idx], mask[idx]
    return values, mask


def build_fitting_sample(
    df: DataFrame,
    column: str,
    config: FitterConfig,
    total_count: int,
) -> np.ndarray:
    """<= fitting_sample_size finite values as an ndarray on the driver
    (reference base_fitter.py:681-700). One job; collects <= ~12k rows."""
    clean = valid_column(df, column).select(column)
    target = config.fitting_sample_size
    if total_count <= target:
        pdf = clean.toPandas()
    else:
        # sample a bit more than needed, then truncate deterministically
        frac = min(1.0, (target * 1.3) / total_count)
        if total_count > config.sample_threshold and config.adaptive_sampling:
            skew = pilot_skewness(df, column, config)
            mode, n_bins = choose_sampling_mode(skew)
            if mode == "stratified":
                sampled = stratified_sample(
                    valid_column(df, column), column, frac, config, n_bins
                ).select(column)
            else:
                sampled = clean.sample(fraction=frac, seed=config.random_seed)
        else:
            sampled = clean.sample(fraction=frac, seed=config.random_seed)
        pdf = sampled.limit(target * 2).toPandas()
    arr = pdf[column].to_numpy(dtype=np.float64)
    arr = arr[np.isfinite(arr)]
    if arr.size > target:
        rng = np.random.default_rng(config.random_seed)
        arr = rng.choice(arr, size=target, replace=False)
    return arr


def neyman_allocation(
    df,
    stratum_col: str,
    value_col: str,
    total_n: int,
):
    """Neyman-optimal stratified sample allocation — size each
    stratum's sample proportional to ``N_h * sigma_h`` (population
    size x spread), the allocation that minimizes the variance of the
    stratified mean at a fixed budget (proportional allocation
    over-samples big HOMOGENEOUS strata; Neyman spends the budget
    where the uncertainty lives):

        n_h = total_n * N_h sigma_h / sum(N_h sigma_h),
        floored, remainder distributed by largest fractional part
        (ties by stratum), each capped at N_h.

    ONE grouped moment pass to the strata-sized relation; the
    rounding windows run on that relation, never the data. Returns
    ``(stratum, n_rows, sigma, allocated)``; strata with zero/null
    spread draw only from remainder distribution. The realized total
    can undershoot ``total_n`` only when strata saturate (allocated =
    population).
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window as _W

    if total_n < 1:
        raise ValueError("total_n must be >= 1")
    base = df.filter(
        F.col(stratum_col).isNotNull() & F.col(value_col).isNotNull()
    )
    per = base.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.stddev_pop(value_col), F.lit(0.0)).alias("sigma"),
    )
    w_all = _W.partitionBy(F.lit(1))
    weighted = per.withColumn(
        "_wt", F.col("n_rows") * F.col("sigma")
    ).withColumn("_tot", F.sum("_wt").over(w_all))
    share = F.when(
        F.col("_tot") > 0,
        F.lit(float(total_n)) * F.col("_wt") / F.col("_tot"),
    ).otherwise(F.lit(0.0))
    staged = (
        weighted.withColumn("_share", share)
        .withColumn("_floor", F.floor("_share").cast("long"))
        .withColumn("_frac", F.col("_share") - F.col("_floor"))
        .withColumn("_used", F.sum("_floor").over(w_all))
    )
    w_rank = _W.partitionBy(F.lit(1)).orderBy(
        F.desc("_frac"), F.asc("stratum")
    )
    ranked = staged.withColumn("_rk", F.row_number().over(w_rank))
    alloc = F.least(
        F.col("_floor")
        + (
            F.col("_rk") <= (F.lit(total_n) - F.col("_used"))
        ).cast("long"),
        F.col("n_rows"),
    )
    return ranked.select(
        "stratum",
        F.col("n_rows").cast("long"),
        F.round("sigma", 6).alias("sigma"),
        alloc.cast("long").alias("allocated"),
    )


def neyman_sample(
    df,
    stratum_col: str,
    value_col: str,
    total_n: int,
    id_col: str,
    seed: int = 2,
):
    """Draw the :func:`neyman_allocation` sample deterministically:
    within each stratum keep the ``allocated`` rows with the smallest
    seeded Knuth-hash keys (ties by id) — rerun/partitioning/engine
    identical, fully in-plan (the allocation relation broadcasts onto
    one per-stratum window; no driver loop). Returns the sampled rows
    with all input columns.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window as _W

    from spark_bestfit_spark.operators.curation import _knuth_u

    alloc = neyman_allocation(df, stratum_col, value_col, total_n)
    base = df.filter(
        F.col(stratum_col).isNotNull() & F.col(value_col).isNotNull()
    )
    w = _W.partitionBy(stratum_col).orderBy(
        _knuth_u(F.col(id_col), seed), F.col(id_col)
    )
    ranked = base.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.join(
            F.broadcast(
                alloc.select(
                    F.col("stratum").alias(stratum_col), "allocated"
                )
            ),
            stratum_col,
        )
        .filter(F.col("_rn") <= F.col("allocated"))
        .drop("_rn", "allocated")
    )
