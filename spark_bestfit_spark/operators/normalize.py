"""Feature normalization operators: z-score / min-max / robust
scaling, percentile winsorization, and exact quantile (percent) rank —
global or per-group.

The feature-engineering layer of the pipeline family: before packing
features or comparing quality scores across domains, columns get
rescaled (per domain, language, source...) or clipped at percentile
gates. No reference-repo analog (the reference is a fitting library);
these are first-class pipeline extras in the mold of
`grouped_robust_stats_df` (same G-row broadcast discipline).

Scale design (100 TB):

* scaling/winsorizing statistics are G-row aggregates (one row per
  group, or a 1-row relation for the global form) that rejoin the data
  BY BROADCAST — never a per-row wide relation, no eager driver
  action; ``approx=True`` swaps exact percentiles for Greenwald-Khanna
  ``approx_percentile`` so executor memory stays bounded at any group
  cardinality.
* the global ``quantile_rank`` is the classic impossible-at-scale op
  (``percent_rank() OVER (ORDER BY v)`` is a single-partition global
  sort); here it reuses the engine's partitioned two-phase prefix-sum
  spine (`two_sample_ks_df`'s design): equi-width ``width_bucket``
  range bucketing, driver-bounded per-bucket totals folded into
  exclusive prefix offsets (<= num_buckets + 1 rows, constant in data
  size), then ONE hash-partitioned per-bucket window — global rank =
  bucket offset + in-bucket rank, never a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .stats import valid_column

__all__ = ["normalize_column", "winsorize", "quantile_rank", "quantile_normalize", "target_encode"]

_METHODS = ("zscore", "minmax", "robust")


def normalize_column(
    df: DataFrame,
    column: str,
    group_col: str | None = None,
    method: str = "zscore",
    approx: bool = False,
    accuracy: int = 10000,
    output_col: str | None = None,
) -> DataFrame:
    """Rescale ``column`` — globally, or within each ``group_col``
    group so no domain's scale dominates another's:

    * ``zscore``: ``(v - mean) / stddev_samp``;
    * ``minmax``: ``(v - min) / (max - min)`` (into [0, 1]);
    * ``robust``: ``(v - median) / IQR`` — the outlier-resistant
      scaler (``approx=True`` bounds executor memory via
      Greenwald-Khanna, the 100 TB path).

    Degenerate scales (zero stddev / constant group / zero IQR) yield
    null — a constant column carries no scale information, and null is
    honest where 0/0 is not. Rows whose value fails ``valid_column``
    (null/NaN/inf) or whose group is null are excluded.

    Execution: one aggregation producing a G-row (or 1-row) stats
    relation, broadcast back — map-only rescale, one lazy plan.
    Appends ``output_col`` (default ``{column}_norm``, rounded to 6
    decimals) to the surviving rows.
    """
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}")
    out = output_col or f"{column}_norm"
    pctl = "approx_percentile" if approx else "percentile"
    acc = f", {int(accuracy)}" if approx else ""
    clean = valid_column(df, column)
    if group_col is not None:
        clean = clean.filter(F.col(group_col).isNotNull())
        grouped = clean.groupBy(F.col(group_col).alias("_g"))
    else:
        grouped = clean.groupBy(F.lit(1).alias("_g"))
    v = F.col(column)
    if method == "zscore":
        stats = grouped.agg(
            F.avg(v).alias("_loc"), F.stddev_samp(v).alias("_scale")
        )
    elif method == "minmax":
        stats = grouped.agg(
            F.min(v).alias("_loc"),
            (F.max(v) - F.min(v)).alias("_scale"),
        )
    else:  # robust
        stats = grouped.agg(
            F.expr(f"{pctl}({column}, 0.5{acc})").alias("_loc"),
            (
                F.expr(f"{pctl}({column}, 0.75{acc})")
                - F.expr(f"{pctl}({column}, 0.25{acc})")
            ).alias("_scale"),
        )
    if group_col is not None:
        joined = clean.join(
            F.broadcast(stats), F.col(group_col) == F.col("_g")
        )
    else:
        joined = clean.crossJoin(F.broadcast(stats))
    return joined.withColumn(
        out,
        F.when(
            F.col("_scale") > 0,
            F.round((v - F.col("_loc")) / F.col("_scale"), 6),
        ),
    ).drop("_g", "_loc", "_scale")


def winsorize(
    df: DataFrame,
    column: str,
    group_col: str | None = None,
    lower: float = 0.01,
    upper: float = 0.99,
    approx: bool = False,
    accuracy: int = 10000,
    mode: str = "clip",
    output_col: str | None = None,
) -> DataFrame:
    """Percentile winsorization of ``column`` — globally or per group:
    values outside the [``lower``, ``upper``] percentile gates are
    clamped to the gate (``mode="clip"``, the winsorizing proper) or
    dropped (``mode="filter"``, percentile trimming). The per-group
    form is the per-domain outlier gate: a heavy-tailed domain clips
    at its OWN tails, not the corpus's.

    Execution: one percentile aggregation to a G-row (or 1-row)
    bounds relation, broadcast back, then a map-only
    ``least``/``greatest`` clamp or filter — one lazy plan, no eager
    action; ``approx=True`` is the Greenwald-Khanna 100 TB path.

    ``mode="clip"`` appends ``output_col`` (default
    ``{column}_wins``); ``mode="filter"`` returns the surviving rows
    with original columns.
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError("need 0 <= lower < upper <= 1")
    if mode not in ("clip", "filter"):
        raise ValueError("mode must be 'clip' or 'filter'")
    out = output_col or f"{column}_wins"
    pctl = "approx_percentile" if approx else "percentile"
    acc = f", {int(accuracy)}" if approx else ""
    clean = valid_column(df, column)
    if group_col is not None:
        clean = clean.filter(F.col(group_col).isNotNull())
        grouped = clean.groupBy(F.col(group_col).alias("_g"))
    else:
        grouped = clean.groupBy(F.lit(1).alias("_g"))
    bounds = grouped.agg(
        F.expr(f"{pctl}({column}, {float(lower)}{acc})").alias("_lo"),
        F.expr(f"{pctl}({column}, {float(upper)}{acc})").alias("_hi"),
    )
    if group_col is not None:
        joined = clean.join(
            F.broadcast(bounds), F.col(group_col) == F.col("_g")
        )
    else:
        joined = clean.crossJoin(F.broadcast(bounds))
    if mode == "filter":
        return joined.filter(
            (F.col(column) >= F.col("_lo"))
            & (F.col(column) <= F.col("_hi"))
        ).drop("_g", "_lo", "_hi")
    return joined.withColumn(
        out,
        F.greatest(F.least(F.col(column), F.col("_hi")), F.col("_lo")),
    ).drop("_g", "_lo", "_hi")


def quantile_rank(
    df: DataFrame,
    column: str,
    group_col: str | None = None,
    num_buckets: int = 1024,
    output_col: str | None = None,
) -> DataFrame:
    """Exact ``percent_rank`` of ``column`` — ``(count of strictly
    smaller values) / (n - 1)``, ties sharing a rank — appended as
    ``output_col`` (default ``{column}_qrank``, rounded to 6).

    Per-group (``group_col`` set): one hash-partitioned window per
    group — the shuffle any per-group ranking pays, never a global
    sort.

    Global (``group_col=None``): naive ``percent_rank() OVER (ORDER BY
    v)`` collapses to a single partition; here the rank is computed on
    the engine's partitioned two-phase prefix-sum spine instead
    (module docstring): equi-width range buckets are a deterministic
    function of the VALUE (ties never straddle buckets), per-bucket
    totals (<= num_buckets + 1 rows, constant in data size) fold into
    exclusive prefix offsets on the driver and broadcast back, and one
    per-bucket hash-partitioned window yields
    ``global rank = offset + in-bucket rank``. Driver actions are
    bounded (a 1-row min/max/count and the bucket totals), matching
    the exact-K-S convention.

    Rows failing ``valid_column`` (null/NaN/inf) are excluded; a
    single-row or all-ties relation ranks 0 everywhere.
    """
    out = output_col or f"{column}_qrank"
    clean = valid_column(df, column)
    if group_col is not None:
        clean = clean.filter(F.col(group_col).isNotNull())
        w = Window.partitionBy(group_col).orderBy(column)
        return clean.withColumn(
            out, F.round(F.percent_rank().over(w), 6)
        )
    spark = df.sparkSession
    stats = clean.agg(
        F.min(column).alias("lo"),
        F.max(column).alias("hi"),
        F.count("*").alias("n"),
    ).first()
    n = int(stats["n"] or 0)
    if n == 0:
        return clean.withColumn(out, F.lit(None).cast("double"))
    lo, hi = float(stats["lo"]), float(stats["hi"])
    if n == 1 or hi <= lo:
        return clean.withColumn(out, F.lit(0.0))
    bk = F.width_bucket(
        F.col(column), F.lit(lo), F.lit(hi), F.lit(int(num_buckets))
    )
    btot = (
        clean.groupBy(bk.alias("_bk")).agg(F.count("*").alias("_c"))
    ).collect()
    off_rows, acc = [], 0
    for r in sorted(btot, key=lambda r: r["_bk"]):
        off_rows.append((int(r["_bk"]), acc))
        acc += int(r["_c"])
    off = spark.createDataFrame(off_rows, "_bk long, _off long")
    wb = Window.partitionBy("_bk").orderBy(column)
    return (
        clean.withColumn("_bk", bk)
        .join(F.broadcast(off), "_bk")
        .withColumn(
            out,
            F.round(
                (F.col("_off") + F.rank().over(wb) - F.lit(1))
                / F.lit(float(n - 1)),
                6,
            ),
        )
        .drop("_bk", "_off")
    )


def quantile_normalize(
    df: DataFrame,
    column: str,
    group_col: str,
    grid: int = 1001,
    approx: bool = False,
    accuracy: int = 10000,
    output_col: str | None = None,
) -> DataFrame:
    """Quantile normalization: map each group's values onto the POOLED
    distribution, so every group ends up with (approximately) the same
    marginal — the batch-effect corrector (microarray-style) for
    quality scores, perplexities, or any per-domain metric whose scale
    drifts between sources.

    Each row's within-group ``percent_rank`` p is evaluated against
    the pooled quantile function, discretized to a ``grid``-point
    broadcast vector with linear interpolation between grid neighbors
    (grid=1001 -> 0.1-percentile resolution). ``approx=True`` swaps
    the exact pooled percentiles for Greenwald-Khanna — the 100 TB
    path; the exact tier is the oracle twin.

    Execution: ONE group-hash window for the percent ranks, ONE 1-row
    pooled-quantile aggregate broadcast back, map-side interpolation —
    no join by rank, no global sort. Ties share a percent_rank and
    therefore normalize identically (value-based determinism). Rows
    failing ``valid_column`` or with a null group are excluded.

    Appends ``p_rank`` and ``output_col`` (default ``{column}_qnorm``,
    rounded to 6).
    """
    if grid < 2:
        raise ValueError("grid must be >= 2")
    out = output_col or f"{column}_qnorm"
    pctl = "approx_percentile" if approx else "percentile"
    acc = f", {int(accuracy)}" if approx else ""
    clean = valid_column(df, column).filter(F.col(group_col).isNotNull())
    qs = ", ".join(f"{i / (grid - 1):.12g}" for i in range(grid))
    pooled = clean.agg(
        F.expr(f"{pctl}({column}, array({qs}){acc})").alias("_q")
    )
    w = Window.partitionBy(group_col).orderBy(F.col(column))
    ranked = clean.withColumn(
        "p_rank", F.round(F.percent_rank().over(w), 12)
    )
    pos = F.col("p_rank") * F.lit(float(grid - 1))
    lo = F.floor(pos).cast("int")
    hi = F.least(lo + 1, F.lit(grid - 1))
    frac = pos - lo
    qlo = F.element_at("_q", lo + 1)
    qhi = F.element_at("_q", hi + 1)
    return (
        ranked.crossJoin(F.broadcast(pooled))
        .withColumn(out, F.round(qlo + (qhi - qlo) * frac, 6))
        .withColumn("p_rank", F.round("p_rank", 6))
        .drop("_q")
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    method: str = "smooth",
    prior_weight: float = 10.0,
    output_col: str | None = None,
) -> DataFrame:
    """Target (mean) encoding of a categorical column — the standard
    high-cardinality categorical featurizer, with the two leakage
    controls:

    * ``smooth``: ``(sum_y + prior * m) / (n + m)`` — the category
      mean shrunk toward the GLOBAL mean by ``prior_weight`` pseudo-
      observations (rare categories get the prior, hot ones their own
      mean);
    * ``loo``: leave-one-out — ``(sum_y - y_i) / (n - 1)`` per row, so
      a row never sees its own target (null for singleton categories —
      the honest answer).

    Execution: one map-combinable groupBy to the G-row category stats,
    one 1-row global prior, both BROADCAST back — map-side arithmetic,
    no window, no sort, one lazy plan. Null categories/targets are
    excluded.

    Appends ``output_col`` (default ``{cat_col}_enc``, rounded to 6).
    """
    if method not in ("smooth", "loo"):
        raise ValueError("method must be 'smooth' or 'loo'")
    out = output_col or f"{cat_col}_enc"
    y = F.col(target_col)
    clean = valid_column(df, target_col).filter(F.col(cat_col).isNotNull())
    stats = clean.groupBy(F.col(cat_col).alias("_cat")).agg(
        F.sum(y).alias("_sy"), F.count(F.lit(1)).alias("_ny")
    )
    prior = clean.agg(F.avg(y).alias("_prior"))
    joined = clean.join(
        F.broadcast(stats), F.col(cat_col) == F.col("_cat")
    ).crossJoin(F.broadcast(prior))
    if method == "smooth":
        m = F.lit(float(prior_weight))
        enc = (F.col("_sy") + F.col("_prior") * m) / (F.col("_ny") + m)
    else:
        enc = F.when(
            F.col("_ny") > 1,
            (F.col("_sy") - y) / (F.col("_ny") - 1),
        )
    return joined.withColumn(out, F.round(enc, 6)).drop(
        "_cat", "_sy", "_ny", "_prior"
    )


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label_col,
    laplace: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence encoding + information value per category of
    ``cat_col`` against a binary outcome — the credit-scoring-standard
    categorical encoder whose aggregate (IV = sum of per-category
    ``(p_pos_i - p_neg_i) * WOE_i``) ranks features by predictive
    power (rule of thumb: <0.02 useless, >0.5 suspiciously strong).

    ``WOE_i = ln( (pos_i / pos_tot) / (neg_i / neg_tot) )`` with
    additive (Laplace) smoothing ``laplace`` on every cell so
    single-class categories stay finite — the same guard logistic
    scorecards use. ``label_col`` may be a column name or a boolean
    Column expression (e.g. ``F.col("o_orderstatus") == "F"``).

    Shape: ONE combiner-friendly groupBy over categories (G rows),
    totals recombined by a broadcast 1-row cross join — at 100 TB
    this is a grouped count; nothing data-sized shuffles twice.
    Returns one row per category: ``(cat_col, n, n_pos, n_neg, woe,
    iv_term)`` rounded to 6 — ``sum(iv_term)`` is the feature's IV.
    """
    lab = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    clean = df.filter(F.col(cat_col).isNotNull() & lab.isNotNull())
    per_cat = clean.groupBy(F.col(cat_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(lab.cast("long")).cast("long").alias("n_pos"),
        F.sum((~lab).cast("long")).cast("long").alias("n_neg"),
    )
    tot = per_cat.agg(
        F.sum("n_pos").alias("_tp"), F.sum("n_neg").alias("_tn"),
        F.count(F.lit(1)).alias("_g"),
    )
    s = F.lit(float(laplace))
    out = per_cat.crossJoin(F.broadcast(tot))
    # smoothed class shares: (x + s) / (tot + G*s) keeps each column a
    # proper distribution after smoothing
    p_pos = (F.col("n_pos") + s) / (F.col("_tp") + F.col("_g") * s)
    p_neg = (F.col("n_neg") + s) / (F.col("_tn") + F.col("_g") * s)
    woe = F.log(p_pos / p_neg)
    return out.select(
        F.col(cat_col),
        "n",
        "n_pos",
        "n_neg",
        F.round(woe, 6).alias("woe"),
        F.round((p_pos - p_neg) * woe, 6).alias("iv_term"),
    )
