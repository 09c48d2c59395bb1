"""Distributed histogram: the keystone aggregate of the engine (SURVEY A4).

Semantics match the reference (/root/reference/src/spark_bestfit/
histogram.py:51-132 + backends/spark.py:373-427):

- Rice rule when requested: bins = ceil(count^(1/3)) * 2, min 2.
- min == max  ->  degenerate single-bin histogram ([1.0], [value]).
- top edge gets +epsilon so the max value falls in the last bin.
- missing bins zero-filled; density normalized so the area is 1.

Spark-first implementation: ``width_bucket`` (JVM, whole-stage codegen)
+ ``groupBy(bucket).count()`` — a single scan with map-side partial
aggregation; only ~n_bins rows are collected. At 100 TB this is the only
full-data pass the fit needs, and it scales linearly with executors.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from spark_bestfit_spark.operators.stats import column_stats, valid_column


def histogram_df(
    df: DataFrame, column: str, bin_edges: np.ndarray, sort: bool = True
) -> DataFrame:
    """Lazy DataFrame of (bin_id, bin_count) for explicit, equi-width bin
    edges. bin_id is 1-based like ``width_bucket``; callers zero-fill.
    ``sort=False`` skips the final exchange when the caller indexes by
    bin_id anyway."""
    lo = float(bin_edges[0])
    hi = float(bin_edges[-1])
    n_bins = len(bin_edges) - 1
    out = (
        valid_column(df, column)
        .filter((F.col(column) >= F.lit(lo)) & (F.col(column) < F.lit(hi)))
        .select(
            F.width_bucket(F.col(column), F.lit(lo), F.lit(hi), F.lit(n_bins)).alias(
                "bin_id"
            )
        )
        .groupBy("bin_id")
        .agg(F.count("*").alias("bin_count"))
    )
    return out.orderBy("bin_id") if sort else out


def compute_histogram(
    df: DataFrame,
    column: str,
    bins: int | np.ndarray = 50,
    use_rice_rule: bool = False,
    approx_count: int | None = None,
    stats: dict | None = None,
):
    """Compute (density, bin_edges) without collecting raw data.

    Returns the same IR the reference builds: density has n_bins values,
    bin_edges n_bins + 1 (degenerate case: ([1.0], [v])).
    """
    if stats is None:
        stats = column_stats(df, column)
    if stats["min"] is None or stats["max"] is None or stats["count"] == 0:
        raise ValueError(
            f"Cannot compute histogram: column '{column}' has no valid values"
        )
    if use_rice_rule:
        count = approx_count if approx_count is not None else int(stats["count"])
        bins = max(int(np.ceil(count ** (1.0 / 3.0)) * 2), 2)
    if isinstance(bins, (int, np.integer)):
        bins = max(int(bins), 2)
        min_val = float(stats["min"])
        max_val = float(stats["max"])
        if min_val == max_val:
            return np.array([1.0]), np.array([min_val])
        epsilon = (max_val - min_val) * 1e-10
        bin_edges = np.linspace(min_val, max_val + epsilon, bins + 1)
    else:
        bin_edges = np.asarray(bins, dtype=np.float64)

    n_bins = len(bin_edges) - 1
    # no orderBy: counts are placed by bin_id below, saving an exchange
    rows = histogram_df(df, column, bin_edges, sort=False).collect()
    counts = np.zeros(n_bins, dtype=np.float64)
    for r in rows:
        b = int(r["bin_id"])
        if 1 <= b <= n_bins:
            counts[b - 1] = float(r["bin_count"])
    total = counts.sum()
    widths = np.diff(bin_edges)
    density = counts / (total * widths) if total > 0 else counts
    return density, bin_edges


def compute_histograms_multi(
    df: DataFrame,
    columns: list,
    stats: dict,
    bins: int = 50,
    use_rice_rule: bool = False,
) -> dict:
    """(density, bin_edges) for MANY columns in ONE scan.

    Per-column ``width_bucket`` expressions are stacked into
    (column_name, bin_id) rows and aggregated together — map-side
    combine reduces each partition to at most C x bins groups, so the
    shuffle stays tiny no matter the table size. Degenerate (min==max)
    columns short-circuit to the single-bin IR without touching the
    cluster."""
    out: dict = {}
    edges_by_col: dict = {}
    stack_args = []
    for c in columns:
        s = stats[c]
        if s["min"] is None or s["count"] == 0:
            continue
        n_bins = bins
        if use_rice_rule:
            n_bins = max(int(np.ceil(int(s["count"]) ** (1.0 / 3.0)) * 2), 2)
        n_bins = max(int(n_bins), 2)
        lo, hi = float(s["min"]), float(s["max"])
        if lo == hi:
            out[c] = (np.array([1.0]), np.array([lo]))
            continue
        eps = (hi - lo) * 1e-10
        edges = np.linspace(lo, hi + eps, n_bins + 1)
        edges_by_col[c] = edges
        col = F.col(c)
        cond = col.isNotNull()
        if dict(df.dtypes)[c] in ("float", "double"):
            cond = cond & ~F.isnan(col) & (F.abs(col) != float("inf"))
        cond = cond & (col >= F.lit(lo)) & (col < F.lit(float(edges[-1])))
        bucket = F.when(
            cond,
            F.width_bucket(col, F.lit(lo), F.lit(float(edges[-1])), F.lit(n_bins)),
        )
        stack_args += [F.lit(c), bucket]
    if edges_by_col:
        n = len(edges_by_col)
        rows = (
            df.select(
                F.stack(F.lit(n), *stack_args).alias("column_name", "bin_id")
            )
            .filter(F.col("bin_id").isNotNull())
            .groupBy("column_name", "bin_id")
            .agg(F.count("*").alias("bin_count"))
            .collect()
        )
        counts = {
            c: np.zeros(len(e) - 1, dtype=np.float64)
            for c, e in edges_by_col.items()
        }
        for r in rows:
            arr = counts.get(r["column_name"])
            b = int(r["bin_id"])
            if arr is not None and 1 <= b <= arr.size:
                arr[b - 1] = float(r["bin_count"])
        for c, e in edges_by_col.items():
            total = counts[c].sum()
            widths = np.diff(e)
            density = counts[c] / (total * widths) if total > 0 else counts[c]
            out[c] = (density, e)
    return out


def discrete_pmf(df: DataFrame, column: str):
    """Distributed empirical PMF: groupBy(value).count(), normalized
    (SURVEY A5 — the distributed version of the reference's sample-side
    np.unique)."""
    rows = (
        valid_column(df, column)
        .groupBy(column)
        .agg(F.count("*").alias("cnt"))
        .orderBy(column)
        .collect()
    )
    if not rows:
        raise ValueError(f"column '{column}' has no valid values")
    x = np.array([float(r[column]) for r in rows])
    counts = np.array([float(r["cnt"]) for r in rows])
    return x, counts / counts.sum()


def equidepth_histogram(
    df: DataFrame,
    column: str,
    bins: int = 10,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Equi-DEPTH histogram: ``bins`` buckets holding (approximately)
    equal row counts, bounded by the column's own quantiles — the
    complement of the equi-width :func:`compute_histogram` (uniform
    value axis) for skewed columns, where equi-width piles everything
    into one bar.

    Interior edges are the exact ``percentile`` at fractions
    ``i/bins`` (``approx=True`` swaps in Greenwald-Khanna
    ``approx_percentile`` — the 100 TB path; exact percentiles
    materialize the value multiset on an executor). Edges are rounded
    to 6 decimals BEFORE binning so bin assignment is a deterministic,
    engine-portable function of the value; a value equal to an edge
    falls in the LOWER bin (``v > edge`` counts edges strictly below).

    One lazy plan: the 1-row edges relation rides a broadcast
    cross-join, the bin id is a JVM higher-order ``filter``/``size``
    over the edges array (no UDF), and the per-bin aggregate is a
    combiner-friendly groupBy on <= ``bins`` keys.

    Returns ``(bin_id, n_rows, lo, hi, mean)`` — lo/hi are the bin's
    OBSERVED min/max (exact values, not interpolated edges), mean
    rounded to 6.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    pctl = "approx_percentile" if approx else "percentile"
    acc = f", {int(accuracy)}" if approx else ""
    fracs = ", ".join(str(i / bins) for i in range(1, bins))
    clean = valid_column(df, column)
    edges = clean.agg(
        F.expr(
            f"transform({pctl}({column}, array({fracs}){acc}), "
            "e -> round(e, 6))"
        ).alias("_edges")
    )
    binned = clean.crossJoin(F.broadcast(edges)).withColumn(
        "bin_id",
        F.size(
            F.filter(
                F.col("_edges"), lambda e: F.col(column) > e
            )
        ),
    )
    return binned.groupBy("bin_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min(column).alias("lo"),
        F.max(column).alias("hi"),
        F.round(F.avg(column), 6).alias("mean"),
    )


def response_curve(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bins: int = 10,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Binned response curve: the target's mean (with a standard
    error) across equal-mass buckets of a feature — the model-free
    partial-dependence diagnostic ("how does y move with x") and the
    monotonicity check before anyone fits anything.

    Binning is :func:`equidepth_histogram`'s scheme verbatim: exact
    (or Greenwald-Khanna, the 100 TB path) quantile edges rounded to 6
    BEFORE assignment, broadcast 1-row edges relation, JVM HOF bin id,
    one combiner-friendly groupBy on <= ``bins`` keys.

    Returns (bin_id, n, x_lo, x_hi, mean_x, mean_y, se_y) rounded to
    6 — ``se_y = stddev_samp / sqrt(n)``, null for single-row bins.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    pctl = "approx_percentile" if approx else "percentile"
    acc = f", {int(accuracy)}" if approx else ""
    fracs = ", ".join(str(i / bins) for i in range(1, bins))
    clean = valid_column(
        valid_column(df.select(x_col, y_col), x_col), y_col
    )
    edges = clean.agg(
        F.expr(
            f"transform({pctl}({x_col}, array({fracs}){acc}), "
            "e -> round(e, 6))"
        ).alias("_edges")
    )
    binned = clean.crossJoin(F.broadcast(edges)).withColumn(
        "bin_id",
        F.size(F.filter(F.col("_edges"), lambda e: F.col(x_col) > e)),
    )
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(x_col).alias("x_lo"),
        F.max(x_col).alias("x_hi"),
        F.round(F.avg(x_col), 6).alias("mean_x"),
        F.round(F.avg(y_col), 6).alias("mean_y"),
        F.round(
            F.stddev_samp(y_col) / F.sqrt(F.count(F.lit(1))), 6
        ).alias("se_y"),
    )


def gains_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Cumulative gains / lift table: equal-mass score bins ranked
    best-first, each with its positive count, the cumulative capture
    rate ("targeting the top k deciles catches X% of positives") and
    the lift over the base rate — the campaign-targeting companion to
    :func:`~spark_bestfit_spark.operators.stats.roc_auc`.

    Binning is the equi-depth scheme (quantile edges rounded BEFORE
    assignment, broadcast edges, HOF bin id, ``approx=True`` for the
    100 TB path); the cumulative legs ride a window over the <= bins
    result rows — nothing sorts data, only the tiny bin relation.

    Returns (decile 1 = best scores, n, n_pos, frac_pos,
    cum_capture, cum_lift) rounded to 6.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    from pyspark.sql import Window as _W

    pctl = "approx_percentile" if approx else "percentile"
    acc = f", {int(accuracy)}" if approx else ""
    fracs = ", ".join(str(i / bins) for i in range(1, bins))
    clean = valid_column(df.select(score_col, label_col), score_col).filter(
        F.col(label_col).isNotNull()
    )
    edges = clean.agg(
        F.expr(
            f"transform({pctl}({score_col}, array({fracs}){acc}), "
            "e -> round(e, 6))"
        ).alias("_edges")
    )
    y = (F.col(label_col) > 0).cast("long")
    binned = clean.crossJoin(F.broadcast(edges)).withColumn(
        "_b",
        F.size(
            F.filter(F.col("_edges"), lambda e: F.col(score_col) > e)
        ),
    )
    per = binned.groupBy("_b").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("n_pos"),
    )
    # decile 1 = highest scores = largest bin id
    per = per.withColumn("decile", (F.lit(bins) - F.col("_b")).cast("int"))
    w = (
        _W.partitionBy(F.lit(1)).orderBy("decile")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    w_all = _W.partitionBy(F.lit(1))
    out = (
        per.withColumn("_cum_pos", F.sum("n_pos").over(w))
        .withColumn("_cum_n", F.sum("n").over(w))
        .withColumn("_tot_pos", F.sum("n_pos").over(w_all))
        .withColumn("_tot_n", F.sum("n").over(w_all))
    )
    return out.select(
        "decile",
        "n",
        "n_pos",
        F.round(F.col("n_pos") / F.col("n"), 6).alias("frac_pos"),
        F.round(
            F.when(
                F.col("_tot_pos") > 0,
                F.col("_cum_pos") / F.col("_tot_pos"),
            ),
            6,
        ).alias("cum_capture"),
        F.round(
            F.when(
                F.col("_tot_pos") > 0,
                (F.col("_cum_pos") / F.col("_cum_n"))
                / (F.col("_tot_pos") / F.col("_tot_n")),
            ),
            6,
        ).alias("cum_lift"),
    )
