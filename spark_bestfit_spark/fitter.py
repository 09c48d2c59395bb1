"""DistributionFitter — the engine's main entry point (SURVEY §3.1).

Query lifecycle per fit (all columns batched):

1. validate (catalog only)                      — driver
2. limit-probe ∥ min/max/count stats            — wave 1 (concurrent jobs)
3. fitting sample ∥ histogram                   — wave 2 (concurrent jobs)
4. prefilter + interleave distribution list     — driver
5. parallel_fit fan-out (mapInPandas) + cache   — wave 3

Waves 1 and 2 each run two independent Spark jobs from driver threads,
so the prelude costs two job latencies, not four. Everything the
executors need is broadcast (~KBs), so the fit cost is independent of
table size beyond the scan.
"""

from __future__ import annotations

import warnings
import zlib
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import NumericType

from spark_bestfit_spark.functions.distributions.registry import (
    DistributionRegistry,
)
from spark_bestfit_spark.functions.estimation import detect_heavy_tail
from spark_bestfit_spark.operators.fit import (
    local_fit_columns,
    parallel_fit_column,
    parallel_fit_columns,
    union_results,
)
from spark_bestfit_spark.operators.histogram import (
    compute_histogram,
    compute_histograms_multi,
)
from spark_bestfit_spark.operators.sampling import (
    build_censored_sample,
    build_fitting_samples_multi,
)
from spark_bestfit_spark.operators.stats import column_stats, multi_column_stats
from spark_bestfit_spark.plans.config import FitterConfig
from spark_bestfit_spark.results import FitResults

# P7 prefilter (reference continuous_fitter.py:966-1063 semantics):
# filter on intrinsic SHAPE properties only — never on support bounds,
# because MLE's loc/scale can shift any distribution onto any data range.
# Layer 1 (~95% reliable): drop intrinsically right-skew-only families
# when the sample is clearly left-skewed. Layer 2 ('aggressive' only):
# drop intrinsically platykurtic families for very heavy-tailed samples.
_RIGHT_SKEW_ONLY = {
    "expon", "gamma", "lognorm", "chi2", "weibull_min", "pareto",
    "rayleigh", "invgamma", "exponweib", "genpareto", "invweibull",
    "fisk", "burr", "burr12", "loggamma", "invgauss", "genextreme",
    "gompertz", "halfnorm", "halfcauchy", "halflogistic", "halfgennorm",
    "nakagami", "gibrat", "lomax", "maxwell", "erlang", "fatiguelife",
    "powerlognorm", "kappa3", "levy", "truncpareto", "alpha",
}
# excess kurtosis is intrinsically negative for these (flat/bounded)
_PLATYKURTIC = {"uniform", "arcsine", "semicircular", "anglit", "cosine"}

_SKEW_FILTER_THRESHOLD = -1.0
_KURT_FILTER_THRESHOLD = 10.0


def prefilter_distributions(
    names: list, data, mode: bool | str = True
) -> tuple:
    """(kept, [(dropped, reason), ...]) — shape-compatibility prefilter."""
    if not mode:
        return list(names), []
    x = np.asarray(data, dtype=np.float64)
    x = x[np.isfinite(x)]
    # same declared-overflow policy as compute_data_stats: at |x|~1e300
    # the variance square overflows — std becomes inf, the shape filter
    # has nothing to say, and numpy's internal warning must not leak
    with np.errstate(over="ignore", invalid="ignore"):
        if x.size < 10:
            return list(names), []
        sd = float(np.std(x))
        if sd == 0 or not np.isfinite(sd):
            return list(names), []
        z = (x - x.mean()) / sd
        skew = float(np.mean(z**3))
        kurt = float(np.mean(z**4) - 3.0)
    kept, dropped = [], []
    for n in names:
        if skew < _SKEW_FILTER_THRESHOLD and n in _RIGHT_SKEW_ONLY:
            dropped.append((n, "right-skew-only family, left-skewed data"))
        elif (
            mode == "aggressive"
            and kurt > _KURT_FILTER_THRESHOLD
            and n in _PLATYKURTIC
        ):
            dropped.append((n, "platykurtic family, heavy-tailed data"))
        else:
            kept.append(n)
    return kept, dropped


def _ensure_spark_df(spark: SparkSession, df):
    """Duck-type the input relation like the reference's storage layer
    (reference storage.py:105-131, base_fitter.py:560-611 accept Spark,
    pandas, and Ray datasets): a pandas DataFrame is converted with
    ``spark.createDataFrame``; Spark DataFrames pass through. Anything
    else raises with the accepted types spelled out."""
    if isinstance(df, DataFrame):
        return df
    try:
        import pandas as pd
    except ImportError:  # pragma: no cover — pandas ships with pyspark
        pd = None
    if pd is not None and isinstance(df, pd.DataFrame):
        return spark.createDataFrame(df)
    raise TypeError(
        f"expected a Spark or pandas DataFrame, got {type(df).__name__}"
    )


def _truncate_group_sample(
    arr: np.ndarray, target: int, seed: int, group
) -> np.ndarray:
    """Deterministic over-budget truncation for fit_grouped: value-sort
    the group's collected rows (erasing Spark's collection order), then
    subsample WITHOUT replacement using a PER-GROUP generator seeded
    from (seed, crc32(str(group))). The truncated multiset depends only
    on the group's value multiset and the seed — never on input
    partitioning, collection order, or the pandas groupby iteration
    order (which consumes a shared rng in appearance order)."""
    if arr.size <= target:
        return arr
    rng = np.random.default_rng(
        [int(seed), zlib.crc32(str(group).encode("utf-8"))]
    )
    return rng.choice(np.sort(arr), size=target, replace=False)


class DistributionFitter:
    """Fits a library of continuous distributions to numeric columns.

    Accepts Spark DataFrames natively and pandas DataFrames by
    conversion (the reference's duck-typed input contract)."""

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
        if config.censoring_column is not None:
            cc = config.censoring_column
            if cc not in schema:
                raise ValueError(f"censoring column {cc!r} not found")
            from pyspark.sql.types import BooleanType, IntegerType, LongType

            if not isinstance(
                schema[cc], (BooleanType, IntegerType, LongType)
            ):
                raise TypeError(
                    f"censoring column {cc!r} must be boolean/int/long, "
                    f"got {schema[cc].simpleString()}"
                )

    def _validate_names(self, names: list) -> None:
        """Fail fast on unknown distribution names: a typo'd name would
        otherwise just fan out, hit the resolve failure inside the kernel
        and vanish as a filtered sentinel row — a silent empty result."""
        unknown = []
        for n in names:
            try:
                self.registry.resolve(n)
            except Exception:  # noqa: BLE001
                unknown.append(n)
        if unknown:
            raise ValueError(
                f"unknown distribution(s): {unknown!r}; see "
                "DistributionRegistry.get_distributions() / "
                "register_distribution() for the available set"
            )

    def _select_distributions(
        self, config: FitterConfig, data: np.ndarray
    ) -> list:
        names = self.registry.get_distributions(
            support_at_zero=config.support_at_zero,
            additional_exclusions=list(config.additional_exclusions),
        )
        if config.prefilter:
            names, _ = prefilter_distributions(names, data, config.prefilter)
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
        df = _ensure_spark_df(self.spark, df)
        cols = list(columns) if columns else [column]
        config = (config or FitterConfig()).with_(**kwargs) if kwargs else (
            config or FitterConfig()
        )
        self._validate(df, cols, config)
        if distributions:
            self._validate_names(distributions)

        # bounded fitting: restrict the relation to [lb, ub] up front so
        # the histogram, sample and stats all describe the retained mass
        # (Catalyst pushes this filter into the scan)
        bounds = (config.lower_bound, config.upper_bound)
        src = df
        if bounds[0] is not None or bounds[1] is not None:
            for c in cols:
                if bounds[0] is not None:
                    src = src.filter(F.col(c) >= bounds[0])
                if bounds[1] is not None:
                    src = src.filter(F.col(c) <= bounds[1])

        if config.censoring_column is not None:
            return self._fit_censored(src, cols, distributions, config, bounds)

        # batched planning: stats for ALL columns in one scan, histograms
        # for ALL columns in one scan, samples in one collect, ONE
        # (column, distribution) fan-out — job count is constant in the
        # number of columns (the 100 TB multi-column win)
        #
        # limit-probe first: collect up to fitting_sample_size + 1 rows
        # in one cheap job (CollectLimit scans one partition of a big
        # table). If the table is smaller than the limit, the probe IS
        # the complete data — stats, histograms, and samples all derive
        # from it driver-side and the fit needs no further scan.
        #
        # prelude jobs run CONCURRENTLY (Spark schedules jobs from
        # separate driver threads in parallel): probe races the stats
        # aggregation, then the sample collect races the histogram —
        # 5 sequential job latencies become 3. The stats job is wasted
        # only when the probe comes back small, i.e. when the relation
        # is tiny and the duplicate agg scan costs microseconds; on a
        # big table both results are needed anyway, so starting stats
        # early is pure wall-clock win. Results are unchanged (same
        # seeds, same plans) — only the submission order differs.
        probe_rows = config.fitting_sample_size + 1
        pool = ThreadPoolExecutor(max_workers=2)
        stats_future = pool.submit(multi_column_stats, src, cols)
        probe = src.select(*cols).limit(probe_rows).toPandas()
        threaded_stats = (
            stats_future.result() if len(probe) >= probe_rows else None
        )
        pool.shutdown(wait=False, cancel_futures=True)
        if len(probe) < probe_rows:
            all_stats, sample_map = {}, {}
            import pandas as pd

            for c in cols:
                # to_numeric handles Decimal/object columns uniformly
                vals = pd.to_numeric(probe[c], errors="coerce").to_numpy(
                    dtype=np.float64
                )
                vals = vals[np.isfinite(vals)]
                all_stats[c] = {
                    "min": float(vals.min()) if vals.size else None,
                    "max": float(vals.max()) if vals.size else None,
                    "count": int(vals.size),
                }
                sample_map[c] = vals
            live_cols = [c for c in cols if all_stats[c]["count"] > 0]
            if not live_cols:
                return self._empty_results()
            all_small = True
            histograms = {}
        else:
            all_stats = threaded_stats
            live_cols = [c for c in cols if all_stats[c]["count"] > 0]
            if not live_cols:
                return self._empty_results()
            # small-data shortcut: when every column's valid count fits
            # in the fitting sample, the sample IS the complete data —
            # the histogram can be built driver-side from it with
            # identical semantics (same edges, left-closed bins, +eps
            # top edge), saving one cluster job per fit
            all_small = all(
                all_stats[c]["count"] <= config.fitting_sample_size
                for c in live_cols
            )
            # sample collect and histogram agg are independent given the
            # stats — run them as concurrent Spark jobs (second prelude
            # fusion; wall-clock = max of the two, not the sum)
            pool = ThreadPoolExecutor(max_workers=2)
            hist_future = None
            if not all_small:
                hist_future = pool.submit(
                    compute_histograms_multi, src, live_cols, all_stats,
                    config.bins, config.use_rice_rule,
                )
            sample_map = build_fitting_samples_multi(
                src, live_cols, config,
                {c: int(all_stats[c]["count"]) for c in live_cols},
            )
            histograms = hist_future.result() if hist_future else {}
            pool.shutdown(wait=False)
        if all_small:
            for c in live_cols:
                sample = sample_map.get(c)
                if sample is None or sample.size == 0:
                    continue
                histograms[c] = self._local_histogram(
                    sample, all_stats[c], config
                )

        plans: dict = {}
        samples: dict = {}
        for c in live_cols:
            sample = sample_map.get(c)
            if sample is None or sample.size < 2 or c not in histograms:
                continue
            samples[c] = sample
            method = config.estimation_method
            if method == "auto":
                method = "mse" if detect_heavy_tail(sample) else "mle"
                if method == "mse":
                    warnings.warn(
                        f"column {c!r} looks heavy-tailed; using "
                        "maximum-spacing estimation", stacklevel=2
                    )
            density, edges = histograms[c]
            plans[c] = {
                "names": (
                    list(distributions) if distributions
                    else self._select_distributions(config, sample)
                ),
                "sample": sample,
                "density": density,
                "edges": edges,
                "method": method,
            }
        if not plans:
            return self._empty_results()
        broadcasts: list = []
        effective = sum(
            self.registry.effective_count(p["names"]) for p in plans.values()
        )
        if (
            0 < effective <= config.local_fit_threshold
            and config.progress_callback is None
        ):
            # tiny plan: kernels run in-process, result is a local
            # relation — no broadcast/fan-out/shuffle round-trip
            result_df = local_fit_columns(
                self.spark, plans, config, self.registry, bounds=bounds
            )
        else:
            result_df = parallel_fit_columns(
                self.spark, plans, config, self.registry, bounds=bounds,
                broadcast_registry=broadcasts,
            )
        results = FitResults(
            result_df, registry=self.registry, samples=samples,
            broadcasts=broadcasts, source=(src, config),
            # lazy fits are KNOWN deferred -> best() skips the probe
            # job; eager fits stay on the cached probe (censored fits
            # legitimately carry all-null KS and must keep behaving as
            # deferred there)
            deferred_metrics=True if config.lazy_metrics else None,
        )
        if config.progress_callback is not None:
            # materialize the fan-out under a tracked job group so the
            # callback sees task completion (reference progress.py role)
            from spark_bestfit_spark.progress import ProgressTracker

            tracker = ProgressTracker(
                self.spark, callback=config.progress_callback
            )
            with tracker.track(f"fitting {sum(len(p['names']) for p in plans.values())} distributions"):
                results.count()
        return results

    # ------------------------------------------------------ instant plotting
    def _plot_data(
        self, result, df, column, bins: int, force_recompute: bool
    ):
        """Cache-first plot-data resolution (reference 'instant
        plotting' v2.10, continuous_fitter.py:648-757): the result's
        cached fitting sample is used when present — zero Spark jobs —
        unless ``force_recompute=True``, in which case (or when no
        sample is cached) the distributed histogram is computed from
        ``df``. Passing ``df`` while a cached sample exists emits a
        FutureWarning and still uses the cache (reference v3.0.3
        CHANGELOG: plots use the cached sample even when df is passed;
        ``force_recompute=True`` opts into re-evaluation). Returns
        (data, hist_density, bin_edges) with exactly one side
        populated."""
        if not force_recompute and getattr(result, "_sample", None) is not None:
            if df is not None:
                warnings.warn(
                    "a cached fitting sample is available; df is ignored "
                    "— pass force_recompute=True to re-evaluate the "
                    "DataFrame",
                    FutureWarning,
                    stacklevel=3,
                )
            return result._sample, None, None
        if df is None:
            raise ValueError(
                "result has no cached sample (or force_recompute=True): "
                "pass the source df (and column if it differs from "
                "result.column_name)"
            )
        from spark_bestfit_spark.operators.histogram import compute_histogram

        df = _ensure_spark_df(self.spark, df)
        density, edges = compute_histogram(
            df, column or result.column_name, bins=bins
        )
        return None, density, edges

    def plot(
        self, result, df=None, column=None, bins: int = 50,
        force_recompute: bool = False, ax=None,
    ):
        """Histogram + fitted-PDF overlay, cached-sample-first
        (reference continuous_fitter.py:648: ``fitter.plot(best)``
        after a fit draws instantly, no DAG recompute)."""
        from spark_bestfit_spark import plotting as P

        data, density, edges = self._plot_data(
            result, df, column, bins, force_recompute
        )
        return P.plot_distribution(
            result, data, bins=bins, ax=ax,
            hist_density=density, bin_edges=edges,
        )

    def plot_comparison(
        self, results, df=None, column=None, bins: int = 50,
        force_recompute: bool = False, ax=None,
    ):
        """Multi-fit overlay (reference continuous_fitter.py:757 /
        plotting.py:409), cached-sample-first."""
        from spark_bestfit_spark import plotting as P

        if not results:
            raise ValueError("plot_comparison needs at least one result")
        lead = results[0]
        if not force_recompute and getattr(lead, "_sample", None) is not None:
            if df is not None:
                warnings.warn(
                    "a cached fitting sample is available; df is ignored "
                    "— pass force_recompute=True to re-evaluate the "
                    "DataFrame",
                    FutureWarning,
                    stacklevel=2,
                )
            return P.plot_comparison(results, lead._sample, bins=bins, ax=ax)
        if df is None:
            raise ValueError(
                "results carry no cached sample: pass the source df"
            )
        df = _ensure_spark_df(self.spark, df)
        col = column or lead.column_name
        data = (
            df.select(col).dropna().limit(100_000).toPandas()[col]
            .to_numpy(dtype=np.float64)
        )
        return P.plot_comparison(results, data, bins=bins, ax=ax)

    def plot_qq(
        self, result, df=None, column=None,
        force_recompute: bool = False, ax=None,
    ):
        """Q-Q plot, cached-sample-first (reference
        continuous_fitter.py:1065)."""
        from spark_bestfit_spark import plotting as P

        data = self._plot_sample(result, df, column, force_recompute)
        return P.plot_qq(result, data, ax=ax)

    def plot_pp(
        self, result, df=None, column=None,
        force_recompute: bool = False, ax=None,
    ):
        """P-P plot, cached-sample-first (reference
        continuous_fitter.py:1179)."""
        from spark_bestfit_spark import plotting as P

        data = self._plot_sample(result, df, column, force_recompute)
        return P.plot_pp(result, data, ax=ax)

    def _plot_sample(self, result, df, column, force_recompute: bool):
        """Raw-sample resolution for the point-wise plots (Q-Q / P-P
        need actual observations, not a histogram). Same cached-first +
        FutureWarning contract as _plot_data."""
        if not force_recompute and getattr(result, "_sample", None) is not None:
            if df is not None:
                warnings.warn(
                    "a cached fitting sample is available; df is ignored "
                    "— pass force_recompute=True to re-evaluate the "
                    "DataFrame",
                    FutureWarning,
                    stacklevel=3,
                )
            return result._sample
        if df is None:
            raise ValueError(
                "result has no cached sample (or force_recompute=True): "
                "pass the source df"
            )
        df = _ensure_spark_df(self.spark, df)
        col = column or result.column_name
        return (
            df.select(col).dropna().limit(100_000).toPandas()[col]
            .to_numpy(dtype=np.float64)
        )

    def fit_grouped(
        self,
        df: DataFrame,
        column: str,
        group_col: str,
        distributions: list | None = None,
        config: FitterConfig | None = None,
        max_groups: int = 200,
        **kwargs,
    ) -> FitResults:
        """Fit the distribution library to one column PER GROUP — a
        Spark-first extension the single-node reference cannot express:
        every per-group prelude is batched into one cluster pass, so
        the job count is constant in the number of groups.

        - per-group min/max/count: ONE groupBy aggregation;
        - per-group histograms: ONE scan (`width_bucket` against the
          group's own [lo, hi] bounds joined in by broadcast, then a
          (group, bin) groupBy — map-side combined, <= G x bins rows
          collected);
        - per-group fitting samples: ONE `sampleBy` pass (per-group
          fractions sized to the fitting sample), truncated
          deterministically driver-side;
        - ONE (group, distribution) fan-out through the same
          LPT-packed engine as multi-column fits.

        Results land in the standard relation with
        ``column_name = f"{column}[{group}]"``, so the whole query
        surface — ``best_per_column``, thresholds, lazy metrics —
        works per group unchanged.

        Driver memory holds G histograms + G samples (~90 KB each), so
        the operator targets grouping keys with up to ``max_groups``
        distinct values (domains, return flags, languages...) and
        raises beyond that; rows with a null group are excluded (a
        null key names no group). At 100 TB: two full scans + one
        sample pass, all shuffles carrying <= G x bins rows.
        """
        df = _ensure_spark_df(self.spark, df)
        config = (config or FitterConfig()).with_(**kwargs) if kwargs else (
            config or FitterConfig()
        )
        if config.censoring_column is not None:
            raise NotImplementedError(
                "fit_grouped does not support censoring_column: the "
                "grouped sample pass carries no event mask, so a "
                "censored config would silently produce uncensored "
                "per-group fits — use fit() per group for censored data"
            )
        self._validate(df, [column], config)
        if group_col not in df.columns:
            raise ValueError(f"group column {group_col!r} not found")
        if distributions:
            self._validate_names(distributions)
        from spark_bestfit_spark.operators.stats import valid_column

        clean = valid_column(df, column).filter(
            F.col(group_col).isNotNull()
        )
        stats_rows = (
            clean.groupBy(group_col)
            .agg(
                F.min(column).alias("lo"),
                F.max(column).alias("hi"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        if not stats_rows:
            return self._empty_results()
        if len(stats_rows) > max_groups:
            raise ValueError(
                f"fit_grouped: {len(stats_rows)} groups exceed "
                f"max_groups={max_groups}; the per-group histograms and "
                "samples are driver-resident — aggregate or bucket the "
                "key first, or raise max_groups deliberately"
            )
        gstats = {
            r[group_col]: {
                "min": float(r["lo"]), "max": float(r["hi"]),
                "count": int(r["n"]),
            }
            for r in stats_rows
        }
        target = config.fitting_sample_size
        # the sample pass and the histogram scan are independent given
        # the stats — run them as concurrent Spark jobs from driver
        # threads (same prelude fusion as fit(): wall-clock = max of
        # the two job latencies, not the sum)
        #
        # sample: ONE stratified sampleBy pass, per-group keep
        # fractions sized to ~1.3x the fitting sample (same
        # oversample-then-truncate convention as build_fitting_sample)
        fractions = {
            g: min(1.0, (target * 1.3) / s["count"])
            for g, s in gstats.items()
        }

        def _collect_samples():
            return (
                clean.select(group_col, column)
                .sampleBy(group_col, fractions, seed=config.random_seed)
                .toPandas()
            )

        # histogram: ONE scan for all non-degenerate groups — broadcast
        # the per-group bounds, bucket each row against ITS group's
        # edges, aggregate (group, bin)
        edges_by_group: dict = {}
        hist_by_group: dict = {}
        bounds_rows = []
        for g, s in gstats.items():
            if s["min"] == s["max"]:
                hist_by_group[g] = (
                    np.array([1.0]), np.array([s["min"]])
                )
                continue
            bins = config.bins
            if config.use_rice_rule:
                bins = max(
                    int(np.ceil(s["count"] ** (1.0 / 3.0)) * 2), 2
                )
            bins = max(int(bins), 2)
            eps = (s["max"] - s["min"]) * 1e-10
            edges_by_group[g] = np.linspace(
                s["min"], s["max"] + eps, bins + 1
            )
            bounds_rows.append((g, s["min"], s["max"] + eps, bins))

        def _collect_counts():
            gtype = clean.schema[group_col].dataType.simpleString()
            bounds_df = self.spark.createDataFrame(
                bounds_rows,
                f"_g {gtype}, _lo double, _hi double, _nb int",
            )
            return (
                clean.join(
                    F.broadcast(bounds_df),
                    clean[group_col] == bounds_df["_g"],
                )
                .filter(
                    (F.col(column) >= F.col("_lo"))
                    & (F.col(column) < F.col("_hi"))
                )
                .select(
                    "_g",
                    F.width_bucket(
                        F.col(column), F.col("_lo"), F.col("_hi"),
                        F.col("_nb"),
                    ).alias("_bin"),
                )
                .groupBy("_g", "_bin")
                .agg(F.count("*").alias("_c"))
                .collect()
            )

        pool = ThreadPoolExecutor(max_workers=2)
        counts_future = (
            pool.submit(_collect_counts) if bounds_rows else None
        )
        pdf = _collect_samples()
        counts = counts_future.result() if counts_future else None
        pool.shutdown(wait=False)
        samples_by_group: dict = {}
        for g, sub in pdf.groupby(group_col, sort=False):
            arr = sub[column].to_numpy(dtype=np.float64)
            arr = arr[np.isfinite(arr)]
            samples_by_group[g] = _truncate_group_sample(
                arr, target, config.random_seed, g
            )
        if counts is not None:
            acc: dict = {
                g: np.zeros(len(e) - 1) for g, e in edges_by_group.items()
            }
            for r in counts:
                arr = acc[r["_g"]]
                b = int(r["_bin"])
                if 1 <= b <= arr.size:
                    arr[b - 1] = float(r["_c"])
            for g, cnts in acc.items():
                edges = edges_by_group[g]
                widths = np.diff(edges)
                total = cnts.sum()
                hist_by_group[g] = (
                    cnts / (total * widths) if total > 0 else cnts,
                    edges,
                )
        plans: dict = {}
        samples: dict = {}
        for g in gstats:
            sample = samples_by_group.get(g)
            if sample is None or sample.size < 2 or g not in hist_by_group:
                continue
            label = f"{column}[{g}]"
            samples[label] = sample
            method = config.estimation_method
            if method == "auto":
                method = "mse" if detect_heavy_tail(sample) else "mle"
            density, edges = hist_by_group[g]
            plans[label] = {
                "names": (
                    list(distributions) if distributions
                    else self._select_distributions(config, sample)
                ),
                "sample": sample,
                "density": density,
                "edges": edges,
                "method": method,
            }
        if not plans:
            return self._empty_results()
        broadcasts: list = []
        bounds = (config.lower_bound, config.upper_bound)
        effective = sum(
            self.registry.effective_count(p["names"]) for p in plans.values()
        )
        if (
            0 < effective <= config.local_fit_threshold
            and config.progress_callback is None
        ):
            result_df = local_fit_columns(
                self.spark, plans, config, self.registry, bounds=bounds
            )
        else:
            result_df = parallel_fit_columns(
                self.spark, plans, config, self.registry, bounds=bounds,
                broadcast_registry=broadcasts,
            )
        return FitResults(
            result_df, registry=self.registry, samples=samples,
            broadcasts=broadcasts,
            deferred_metrics=True if config.lazy_metrics else None,
        )

    @staticmethod
    def _local_histogram(sample: np.ndarray, stats: dict, config):
        """Driver-side histogram with the distributed path's exact edge
        semantics (min==max single bin; +eps top edge; density)."""
        lo, hi = float(stats["min"]), float(stats["max"])
        if lo == hi:
            return np.array([1.0]), np.array([lo])
        bins = config.bins
        if config.use_rice_rule:
            bins = max(int(np.ceil(sample.size ** (1.0 / 3.0)) * 2), 2)
        bins = max(int(bins), 2)
        edges = np.linspace(lo, hi + (hi - lo) * 1e-10, bins + 1)
        counts, _ = np.histogram(sample, bins=edges)
        total = counts.sum()
        widths = np.diff(edges)
        density = (
            counts / (total * widths) if total > 0
            else counts.astype(np.float64)
        )
        return density, edges

    def _empty_results(self) -> FitResults:
        from spark_bestfit_spark.operators.fit import FIT_RESULT_SCHEMA

        empty = self.spark.createDataFrame([], schema=FIT_RESULT_SCHEMA)
        return FitResults(empty, registry=self.registry, cache=False)

    def _fit_censored(
        self, src: DataFrame, cols: list, distributions, config, bounds
    ) -> FitResults:
        """Censored (survival) path: the sample carries an event mask, so
        columns are planned individually."""
        per_column_dfs = []
        samples: dict = {}
        broadcasts: list = []
        for c in cols:
            stats = column_stats(src, c)
            if stats["count"] == 0:
                continue
            # histogram agg and sample collect are independent given the
            # stats — race them (same fusion as the uncensored prelude)
            pool = ThreadPoolExecutor(max_workers=2)
            hist_future = pool.submit(
                compute_histogram, src, c, bins=config.bins,
                use_rice_rule=config.use_rice_rule, stats=stats,
            )
            sample, censor_mask = build_censored_sample(
                src, c, config.censoring_column, config, int(stats["count"])
            )
            density, edges = hist_future.result()
            pool.shutdown(wait=False)
            if sample.size < 2:
                continue
            samples[c] = sample
            names = distributions or self._select_distributions(config, sample)
            per_column_dfs.append(
                parallel_fit_column(
                    self.spark, names, sample, density, edges, c, config,
                    self.registry, bounds=bounds, method="mle",
                    censor_mask=censor_mask, broadcast_registry=broadcasts,
                )
            )
        if not per_column_dfs:
            return self._empty_results()
        result_df = union_results(per_column_dfs)
        return FitResults(
            result_df, registry=self.registry, samples=samples,
            broadcasts=broadcasts, source=(src, config),
            deferred_metrics=True if config.lazy_metrics else None,
        )


class DiscreteDistributionFitter:
    """Fits the discrete distribution library to integer-valued columns
    (reference DiscreteFitter capability, same engine spine)."""

    def __init__(
        self,
        spark: SparkSession,
        registry: DistributionRegistry | None = None,
    ):
        self.spark = spark
        self.registry = registry or DistributionRegistry()

    def fit(
        self,
        df: DataFrame,
        column: str | None = None,
        columns: list | None = None,
        distributions: list | None = None,
        config: FitterConfig | None = None,
        **kwargs,
    ) -> FitResults:
        from spark_bestfit_spark.operators.discrete_fit import (
            empirical_pmfs_multi,
            parallel_fit_discrete_columns,
        )

        if column is None and columns is None:
            raise ValueError("provide column= or columns=")
        df = _ensure_spark_df(self.spark, df)
        cols = list(columns) if columns else [column]
        config = (config or FitterConfig()).with_(**kwargs) if kwargs else (
            config or FitterConfig()
        )
        schema = {f.name: f.dataType for f in df.schema.fields}
        for c in cols:
            if c not in schema:
                raise ValueError(f"column {c!r} not found in DataFrame")
            if not isinstance(schema[c], NumericType):
                raise TypeError(
                    f"column {c!r} has non-numeric type "
                    f"{schema[c].simpleString()}"
                )
        if distributions:
            DistributionFitter._validate_names(self, distributions)

        # batched planning, mirroring the continuous fitter: stats for
        # all columns in one scan, PMFs in one stacked groupBy, samples
        # in one collect, one (column, distribution) fan-out. The PMF
        # groupBy doesn't depend on the stats, so the two jobs race from
        # driver threads (same prelude fusion as the continuous path);
        # only the sample collect needs the counts.
        pool = ThreadPoolExecutor(max_workers=2)
        pmfs_future = pool.submit(empirical_pmfs_multi, df, cols)
        all_stats = multi_column_stats(df, cols)
        live_cols = [c for c in cols if all_stats[c]["count"] > 0]
        if not live_cols:
            pool.shutdown(wait=False, cancel_futures=True)
            return self._empty_results()
        sample_map = build_fitting_samples_multi(
            df, live_cols, config,
            {c: int(all_stats[c]["count"]) for c in live_cols},
        )
        pmfs = pmfs_future.result()
        pool.shutdown(wait=False)

        plans: dict = {}
        samples: dict = {}
        for c in live_cols:
            x_values, pmf = pmfs.get(c, (np.array([]), np.array([])))
            sample = sample_map.get(c)
            if x_values.size == 0 or sample is None:
                continue
            sample = np.floor(sample)
            if sample.size < 2:
                continue
            samples[c] = sample
            names = distributions or self.registry.get_discrete_distributions(
                additional_exclusions=list(config.additional_exclusions)
            )
            if config.max_distributions is not None:
                names = names[: config.max_distributions]
            plans[c] = {
                "names": list(names),
                "sample": sample,
                "x_values": x_values,
                "pmf": pmf,
            }
        if not plans:
            return self._empty_results()
        result_df = parallel_fit_discrete_columns(
            self.spark, plans, config, self.registry
        )
        return FitResults(
            result_df, registry=self.registry, samples=samples,
            source=(df, config),
        )

    def fit_grouped(
        self,
        df: DataFrame,
        column: str,
        group_col: str,
        distributions: list | None = None,
        config: FitterConfig | None = None,
        max_groups: int = 200,
        **kwargs,
    ) -> FitResults:
        """Discrete fitting PER GROUP — the discrete twin of
        ``DistributionFitter.fit_grouped`` with the same constant job
        count in the number of groups:

        - per-group counts: ONE groupBy aggregation (+ max_groups
          guard, null groups excluded);
        - per-group empirical PMFs: ONE (group, floored-value)
          aggregation — map-side combined, the shuffle carries one row
          per (group, support point);
        - per-group samples: ONE ``sampleBy`` pass, truncated with the
          same value-based per-group-seeded convention;
        - ONE (group, distribution) fan-out; results address as
          ``column[group]``.
        """
        df = _ensure_spark_df(self.spark, df)
        cols_types = {f.name: f.dataType for f in df.schema.fields}
        if column not in cols_types:
            raise ValueError(f"column {column!r} not found in DataFrame")
        if not isinstance(cols_types[column], NumericType):
            raise TypeError(
                f"column {column!r} has non-numeric type "
                f"{cols_types[column].simpleString()}"
            )
        if group_col not in df.columns:
            raise ValueError(f"group column {group_col!r} not found")
        config = (config or FitterConfig()).with_(**kwargs) if kwargs else (
            config or FitterConfig()
        )
        if distributions:
            DistributionFitter._validate_names(self, distributions)
        from spark_bestfit_spark.operators.discrete_fit import (
            parallel_fit_discrete_columns,
        )
        from spark_bestfit_spark.operators.stats import valid_column

        clean = valid_column(df, column).filter(
            F.col(group_col).isNotNull()
        )
        counts = (
            clean.groupBy(group_col).agg(F.count("*").alias("n")).collect()
        )
        if not counts:
            return self._empty_results()
        if len(counts) > max_groups:
            raise ValueError(
                f"fit_grouped: {len(counts)} groups exceed "
                f"max_groups={max_groups}; the per-group PMFs and "
                "samples are driver-resident — aggregate or bucket the "
                "key first, or raise max_groups deliberately"
            )
        gcounts = {r[group_col]: int(r["n"]) for r in counts}
        target = config.fitting_sample_size
        # ONE stacked PMF pass over (group, floored value)
        pmf_rows = (
            clean.groupBy(group_col, F.floor(column).alias("_k"))
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        pmf_pairs: dict = {g: [] for g in gcounts}
        for r in pmf_rows:
            pmf_pairs[r[group_col]].append(
                (float(r["_k"]), float(r["cnt"]))
            )
        # ONE sampleBy pass for the fitting samples
        fractions = {
            g: min(1.0, (target * 1.3) / n) for g, n in gcounts.items()
        }
        pdf = (
            clean.select(group_col, column)
            .sampleBy(group_col, fractions, seed=config.random_seed)
            .toPandas()
        )
        samples_by_group: dict = {}
        for g, sub in pdf.groupby(group_col, sort=False):
            arr = np.floor(sub[column].to_numpy(dtype=np.float64))
            arr = arr[np.isfinite(arr)]
            samples_by_group[g] = _truncate_group_sample(
                arr, target, config.random_seed, g
            )
        names = distributions or self.registry.get_discrete_distributions(
            additional_exclusions=list(config.additional_exclusions)
        )
        if config.max_distributions is not None:
            names = names[: config.max_distributions]
        plans: dict = {}
        samples: dict = {}
        for g in gcounts:
            pairs = sorted(pmf_pairs.get(g, []))
            sample = samples_by_group.get(g)
            if not pairs or sample is None or sample.size < 2:
                continue
            x = np.array([p[0] for p in pairs])
            cnts = np.array([p[1] for p in pairs])
            label = f"{column}[{g}]"
            samples[label] = sample
            plans[label] = {
                "names": list(names),
                "sample": sample,
                "x_values": x,
                "pmf": cnts / cnts.sum(),
            }
        if not plans:
            return self._empty_results()
        result_df = parallel_fit_discrete_columns(
            self.spark, plans, config, self.registry
        )
        return FitResults(
            result_df, registry=self.registry, samples=samples
        )

    def plot(
        self, result, df=None, column=None,
        force_recompute: bool = False, ax=None,
    ):
        """Empirical-PMF bars + fitted-PMF stems, cached-sample-first
        (reference discrete_fitter.py:518 / plotting.py:735)."""
        from spark_bestfit_spark import plotting as P

        if not force_recompute and getattr(result, "_sample", None) is not None:
            if df is not None:
                warnings.warn(
                    "a cached fitting sample is available; df is ignored "
                    "— pass force_recompute=True to re-evaluate the "
                    "DataFrame",
                    FutureWarning,
                    stacklevel=2,
                )
            return P.plot_discrete_distribution(
                result, result._sample, ax=ax
            )
        if df is None:
            raise ValueError(
                "result has no cached sample (or force_recompute=True): "
                "pass the source df"
            )
        df = _ensure_spark_df(self.spark, df)
        col = column or result.column_name
        data = (
            df.select(col).dropna().limit(100_000).toPandas()[col]
            .to_numpy(dtype=np.float64)
        )
        return P.plot_discrete_distribution(result, data, ax=ax)

    def _empty_results(self) -> FitResults:
        from spark_bestfit_spark.operators.fit import FIT_RESULT_SCHEMA

        empty = self.spark.createDataFrame([], schema=FIT_RESULT_SCHEMA)
        return FitResults(empty, registry=self.registry, cache=False)
