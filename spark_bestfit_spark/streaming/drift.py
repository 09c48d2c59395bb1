"""Streaming drift detection (Spark-native version of the reference's
repeated-batch drift notebook).

Design: a reference model (a fitted ``DistributionFitResult``) is scored
against each micro-batch with the K-S statistic inside ``foreachBatch``.
The batch reduction uses the engine's own operators — histogram +
sample — so each micro-batch costs one scan of the batch, and the
driver-side state is a short drift history.

At scale: ``foreachBatch`` gives exactly-once batch semantics on any
streaming source (Kafka, files, Delta). The per-batch fit is the same
O(scan) + broadcast fan-out as the batch engine; watermarking/windowed
pre-aggregation can bound batch sizes upstream.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from spark_bestfit_spark.functions import metrics as M

__all__ = [
    "CertifiedDriftRecord",
    "CertifiedDriftMonitor",
    "GroupedCertifiedDriftRecord",
    "CertifiedDriftMonitorByGroup",
    "ks_drift_score",
    "w1_drift_score",
    "DriftRecord",
    "DriftMonitor",
]


def ks_drift_score(result, batch_values: np.ndarray) -> tuple:
    """(ks_statistic, pvalue) of a batch against a fitted model."""
    data = np.asarray(batch_values, dtype=np.float64)
    data = data[np.isfinite(data)]
    if data.size < 2:
        return float("nan"), float("nan")
    dist = result._dist()
    return M.compute_ks(dist, tuple(result.parameters), data)


def w1_drift_score(result, batch_values: np.ndarray) -> float:
    """1-Wasserstein distance of a batch against a fitted model — the
    magnitude leg of drift scoring (K-S reports the largest CDF gap;
    W1 reports HOW FAR the batch moved in the column's own units, so
    thresholds are interpretable: "alert when the distribution shifts
    by more than 2 dollars").

    Quantile-form estimator: ``W1 = integral_0^1 |Q_emp(u) -
    Q_model(u)| du ~= mean_i |x_(i) - ppf((i - 0.5) / n)|`` — one
    model-PPF evaluation over the sorted batch, no quadrature. NaN
    when fewer than 2 finite values."""
    data = np.asarray(batch_values, dtype=np.float64)
    data = np.sort(data[np.isfinite(data)])
    n = data.size
    if n < 2:
        return float("nan")
    try:
        dist = result._dist()
        q = np.asarray(
            dist.ppf((np.arange(1, n + 1) - 0.5) / n, *result.parameters),
            dtype=np.float64,
        )
        diffs = np.abs(data - q)
        diffs = diffs[np.isfinite(diffs)]
        return float(np.mean(diffs)) if diffs.size else float("inf")
    except Exception:  # noqa: BLE001
        return float("inf")


@dataclass
class DriftRecord:
    batch_id: int
    n_rows: int
    ks_statistic: float
    pvalue: float
    drifted: bool
    timestamp: float = field(default_factory=time.time)
    w1: float = float("nan")


class DriftMonitor:
    """foreachBatch drift monitor.

    Usage::

        monitor = DriftMonitor(reference_result, column="value",
                               ks_threshold=0.1)
        query = (df.writeStream
                   .foreachBatch(monitor)
                   .outputMode("update").start())
        ...
        monitor.history      # list[DriftRecord]
        monitor.drift_count

    The monitor object is the foreachBatch callable; it samples each
    micro-batch down to ``max_batch_sample`` rows (one job per batch),
    scores K-S against the reference model, and keeps a bounded history.
    An optional ``on_drift`` callback fires on threshold violations.
    """

    def __init__(
        self,
        reference_result,
        column: str,
        ks_threshold: float = 0.1,
        min_pvalue: float | None = None,
        max_batch_sample: int = 10_000,
        on_drift=None,
        max_history: int = 1000,
        w1_threshold: float | None = None,
    ):
        self.reference = reference_result
        self.column = column
        self.ks_threshold = ks_threshold
        self.min_pvalue = min_pvalue
        self.w1_threshold = w1_threshold
        self.max_batch_sample = max_batch_sample
        self.on_drift = on_drift
        self.max_history = max_history
        self.history: list = []

    # foreachBatch entry point ------------------------------------------
    def __call__(self, batch_df, batch_id: int) -> None:
        import pyspark.sql.functions as F

        clean = batch_df.select(self.column).filter(
            F.col(self.column).isNotNull()
        )
        n = clean.count()
        if n == 0:
            return
        if n > self.max_batch_sample:
            frac = min(1.0, (self.max_batch_sample * 1.2) / n)
            clean = clean.sample(fraction=frac, seed=42)
        values = clean.toPandas()[self.column].to_numpy(dtype=np.float64)
        ks, p = ks_drift_score(self.reference, values)
        w1 = w1_drift_score(self.reference, values)
        drifted = False
        if np.isfinite(ks) and ks > self.ks_threshold:
            drifted = True
        if (
            self.min_pvalue is not None
            and np.isfinite(p)
            and p < self.min_pvalue
        ):
            drifted = True
        if (
            self.w1_threshold is not None
            and np.isfinite(w1)
            and w1 > self.w1_threshold
        ):
            drifted = True
        record = DriftRecord(
            batch_id=int(batch_id),
            n_rows=int(n),
            ks_statistic=float(ks),
            pvalue=float(p),
            drifted=drifted,
            w1=float(w1),
        )
        self.history.append(record)
        if len(self.history) > self.max_history:
            del self.history[: len(self.history) - self.max_history]
        if drifted and self.on_drift is not None:
            try:
                self.on_drift(record)
            except Exception:  # noqa: BLE001 — user callback must not kill the query
                pass

    # ------------------------------------------------------------- queries
    @property
    def drift_count(self) -> int:
        return sum(1 for r in self.history if r.drifted)

    @property
    def last(self):
        return self.history[-1] if self.history else None

    def summary(self) -> dict:
        ks_vals = [
            r.ks_statistic for r in self.history
            if np.isfinite(r.ks_statistic)
        ]
        w1_vals = [r.w1 for r in self.history if np.isfinite(r.w1)]
        return {
            "n_batches": len(self.history),
            "n_drifted": self.drift_count,
            "ks_mean": float(np.mean(ks_vals)) if ks_vals else None,
            "ks_max": float(np.max(ks_vals)) if ks_vals else None,
            "w1_mean": float(np.mean(w1_vals)) if w1_vals else None,
            "w1_max": float(np.max(w1_vals)) if w1_vals else None,
        }


@dataclass
class CertifiedDriftRecord:
    batch_id: int
    n_rows: int
    n_out_of_range: int
    d_batch: float
    d_cum: float
    err_bound: float
    w1_batch: float
    w1_cum: float
    w1_err_bound: float
    drifted: bool
    timestamp: float = field(default_factory=time.time)


class CertifiedDriftMonitor:
    """foreachBatch TWO-SAMPLE drift monitor with the batch engine's
    certified-approximation guarantees — the streaming twin of
    ``two_sample_ks_approx_df`` / ``wasserstein_approx_df``: instead
    of scoring micro-batches against a fitted model on a driver-side
    SAMPLE (:class:`DriftMonitor`), it scores the stream against a
    REFERENCE CORPUS on the deterministic equi-width grid, fully
    distributed per batch, with the same certificates.

    Construction pays two bounded reference jobs ONCE: a stats scan
    fixes the grid ([lo, hi] from the reference — a stream has no
    global bounds to derive one from), and a map-combinable bucket
    aggregation collapses the reference to a ``grid_size`` count
    vector (the only driver state besides the stream's own count
    vector — grid counts are ADDITIVE, so per-batch accumulation is
    exact, order-independent, and restart-mergeable, the
    ``kn_merge_counts`` convention).

    Per micro-batch: one map-combinable aggregation over the batch
    (never a driver-side sample), then O(grid) numpy on the driver.
    Emitted per batch, for both the batch alone and the stream so
    far: the K-S lower bound ``d`` with its certificate
    ``d <= D_exact <= d + err_bound`` (err = max per-bucket combined
    mass, computed from the same counts) and the grid W1 with its
    data-independent ``2(hi-lo)/grid_size`` bound.

    Out-of-range stream values clamp into the edge buckets (the grid
    is frozen from the reference); the certificates then cover the
    CLAMPED distributions, so the monitor also reports
    ``n_out_of_range`` per batch — mass leaving the reference's range
    is itself a loud drift signal (and ``oor_fraction_threshold``
    can alert on it directly).
    """

    def __init__(
        self,
        reference,
        column: str,
        grid_size: int = 2048,
        d_threshold: float | None = 0.1,
        w1_threshold: float | None = None,
        oor_fraction_threshold: float | None = None,
        on_drift=None,
        max_history: int = 1000,
    ):
        import pyspark.sql.functions as F

        self.column = column
        self.grid_size = int(grid_size)
        self.d_threshold = d_threshold
        self.w1_threshold = w1_threshold
        self.oor_fraction_threshold = oor_fraction_threshold
        self.on_drift = on_drift
        self.max_history = max_history
        self.history: list = []

        clean = reference.select(F.col(column).alias("v")).filter(
            F.col("v").isNotNull()
            & ~F.isnan("v")
            & (F.abs(F.col("v")) != float("inf"))
        )
        stats = clean.agg(
            F.min("v").alias("lo"), F.max("v").alias("hi"),
            F.count("v").alias("n"),
        ).first()
        if not stats["n"] or stats["hi"] <= stats["lo"]:
            raise ValueError(
                "CertifiedDriftMonitor needs a reference with at least"
                " two distinct finite values to fix the grid"
            )
        self.lo, self.hi = float(stats["lo"]), float(stats["hi"])
        self.width = (self.hi - self.lo) / self.grid_size
        self.ref_counts = self._bucket_counts(clean)
        self.ref_n = int(self.ref_counts.sum())
        self.stream_counts = np.zeros(self.grid_size, dtype=np.int64)
        self.total_out_of_range = 0

    # ------------------------------------------------------- internals
    def _bucket_counts(self, clean_df) -> np.ndarray:
        """Map-combinable (bucket -> count) agg; <= grid_size rows
        cross the driver boundary. Same floor arithmetic as the batch
        tier, with out-of-range values clamped to the edge buckets."""
        import pyspark.sql.functions as F

        g = self.grid_size
        bk = F.greatest(
            F.least(
                F.floor(
                    (F.col("v") - F.lit(self.lo)) / F.lit(self.width)
                ).cast("long"),
                F.lit(g - 1),
            ),
            F.lit(0),
        )
        rows = clean_df.groupBy(bk.alias("bk")).count().collect()
        out = np.zeros(g, dtype=np.int64)
        for r in rows:
            out[int(r["bk"])] = int(r["count"])
        return out

    def _scores(self, counts: np.ndarray) -> tuple:
        """(d, err, w1, w1_err) of a stream count vector vs the
        reference, on the shared grid — exact O(grid) numpy replay of
        the batch tier's window arithmetic (dense arrays make the
        empty-run handling implicit)."""
        n = counts.sum()
        if n == 0:
            return float("nan"), float("nan"), float("nan"), float("nan")
        fa = np.cumsum(self.ref_counts) / float(self.ref_n)
        fb = np.cumsum(counts) / float(n)
        gaps = np.abs(fa - fb)
        d = float(gaps.max())
        err = float(
            (
                self.ref_counts / float(self.ref_n)
                + counts / float(n)
            ).max()
        )
        w1 = float((gaps * self.width).sum())
        w1_err = 2.0 * (self.hi - self.lo) / self.grid_size
        return d, err, w1, w1_err

    # ------------------------------------------- foreachBatch entry
    def __call__(self, batch_df, batch_id: int) -> None:
        import pyspark.sql.functions as F

        clean = batch_df.select(
            F.col(self.column).alias("v")
        ).filter(
            F.col("v").isNotNull()
            & ~F.isnan("v")
            & (F.abs(F.col("v")) != float("inf"))
        )
        batch_counts = self._bucket_counts(clean)
        n = int(batch_counts.sum())
        if n == 0:
            return
        oor = clean.filter(
            (F.col("v") < self.lo) | (F.col("v") > self.hi)
        ).count()
        self.stream_counts += batch_counts
        self.total_out_of_range += int(oor)
        d_b, err_b, w1_b, _ = self._scores(batch_counts)
        d_c, err_c, w1_c, w1_err = self._scores(self.stream_counts)
        err = max(err_b, err_c)
        drifted = False
        if self.d_threshold is not None and (
            d_b > self.d_threshold or d_c > self.d_threshold
        ):
            drifted = True
        if self.w1_threshold is not None and (
            w1_b > self.w1_threshold or w1_c > self.w1_threshold
        ):
            drifted = True
        if (
            self.oor_fraction_threshold is not None
            and oor / n > self.oor_fraction_threshold
        ):
            drifted = True
        record = CertifiedDriftRecord(
            batch_id=int(batch_id),
            n_rows=n,
            n_out_of_range=int(oor),
            d_batch=d_b,
            d_cum=d_c,
            err_bound=err,
            w1_batch=w1_b,
            w1_cum=w1_c,
            w1_err_bound=w1_err,
            drifted=drifted,
        )
        self.history.append(record)
        if len(self.history) > self.max_history:
            del self.history[: len(self.history) - self.max_history]
        if drifted and self.on_drift is not None:
            try:
                self.on_drift(record)
            except Exception:  # noqa: BLE001 — user callback must not kill the query
                pass

    # ------------------------------------------------------- queries
    def cumulative(self) -> dict:
        """Certified scores of the WHOLE stream drained so far vs the
        reference — a pure function of the additive count vector, so
        (unlike the per-batch history) it is independent of how the
        source happened to split into micro-batches: the right surface
        to assert in tests and to checkpoint for restart-merging."""
        d, err, w1, w1_err = self._scores(self.stream_counts)
        return {
            "n_rows": int(self.stream_counts.sum()),
            "n_out_of_range": int(self.total_out_of_range),
            "d_stat": d,
            "err_bound": err,
            "w1": w1,
            "w1_err_bound": w1_err,
        }

    def quantiles(self, qs=(0.25, 0.5, 0.75)) -> list:
        """Certified-approximate quantiles of the WHOLE stream drained
        so far, straight from the additive grid count vector — the
        streaming twin of
        :func:`~spark_bestfit_spark.operators.stats.quantiles_approx_certified`,
        at ZERO extra cost (no Spark job: the state the drift scores
        already maintain is exactly the grid ECDF). Same inversion,
        same certificate: the true lower-edge quantile of the CLAMPED
        stream lies in ``[lo_edge, hi_edge]``, ``err_bound`` = one
        grid cell. With ``n_out_of_range > 0`` the clamp moves edge
        mass into the boundary buckets, so quantiles landing in the
        first/last bucket inherit the clamp — check
        ``total_out_of_range`` before trusting extreme quantiles
        (interior quantiles are unaffected: clamping never reorders
        interior bucket boundaries).

        Returns a list of dicts
        ``{q, value, lo_edge, hi_edge, err_bound, n}`` (empty stream →
        empty list); pytest pins agreement with the batch tier on the
        union of drained batches.
        """
        for q in qs:
            if not 0 < q <= 1:
                raise ValueError("quantiles must be in (0, 1]")
        n = int(self.stream_counts.sum())
        if n == 0:
            return []
        cum = np.cumsum(self.stream_counts)
        out = []
        for q in qs:
            b = int(np.searchsorted(cum, q * n, side="left"))
            lo_e = self.lo + b * self.width
            hi_e = self.lo + (b + 1) * self.width
            out.append(
                {
                    "q": float(q),
                    "value": round((lo_e + hi_e) / 2, 6),
                    "lo_edge": round(lo_e, 6),
                    "hi_edge": round(hi_e, 6),
                    "err_bound": round(hi_e - lo_e, 6),
                    "n": n,
                }
            )
        return out

    @property
    def drift_count(self) -> int:
        return sum(1 for r in self.history if r.drifted)

    @property
    def last(self):
        return self.history[-1] if self.history else None


@dataclass
class GroupedCertifiedDriftRecord:
    batch_id: int
    group: str
    n_rows: int
    n_out_of_range: int
    d_batch: float
    d_cum: float
    err_bound: float
    w1_batch: float
    w1_cum: float
    w1_err_bound: float
    drifted: bool
    timestamp: float = field(default_factory=time.time)


class CertifiedDriftMonitorByGroup:
    """Per-segment :class:`CertifiedDriftMonitor` — one certified
    two-sample drift check PER GROUP (the per-language / per-domain
    production shape), all fed by ONE map-combinable (group, bucket)
    aggregation per micro-batch.

    Each group gets its own grid frozen from its own reference slice
    (per-group [lo, hi] and counts collected once at construction —
    driver state is groups x grid_size ints, the bounded-sketch
    convention: groups are languages/domains, not data). Per batch,
    every monitored group present emits a
    :class:`GroupedCertifiedDriftRecord` with its own batch and
    cumulative certificates; out-of-range mass clamps into the
    group's edge buckets and is reported per group.

    Batch rows whose group has no (two-distinct-valued) reference
    slice cannot be scored — they are counted in
    ``unmonitored_rows`` per group (a loud signal: a NEW segment
    appeared in the stream), never silently dropped.
    """

    def __init__(
        self,
        reference,
        column: str,
        group_col: str,
        grid_size: int = 2048,
        d_threshold: float | None = 0.1,
        w1_threshold: float | None = None,
        oor_fraction_threshold: float | None = None,
        on_drift=None,
        max_history: int = 10_000,
    ):
        import pyspark.sql.functions as F

        self.column = column
        self.group_col = group_col
        self.grid_size = int(grid_size)
        self.d_threshold = d_threshold
        self.w1_threshold = w1_threshold
        self.oor_fraction_threshold = oor_fraction_threshold
        self.on_drift = on_drift
        self.max_history = max_history
        self.history: list = []
        self.unmonitored_rows: dict = {}

        clean = self._clean(reference)
        bounds = {
            r["g"]: (float(r["lo"]), float(r["hi"]))
            for r in clean.groupBy("g")
            .agg(
                F.min("v").alias("lo"), F.max("v").alias("hi"),
                F.count("v").alias("n"),
            )
            .collect()
            if r["n"] and r["hi"] > r["lo"]
        }
        if not bounds:
            raise ValueError(
                "CertifiedDriftMonitorByGroup: no group in the"
                " reference has two distinct finite values"
            )
        self.bounds = bounds
        self.ref_counts = self._bucket_counts(clean)
        self.ref_n = {g: int(c.sum()) for g, c in self.ref_counts.items()}
        self.stream_counts = {
            g: np.zeros(self.grid_size, dtype=np.int64) for g in bounds
        }
        self.total_out_of_range = {g: 0 for g in bounds}

    def _clean(self, df):
        import pyspark.sql.functions as F

        return df.select(
            F.col(self.group_col).cast("string").alias("g"),
            F.col(self.column).alias("v"),
        ).filter(
            F.col("g").isNotNull()
            & F.col("v").isNotNull()
            & ~F.isnan("v")
            & (F.abs(F.col("v")) != float("inf"))
        )

    def _bucket_counts(self, clean_df) -> dict:
        """One (group, bucket) map-combinable agg; <= groups x grid
        rows cross the driver boundary. Per-group clamped floor
        bucketing on each group's own frozen grid."""
        import pyspark.sql.functions as F

        g = self.grid_size
        lo = F.create_map(
            *[x for gk, (l, h) in self.bounds.items()
              for x in (F.lit(gk), F.lit(l))]
        )[F.col("g")]
        hi = F.create_map(
            *[x for gk, (l, h) in self.bounds.items()
              for x in (F.lit(gk), F.lit(h))]
        )[F.col("g")]
        bk = F.greatest(
            F.least(
                F.floor(
                    (F.col("v") - lo) / ((hi - lo) / F.lit(float(g)))
                ).cast("long"),
                F.lit(g - 1),
            ),
            F.lit(0),
        )
        rows = (
            clean_df.withColumn("_lo", lo)
            .withColumn("bk", F.when(lo.isNotNull(), bk))
            .groupBy("g", "bk")
            .count()
            .collect()
        )
        out: dict = {}
        unmon: dict = {}
        for r in rows:
            if r["bk"] is None:
                unmon[r["g"]] = unmon.get(r["g"], 0) + int(r["count"])
                continue
            arr = out.setdefault(
                r["g"], np.zeros(g, dtype=np.int64)
            )
            arr[int(r["bk"])] = int(r["count"])
        self._last_unmonitored = unmon
        return out

    def _scores(self, group: str, counts: np.ndarray) -> tuple:
        n = counts.sum()
        if n == 0:
            return (float("nan"),) * 4
        lo, hi = self.bounds[group]
        ref = self.ref_counts[group]
        rn = self.ref_n[group]
        fa = np.cumsum(ref) / float(rn)
        fb = np.cumsum(counts) / float(n)
        gaps = np.abs(fa - fb)
        width = (hi - lo) / self.grid_size
        return (
            float(gaps.max()),
            float((ref / float(rn) + counts / float(n)).max()),
            float((gaps * width).sum()),
            2.0 * (hi - lo) / self.grid_size,
        )

    # ------------------------------------------- foreachBatch entry
    def __call__(self, batch_df, batch_id: int) -> None:
        import pyspark.sql.functions as F

        clean = self._clean(batch_df)
        per_group = self._bucket_counts(clean)
        for gk, n in self._last_unmonitored.items():
            self.unmonitored_rows[gk] = (
                self.unmonitored_rows.get(gk, 0) + n
            )
        oor_rows = {
            r["g"]: int(r["n"])
            for r in clean.groupBy("g").agg(
                F.sum(
                    (
                        (F.col("v") < F.create_map(
                            *[x for gk, (l, h) in self.bounds.items()
                              for x in (F.lit(gk), F.lit(l))]
                        )[F.col("g")])
                        | (F.col("v") > F.create_map(
                            *[x for gk, (l, h) in self.bounds.items()
                              for x in (F.lit(gk), F.lit(h))]
                        )[F.col("g")])
                    ).cast("long")
                ).alias("n")
            ).collect()
            if r["n"] is not None
        }
        for gk in sorted(per_group):
            if gk not in self.bounds:
                continue
            counts = per_group[gk]
            n = int(counts.sum())
            if n == 0:
                continue
            oor = int(oor_rows.get(gk, 0))
            self.stream_counts[gk] += counts
            self.total_out_of_range[gk] += oor
            d_b, err_b, w1_b, _ = self._scores(gk, counts)
            d_c, err_c, w1_c, w1_err = self._scores(
                gk, self.stream_counts[gk]
            )
            drifted = False
            if self.d_threshold is not None and (
                d_b > self.d_threshold or d_c > self.d_threshold
            ):
                drifted = True
            if self.w1_threshold is not None and (
                w1_b > self.w1_threshold or w1_c > self.w1_threshold
            ):
                drifted = True
            if (
                self.oor_fraction_threshold is not None
                and oor / n > self.oor_fraction_threshold
            ):
                drifted = True
            record = GroupedCertifiedDriftRecord(
                batch_id=int(batch_id),
                group=gk,
                n_rows=n,
                n_out_of_range=oor,
                d_batch=d_b,
                d_cum=d_c,
                err_bound=max(err_b, err_c),
                w1_batch=w1_b,
                w1_cum=w1_c,
                w1_err_bound=w1_err,
                drifted=drifted,
            )
            self.history.append(record)
            if drifted and self.on_drift is not None:
                try:
                    self.on_drift(record)
                except Exception:  # noqa: BLE001 — user callback must not kill the query
                    pass
        if len(self.history) > self.max_history:
            del self.history[: len(self.history) - self.max_history]

    # ------------------------------------------------------- queries
    def cumulative(self) -> dict:
        """{group: certified scores of the whole stream so far} — a
        pure function of the additive per-group count vectors
        (batching-invariant, restart-mergeable)."""
        out = {}
        for gk in sorted(self.bounds):
            d, err, w1, w1_err = self._scores(
                gk, self.stream_counts[gk]
            )
            out[gk] = {
                "n_rows": int(self.stream_counts[gk].sum()),
                "n_out_of_range": int(self.total_out_of_range[gk]),
                "d_stat": d,
                "err_bound": err,
                "w1": w1,
                "w1_err_bound": w1_err,
            }
        return out

    @property
    def drift_count(self) -> int:
        return sum(1 for r in self.history if r.drifted)
