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
