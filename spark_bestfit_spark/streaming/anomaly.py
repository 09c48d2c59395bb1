"""Streaming per-entity rolling anomaly detection via
``applyInPandasWithState``.

The streaming twin of the batch :func:`~spark_bestfit_spark.operators.
asof.rolling_stats`: each entity carries the last ``window`` observed
values as keyed state (O(window) per key, the same bound the batch
row-frame gives), and every arriving row is scored against its
entity's trailing window — mean / stddev / z-score / anomaly flag —
then pushed into it. With rows arriving in timestamp order the
emitted scores are IDENTICAL to the batch operator's (pinned by the
equivalence test); out-of-order arrivals are scored against the
window as-of arrival, the standard online-detector semantics (use the
batch operator for exact retrospective scoring).

State is a plain double array (no timestamps retained): bounded,
serializable, and merge-free — each micro-batch appends its
ts-sorted rows and trims to the last ``window`` values.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "streaming_rolling_anomaly",
    "streaming_hampel",
    "streaming_cusum",
    "ANOMALY_SCHEMA",
    "HAMPEL_SCHEMA",
    "CUSUM_SCHEMA",
]

ANOMALY_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("rolling_count", LongType()),
        StructField("rolling_mean", DoubleType()),
        StructField("rolling_stddev", DoubleType()),
        StructField("rolling_z", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

_STATE_SCHEMA = "vals array<double>"


def streaming_rolling_anomaly(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: str = "user_id",
    window: int = 10,
    min_periods: int = 2,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Score each arriving row against its entity's trailing
    ``window`` values (current row INCLUDED — the batch
    :func:`rolling_stats` convention, so in-order streams reproduce
    the batch scores exactly): emits per row the window count, mean,
    sample stddev, z-score (null below ``min_periods`` rows or at
    zero stddev), and ``is_anomaly = |z| >= z_threshold``.

    Rows are processed in ``ts_col`` order WITHIN each micro-batch;
    ``ts_col`` must be numeric (the engine's epoch-nanos convention).
    Stats are rounded to 6 decimals, matching the batch operator.

    Usage::

        out = streaming_rolling_anomaly(stream, "value", "ts", "user_id")
        out.writeStream.outputMode("append")...
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if not 1 <= min_periods <= window:
        raise ValueError("min_periods must be in [1, window]")
    if z_threshold <= 0:
        raise ValueError("z_threshold must be positive")

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (vals,) = state.get if state.exists else ([],)
        buf = list(vals)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="stable")
            out = {c.name: [] for c in ANOMALY_SCHEMA.fields}
            for ts, v in zip(
                pdf[ts_col].to_numpy(), pdf[value_col].to_numpy()
            ):
                fv = float(v)
                if not np.isfinite(fv):
                    continue
                buf.append(fv)
                if len(buf) > window:
                    buf = buf[-window:]
                n = len(buf)
                out["key"].append(str(key[0]))
                out["ts"].append(int(ts))
                out["value"].append(fv)
                out["rolling_count"].append(n)
                if n >= min_periods:
                    arr = np.asarray(buf)
                    m = float(arr.mean())
                    s = float(arr.std(ddof=1)) if n > 1 else 0.0
                    z = (fv - m) / s if s > 0 else None
                    out["rolling_mean"].append(round(m, 6))
                    out["rolling_stddev"].append(round(s, 6))
                    out["rolling_z"].append(
                        round(z, 6) if z is not None else None
                    )
                    out["is_anomaly"].append(
                        z is not None and abs(z) >= z_threshold
                    )
                else:
                    out["rolling_mean"].append(None)
                    out["rolling_stddev"].append(None)
                    out["rolling_z"].append(None)
                    out["is_anomaly"].append(False)
            if out["key"]:
                yield pd.DataFrame(out)
        state.update((buf,))

    grouped = df.select(key_col, ts_col, value_col).groupBy(key_col)
    return grouped.applyInPandasWithState(
        update,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HAMPEL_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("hampel_count", LongType()),
        StructField("hampel_median", DoubleType()),
        StructField("hampel_mad", DoubleType()),
        StructField("hampel_score", DoubleType()),
        StructField("hampel_outlier", BooleanType()),
    ]
)


def _interp_median(arr: np.ndarray) -> float:
    """Interpolated median with the EXACT expression of the batch
    operator and its SQL oracle — ``v_lo + frac * (v_hi - v_lo)``,
    NOT numpy's ``(a + b) / 2`` (same value in exact math, different
    last-ulp float path)."""
    n = len(arr)
    pos = (n - 1) * 0.5
    lo = int(pos)
    frac = pos - lo
    hi = min(lo + 1, n - 1)
    return float(arr[lo] + frac * (arr[hi] - arr[lo]))


def streaming_hampel(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: str = "user_id",
    window: int = 10,
    n_sigmas: float = 3.0,
    min_periods: int = 3,
) -> DataFrame:
    """Streaming twin of the batch
    :func:`~spark_bestfit_spark.operators.asof.hampel_filter`: score
    each arriving row against the trailing-``window`` median and MAD
    of its own entity (current row INCLUDED, the batch convention —
    in-order streams reproduce the batch rows exactly, pinned by the
    equivalence test). Median/MAD are 50%-breakdown estimators, so a
    spike cannot inflate its own baseline the way the rolling-z
    detector's mean/stddev let it.

    Same O(window) keyed double-array state as
    :func:`streaming_rolling_anomaly`; both medians use the exact
    interpolation expression of the batch operator and its SQL
    oracle. Emits ``hampel_median/mad/score`` rounded to 6 (null
    below ``min_periods``; score null at zero MAD where
    ``hampel_outlier`` falls back to value != median).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if n_sigmas <= 0:
        raise ValueError("n_sigmas must be positive")
    if not 1 <= min_periods <= window:
        raise ValueError("min_periods must be in [1, window]")

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (vals,) = state.get if state.exists else ([],)
        buf = list(vals)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="stable")
            out = {c.name: [] for c in HAMPEL_SCHEMA.fields}
            for ts, v in zip(
                pdf[ts_col].to_numpy(), pdf[value_col].to_numpy()
            ):
                fv = float(v)
                if not np.isfinite(fv):
                    continue
                buf.append(fv)
                if len(buf) > window:
                    buf = buf[-window:]
                n = len(buf)
                out["key"].append(str(key[0]))
                out["ts"].append(int(ts))
                out["value"].append(fv)
                out["hampel_count"].append(n)
                if n >= min_periods:
                    arr = np.sort(np.asarray(buf))
                    med = _interp_median(arr)
                    mad = _interp_median(
                        np.sort(np.abs(arr - med))
                    )
                    out["hampel_median"].append(round(med, 6))
                    out["hampel_mad"].append(round(mad, 6))
                    if mad > 0:
                        score = abs(fv - med) / (1.4826 * mad)
                        out["hampel_score"].append(round(score, 6))
                        out["hampel_outlier"].append(
                            score > n_sigmas
                        )
                    else:
                        out["hampel_score"].append(None)
                        out["hampel_outlier"].append(fv != med)
                else:
                    out["hampel_median"].append(None)
                    out["hampel_mad"].append(None)
                    out["hampel_score"].append(None)
                    out["hampel_outlier"].append(None)
            yield pd.DataFrame(out)
        state.update((buf,))

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            HAMPEL_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("s_hi", DoubleType()),
        StructField("s_lo", DoubleType()),
        StructField("alarm", BooleanType()),
    ]
)

_CUSUM_STATE_SCHEMA = "s_hi double, s_lo double"


def streaming_cusum(
    df: DataFrame,
    target: float,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: str = "user_id",
    k: float = 0.5,
    h: float = 5.0,
    reset_on_alarm: bool = True,
) -> DataFrame:
    """Streaming tabular CUSUM control chart (Page 1954) — the
    real-time mean-shift detector beside the offline retrospective
    :func:`~spark_bestfit_spark.operators.events.cusum_changepoint`
    (that one LOCATES a past shift; this one fires DURING one, with
    O(1) keyed state):

        s_hi_t = max(0, s_hi_{t-1} + (x_t - target) - k)
        s_lo_t = max(0, s_lo_{t-1} - (x_t - target) - k)
        alarm when either side exceeds h (both reset to 0 on alarm
        when ``reset_on_alarm`` — the restart convention of control
        charts).

    ``target``/``k``/``h`` are in the metric's own units (classic
    choices: target = in-control mean, k = half the shift worth
    detecting, h ~ 4-5 sigma). State per key is TWO doubles — the
    cheapest stateful detector in the module. Statistics are rounded
    to 6; the recursion uses the exact operation order of the
    oracle's recursive CTE.
    """
    if k < 0 or h <= 0:
        raise ValueError("k must be >= 0 and h > 0")
    t0 = float(target)
    kk, hh = float(k), float(h)

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        s_hi, s_lo = state.get if state.exists else (0.0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="stable")
            out = {c.name: [] for c in CUSUM_SCHEMA.fields}
            for ts, v in zip(
                pdf[ts_col].to_numpy(), pdf[value_col].to_numpy()
            ):
                fv = float(v)
                if not np.isfinite(fv):
                    continue
                s_hi = max(0.0, s_hi + (fv - t0) - kk)
                s_lo = max(0.0, s_lo - (fv - t0) - kk)
                alarm = s_hi > hh or s_lo > hh
                out["key"].append(str(key[0]))
                out["ts"].append(int(ts))
                out["value"].append(fv)
                out["s_hi"].append(round(s_hi, 6))
                out["s_lo"].append(round(s_lo, 6))
                out["alarm"].append(alarm)
                if alarm and reset_on_alarm:
                    s_hi = s_lo = 0.0
            yield pd.DataFrame(out)
        state.update((s_hi, s_lo))

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            CUSUM_SCHEMA,
            _CUSUM_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
