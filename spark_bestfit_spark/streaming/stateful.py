"""Stateful streaming statistics via ``applyInPandasWithState``.

``streaming_moments`` maintains exact running per-key moments (count,
mean, M2/M3/M4 central-moment accumulators -> stddev/skewness/kurtosis)
across micro-batches. The merge is the parallel Welford/Chan update, so
state is O(1) per key no matter how many rows stream through — the
streaming analogue of the engine's one-pass moment aggregates
(SURVEY A11/A12).

Emitted rows (outputMode="update") give the cumulative statistics per
key after each batch; downstream drift logic can re-fit or alert on
them without ever re-reading history.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["streaming_moments", "MOMENTS_SCHEMA", "merge_moment_states"]

MOMENTS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("stddev", DoubleType()),
        StructField("skewness", DoubleType()),
        StructField("kurtosis", DoubleType()),
        StructField("min_v", DoubleType()),
        StructField("max_v", DoubleType()),
    ]
)

_STATE_SCHEMA = (
    "n long, mean double, m2 double, m3 double, m4 double, "
    "min_v double, max_v double"
)


def _batch_moments(x: np.ndarray) -> tuple:
    n = x.size
    mean = float(x.mean())
    d = x - mean
    return (
        n, mean, float(np.sum(d**2)), float(np.sum(d**3)),
        float(np.sum(d**4)), float(x.min()), float(x.max()),
    )


def merge_moment_states(a: tuple, b: tuple) -> tuple:
    """Chan et al. parallel update of (n, mean, M2, M3, M4, min, max)."""
    n1, mean1, m2a, m3a, m4a, lo1, hi1 = a
    n2, mean2, m2b, m3b, m4b, lo2, hi2 = b
    if n1 == 0:
        return b
    if n2 == 0:
        return a
    n = n1 + n2
    delta = mean2 - mean1
    mean = mean1 + delta * n2 / n
    m2 = m2a + m2b + delta**2 * n1 * n2 / n
    m3 = (
        m3a + m3b
        + delta**3 * n1 * n2 * (n1 - n2) / n**2
        + 3.0 * delta * (n1 * m2b - n2 * m2a) / n
    )
    m4 = (
        m4a + m4b
        + delta**4 * n1 * n2 * (n1**2 - n1 * n2 + n2**2) / n**3
        + 6.0 * delta**2 * (n1**2 * m2b + n2**2 * m2a) / n**2
        + 4.0 * delta * (n1 * m3b - n2 * m3a) / n
    )
    return (n, mean, m2, m3, m4, min(lo1, lo2), max(hi1, hi2))


def _emit(key: str, state: tuple) -> pd.DataFrame:
    n, mean, m2, m3, m4, lo, hi = state
    if n > 1 and m2 > 0:
        var = m2 / n
        std = float(np.sqrt(var))
        skew = float((m3 / n) / var**1.5)
        kurt = float((m4 / n) / var**2 - 3.0)
    else:
        std, skew, kurt = 0.0, 0.0, 0.0
    return pd.DataFrame(
        [{
            "key": key, "n": int(n), "mean": float(mean), "stddev": std,
            "skewness": skew, "kurtosis": kurt,
            "min_v": float(lo), "max_v": float(hi),
        }]
    )


def streaming_moments(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Cumulative per-key moments over a stream.

    Usage::

        out = streaming_moments(stream_df, "event_type", "value")
        q = out.writeStream.outputMode("update").format("memory")...
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        acc = (
            tuple(state.get) if state.exists
            else (0, 0.0, 0.0, 0.0, 0.0, float("inf"), float("-inf"))
        )
        for pdf in pdfs:
            vals = pdf[value_col].to_numpy(dtype=np.float64)
            vals = vals[np.isfinite(vals)]
            if vals.size:
                acc = merge_moment_states(acc, _batch_moments(vals))
        state.update(acc)
        if acc[0] > 0:
            yield _emit(str(key[0]), acc)

    grouped = df.select(key_col, value_col).groupBy(key_col)
    return grouped.applyInPandasWithState(
        update,
        outputStructType=MOMENTS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_binned_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    qs: tuple = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Cumulative per-key approximate quantiles over a stream via a
    FIXED-bin histogram state — the mergeable-sketch pattern: the
    state is ``bins + 2`` counts over a pre-declared [lo, hi] range
    (bounds from yesterday's profile, the production convention), so
    merging micro-batches is pure addition and the FINAL emission is
    byte-identical to the batch histogram no matter how the stream
    was batched. Quantiles interpolate linearly inside the owning bin
    (the equi-width inverse-CDF read-off); out-of-range values land
    in the edge bins and estimates clamp to [lo, hi].

    State per key is O(bins) — bounded regardless of stream length —
    and the emission schema carries ``q_{pct}`` columns for each
    requested quantile plus the cumulative ``n``.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    if not qs or any(not 0 < q < 1 for q in qs):
        raise ValueError("qs must be fractions in (0, 1)")
    qs = tuple(float(q) for q in qs)
    width = (hi - lo) / bins
    qcols = [f"q_{int(round(q * 100)):02d}" for q in qs]
    out_schema = "key string, n long, " + ", ".join(
        f"{c} double" for c in qcols
    )
    state_schema = "counts array<long>"

    def _quantile(counts: "np.ndarray", n: int, q: float) -> float:
        target = q * n
        cum = 0.0
        for idx in range(len(counts)):
            c = int(counts[idx])
            if c == 0:
                continue
            if cum + c >= target:
                # bin 0 = below lo, bin i (1..bins) covers
                # [lo + (i-1) w, lo + i w), bin bins+1 = above hi
                if idx == 0:
                    return float(lo)
                if idx == len(counts) - 1:
                    return float(hi)
                frac = (target - cum) / c
                return float(lo + (idx - 1 + frac) * width)
            cum += c
        return float(hi)

    def update(key, pdfs, state):
        if state.exists:
            counts = np.array(tuple(state.get)[0], dtype=np.int64)
        else:
            counts = np.zeros(bins + 2, dtype=np.int64)
        for pdf in pdfs:
            vals = pdf[value_col].to_numpy(dtype=np.float64)
            vals = vals[np.isfinite(vals)]
            if not vals.size:
                continue
            idx = np.floor((vals - lo) / width).astype(np.int64) + 1
            idx = np.clip(idx, 0, bins + 1)
            idx[vals >= hi] = np.minimum(
                idx[vals >= hi], np.int64(bins + 1)
            )
            idx[vals < lo] = 0
            counts += np.bincount(idx, minlength=bins + 2).astype(
                np.int64
            )
        state.update((counts.tolist(),))
        n = int(counts.sum())
        if n > 0:
            row = {"key": str(key[0]), "n": n}
            for q, cname in zip(qs, qcols):
                row[cname] = round(_quantile(counts, n, q), 6)
            yield pd.DataFrame([row])

    grouped = df.select(key_col, value_col).groupBy(key_col)
    return grouped.applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
