"""Streaming Hampel spike filter: batch equivalence (in-order streams
must reproduce the batch hampel_filter rows exactly), spike detection
across micro-batch boundaries, and validation."""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.operators.asof import hampel_filter
from spark_bestfit_spark.streaming.anomaly import streaming_hampel


def _run_stream(spark, tmp_path, frames, **kwargs):
    src = tmp_path / "src"
    src.mkdir()
    base = time.time() - 100
    for i, pdf in enumerate(frames):
        p = src / f"batch_{i}.parquet"
        pdf.to_parquet(p)
        os.utime(p, (base + i, base + i))
    stream = (
        spark.readStream.schema("user_id long, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    out = streaming_hampel(stream, **kwargs)
    name = f"hampel_sink_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    deadline = time.time() + 30
    while q.isActive and time.time() < deadline:
        time.sleep(0.5)
    assert not q.isActive
    return spark.sql(f"SELECT * FROM {name}").toPandas()


class TestStreamingHampel:
    def test_in_order_stream_matches_batch(self, spark, tmp_path):
        rng = np.random.default_rng(29)
        n, n_users = 300, 5
        pdf = pd.DataFrame({
            "user_id": rng.integers(0, n_users, n),
            "ts": np.arange(n, dtype="int64") * 10,
            "value": rng.normal(20.0, 4.0, n).round(3),
        })
        frames = [pdf.iloc[:100], pdf.iloc[100:200], pdf.iloc[200:]]
        got = _run_stream(
            spark, tmp_path, frames,
            value_col="value", ts_col="ts", key_col="user_id",
            window=6, n_sigmas=3.0, min_periods=2,
        )
        batch = hampel_filter(
            spark.createDataFrame(pdf),
            "value", "ts", "user_id",
            window=6, n_sigmas=3.0, min_periods=2,
        ).toPandas()
        g = (
            got.assign(user_id=got.key.astype("int64"))
            .set_index("ts")
            .sort_index()
        )
        b = batch.set_index("ts").sort_index()
        assert len(g) == len(b)
        for col in ("hampel_median", "hampel_mad", "hampel_score"):
            pd.testing.assert_series_equal(
                g[col].astype("float64"),
                b[col].astype("float64"),
                check_names=False,
            )
        assert (
            g["hampel_outlier"].fillna("null").tolist()
            == b["hampel_outlier"].fillna("null").tolist()
        )

    def test_spike_flagged_across_batch_boundary(self, spark, tmp_path):
        # stable window filled in batch 1; the spike arrives as the
        # FIRST row of batch 2 — state must carry the window across
        rows1 = pd.DataFrame({
            "user_id": [1] * 6,
            "ts": np.arange(6, dtype="int64"),
            "value": [10.0, 10.1, 9.9, 10.0, 10.2, 9.8],
        })
        rows2 = pd.DataFrame({
            "user_id": [1] * 2,
            "ts": np.arange(6, 8, dtype="int64"),
            "value": [99.0, 10.0],
        })
        got = _run_stream(
            spark, tmp_path, [rows1, rows2],
            value_col="value", ts_col="ts", key_col="user_id",
            window=7, min_periods=3,
        ).set_index("ts")
        assert bool(got.loc[6, "hampel_outlier"]) is True
        assert not any(
            got.loc[t, "hampel_outlier"] for t in range(2, 6)
        )

    def test_validation(self, spark):
        df = spark.readStream.format("rate").load()
        with pytest.raises(ValueError):
            streaming_hampel(df, window=0)
        with pytest.raises(ValueError):
            streaming_hampel(df, n_sigmas=0)
        with pytest.raises(ValueError):
            streaming_hampel(df, window=5, min_periods=9)


from spark_bestfit_spark.streaming.anomaly import streaming_cusum  # noqa: E402


def _run_cusum(spark, tmp_path, frames, **kwargs):
    src = tmp_path / "src"
    src.mkdir()
    base = time.time() - 100
    for i, pdf in enumerate(frames):
        p = src / f"batch_{i}.parquet"
        pdf.to_parquet(p)
        os.utime(p, (base + i, base + i))
    stream = (
        spark.readStream.schema("user_id long, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    out = streaming_cusum(stream, **kwargs)
    name = f"cusum_sink_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    deadline = time.time() + 30
    while q.isActive and time.time() < deadline:
        time.sleep(0.5)
    assert not q.isActive
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def _cusum_brute(values, target, k, h, reset=True):
    s_hi = s_lo = 0.0
    out = []
    for v in values:
        s_hi = max(0.0, s_hi + (v - target) - k)
        s_lo = max(0.0, s_lo - (v - target) - k)
        alarm = s_hi > h or s_lo > h
        out.append((round(s_hi, 6), round(s_lo, 6), alarm))
        if alarm and reset:
            s_hi = s_lo = 0.0
    return out


class TestStreamingCusum:
    def test_matches_reference_recursion_across_batches(
        self, spark, tmp_path
    ):
        rng = np.random.default_rng(41)
        vals = np.round(rng.normal(10, 1, 120), 3)
        vals[60:80] += 4.0  # planted upward shift
        pdf = pd.DataFrame({
            "user_id": [1] * 120,
            "ts": np.arange(120, dtype="int64"),
            "value": vals,
        })
        frames = [pdf.iloc[:50], pdf.iloc[50:90], pdf.iloc[90:]]
        got = _run_cusum(
            spark, tmp_path, frames,
            target=10.0, value_col="value", ts_col="ts",
            key_col="user_id", k=0.5, h=8.0,
        ).sort_values("ts")
        want = _cusum_brute(vals, 10.0, 0.5, 8.0)
        assert list(
            zip(got.s_hi, got.s_lo, got.alarm)
        ) == want
        # the planted shift raises an alarm; the in-control head not
        assert not any(a for _, _, a in want[:55])
        assert any(a for _, _, a in want[60:85])

    def test_downward_shift_fires_low_side(self, spark, tmp_path):
        vals = [10.0] * 10 + [4.0] * 6
        pdf = pd.DataFrame({
            "user_id": [1] * len(vals),
            "ts": np.arange(len(vals), dtype="int64"),
            "value": vals,
        })
        got = _run_cusum(
            spark, tmp_path, [pdf],
            target=10.0, value_col="value", ts_col="ts",
            key_col="user_id", k=0.5, h=10.0,
        ).sort_values("ts")
        assert got.alarm.any()
        alarm_row = got[got.alarm].iloc[0]
        assert alarm_row.s_lo > 10.0 and alarm_row.s_hi == 0.0

    def test_validation(self, spark):
        df = spark.readStream.format("rate").load()
        with pytest.raises(ValueError):
            streaming_cusum(df, target=0.0, h=0)
        with pytest.raises(ValueError):
            streaming_cusum(df, target=0.0, k=-1)
