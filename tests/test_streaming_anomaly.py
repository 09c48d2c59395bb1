"""Streaming rolling-anomaly detector: batch equivalence (in-order
streams must reproduce the batch rolling_stats scores exactly),
windowing behavior, and validation."""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.streaming.anomaly import streaming_rolling_anomaly


def _run_stream(spark, tmp_path, frames, **kwargs):
    src = tmp_path / "src"
    src.mkdir()
    base = time.time() - 100
    for i, pdf in enumerate(frames):
        p = src / f"batch_{i}.parquet"
        pdf.to_parquet(p)
        os.utime(p, (base + i, base + i))  # force mtime trigger order
    stream = (
        spark.readStream.schema("user_id long, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    out = streaming_rolling_anomaly(stream, **kwargs)
    name = f"anomaly_sink_{abs(hash(str(tmp_path))) % 10**8}"
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


class TestStreamingRollingAnomaly:
    def test_in_order_stream_matches_batch_rolling(self, spark, tmp_path):
        """Three ts-ordered micro-batches through the stateful detector
        must reproduce the batch rolling_stats scores row for row."""
        rng = np.random.default_rng(83)
        n, n_users = 360, 6
        pdf = pd.DataFrame({
            "user_id": rng.integers(0, n_users, n),
            "ts": np.arange(n, dtype="int64") * 10,  # unique, ordered
            "value": rng.normal(50.0, 8.0, n).round(3),
        })
        frames = [
            pdf.iloc[:120], pdf.iloc[120:240], pdf.iloc[240:],
        ]
        got = _run_stream(
            spark, tmp_path, frames,
            window=7, min_periods=3, z_threshold=2.0,
        )
        assert len(got) == n

        from spark_bestfit_spark.operators.asof import rolling_stats

        batch = rolling_stats(
            spark.createDataFrame(pdf), "value", "ts", "user_id",
            window=7, min_periods=3, with_zscore=True,
        ).toPandas()
        b = batch.set_index("ts")
        for _, r in got.iterrows():
            e = b.loc[r["ts"]]
            assert int(r["key"]) == e["user_id"]
            assert r["rolling_count"] == e["rolling_count"], r["ts"]
            for c in ("rolling_mean", "rolling_stddev", "rolling_z"):
                if pd.isna(e[c]):
                    assert pd.isna(r[c]), (r["ts"], c)
                else:
                    assert r[c] == pytest.approx(e[c], abs=2e-6), (
                        r["ts"], c,
                    )
            if not pd.isna(e["rolling_z"]):
                assert r["is_anomaly"] == (abs(e["rolling_z"]) >= 2.0)

    def test_state_carries_across_batches(self, spark, tmp_path):
        """The second batch's first row must be scored against a window
        populated by the FIRST batch (state survives the trigger)."""
        f1 = pd.DataFrame({
            "user_id": [1] * 6, "ts": [0, 10, 20, 30, 40, 50],
            "value": [10.0, 10.5, 9.5, 10.2, 10.1, 9.9],
        })
        f2 = pd.DataFrame({
            "user_id": [1], "ts": [60], "value": [30.0]  # clear outlier
        })
        got = _run_stream(
            spark, tmp_path, [f1, f2],
            window=10, min_periods=2, z_threshold=2.0,
        ).set_index("ts")
        # the outlier's window = the 6 first-batch values + itself:
        # state crossed the trigger boundary
        assert got.loc[60, "rolling_count"] == 7
        assert bool(got.loc[60, "is_anomaly"])
        assert not got.loc[50, "is_anomaly"]

    def test_validation(self, spark):
        df = (
            spark.readStream.format("rate").load()
            .selectExpr("1 AS user_id", "value AS ts",
                        "CAST(value AS DOUBLE) AS value")
        )
        with pytest.raises(ValueError, match="window"):
            streaming_rolling_anomaly(df, window=0)
        with pytest.raises(ValueError, match="min_periods"):
            streaming_rolling_anomaly(df, window=3, min_periods=9)
        with pytest.raises(ValueError, match="z_threshold"):
            streaming_rolling_anomaly(df, z_threshold=0)
