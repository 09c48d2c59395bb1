"""Tests for the stateful streaming moments operator: exact merge math
plus a real applyInPandasWithState run over a multi-batch file stream."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.streaming.stateful import (
    merge_moment_states,
    streaming_moments,
)


def _direct(x: np.ndarray) -> tuple:
    n = x.size
    mean = float(x.mean())
    d = x - mean
    return (
        n, mean, float(np.sum(d**2)), float(np.sum(d**3)),
        float(np.sum(d**4)), float(x.min()), float(x.max()),
    )


class TestMergeMath:
    def test_merge_equals_direct(self):
        rng = np.random.default_rng(42)
        a, b = rng.gamma(2, 2, 1500), rng.gamma(3, 1, 700)
        merged = merge_moment_states(_direct(a), _direct(b))
        direct = _direct(np.concatenate([a, b]))
        for got, want in zip(merged, direct):
            assert got == pytest.approx(want, rel=1e-9)

    def test_merge_chain_order_independent(self):
        rng = np.random.default_rng(0)
        chunks = [rng.normal(5, 2, n) for n in (100, 1, 5000, 37)]
        forward = _direct(chunks[0])
        for c in chunks[1:]:
            forward = merge_moment_states(forward, _direct(c))
        backward = _direct(chunks[-1])
        for c in reversed(chunks[:-1]):
            backward = merge_moment_states(backward, _direct(c))
        for got, want in zip(forward, backward):
            assert got == pytest.approx(want, rel=1e-8)

    def test_empty_side_identity(self):
        s = _direct(np.array([1.0, 2.0, 3.0]))
        empty = (0, 0.0, 0.0, 0.0, 0.0, float("inf"), float("-inf"))
        assert merge_moment_states(empty, s) == s
        assert merge_moment_states(s, empty) == s


class TestStreamingMoments:
    def test_multi_batch_stream_matches_batch_aggregate(
        self, spark, tmp_path
    ):
        rng = np.random.default_rng(42)
        src = tmp_path / "src"
        src.mkdir()
        frames = []
        for i in range(3):
            pdf = pd.DataFrame({
                "k": np.repeat(["a", "b"], 400),
                "v": np.concatenate([
                    rng.normal(10, 2, 400), rng.exponential(5, 400)
                ]),
            })
            frames.append(pdf)
            pdf.to_parquet(src / f"batch_{i}.parquet")
        stream = (
            spark.readStream.schema("k string, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = streaming_moments(stream, "k", "v")
        query = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("moments_sink")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        deadline = time.time() + 30
        while query.isActive and time.time() < deadline:
            time.sleep(0.5)
        assert not query.isActive

        all_rows = spark.sql(
            "SELECT * FROM moments_sink"
        ).toPandas()
        # last emitted row per key = cumulative stats over all batches
        final = (
            all_rows.sort_values("n").groupby("key").last().reset_index()
        )
        full = pd.concat(frames)
        for key in ("a", "b"):
            vals = full[full.k == key].v.to_numpy()
            row = final[final.key == key].iloc[0]
            assert row["n"] == len(vals)
            assert row["mean"] == pytest.approx(vals.mean(), rel=1e-9)
            assert row["stddev"] == pytest.approx(vals.std(), rel=1e-9)
            assert row["min_v"] == pytest.approx(vals.min())
            assert row["max_v"] == pytest.approx(vals.max())
            zc = (vals - vals.mean()) / vals.std()
            assert row["skewness"] == pytest.approx(
                float(np.mean(zc**3)), rel=1e-6, abs=1e-9
            )
            assert row["kurtosis"] == pytest.approx(
                float(np.mean(zc**4) - 3.0), rel=1e-6, abs=1e-9
            )
