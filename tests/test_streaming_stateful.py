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


class TestStreamingBinnedQuantiles:
    def test_final_emission_equals_batch_histogram(self, spark, tmp_path):
        import os
        import uuid

        from spark_bestfit_spark.streaming.stateful import (
            streaming_binned_quantiles,
        )

        rng = np.random.default_rng(201)
        vals = rng.gamma(3, 20, 2400)
        keys = rng.choice(["a", "b"], 2400)
        src = str(tmp_path / "src")
        os.makedirs(src)
        pdf = pd.DataFrame({"k": keys, "v": vals})
        for i in range(4):
            pdf.iloc[i * 600:(i + 1) * 600].to_parquet(
                os.path.join(src, f"b{i}.parquet"), index=False
            )
        static = spark.read.parquet(src)
        lo, hi, bins = 0.0, 300.0, 60
        sdf = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_binned_quantiles(
            sdf, "k", "v", lo=lo, hi=hi, bins=bins
        )
        name = "sq" + uuid.uuid4().hex[:6]
        out = (
            q.writeStream.format("memory").queryName(name)
            .outputMode("update").start()
        )
        out.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").toPandas()
        out.stop()
        final = rows.sort_values("n").groupby("key").last()
        width = (hi - lo) / bins
        for k in ("a", "b"):
            v = vals[keys == k]
            counts = np.zeros(bins + 2, dtype=int)
            idx = np.clip(
                np.floor((v - lo) / width).astype(int) + 1, 0, bins + 1
            )
            np.add.at(counts, idx, 1)
            n = int(counts.sum())
            assert int(final.loc[k, "n"]) == n

            def ref(qf):
                t, c = qf * n, 0
                for i, cnt in enumerate(counts):
                    if cnt and c + cnt >= t:
                        if i == 0:
                            return lo
                        if i == bins + 1:
                            return hi
                        return lo + (i - 1 + (t - c) / cnt) * width
                    c += cnt
                return hi

            for qf, col in [(0.25, "q_25"), (0.5, "q_50"),
                            (0.75, "q_75"), (0.95, "q_95")]:
                assert final.loc[k, col] == pytest.approx(
                    round(ref(qf), 6), abs=1e-6
                )

    def test_validation(self, spark):
        from spark_bestfit_spark.streaming.stateful import (
            streaming_binned_quantiles,
        )

        df = spark.createDataFrame([("a", 1.0)], "k string, v double")
        with pytest.raises(ValueError, match="bins"):
            streaming_binned_quantiles(df, "k", "v", 0, 1, bins=1)
        with pytest.raises(ValueError, match="hi"):
            streaming_binned_quantiles(df, "k", "v", 1, 1)
        with pytest.raises(ValueError, match="qs"):
            streaming_binned_quantiles(df, "k", "v", 0, 1, qs=(1.5,))
