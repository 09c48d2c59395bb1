"""Streaming frequent items: exact-regime equivalence with the batch
GROUP BY, sketch-regime superset guarantee, and state carryover."""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.streaming.topk import streaming_frequent_items


def _run(spark, tmp_path, frames, **kwargs):
    src = tmp_path / "src"
    src.mkdir()
    base = time.time() - 100
    for i, pdf in enumerate(frames):
        p = src / f"b{i}.parquet"
        pdf.to_parquet(p)
        os.utime(p, (base + i, base + i))
    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    out = streaming_frequent_items(stream, "tok", **kwargs)
    name = f"freq_sink_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        out.writeStream.outputMode("update")
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


def _current_view(emitted):
    """Latest version per shard -> the live candidate sets."""
    last = emitted.groupby("shard")["version"].max()
    return emitted[
        emitted["version"].values
        == last.reindex(emitted["shard"]).values
    ]


class TestStreamingFrequentItems:
    def test_exact_regime_equals_batch_group_by(self, spark, tmp_path):
        """With k above the per-shard distinct count the sketch never
        reduces, so the final view's counts are EXACTLY the batch
        GROUP BY — across three micro-batches of state updates."""
        rng = np.random.default_rng(101)
        vocab = [f"w{i}" for i in range(200)]
        w = 1.0 / np.arange(1, 201) ** 1.2
        w /= w.sum()
        toks = rng.choice(vocab, 9000, p=w)
        frames = [
            pd.DataFrame({"tok": toks[i * 3000:(i + 1) * 3000]})
            for i in range(3)
        ]
        emitted = _run(spark, tmp_path, frames, k=512, n_shards=4)
        cur = _current_view(emitted)
        got = dict(zip(cur["item"], cur["cnt"]))
        exp = pd.Series(toks).value_counts()
        assert got == {i: int(c) for i, c in exp.items()}
        # shard totals sum to the full stream length
        assert (
            cur.groupby("shard")["shard_total"].first().sum() == len(toks)
        )

    def test_sketch_regime_keeps_heavy_hitters(self, spark, tmp_path):
        """k far below the vocabulary: the surviving candidates must
        still include every item above phi = 1/(k+1) per shard (the MG
        guarantee), with lower-bound counts."""
        import math

        rng = np.random.default_rng(103)
        vocab = [f"v{i}" for i in range(2000)]
        w = 1.0 / np.arange(1, 2001) ** 1.5
        w /= w.sum()
        toks = rng.choice(vocab, 20000, p=w)
        frames = [
            pd.DataFrame({"tok": toks[:10000]}),
            pd.DataFrame({"tok": toks[10000:]}),
        ]
        k = 64
        emitted = _run(spark, tmp_path, frames, k=k, n_shards=2)
        cur = _current_view(emitted)
        got = dict(zip(cur["item"], cur["cnt"]))
        exp = pd.Series(toks).value_counts()
        # per-shard guarantee -> any item with freq > N/(k+1) survives
        thresh = math.ceil(len(toks) / (k + 1))
        heavy = exp[exp > thresh]
        assert len(heavy) >= 5
        for item, c in heavy.items():
            assert item in got, item
            assert got[item] <= c  # lower bound, never overcount

    def test_validation(self, spark):
        df = (
            spark.readStream.format("rate").load()
            .selectExpr("CAST(value AS STRING) AS tok")
        )
        with pytest.raises(ValueError, match="k must"):
            streaming_frequent_items(df, "tok", k=0)
        with pytest.raises(ValueError, match="n_shards"):
            streaming_frequent_items(df, "tok", n_shards=0)
