"""run_stream_once: bounded drains of the real streaming engine, and
the final-emission selection used by the streaming_moments entry query
when a key emits once per micro-batch."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Window

from spark_bestfit_spark.streaming.run import run_stream_once
from spark_bestfit_spark.streaming.stateful import streaming_moments


def _write_batches(tmp_path, frames):
    src = tmp_path / "src"
    src.mkdir()
    for i, f in enumerate(frames):
        f.to_parquet(src / f"b{i}.parquet")
    return src


class TestRunStreamOnce:
    def test_append_drain_matches_input(self, spark, tmp_path):
        frames = [
            pd.DataFrame({"k": ["a", "b"], "v": [1.0, 2.0]}),
            pd.DataFrame({"k": ["c"], "v": [3.0]}),
        ]
        src = _write_batches(tmp_path, frames)
        stream = (
            spark.readStream.schema("k string, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = run_stream_once(stream, output_mode="append")
        got = sorted((r.k, r.v) for r in out.collect())
        assert got == [("a", 1.0), ("b", 2.0), ("c", 3.0)]

    def test_update_mode_final_emission_per_key(self, spark, tmp_path):
        # key "a" appears in both micro-batches -> two update emissions;
        # the max-n row per key (the entry query's selection rule) must
        # carry the cumulative, batch-boundary-independent moments
        frames = [
            pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 3.0, 10.0]}),
            pd.DataFrame({"k": ["a", "b"], "v": [5.0, 20.0]}),
        ]
        src = _write_batches(tmp_path, frames)
        stream = (
            spark.readStream.schema("k string, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = run_stream_once(
            streaming_moments(stream, "k", "v"), output_mode="update"
        )
        emissions = out.groupBy("key").count().collect()
        assert {r.key: r["count"] for r in emissions} == {"a": 2, "b": 2}

        last = Window.partitionBy("key").orderBy(F.desc("n"))
        final = (
            out.withColumn("_rn", F.row_number().over(last))
            .filter(F.col("_rn") == 1)
            .collect()
        )
        stats = {r.key: r for r in final}
        assert stats["a"].n == 3
        assert stats["a"].mean == 3.0
        assert stats["a"].min_v == 1.0 and stats["a"].max_v == 5.0
        assert stats["b"].n == 2
        assert stats["b"].mean == 15.0


class TestEnrichWithDimension:
    def test_streaming_enrichment_matches_batch_join(self, spark, tmp_path):
        from spark_bestfit_spark.streaming.enrich import enrich_with_dimension

        frames = [
            pd.DataFrame({"k": ["a", "b", "zz"], "v": [1.0, 2.0, 9.0]}),
            pd.DataFrame({"k": ["a", "c"], "v": [3.0, 4.0]}),
        ]
        src = _write_batches(tmp_path, frames)
        stream = (
            spark.readStream.schema("k string, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        dim = spark.createDataFrame(
            [("a", "north", 1), ("b", "south", 2), ("c", "north", 3)],
            "k string, region string, extra int",
        )
        enriched = enrich_with_dimension(
            stream, dim, on=["k"], dim_cols=["region"]
        )
        # dim_cols pruned the broadcast payload
        assert "extra" not in enriched.columns
        agg = enriched.groupBy("region").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("t")
        )
        out = run_stream_once(agg, output_mode="complete")
        got = sorted(
            ((r.region, r.n, r.t) for r in out.collect()),
            key=lambda t: (t[0] is not None, t),
        )
        # unmatched fact "zz" survives the left join with null region
        assert got == [
            (None, 1, 9.0), ("north", 3, 8.0), ("south", 1, 2.0)
        ]

    def test_broadcast_shape_and_validation(self, spark, tmp_path):
        import pytest

        from spark_bestfit_spark.streaming.enrich import enrich_with_dimension

        frames = [pd.DataFrame({"k": ["a"], "v": [1.0]})]
        src = _write_batches(tmp_path, frames)
        stream = (
            spark.readStream.schema("k string, v double").parquet(str(src))
        )
        dim = spark.createDataFrame([("a", "x")], "k string, region string")
        enriched = enrich_with_dimension(stream, dim, on=["k"])
        # logical plan carries the broadcast hint for every micro-batch
        assert "UnresolvedHint BROADCAST" in str(
            enriched._jdf.queryExecution().logical()
        ) or "ResolvedHint (strategy=broadcast)" in str(
            enriched._jdf.queryExecution().analyzed()
        )
        batch = spark.createDataFrame([("a", 1.0)], "k string, v double")
        with pytest.raises(ValueError, match="streaming"):
            enrich_with_dimension(batch, dim, on=["k"])
        with pytest.raises(ValueError, match="static"):
            enrich_with_dimension(stream, stream, on=["k"])
        with pytest.raises(ValueError, match="how"):
            enrich_with_dimension(stream, dim, on=["k"], how="outer")


class TestStreamStreamJoin:
    def test_time_bounded_join_matches_batch(self, spark, tmp_path):
        from spark_bestfit_spark.streaming.join import stream_stream_join

        def ts(minute):
            return pd.Timestamp(2024, 1, 1, 0, minute)

        def mk(col, rows):
            df = pd.DataFrame(rows)
            df[col] = df[col].astype("datetime64[us]")
            return df

        clicks = [
            mk("cts", {"k": ["a", "b"], "cts": [ts(0), ts(10)],
                       "cid": [1, 2]}),
            mk("cts", {"k": ["a"], "cts": [ts(40)], "cid": [3]}),
        ]
        buys = [
            mk("bts", {"k": ["a"], "bts": [ts(25)], "bid": [10]}),
            mk("bts", {"k": ["a", "b"], "bts": [ts(45), ts(50)],
                       "bid": [11, 12]}),
        ]
        (tmp_path / "c").mkdir()
        (tmp_path / "b").mkdir()
        csrc = _write_batches(tmp_path / "c", clicks)
        bsrc = _write_batches(tmp_path / "b", buys)
        cs = (
            spark.readStream.schema("k string, cts timestamp, cid long")
            .option("maxFilesPerTrigger", 1).parquet(str(csrc))
        )
        bs = (
            spark.readStream.schema("k string, bts timestamp, bid long")
            .option("maxFilesPerTrigger", 1).parquet(str(bsrc))
        )
        joined = stream_stream_join(
            cs, bs, on=["k"], left_ts="cts", right_ts="bts",
            max_delay="30 minutes", watermark="10 years",
        ).select("k", "cid", "bid")
        out = run_stream_once(joined, output_mode="append")
        got = sorted((r.k, r.cid, r.bid) for r in out.collect())
        # a: click@0 -> buy@25 (in 30m); click@40 -> buy@45
        # b: click@10 -> buy@50 is 40m out -> excluded
        assert got == [("a", 1, 10), ("a", 3, 11)]

    def test_validation(self, spark, tmp_path):
        import pytest

        from spark_bestfit_spark.streaming.join import stream_stream_join

        frames = [pd.DataFrame({"k": ["a"], "ts": [pd.Timestamp(2024, 1, 1)]})]
        (tmp_path / "v").mkdir()
        src = _write_batches(tmp_path / "v", frames)
        stream = (
            spark.readStream.schema("k string, ts timestamp")
            .parquet(str(src))
        )
        batch = spark.createDataFrame(
            [("a",)], "k string"
        )
        with pytest.raises(ValueError, match="streaming"):
            stream_stream_join(
                stream, batch, ["k"], "ts", "ts", "1 hour", "1 hour"
            )
        with pytest.raises(ValueError, match="key"):
            stream_stream_join(
                stream, stream, [], "ts", "ts", "1 hour", "1 hour"
            )
