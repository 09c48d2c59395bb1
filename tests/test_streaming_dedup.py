"""Streaming exact dedup: duplicate documents across micro-batches must
be dropped; the fingerprint matches the batch dedup tier."""

from __future__ import annotations

import time

import pandas as pd
import pytest

from spark_bestfit_spark.streaming.dedup import (
    fingerprint_column,
    streaming_exact_dedup,
)


def _frames():
    def mk(rows, t0):
        df = pd.DataFrame(rows, columns=["doc_id", "text"])
        df["ts"] = pd.to_datetime(t0).to_datetime64().astype("datetime64[us]")
        return df

    b0 = mk(
        [
            (0, "the quick brown fox"),
            (1, "a different document entirely"),
            (2, "The  Quick   Brown fox"),  # dup of 0 modulo whitespace/case
        ],
        "2024-01-01 00:00:00",
    )
    b1 = mk(
        [
            (3, "the quick brown fox"),      # dup of 0, later batch
            (4, "yet another novel text"),
        ],
        "2024-01-01 00:05:00",
    )
    return [b0, b1]


class TestStreamingDedup:
    def test_fingerprint_matches_batch_normalization(self, spark):
        df = spark.createDataFrame(
            [("a  b c",), ("A B  C",)], "text string"
        ).select(fingerprint_column("text").alias("fp"))
        fps = [r.fp for r in df.collect()]
        assert fps[0] == fps[1]

    def test_unbounded_dedup_across_batches(self, spark, tmp_path):
        src = tmp_path / "dsrc"
        src.mkdir()
        frames = _frames()
        frames[0].to_parquet(src / "b0.parquet", index=False)

        stream = spark.readStream.schema(
            "doc_id long, text string, ts timestamp"
        ).parquet(str(src))
        out = streaming_exact_dedup(stream, "text")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_sink")
            .option("checkpointLocation", str(tmp_path / "dckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            frames[1].to_parquet(src / "b1.parquet", index=False)
            time.sleep(0.2)
            q.processAllAvailable()
            got = {
                r.doc_id
                for r in spark.sql("select * from dedup_sink").collect()
            }
        finally:
            q.stop()
        # 2 is a whitespace/case dup of 0 inside batch 0; 3 is a dup of 0
        # arriving in batch 1 — both dropped by the unbounded state
        assert 0 in got and 1 in got and 4 in got
        assert 2 not in got and 3 not in got

    def test_watermarked_dedup_requires_event_time(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="event_time_col"):
            streaming_exact_dedup(df, "text", watermark="10 minutes")

    def test_watermarked_dedup_within_horizon(self, spark, tmp_path):
        src = tmp_path / "wsrc"
        src.mkdir()
        frames = _frames()
        frames[0].to_parquet(src / "b0.parquet", index=False)

        stream = spark.readStream.schema(
            "doc_id long, text string, ts timestamp"
        ).parquet(str(src))
        out = streaming_exact_dedup(
            stream, "text", event_time_col="ts", watermark="30 minutes"
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("wdedup_sink")
            .option("checkpointLocation", str(tmp_path / "wckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            frames[1].to_parquet(src / "b1.parquet", index=False)
            time.sleep(0.2)
            q.processAllAvailable()
            got = {
                r.doc_id
                for r in spark.sql("select * from wdedup_sink").collect()
            }
        finally:
            q.stop()
        # batch-1 dup (doc 3) is within the 30-minute horizon of doc 0
        assert 2 not in got and 3 not in got
        assert {0, 1, 4} <= got


class TestStreamingMinhashDedup:
    def test_near_dups_dropped_across_batches(self, spark, tmp_path):
        import os
        import time

        import pandas as pd

        from spark_bestfit_spark.streaming.dedup import (
            streaming_minhash_dedup,
        )
        from spark_bestfit_spark.streaming.run import run_stream_once

        base = "the quick brown fox jumps over the lazy dog again"
        b0 = pd.DataFrame(
            {"doc_id": [0, 1], "text": [base, "totally different words"]}
        )
        # batch 2: case/whitespace near-dup of doc 0 (same shingle set
        # after normalization -> same signature) + one new doc
        b1 = pd.DataFrame(
            {
                "doc_id": [2, 3],
                "text": [
                    "The  QUICK brown fox jumps over the lazy dog again",
                    "yet another brand new document body",
                ],
            }
        )
        src = tmp_path / "mh_src"
        src.mkdir()
        t0 = time.time() - 100
        for i, f in enumerate((b0, b1)):
            p = src / f"b{i}.parquet"
            f.to_parquet(p)
            os.utime(p, (t0 + 10 * i, t0 + 10 * i))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = run_stream_once(
            streaming_minhash_dedup(stream, keep_signature=True),
            output_mode="append",
        )
        rows = sorted(r.doc_id for r in out.collect())
        # doc 2's signature equals doc 0's -> dropped; 3 survives
        assert rows == [0, 1, 3]

    def test_matches_batch_distinct_signatures(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.dedup import (
            minhash_signature_col,
        )
        from spark_bestfit_spark.streaming.dedup import (
            streaming_minhash_dedup,
        )
        from spark_bestfit_spark.streaming.run import run_stream_once

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        src = tmp_path / "mh_docs"
        docs.repartition(3).write.parquet(str(src))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = run_stream_once(
            streaming_minhash_dedup(stream, keep_signature=True),
            output_mode="append",
        )
        streamed_sigs = sorted(r["_sig"] for r in out.collect())
        batch_sigs = sorted(
            r["s"]
            for r in docs.select(
                F.concat_ws("-", minhash_signature_col("text", 8, 3)).alias(
                    "s"
                )
            )
            .distinct()
            .collect()
        )
        assert streamed_sigs == batch_sigs
