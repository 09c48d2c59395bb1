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
