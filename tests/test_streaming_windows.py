"""Tests for watermarked windowed aggregation: a real append-mode
stream with out-of-order batches must converge to the batch answer."""

from __future__ import annotations

import time

import pandas as pd
import pytest

from spark_bestfit_spark.streaming.windows import (
    session_stats,
    windowed_stats,
)


@pytest.fixture(scope="module")
def event_frames():
    def mk(rows):
        df = pd.DataFrame(rows, columns=["ts", "k", "v"])
        # microsecond precision: Spark's timestamp type rejects the
        # nanosecond parquet physical type pandas writes by default
        df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
        return df

    b0 = mk([
        ("2024-01-01 00:01:00", "a", 1.0),
        ("2024-01-01 00:04:00", "a", 3.0),
        ("2024-01-01 00:12:00", "b", 10.0),
    ])
    # second batch has a late row for the first window (within watermark)
    b1 = mk([
        ("2024-01-01 00:07:00", "a", 5.0),
        ("2024-01-01 00:02:30", "a", 2.0),   # late arrival
        ("2024-01-01 00:15:00", "b", 20.0),
        ("2024-01-01 00:31:00", "a", 7.0),   # advances the watermark
    ])
    return [b0, b1]


class TestWindowedStats:
    def test_batch_mode_windows(self, spark, event_frames):
        full = pd.concat(event_frames)
        df = spark.createDataFrame(full)
        out = windowed_stats(
            df, "ts", "v", window_duration="10 minutes", group_cols=["k"]
        )
        rows = {
            (str(r.window_start), r.k): (r.n, r.total)
            for r in out.collect()
        }
        assert rows[("2024-01-01 00:00:00", "a")] == (4, 11.0)
        assert rows[("2024-01-01 00:10:00", "b")] == (2, 30.0)
        assert rows[("2024-01-01 00:30:00", "a")] == (1, 7.0)

    def test_session_windows_batch(self, spark):
        rows = [
            # user a: two sessions (gap > 10 min between 00:05 and 00:30)
            ("2024-01-01 00:01:00", "a", 1.0),
            ("2024-01-01 00:05:00", "a", 2.0),
            ("2024-01-01 00:30:00", "a", 3.0),
            # user b: one session
            ("2024-01-01 00:02:00", "b", 5.0),
            ("2024-01-01 00:08:00", "b", 7.0),
        ]
        pdf = pd.DataFrame(rows, columns=["ts", "k", "v"])
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        out = session_stats(
            spark.createDataFrame(pdf), "ts", "v",
            gap_duration="10 minutes", group_cols=["k"],
        )
        got = {
            (r.k, str(r.session_start)): (r.n, r.total)
            for r in out.collect()
        }
        assert got[("a", "2024-01-01 00:01:00")] == (2, 3.0)
        assert got[("a", "2024-01-01 00:30:00")] == (1, 3.0)
        assert got[("b", "2024-01-01 00:02:00")] == (2, 12.0)

    def test_session_windows_streaming(self, spark, tmp_path):
        pdf = pd.DataFrame(
            [
                ("2024-01-01 00:01:00", "a", 1.0),
                ("2024-01-01 00:05:00", "a", 2.0),
                ("2024-01-01 02:00:00", "a", 9.0),  # far later: closes s1
            ],
            columns=["ts", "k", "v"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        src = tmp_path / "ssrc"
        src.mkdir()
        pdf.to_parquet(src / "b0.parquet")
        stream = (
            spark.readStream.schema("ts timestamp, k string, v double")
            .parquet(str(src))
        )
        out = session_stats(
            stream, "ts", "v", gap_duration="10 minutes",
            watermark_delay="5 minutes", group_cols=["k"],
        )
        query = (
            out.writeStream.outputMode("complete")
            .format("memory").queryName("sess_sink")
            .option("checkpointLocation", str(tmp_path / "sckpt"))
            .trigger(availableNow=True).start()
        )
        query.awaitTermination(120)
        deadline = time.time() + 30
        while query.isActive and time.time() < deadline:
            time.sleep(0.5)
        rows = {
            (r.k, str(r.session_start)): r.n
            for r in spark.sql("SELECT * FROM sess_sink").collect()
        }
        assert rows[("a", "2024-01-01 00:01:00")] == 2
        assert rows[("a", "2024-01-01 02:00:00")] == 1

    def test_streaming_matches_batch(self, spark, event_frames, tmp_path):
        src = tmp_path / "wsrc"
        src.mkdir()
        for i, f in enumerate(event_frames):
            f.to_parquet(src / f"b{i}.parquet")
        stream = (
            spark.readStream.schema("ts timestamp, k string, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = windowed_stats(
            stream, "ts", "v",
            window_duration="10 minutes",
            watermark_delay="30 minutes",
            group_cols=["k"],
        )
        query = (
            out.writeStream.outputMode("complete")
            .format("memory")
            .queryName("win_sink")
            .option("checkpointLocation", str(tmp_path / "wckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        deadline = time.time() + 30
        while query.isActive and time.time() < deadline:
            time.sleep(0.5)
        assert not query.isActive
        streamed = {
            (str(r.window_start), r.k): (r.n, r.total)
            for r in spark.sql("SELECT * FROM win_sink").collect()
        }
        batch = {
            (str(r.window_start), r.k): (r.n, r.total)
            for r in windowed_stats(
                spark.createDataFrame(pd.concat(event_frames)),
                "ts", "v", window_duration="10 minutes",
                group_cols=["k"],
            ).collect()
        }
        # the late-but-within-watermark row is folded into its window
        assert streamed == batch


class TestWatermarkEviction:
    def test_update_mode_drops_rows_behind_watermark(self, spark, tmp_path):
        """State EVICTION, not just accumulation: a later batch delivers
        rows for windows the watermark has long passed — they must be
        dropped, not resurrect evicted state or mint new late windows.

        NB the late-row filter uses the watermark current when the
        batch is PLANNED, which trails the just-ingested event-time
        stats by one batch: data in batch N is filtered against the
        horizon derived from batches <= N-2. The scenario leaves a
        full batch between the watermark-advancing data (b0) and the
        late data (b2), so the drop is unambiguous. File mtimes pin
        the processing order, making the progression deterministic."""
        import os

        from spark_bestfit_spark.streaming.run import run_stream_once

        def mk(rows):
            df = pd.DataFrame(rows, columns=["ts", "k", "v"])
            df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
            return df

        # b0 advances the watermark to 05:55 - 30min = 05:25
        b0 = mk([
            ("2024-01-01 00:01:00", "a", 1.0),
            ("2024-01-01 00:08:00", "a", 2.0),
            ("2024-01-01 05:55:00", "b", 20.0),
        ])
        # in-horizon update of the open 05:50 window
        b1 = mk([
            ("2024-01-01 05:58:00", "b", 10.0),
        ])
        # entirely late: 00:03 targets the EVICTED 00:00 window, 01:02
        # would mint a new window hours behind the horizon
        b2 = mk([
            ("2024-01-01 00:03:00", "a", 100.0),
            ("2024-01-01 01:02:00", "a", 200.0),
        ])
        src = tmp_path / "evict_src"
        src.mkdir()
        base = time.time() - 1000
        for i, f in enumerate((b0, b1, b2)):
            p = src / f"b{i}.parquet"
            f.to_parquet(p)
            os.utime(p, (base + 10 * i, base + 10 * i))
        stream = (
            spark.readStream.schema("ts timestamp, k string, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = run_stream_once(
            windowed_stats(
                stream, "ts", "v",
                window_duration="10 minutes",
                watermark_delay="30 minutes",
                group_cols=["k"],
            ),
            output_mode="update",
        )
        emitted = sorted(
            ((str(r.window_start), r.k), (r.n, r.total))
            for r in out.collect()
        )
        # b0 emits both windows, b1 re-emits the updated 05:50 window,
        # b2 emits NOTHING — its rows were dropped at the horizon
        assert emitted == [
            (("2024-01-01 00:00:00", "a"), (2, 3.0)),
            (("2024-01-01 05:50:00", "b"), (1, 20.0)),
            (("2024-01-01 05:50:00", "b"), (2, 30.0)),
        ], emitted
