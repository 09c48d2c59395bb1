"""Tests for the streaming drift monitor: scoring math, foreachBatch
callable semantics (called directly with batch DataFrames), and a real
Structured Streaming file-source run."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.streaming import DriftMonitor, ks_drift_score


@pytest.fixture(scope="module")
def reference_model(spark):
    from spark_bestfit_spark.fitter import DistributionFitter

    rng = np.random.default_rng(42)
    df = spark.createDataFrame(
        pd.DataFrame({"value": rng.normal(50.0, 10.0, 8000)})
    )
    return DistributionFitter(spark).fit(
        df, column="value", distributions=["norm"]
    ).best(1, metric="sse")


class TestKsDriftScore:
    def test_same_distribution_low_ks(self, reference_model):
        rng = np.random.default_rng(7)
        ks, p = ks_drift_score(reference_model, rng.normal(50, 10, 5000))
        assert ks < 0.05
        assert p > 0.01

    def test_shifted_distribution_high_ks(self, reference_model):
        rng = np.random.default_rng(7)
        ks, p = ks_drift_score(reference_model, rng.normal(70, 10, 5000))
        assert ks > 0.3
        assert p < 1e-6

    def test_degenerate_batch_nan(self, reference_model):
        ks, p = ks_drift_score(reference_model, np.array([1.0]))
        assert np.isnan(ks)


class TestDriftMonitorBatches:
    def test_detects_drift_sequence(self, spark, reference_model):
        alerts = []
        monitor = DriftMonitor(
            reference_model, column="value", ks_threshold=0.1,
            on_drift=alerts.append,
        )
        rng = np.random.default_rng(0)
        ok = spark.createDataFrame(
            pd.DataFrame({"value": rng.normal(50, 10, 3000)})
        )
        shifted = spark.createDataFrame(
            pd.DataFrame({"value": rng.normal(80, 10, 3000)})
        )
        monitor(ok, 0)
        monitor(ok, 1)
        monitor(shifted, 2)
        assert len(monitor.history) == 3
        assert [r.drifted for r in monitor.history] == [False, False, True]
        assert monitor.drift_count == 1
        assert len(alerts) == 1 and alerts[0].batch_id == 2
        s = monitor.summary()
        assert s["n_batches"] == 3 and s["n_drifted"] == 1

    def test_empty_batch_skipped(self, spark, reference_model):
        monitor = DriftMonitor(reference_model, column="value")
        empty = spark.createDataFrame([], "value double")
        monitor(empty, 0)
        assert monitor.history == []

    def test_large_batch_sampled(self, spark, reference_model):
        monitor = DriftMonitor(
            reference_model, column="value", max_batch_sample=500
        )
        rng = np.random.default_rng(1)
        big = spark.createDataFrame(
            pd.DataFrame({"value": rng.normal(50, 10, 20_000)})
        )
        monitor(big, 0)
        assert monitor.last.n_rows == 20_000
        assert not monitor.last.drifted

    def test_callback_errors_do_not_break_query(self, spark, reference_model):
        def bad_callback(record):
            raise RuntimeError("boom")

        monitor = DriftMonitor(
            reference_model, column="value", ks_threshold=0.01,
            on_drift=bad_callback,
        )
        rng = np.random.default_rng(2)
        shifted = spark.createDataFrame(
            pd.DataFrame({"value": rng.normal(90, 5, 2000)})
        )
        monitor(shifted, 0)  # must not raise
        assert monitor.drift_count == 1


class TestStructuredStreamingEndToEnd:
    def test_file_source_stream(self, spark, reference_model, tmp_path):
        """Real readStream -> foreachBatch run over a file source."""
        src = tmp_path / "stream_src"
        src.mkdir()
        rng = np.random.default_rng(3)
        # batch files: two in-distribution, one drifted
        pd.DataFrame({"value": rng.normal(50, 10, 2000)}).to_parquet(
            src / "a.parquet"
        )
        pd.DataFrame({"value": rng.normal(50, 10, 2000)}).to_parquet(
            src / "b.parquet"
        )
        pd.DataFrame({"value": rng.normal(75, 10, 2000)}).to_parquet(
            src / "c.parquet"
        )
        monitor = DriftMonitor(
            reference_model, column="value", ks_threshold=0.1
        )
        stream = (
            spark.readStream.schema("value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        query = (
            stream.writeStream.foreachBatch(monitor)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        deadline = time.time() + 30
        while query.isActive and time.time() < deadline:
            time.sleep(0.5)
        assert not query.isActive
        assert len(monitor.history) == 3
        assert monitor.drift_count == 1
        assert any(r.drifted for r in monitor.history)


class TestW1DriftScore:
    def test_shift_recovered_in_column_units(self, reference_model):
        """W1 against the model reports the shift magnitude in the
        column's own units — a +12 shift scores ~12, while the
        same-distribution batch scores near 0."""
        from spark_bestfit_spark.streaming import w1_drift_score

        rng = np.random.default_rng(11)
        near = w1_drift_score(
            reference_model, rng.normal(50, 10, 8000)
        )
        shifted = w1_drift_score(
            reference_model, rng.normal(62, 10, 8000)
        )
        assert near < 1.0
        assert shifted == pytest.approx(12.0, abs=1.5)
        assert np.isnan(w1_drift_score(reference_model, np.array([1.0])))

    def test_monitor_w1_threshold_and_summary(self, spark, reference_model):
        monitor = DriftMonitor(
            reference_model, column="value",
            ks_threshold=10.0,        # K-S leg disabled
            w1_threshold=5.0,         # drift = "moved more than 5 units"
        )
        rng = np.random.default_rng(12)
        ok = spark.createDataFrame(
            pd.DataFrame({"value": rng.normal(50, 10, 3000)})
        )
        shifted = spark.createDataFrame(
            pd.DataFrame({"value": rng.normal(58, 10, 3000)})
        )
        monitor(ok, 0)
        monitor(shifted, 1)
        assert [r.drifted for r in monitor.history] == [False, True]
        assert monitor.history[1].w1 == pytest.approx(8.0, abs=1.5)
        s = monitor.summary()
        assert s["w1_max"] == pytest.approx(8.0, abs=1.5)
        assert s["w1_mean"] is not None
