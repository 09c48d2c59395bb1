"""CertifiedDriftMonitor: the streaming twin of the certified-approx
two-sample drift tier. Load-bearing properties: the cumulative stream
scores must equal the batch operators' output on the union of the
drained batches (grid counts are additive); accumulation must be
order-independent (restart-mergeable); out-of-range mass must clamp
into edge buckets and be reported; a real file-source run must flag
the drifted batch.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest

from spark_bestfit_spark.streaming import (
    CertifiedDriftMonitor,
    CertifiedDriftMonitorByGroup,
)


@pytest.fixture(scope="module")
def reference_df(spark):
    rng = np.random.default_rng(21)
    return spark.createDataFrame(
        pd.DataFrame({"value": rng.normal(50.0, 10.0, 6000)})
    )


class TestCertifiedScores:
    def test_cumulative_equals_batch_tier(self, spark, reference_df):
        """Drain three in-range batches; the cumulative (d, err, w1)
        must equal two_sample_ks_approx_df / wasserstein_approx_df
        over reference vs union-of-batches (the union's bounds equal
        the reference's, so the grids coincide)."""
        from spark_bestfit_spark.operators.stats import (
            two_sample_ks_approx_df,
            wasserstein_approx_df,
        )

        lo = reference_df.agg({"value": "min"}).first()[0]
        hi = reference_df.agg({"value": "max"}).first()[0]
        rng = np.random.default_rng(5)
        batches = [
            np.clip(rng.normal(52, 9, 1500), lo, hi) for _ in range(3)
        ]
        monitor = CertifiedDriftMonitor(
            reference_df, column="value", grid_size=512,
            d_threshold=None,
        )
        for i, b in enumerate(batches):
            monitor(
                spark.createDataFrame(pd.DataFrame({"value": b})), i
            )
        assert len(monitor.history) == 3
        last = monitor.history[-1]
        union = spark.createDataFrame(
            pd.DataFrame({"value": np.concatenate(batches)})
        )
        ks = two_sample_ks_approx_df(
            reference_df, union, "value", grid_size=512
        ).first()
        w1 = wasserstein_approx_df(
            reference_df, union, "value", grid_size=512
        ).first()
        assert last.d_cum == pytest.approx(ks["d_stat"], abs=2e-6)
        assert last.w1_cum == pytest.approx(w1["w1"], abs=2e-6)
        # batch-tier err is the max combined bucket mass; the
        # monitor's err_bound is the max of batch/cum — compare the
        # cum component via a fresh single-batch monitor
        single = CertifiedDriftMonitor(
            reference_df, column="value", grid_size=512,
            d_threshold=None,
        )
        single(union, 0)
        assert single.history[0].err_bound == pytest.approx(
            ks["err_bound"], abs=2e-6
        )
        assert single.history[0].w1_err_bound == pytest.approx(
            w1["err_bound"], abs=2e-6
        )

    def test_order_independent_accumulation(self, spark, reference_df):
        rng = np.random.default_rng(9)
        batches = [rng.normal(50, 10, 800) for _ in range(3)]
        scores = []
        for order in ([0, 1, 2], [2, 0, 1]):
            m = CertifiedDriftMonitor(
                reference_df, column="value", grid_size=256,
                d_threshold=None,
            )
            for i, k in enumerate(order):
                m(
                    spark.createDataFrame(
                        pd.DataFrame({"value": batches[k]})
                    ),
                    i,
                )
            scores.append(
                (m.history[-1].d_cum, m.history[-1].w1_cum)
            )
        assert scores[0] == scores[1]

    def test_out_of_range_clamped_and_reported(self, spark, reference_df):
        alerts = []
        monitor = CertifiedDriftMonitor(
            reference_df, column="value", grid_size=256,
            d_threshold=None, oor_fraction_threshold=0.2,
            on_drift=alerts.append,
        )
        vals = np.concatenate([
            np.full(500, 500.0),  # far above the reference range
            np.random.default_rng(2).normal(50, 10, 500),
        ])
        monitor(
            spark.createDataFrame(pd.DataFrame({"value": vals})), 0
        )
        rec = monitor.history[0]
        assert rec.n_rows == 1000
        assert rec.n_out_of_range >= 500
        assert rec.drifted
        assert len(alerts) == 1
        # the clamped mass piles into the top bucket: huge ECDF gap
        assert rec.d_batch > 0.4

    def test_shifted_batch_flags_ks(self, spark, reference_df):
        monitor = CertifiedDriftMonitor(
            reference_df, column="value", grid_size=512,
            d_threshold=0.1,
        )
        rng = np.random.default_rng(4)
        ok = spark.createDataFrame(
            pd.DataFrame({"value": rng.normal(50, 10, 2000)})
        )
        shifted = spark.createDataFrame(
            pd.DataFrame({"value": rng.normal(62, 10, 2000)})
        )
        monitor(ok, 0)
        assert not monitor.history[0].drifted
        monitor(shifted, 1)
        assert monitor.history[1].drifted
        assert monitor.history[1].d_batch > 0.3

    def test_certificate_sandwiches_exact(self, spark, reference_df):
        """d_cum <= D_exact(clamped) <= d_cum + err_bound against the
        exact two-sample K-S on the same (in-range) data."""
        from spark_bestfit_spark.operators.stats import two_sample_ks_df

        lo = reference_df.agg({"value": "min"}).first()[0]
        hi = reference_df.agg({"value": "max"}).first()[0]
        rng = np.random.default_rng(13)
        vals = np.clip(rng.normal(55, 11, 3000), lo, hi)
        batch = spark.createDataFrame(pd.DataFrame({"value": vals}))
        monitor = CertifiedDriftMonitor(
            reference_df, column="value", grid_size=512,
            d_threshold=None,
        )
        monitor(batch, 0)
        rec = monitor.history[0]
        exact = two_sample_ks_df(
            reference_df, batch, "value"
        ).first()["d_stat"]
        assert rec.d_cum <= exact + 1e-9
        assert exact - rec.d_cum <= rec.err_bound + 1e-9

    def test_degenerate_reference_rejected(self, spark):
        const = spark.createDataFrame(
            pd.DataFrame({"value": [3.0] * 100})
        )
        with pytest.raises(ValueError, match="distinct finite"):
            CertifiedDriftMonitor(const, column="value")

    def test_empty_batch_skipped(self, spark, reference_df):
        monitor = CertifiedDriftMonitor(reference_df, column="value")
        monitor(spark.createDataFrame([], "value double"), 0)
        assert monitor.history == []


class TestCertifiedStreamRun:
    def test_file_source_run(self, spark, reference_df, tmp_path):
        src = tmp_path / "stream_src"
        src.mkdir()
        rng = np.random.default_rng(3)
        pd.DataFrame({"value": rng.normal(50, 10, 2000)}).to_parquet(
            src / "a.parquet"
        )
        pd.DataFrame({"value": rng.normal(50, 10, 2000)}).to_parquet(
            src / "b.parquet"
        )
        pd.DataFrame({"value": rng.normal(75, 10, 2000)}).to_parquet(
            src / "c.parquet"
        )
        monitor = CertifiedDriftMonitor(
            reference_df, column="value", grid_size=512,
            d_threshold=0.15,
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
        drifted = [r for r in monitor.history if r.drifted][0]
        # the drifted file flags on its own batch score with a valid
        # certificate attached
        assert drifted.d_batch > 0.15
        assert drifted.err_bound > 0.0


class TestCertifiedDriftByGroup:
    @pytest.fixture(scope="class")
    def grouped_ref(self, spark):
        rng = np.random.default_rng(33)
        frames = []
        for g, (mu, sd) in [("a", (50, 10)), ("b", (0, 1))]:
            frames.append(pd.DataFrame({
                "seg": g, "value": rng.normal(mu, sd, 4000)
            }))
        return spark.createDataFrame(pd.concat(frames))

    def test_cumulative_matches_flat_per_group(self, spark, grouped_ref):
        from spark_bestfit_spark.streaming import CertifiedDriftMonitor

        rng = np.random.default_rng(8)
        batch = pd.concat([
            pd.DataFrame({"seg": "a",
                          "value": rng.normal(52, 10, 1200)}),
            pd.DataFrame({"seg": "b",
                          "value": rng.normal(0.2, 1, 900)}),
        ])
        grouped = CertifiedDriftMonitorByGroup(
            grouped_ref, column="value", group_col="seg",
            grid_size=256, d_threshold=None,
        )
        grouped(spark.createDataFrame(batch), 0)
        cum = grouped.cumulative()
        for g in ["a", "b"]:
            flat = CertifiedDriftMonitor(
                grouped_ref.filter(f"seg = '{g}'"), column="value",
                grid_size=256, d_threshold=None,
            )
            flat(
                spark.createDataFrame(batch[batch.seg == g]), 0
            )
            fc = flat.cumulative()
            gc = cum[g]
            assert gc["n_rows"] == fc["n_rows"], g
            assert gc["d_stat"] == pytest.approx(
                fc["d_stat"], abs=1e-12
            ), g
            assert gc["w1"] == pytest.approx(fc["w1"], abs=1e-9), g
            assert gc["err_bound"] == pytest.approx(
                fc["err_bound"], abs=1e-12
            ), g

    def test_only_shifted_group_flags(self, spark, grouped_ref):
        rng = np.random.default_rng(12)
        monitor = CertifiedDriftMonitorByGroup(
            grouped_ref, column="value", group_col="seg",
            grid_size=256, d_threshold=0.15,
        )
        batch = pd.concat([
            pd.DataFrame({"seg": "a",
                          "value": rng.normal(50, 10, 1500)}),
            pd.DataFrame({"seg": "b",
                          "value": rng.normal(1.5, 1, 1500)}),
        ])
        monitor(spark.createDataFrame(batch), 0)
        flags = {r.group: r.drifted for r in monitor.history}
        assert flags == {"a": False, "b": True}

    def test_unmonitored_group_counted(self, spark, grouped_ref):
        monitor = CertifiedDriftMonitorByGroup(
            grouped_ref, column="value", group_col="seg",
            grid_size=128, d_threshold=None,
        )
        batch = pd.DataFrame({
            "seg": ["zz"] * 40 + ["a"] * 60,
            "value": np.linspace(0, 100, 100),
        })
        monitor(spark.createDataFrame(batch), 0)
        assert monitor.unmonitored_rows == {"zz": 40}
        assert {r.group for r in monitor.history} == {"a"}

    def test_per_group_oor(self, spark, grouped_ref):
        monitor = CertifiedDriftMonitorByGroup(
            grouped_ref, column="value", group_col="seg",
            grid_size=128, d_threshold=None,
            oor_fraction_threshold=0.3,
        )
        batch = pd.DataFrame({
            "seg": ["b"] * 100,
            "value": [500.0] * 50
            + list(np.random.default_rng(1).normal(0, 1, 50)),
        })
        monitor(spark.createDataFrame(batch), 0)
        rec = [r for r in monitor.history if r.group == "b"][0]
        assert rec.n_out_of_range >= 50
        assert rec.drifted


class TestStreamingCertifiedQuantiles:
    def test_matches_batch_tier_on_union(self, spark, reference_df):
        """quantiles() from the monitor's additive grid state must
        sandwich the exact quantiles of the union of drained batches
        (all in-range, so the clamp is a no-op), and agree with the
        batch tier's inversion when the grids coincide."""
        lo = reference_df.agg({"value": "min"}).first()[0]
        hi = reference_df.agg({"value": "max"}).first()[0]
        rng = np.random.default_rng(17)
        batches = [
            np.clip(rng.normal(50, 10, 1200), lo, hi) for _ in range(3)
        ]
        monitor = CertifiedDriftMonitor(
            reference_df, column="value", grid_size=512,
            d_threshold=None,
        )
        for i, b in enumerate(batches):
            monitor(
                spark.createDataFrame(pd.DataFrame({"value": b})), i
            )
        qs = (0.1, 0.5, 0.9)
        got = monitor.quantiles(qs)
        union = np.sort(np.concatenate(batches))
        n = len(union)
        import math

        for r, q in zip(got, qs):
            exact = union[max(0, math.ceil(q * n) - 1)]
            assert r["lo_edge"] <= exact <= r["hi_edge"]
            assert r["n"] == n
            assert r["err_bound"] == pytest.approx(
                (hi - lo) / 512, abs=1e-6
            )

    def test_order_independent(self, spark, reference_df):
        rng = np.random.default_rng(23)
        batches = [rng.normal(50, 10, 800) for _ in range(3)]

        def drained(order):
            m = CertifiedDriftMonitor(
                reference_df, column="value", grid_size=256,
                d_threshold=None,
            )
            for i, b in enumerate(order):
                m(spark.createDataFrame(pd.DataFrame({"value": b})), i)
            return m.quantiles((0.25, 0.75))

        assert drained(batches) == drained(batches[::-1])

    def test_empty_and_validation(self, spark, reference_df):
        m = CertifiedDriftMonitor(
            reference_df, column="value", grid_size=64,
            d_threshold=None,
        )
        assert m.quantiles() == []
        with pytest.raises(ValueError):
            m.quantiles((0.0,))
