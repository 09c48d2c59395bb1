"""Streaming drift detection against a fitted reference model.

Run from the repo root:  python examples/drift_monitoring.py
(writes a small temporary file stream under /tmp)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

from spark_bestfit_spark import DistributionFitter, get_spark
from spark_bestfit_spark.streaming import DriftMonitor


def main() -> None:
    spark = get_spark(app_name="drift")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(42)

    # reference model from historical data
    hist = spark.createDataFrame(
        pd.DataFrame({"value": rng.normal(50.0, 10.0, 20_000)})
    )
    reference = DistributionFitter(spark).fit(
        hist, column="value", distributions=["norm", "lognorm", "gamma"]
    ).best(1, metric="ks_statistic")
    print("reference model:", reference.distribution, reference.parameters)

    # stream: two in-distribution batches, then a shifted one
    with tempfile.TemporaryDirectory() as tmp:
        src = Path(tmp) / "stream"
        src.mkdir()
        for i, mu in enumerate((50.0, 50.0, 72.0)):
            pd.DataFrame({"value": rng.normal(mu, 10.0, 3_000)}).to_parquet(
                src / f"batch_{i}.parquet"
            )
        monitor = DriftMonitor(
            reference, column="value", ks_threshold=0.1,
            on_drift=lambda rec: print(
                f"  !! drift in batch {rec.batch_id}: "
                f"KS={rec.ks_statistic:.3f}"
            ),
        )
        query = (
            spark.readStream.schema("value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(monitor)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        print("\nper-batch history:")
        for rec in monitor.history:
            print(f"  batch {rec.batch_id}: n={rec.n_rows} "
                  f"ks={rec.ks_statistic:.4f} drifted={rec.drifted}")
        print("summary:", monitor.summary())
    spark.stop()


if __name__ == "__main__":
    main()
