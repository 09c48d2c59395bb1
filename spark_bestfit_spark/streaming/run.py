"""Run a bounded stream to completion and hand back its result.

``run_stream_once`` executes a streaming DataFrame with the
``availableNow`` trigger into an in-memory table and returns that table
as a batch DataFrame once the stream terminates. This is the bridge
that lets the exact same Structured Streaming plans used for unbounded
ingest (windowed aggregation, streaming dedup, stateful moments) be
checked against a batch/SQL oracle: ``availableNow`` drains everything
currently in the source across one or more micro-batches, then stops.

The memory sink collects results on the driver, so this is strictly
for bounded, aggregate-sized outputs (window counts, per-key state,
distinct fingerprints) — production streams write to kafka/parquet
sinks instead. State handling is the real streaming engine's
(checkpointed state store, watermarks, ``applyInPandasWithState``),
not a batch re-expression, so what this verifies is the incremental
plan itself.
"""

from __future__ import annotations

import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame

__all__ = ["run_stream_once", "drain_foreach_batch"]


def run_stream_once(
    stream_df: DataFrame,
    output_mode: str = "append",
    timeout: float = 300.0,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain ``stream_df`` with ``trigger(availableNow=True)`` into a
    uniquely-named memory table; return the table as a DataFrame.

    ``output_mode``: "complete" for full-result aggregations, "update"
    for stateful per-key emissions, "append" for row streams (dedup).
    The checkpoint directory is a throwaway tempdir, removed after the
    query stops — replaying from a checkpoint is a durability concern
    for long-lived streams, not for a drained bounded run.

    ``state_partitions``: stateful operators create one state store
    per shuffle partition PER MICRO-BATCH, and Spark pins the count at
    the first checkpoint — so state partitioning should be sized to
    the STATE cardinality, not to the session's scan parallelism.
    Passing a small value here (the aggregate state of these drains is
    thousands of rows) scopes ``spark.sql.shuffle.partitions`` around
    the query start and cuts the fixed per-batch store overhead ~2x;
    results are partition-count invariant (hash aggregation / keyed
    state). None leaves the session setting untouched.
    """
    spark = stream_df.sparkSession
    name = f"sbf_once_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="sbf_stream_ckpt_")
    prev_parts = None
    if state_partitions is not None:
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(int(state_partitions))
        )
    try:
        query = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        # the query captured the conf at start; restore immediately
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    try:
        # one deadline shared by awaitTermination and the defensive
        # poll loop — the stated timeout bounds the WHOLE wait, not
        # each phase
        deadline = time.time() + timeout
        query.awaitTermination(int(timeout))
        while query.isActive and time.time() < deadline:
            time.sleep(0.25)
        if query.isActive:  # pragma: no cover - defensive
            query.stop()
            raise TimeoutError(
                f"bounded stream {name!r} did not drain in {timeout}s"
            )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def drain_foreach_batch(
    stream_df: DataFrame,
    fn,
    timeout: float = 300.0,
) -> None:
    """Drain ``stream_df`` through a ``foreachBatch`` callable with
    ``trigger(availableNow=True)`` — the monitor-object counterpart of
    :func:`run_stream_once` (same throwaway checkpoint, same bounded
    wait). ``fn`` is any ``(batch_df, batch_id) -> None`` callable,
    e.g. a :class:`~spark_bestfit_spark.streaming.DriftMonitor` or
    :class:`~spark_bestfit_spark.streaming.CertifiedDriftMonitor`;
    its accumulated state IS the result."""
    spark = stream_df.sparkSession
    ckpt = tempfile.mkdtemp(prefix="sbf_stream_ckpt_")
    try:
        query = (
            stream_df.writeStream.foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + timeout
        query.awaitTermination(int(timeout))
        while query.isActive and time.time() < deadline:
            time.sleep(0.25)
        if query.isActive:  # pragma: no cover - defensive
            query.stop()
            raise TimeoutError(
                f"foreachBatch drain did not finish in {timeout}s"
            )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
