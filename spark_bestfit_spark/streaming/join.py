"""Stream-stream time-bounded inner join.

The second join tier of the streaming family: unlike
:mod:`.enrich` (stream x static dimension, broadcast per micro-batch),
BOTH sides here are unbounded, so Spark must buffer each side in keyed
state until the other side's matching rows can no longer arrive. That
is only bounded when (a) both sides carry a WATERMARK and (b) the join
condition bounds the event-time gap — together they give the state
store an eviction horizon. This module packages those two requirements
so a caller cannot accidentally build the unbounded-state version.

State size at 100 TB/day: per key, rows within
``lower_bound..upper_bound`` of the watermark frontier — sized by the
time bound and the per-key rate, independent of stream length. The
join itself is the stateful symmetric hash join on the key columns;
each side shuffles once on those keys (the same exchange any keyed
stateful operator pays).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["stream_stream_join"]


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list,
    left_ts: str,
    right_ts: str,
    max_delay: str,
    watermark: str,
    min_delay: str | None = None,
) -> DataFrame:
    """Inner-join two streams on ``on`` keys where the right event
    lands within ``(min_delay or 0) .. max_delay`` AFTER the left
    event (event time, inclusive bounds).

    ``left_ts`` / ``right_ts`` are timestamp columns; ``watermark``
    (e.g. ``"1 hour"``) is applied to BOTH sides and, with the time
    bound, lets Spark evict join state. Late rows beyond the watermark
    are dropped by the engine — the streaming contract, not a bug.

    Raises when either input is not streaming (use a plain join or
    :func:`~spark_bestfit_spark.streaming.enrich.enrich_with_dimension`).
    """
    if not (left.isStreaming and right.isStreaming):
        raise ValueError(
            "both inputs must be streaming DataFrames — for a static "
            "side use enrich_with_dimension or a plain join"
        )
    if not on:
        raise ValueError("on must list at least one key column")
    lo = f"INTERVAL {min_delay}" if min_delay else "INTERVAL 0 seconds"
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = [lw[k] == rw[k] for k in on]
    cond.append(rw[right_ts] >= lw[left_ts] + F.expr(lo))
    cond.append(
        rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}")
    )
    joined = lw.join(rw, on=cond, how="inner")
    # drop the duplicate key columns from the right side
    for k in on:
        joined = joined.drop(rw[k])
    return joined
