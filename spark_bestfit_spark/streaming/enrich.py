"""Stream-static dimension enrichment.

The ingest-time analog of a warehouse dimension join: each micro-batch
of the fact stream is joined against a STATIC (batch) dimension table.
Spark supports this natively — the static side is re-planned per
micro-batch — but the default plan can shuffle the streaming side,
which doubles the per-batch latency floor and pins state partitioning.
``enrich_with_dimension`` forces the broadcast-hash shape (dimension
broadcast once, stream map-side only), which is the only shape that
holds at 100 TB/day ingest: the fact stream never shuffles for the
join, and downstream stateful operators keep their own partitioning.

Stream-STREAM joins (both sides unbounded, watermark-bounded state)
are a different operator family; this module is the stream-static tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["enrich_with_dimension"]


def enrich_with_dimension(
    stream: DataFrame,
    dimension: DataFrame,
    on,
    how: str = "left",
    dim_cols: list | None = None,
) -> DataFrame:
    """Join a streaming fact DataFrame to a static dimension.

    ``on`` is either a column name list shared by both sides or a join
    Column expression. ``how`` is "left" (keep unmatched facts with
    null attributes — the usual ingest contract) or "inner".
    ``dim_cols`` optionally prunes the dimension to the key + listed
    attribute columns BEFORE the broadcast, so the broadcast payload
    carries only what the pipeline reads.

    The dimension is wrapped in ``F.broadcast``: the streaming side
    stays map-side for the join in every micro-batch. Raises if
    ``stream`` is not actually streaming (use a plain join) or if the
    dimension is streaming (that is a stream-stream join).
    """
    if not stream.isStreaming:
        raise ValueError(
            "stream must be a streaming DataFrame — for batch inputs "
            "use a plain join"
        )
    if dimension.isStreaming:
        raise ValueError(
            "dimension must be static — stream-stream joins need "
            "watermarks and are a different operator"
        )
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    dim = dimension
    if dim_cols is not None:
        keys = on if isinstance(on, list) else []
        keep = list(dict.fromkeys(list(keys) + list(dim_cols)))
        dim = dim.select(*keep)
    return stream.join(F.broadcast(dim), on=on, how=how)
