"""Streaming frequent items via sharded Misra-Gries state.

The streaming twin of :func:`~spark_bestfit_spark.operators.frequency.
heavy_hitters`: items hash into ``n_shards`` state shards (ALL
occurrences of an item land in one shard, so per-item mass never
splits), and each shard folds its stream through one Misra-Gries
sketch of ``k`` counters held as keyed state — O(k) per shard forever,
no matter how many rows stream through.

Each micro-batch every touched shard re-emits its full candidate set
(``outputMode="update"``) stamped with the shard's update version and
running row total, so downstream the CURRENT view is one
``latest-version-per-shard`` selection (the :func:`latest_by_key`
idiom) and the global N is the sum of the latest shard totals. The MG
guarantee degrades gracefully: counts are exact until a shard exceeds
``k`` distinct items, and lower bounds with undercount at most
``n_shard / (k + 1)`` after — size ``k`` to the expected hot-set, not
the vocabulary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["streaming_frequent_items", "FREQ_SCHEMA"]

FREQ_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("item", StringType()),
        StructField("cnt", LongType()),
        StructField("version", LongType()),
        StructField("shard_total", LongType()),
    ]
)

_STATE_SCHEMA = (
    "items array<string>, counts array<long>, version long, total long"
)


def streaming_frequent_items(
    df: DataFrame,
    item_col: str,
    k: int = 1024,
    n_shards: int = 8,
) -> DataFrame:
    """Maintain per-shard Misra-Gries candidate sets over a stream of
    (string) items; every micro-batch re-emits each touched shard's
    candidates as ``(shard, item, cnt, version, shard_total)``.

    Current-view recipe (what the oracle query does)::

        latest = latest_by_key(emitted, "shard", "version")   # per shard
        N      = latest totals summed; filter cnt >= ceil(phi * N)

    While a shard's distinct-item count stays <= ``k`` the counts are
    EXACT (the sketch never reduces), so in that regime the current
    view equals the batch ``GROUP BY`` — the testable configuration;
    beyond it they are guaranteed lower bounds covering every item
    above ``n_shard / (k + 1)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")

    def update(
        key: tuple,
        pdfs: Iterator["object"],
        state: GroupState,
    ) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        if state.exists:
            items, counts, version, total = state.get
            counters = dict(zip(items, (int(c) for c in counts)))
        else:
            counters, version, total = {}, 0, 0
        touched = False
        for pdf in pdfs:
            vals = pdf[item_col].dropna()
            if not len(vals):
                continue
            touched = True
            total += len(vals)
            for item, c in vals.value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                arr = np.fromiter(
                    counters.values(), dtype=np.int64, count=len(counters)
                )
                m = np.partition(arr, len(arr) - (k + 1))[
                    len(arr) - (k + 1)
                ]
                counters = {
                    i: c - int(m) for i, c in counters.items() if c > m
                }
        if touched:
            version += 1
            state.update(
                (
                    list(counters.keys()),
                    list(counters.values()),
                    version,
                    total,
                )
            )
            yield pd.DataFrame(
                {
                    "shard": [int(key[0])] * len(counters),
                    "item": list(counters.keys()),
                    "cnt": list(counters.values()),
                    "version": [version] * len(counters),
                    "shard_total": [total] * len(counters),
                }
            )

    sharded = df.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(int(n_shards))).alias(
            "_shard"
        ),
        F.col(item_col).cast("string").alias(item_col),
    )
    return sharded.groupBy("_shard").applyInPandasWithState(
        update,
        outputStructType=FREQ_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
