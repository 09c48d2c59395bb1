"""Heavy hitters: exact frequent-item detection with sketch-bounded
shuffle.

The naive frequent-token query (``GROUP BY token HAVING count >= T``)
shuffles EVERY distinct key — at 100 TB of text that is billions of
n-grams moving through one wide exchange to find the few hundred items
anyone cares about. This module keeps the answer EXACT while bounding
the shuffle with a Misra-Gries summary:

* phase 1 (map-only): each partition folds its rows through a
  Misra-Gries sketch of ``k`` counters inside an Arrow-batched
  ``mapInPandas`` — O(k) memory, no shuffle. MG guarantees every item
  with partition frequency above ``n_p / (k+1)`` survives with a
  positive counter; by the averaging argument, any item with GLOBAL
  frequency >= phi * N exceeds that bar in at least one partition, so
  the union of per-partition candidates is a superset of the true
  heavy hitters whenever ``k + 1 > 1/phi`` (validated).
* phase 2: the driver folds the bounded sketch output (<= k + 1 rows
  per partition — one sentinel row per partition carries its row
  count, so the corpus total N comes from the SAME pass; this is the
  exact-K-S bucket-total convention of a constant-size driver action),
  broadcasts the candidate set back as a left-semi probe — map-only —
  and only the surviving rows pay a groupBy, whose key space is the
  candidate set, not the vocabulary. The whole operator is exactly TWO
  scans of the input, and the final ``HAVING``-style filter makes the
  output EXACTLY the naive query's answer — candidates are a
  superset, and the exact-count filter trims the superset back,
  independent of partitioning.

No reference-repo analog (the reference is a fitting library); this is
a first-class pipeline extra in the mold of `robust_stats_approx`
(sketch where it scales, exact where it's checkable).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["heavy_hitters"]


def heavy_hitters(
    df: DataFrame,
    col: str,
    phi: float,
    k: int | None = None,
) -> DataFrame:
    """All items whose frequency is at least ``ceil(phi * N)`` of the
    ``N`` non-null values in ``col``, with EXACT counts — computed with
    a Misra-Gries candidate pass so the wide shuffle is bounded by the
    candidate set instead of the column's full distinct cardinality
    (module docstring has the guarantee sketch).

    ``k`` is the sketch width (counters per partition); it defaults to
    ``max(ceil(2/phi), 16)`` and must satisfy ``k + 1 > 1/phi`` or the
    superset guarantee fails (validated loudly).

    Returns ``(item, n, frac)`` where ``item`` keeps the input
    column's type, ``n`` is the exact count, and ``frac = n / N``
    rounded to 6 decimals.
    """
    if not 0.0 < phi < 1.0:
        raise ValueError("phi must be in (0, 1)")
    if k is None:
        k = max(int(math.ceil(2.0 / phi)), 16)
    if (k + 1) * phi <= 1.0:
        raise ValueError(
            f"k={k} too small for phi={phi}: need k + 1 > 1/phi for the "
            "Misra-Gries superset guarantee"
        )
    src = df.select(F.col(col).alias("item")).filter(
        F.col("item").isNotNull()
    )
    item_type = src.schema["item"].dataType
    out_schema = T.StructType(
        [
            T.StructField("item", item_type),
            T.StructField("_lb", T.LongType()),
            T.StructField("_tot", T.BooleanType()),
        ]
    )

    def _mg(batches):
        import numpy as np
        import pandas as pd

        counters: dict = {}
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            for item, c in pdf["item"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                vals = np.fromiter(
                    counters.values(), dtype=np.int64, count=len(counters)
                )
                # subtract the (k+1)-th largest count from everything and
                # drop the non-positive — the mergeable-summaries MG
                # reduction (at most k survivors; total decremented mass
                # per reduction >= (k+1) * m, hence the n_p/(k+1) bound)
                m = np.partition(vals, len(vals) - (k + 1))[
                    len(vals) - (k + 1)
                ]
                counters = {
                    i: c - int(m) for i, c in counters.items() if c > m
                }
        # one sentinel row carries the partition's row count, so the
        # corpus total N needs NO third scan of the input — it is the
        # sum of the sentinels from the same sketch pass
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "_lb": list(counters.values()) + [n_p],
                "_tot": [False] * len(counters) + [True],
            }
        )

    # ONE bounded driver action folds the sketch (<= k + 1 rows per
    # partition, constant w.r.t. data size — the exact-K-S bucket-total
    # convention): candidate items + the corpus total N from the same
    # pass, so the whole operator is exactly TWO scans of the input
    # (sketch, then exact count) — a diamond on the lazy sketch
    # relation would re-run the sketch scan instead.
    collected = src.mapInPandas(_mg, schema=out_schema).collect()
    n = sum(int(r["_lb"]) for r in collected if r["_tot"])
    items = [
        r["item"]
        for r in collected
        if not r["_tot"] and r["item"] is not None
    ]
    spark = df.sparkSession
    cand = spark.createDataFrame(
        [(i,) for i in set(items)],
        T.StructType([T.StructField("item", item_type)]),
    )
    thresh = int(math.ceil(phi * n)) if n else 1
    return (
        src.join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") >= F.lit(thresh))
        .select(
            "item",
            "n",
            F.round(F.col("n") / F.lit(float(max(n, 1))), 6).alias(
                "frac"
            ),
        )
    )
