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
* phase 2: the candidate set (<= k rows per partition, tiny) is
  broadcast back as a left-semi probe — map-only — and only the
  surviving rows pay a groupBy, whose key space is the candidate set,
  not the vocabulary. The corpus total rides the plan as a broadcast
  1-row relation (no eager count), and the final ``HAVING``-style
  filter makes the output EXACTLY the naive query's answer —
  candidates are a superset, and the exact-count filter trims the
  superset back, independent of partitioning.

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
        ]
    )

    def _mg(batches):
        import numpy as np
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
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
        if counters:
            yield pd.DataFrame(
                {
                    "item": list(counters.keys()),
                    "_lb": list(counters.values()),
                }
            )

    candidates = (
        src.mapInPandas(_mg, schema=out_schema).select("item").distinct()
    )
    total = src.agg(F.count("*").cast("double").alias("_n"))
    return (
        src.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") >= F.ceil(F.lit(float(phi)) * F.col("_n")))
        .select(
            "item",
            "n",
            F.round(F.col("n") / F.col("_n"), 6).alias("frac"),
        )
    )
