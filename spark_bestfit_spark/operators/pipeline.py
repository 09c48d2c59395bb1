"""End-to-end corpus curation: the composition a pretraining-data
pipeline actually runs, built from the engine's own operators.

    raw documents
      -> quality scoring (map-only column algebra)
      -> quality / length / language filters (pushed into the scan)
      -> exact dedup (md5 fingerprint groupBy)
      -> MinHash near-dup removal (LSH band buckets, verified Jaccard)
      -> curated corpus + per-stage audit counts

Shuffle profile at 100 TB: one shuffle for exact dedup (fingerprint),
one for the LSH band buckets, one small join to drop near-dup losers.
Everything else is map-only and pipelines with the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from spark_bestfit_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
)
from spark_bestfit_spark.operators.textstats import (
    with_language_id,
    with_quality_score,
)

__all__ = ["curate_corpus"]


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.25,
    min_tokens: int = 5,
    languages: list | None = None,
    near_dup_threshold: float = 0.85,
    minhash_kwargs: dict | None = None,
) -> tuple:
    """Returns (curated DataFrame, audit dict of per-stage counts).

    The audit counts cost one extra action per stage; pass the result
    through ``.cache()`` upstream if the input is recomputed expensively.
    """
    audit = {"input": df.count()}

    scored = with_quality_score(df, text_col)
    scored = scored.withColumn(
        "_n_tokens",
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")),
    )
    filtered = scored.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("_n_tokens") >= min_tokens)
    )
    if languages:
        filtered = with_language_id(filtered, text_col).filter(
            F.col("lang_guess").isin(list(languages))
        )
    filtered = filtered.drop("_n_tokens")
    audit["after_quality_filter"] = filtered.count()

    deduped = exact_dedup(filtered, text_col, id_col)
    audit["after_exact_dedup"] = deduped.count()

    pairs = minhash_dedup_pairs(
        deduped, text_col, id_col,
        threshold=near_dup_threshold,
        **(minhash_kwargs or {}),
    )
    # keep the lowest id of each near-dup pair: drop every id that
    # appears as the larger side of a surviving pair
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    curated = deduped.join(losers, on=id_col, how="left_anti")
    audit["after_near_dedup"] = curated.count()
    audit["near_dup_pairs"] = pairs.count()
    return curated, audit
