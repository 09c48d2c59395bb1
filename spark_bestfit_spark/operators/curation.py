"""Corpus-curation operators beyond dedup: decontamination and
deterministic stratified sampling.

Decontamination removes training documents that contain evaluation/
benchmark content — a standard step in pretraining pipelines. Two tiers:

- ``flag_contamination``: a small probe list (canary strings, benchmark
  questions) shipped as a literal array; matching is substring
  containment on normalized text, evaluated JVM-side with a single
  ``exists`` over the array. Map-only, pipelines with the scan.
- ``decontaminate_by_ngrams``: the scale path for millions of probe
  n-grams — documents explode to word n-grams and semi-join the probe
  relation (broadcast when small, shuffle hash join otherwise); the
  flagged ids anti-join back. Shuffle profile: one join on the n-gram
  key.

``stratified_quota_sample`` keeps at most ``quota`` documents per
stratum, ranked by md5 of the id — a stable pseudo-random order any
engine reproduces, so the sample is deterministic and oracle-checkable
(unlike ``df.sample``, whose output depends on partitioning).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from spark_bestfit_spark.operators.dedup import _normalized, word_shingles

__all__ = [
    "flag_contamination",
    "decontaminate_by_ngrams",
    "stratified_quota_sample",
]


def flag_contamination(
    df: DataFrame,
    probes: list,
    text_col: str = "text",
) -> DataFrame:
    """Adds a boolean ``contaminated`` column: True when the normalized
    text (lowercased, whitespace collapsed) contains any probe string
    (case-insensitive substring)."""
    if not probes:
        return df.withColumn("contaminated", F.lit(False))
    norm = _normalized(text_col)
    probe_arr = F.array(*[F.lit(str(p).lower()) for p in probes])
    return df.withColumn(
        "contaminated",
        F.exists(probe_arr, lambda p: norm.contains(p)),
    )


def decontaminate_by_ngrams(
    df: DataFrame,
    probe_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_col: str = "ngram",
    n: int = 8,
    broadcast_probes: bool = True,
) -> tuple:
    """Removes documents sharing any word n-gram with the probe relation.

    Returns (clean DataFrame, flagged-ids DataFrame). ``probe_df`` holds
    one n-gram per row in ``ngram_col`` (normalized: lowercased,
    single-spaced). Set ``broadcast_probes=False`` when the probe set is
    too large to broadcast — the join degrades gracefully to a shuffle
    hash join on the n-gram key."""
    grams = df.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, n)).alias(ngram_col),
    )
    probes = probe_df.select(ngram_col).distinct()
    if broadcast_probes:
        probes = F.broadcast(probes)
    flagged = grams.join(probes, on=ngram_col, how="left_semi").select(
        id_col
    ).distinct()
    clean = df.join(flagged, on=id_col, how="left_anti")
    return clean, flagged


def stratified_quota_sample(
    df: DataFrame,
    strata: list,
    quota: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``quota`` rows per stratum, chosen by md5-rank of the id.

    The md5 order is uniform over ids but fully deterministic, so the
    same quota sample falls out on any engine, any partitioning, any
    cluster size — the property that makes corpus subsampling
    reproducible (and lets an oracle re-run it row-for-row)."""
    if quota <= 0:
        raise ValueError("quota must be positive")
    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )
