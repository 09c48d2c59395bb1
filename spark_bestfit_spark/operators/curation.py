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

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from spark_bestfit_spark.operators.dedup import _normalized, word_shingles

__all__ = [
    "assign_training_shards",
    "dsir_logweights",
    "dsir_logweights_by_group",
    "dsir_select",
    "dsir_select_by_group",
    "domain_mixture_weights",
    "flag_contamination",
    "contamination_overlap",
    "decontaminate_by_ngrams",
    "decontaminate_by_ngrams_bloom",
    "hash_split",
    "pack_training_sequences",
    "select_within_token_budget",
    "stratified_quota_sample",
    "strip_boilerplate_lines",
    "temperature_sample",
    "unimax_allocation",
    "weighted_sample",
]

_KNUTH_A = 2654435761  # Knuth's 2^32 multiplicative-hash constant


def _knuth_u(id_expr, seed: int = 0):
    """``u = ((id + seed) * 2654435761 mod 2^32) / 2^32`` in ``[0, 1)``
    — exact over the whole long domain.

    The naive ``((id + seed) * A) % 2^32`` breaks outside small
    positive ids: Spark's ``%`` keeps the dividend's sign (negative
    ids → negative u), ``id * A`` wraps int64 for ``id >= ~3.5e9``
    (negative u again), and under ``spark.sql.ansi.enabled`` the
    multiply — or the seed add at ``id`` near the long max — throws
    instead. Since the hash only depends on ``(id + seed) mod 2^32``,
    reduce FIRST (the seed folds in after the pmod, so the add can
    never overflow either), then evaluate in 16-bit limbs: with
    ``x = pmod(id + seed, 2^32) = hi·2^16 + lo``,

        A·x mod 2^32 = (A·hi mod 2^16)·2^16 + A·lo   (mod 2^32)

    and every intermediate stays < 2^48 — no int64 overflow, no ANSI
    trap, and identical values to the naive formula wherever that one
    was correct (so the DuckDB oracle twins, which use the naive SQL on
    small positive ids, are unchanged).
    """
    x = F.pmod(id_expr.cast("long"), F.lit(4294967296))
    if seed:
        x = F.pmod(x + F.lit(int(seed)), F.lit(4294967296))
    hi = F.floor(x / F.lit(65536)).cast("long")
    lo = x - hi * F.lit(65536)
    h = F.pmod(
        F.pmod(hi * F.lit(_KNUTH_A), F.lit(65536)) * F.lit(65536)
        + lo * F.lit(_KNUTH_A),
        F.lit(4294967296),
    )
    return h / F.lit(4294967296.0)


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


def decontaminate_fuzzy(
    df: DataFrame,
    probe_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str | None = None,
    probe_id_col: str | None = None,
    threshold: float = 0.5,
    shingle_k: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    max_probe_bucket: int | None = None,
) -> DataFrame:
    """NEAR-duplicate benchmark contamination: corpus documents whose
    shingle-set Jaccard with ANY probe (benchmark) document reaches
    ``threshold`` — the fuzzy tier between the exact n-gram gate
    (:func:`decontaminate_by_ngrams`: one shared n-gram) and the graded
    overlap fraction (:func:`contamination_overlap`). Catches lightly
    paraphrased or partially quoted eval items neither exact tier sees
    as whole-document duplicates.

    Dataflow (the probe side is an eval set — small by nature — so it
    rides broadcast everywhere and the CORPUS NEVER SHUFFLES):

    1. both sides band their MinHash signatures map-side
       (``num_hashes`` hashes, ``num_bands`` bands — the self-dedup
       LSH from ``dedup.py``, cross-relation);
    2. corpus bands equi-join the BROADCAST probe bands on
       (band, band_sig) — candidates only, one distinct over the
       (corpus_id, probe_id) pairs;
    3. verification recomputes the exact shingle Jaccard: the corpus
       is semi-joined map-side against the broadcast candidate ids
       (a second map-only text pass over the few flagged docs), the
       probe shingle sets join by broadcast.

    Documents shorter than ``shingle_k`` words band on their single
    degenerate whole-text shingle (so two short docs only meet when
    their full texts MinHash-collide). ``max_probe_bucket`` drops probe band buckets larger than
    the cap (boilerplate band signatures — the ``max_bucket_size``
    convention), bounding the candidate fan-out per corpus row.

    Returns verified pairs ``(id_col, probe_id, jaccard)`` rounded to
    6; anti-join the ids downstream to drop, or keep the pairs as an
    audit trail.
    """
    from spark_bestfit_spark.operators.dedup import (
        ensure_parallelism,
        minhash_signature_col,
    )

    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    # a one-file corpus would hash single-threaded; no-op at real scale
    df = ensure_parallelism(df)
    probe_df = ensure_parallelism(probe_df)
    ptext = probe_text_col or text_col
    pid = probe_id_col or id_col
    if pid == id_col:
        pid_out = f"probe_{pid}"
    else:
        pid_out = pid

    def _bands(relation, idc, tcol, out_id):
        sig = minhash_signature_col(tcol, num_hashes, shingle_k)
        rows_per_band = num_hashes // num_bands
        # r12 (guide §1/§2.2): bind the signature ONCE through a
        # one-element transform (the minhash_signature_col convention).
        # The old shape referenced `sig` inside the per-band lambda, so
        # the ENTIRE MinHash kernel (md5 per shingle + num_hashes
        # permutation minima) was re-evaluated once per band — 4x the
        # dominant cost of this operator (stage-attributed: the corpus
        # banding stage was 7.8 s of the 10 s sf1 line; the signature
        # alone costs ~2 s warm).
        band_sigs = F.transform(
            F.array(sig),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(
                            s,
                            (b * rows_per_band + 1).cast("int"),
                            F.lit(rows_per_band).cast("int"),
                        ),
                        lambda x: x.cast("string"),
                    ),
                ),
            ),
        )[0]
        # r12: the old `filter(size(word_shingles(...)) > 0)` here was
        # semantically DEAD — word_shingles never returns an empty
        # array (null/empty/short text all yield the 1-element
        # degenerate shingle, verified row-by-row), so the filter kept
        # every row while paying a full extra shingle-construction
        # pass per scan (measured 3.0 s of the sf1 corpus pass —
        # shingle building is this operator's dominant cost).
        return relation.select(
            F.col(idc).alias(out_id),
            F.posexplode(band_sigs).alias("band", "band_sig"),
        )

    probe_bands = _bands(probe_df, pid, ptext, pid_out)
    if max_probe_bucket is not None:
        w = Window.partitionBy("band", "band_sig")
        probe_bands = (
            probe_bands.withColumn("_bc", F.count(F.lit(1)).over(w))
            .filter(F.col("_bc") <= int(max_probe_bucket))
            .drop("_bc")
        )
    corpus_bands = _bands(df, id_col, text_col, id_col)
    cand = (
        corpus_bands.join(
            F.broadcast(probe_bands), on=["band", "band_sig"], how="inner"
        )
        .select(id_col, pid_out)
        .distinct()
    )
    probe_sets = probe_df.select(
        F.col(pid).alias(pid_out),
        F.array_distinct(word_shingles(ptext, shingle_k)).alias("_ps"),
    )
    # candidates + their probe shingle sets, broadcast as one small
    # relation: verification is then ONE broadcast join against the
    # corpus (the second and last map-side text pass)
    cand_sets = cand.join(F.broadcast(probe_sets), on=pid_out, how="inner")
    inter = F.size(F.array_intersect("_cs", "_ps")).cast("double")
    union = F.size(F.array_union("_cs", "_ps")).cast("double")
    return (
        df.join(F.broadcast(cand_sets), on=id_col, how="inner")
        .withColumn(
            "_cs",
            F.array_distinct(word_shingles(text_col, shingle_k)),
        )
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select(id_col, pid_out, "jaccard")
    )


def contamination_overlap(
    df: DataFrame,
    probe_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_col: str = "ngram",
    n: int = 8,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Fractional n-gram overlap with the probe set per document — the
    GRADED complement to :func:`decontaminate_by_ngrams`' boolean gate:
    GPT-3/PaLM-style decontamination drops or downweights documents
    whose overlap FRACTION crosses a threshold rather than any document
    sharing a single n-gram (one colliding idiom shouldn't kill a long
    document; a benchmark quote pasted wholesale should).

    ``overlap_frac = |distinct doc n-grams ∩ probes| / |distinct doc
    n-grams|``. Same dataflow as the boolean tier — explode to distinct
    word n-grams, semi-match the probe relation (broadcast when small,
    shuffle hash join on the n-gram key otherwise), ONE doc-keyed
    re-aggregation — so the cost at 100 TB is identical to the gate it
    refines; thresholding is a plain filter on the output.

    Output: (id_col, n_ngrams, n_matched, overlap_frac) for every
    input document (docs with no probe collision report 0.0)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    grams = df.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, n)).alias(ngram_col),
    )
    probes = probe_df.select(ngram_col).distinct().withColumn(
        "_hit", F.lit(1)
    )
    if broadcast_probes:
        probes = F.broadcast(probes)
    joined = grams.join(probes, on=ngram_col, how="left")
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_ngrams"),
        F.coalesce(F.sum("_hit"), F.lit(0))
        .cast("long")
        .alias("n_matched"),
        F.round(
            F.coalesce(F.sum("_hit"), F.lit(0)) / F.count("*"), 6
        ).alias("overlap_frac"),
    )


def _bloom_positions(col, m: int, k: int):
    """k Bloom bit positions for a string column: k INDEPENDENT
    xxhash64 views (seeded by a literal index column), each
    pmod-reduced to [0, m). No double hashing on purpose: the
    Kirsch-Mitzenmacher scheme lays each value's positions on an
    arithmetic progression mod m, and at sketch-sized m two values
    that collide on the stride share k-1 of k positions — measured
    ~60x false-positive inflation on the test corpus. Independent
    hashes restore the textbook fill^k rate. Build and probe evaluate
    the SAME JVM expression, so positions are consistent by
    construction; pmod keeps everything ANSI-safe."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m)) for i in range(k)]
    )


def decontaminate_by_ngrams_bloom(
    df: DataFrame,
    probe_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_col: str = "ngram",
    n: int = 8,
    expected_items: int | None = None,
    fpp: float = 1e-6,
) -> tuple:
    """Bloom-filter decontamination — the 100 TB path when the probe
    n-gram set is too large to broadcast as data but fits as a sketch.

    Built entirely from public primitives (Spark's internal
    ``bloom_filter_agg`` is not SQL-registered): the distinct probe
    n-grams hash to k = ~log2(1/fpp) bit positions JVM-side
    (:func:`_bloom_positions`), a ``bit_or`` aggregation folds them
    into <= m/64 bitset words (order-independent, so the sketch is
    deterministic on any partitioning), and the words broadcast as one
    numpy bitset — ~28.8 bits (3.6 bytes) per probe at fpp = 1e-6, so
    a million probe n-grams travel as ~3.6 MB where the exact relation
    would be hundreds of MB. The corpus side computes the same
    positions JVM-side and checks them against the broadcast bitset in
    one Arrow-vectorized pandas UDF — a map-only pass, no join or
    shuffle on the corpus. (At extreme probe counts size the sketch to
    what a broadcast can carry — ~10^8 probes at 1e-6 is a ~360 MB
    bitset; loosen fpp or shard the probe space past that.)

    Guarantees: NO false negatives (every truly contaminated document
    is flagged); false positives over-flag a document with probability
    ~L * fpp for an L-gram document, so size ``fpp`` to the corpus
    (the 1e-6 default keeps expected over-flagging ~2 docs per 10k at
    L ~ 200). Use :func:`decontaminate_by_ngrams` when exactness
    matters more than broadcast size.

    Returns (clean DataFrame, flagged-ids DataFrame)."""
    from pyspark.sql.functions import pandas_udf

    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    probes = probe_df.select(ngram_col).distinct()
    if expected_items is None:
        # one bounded count job; pass expected_items to stay fully lazy
        expected_items = probes.count()
    expected_items = max(int(expected_items), 1)
    m = max(
        128,
        int(np.ceil(-expected_items * np.log(fpp) / (np.log(2.0) ** 2))),
    )
    # optimal k ~ (m/n) ln2 ~ log2(1/fpp); the cap only binds when the
    # m floor (128 bits) dominates a tiny probe set, where extra
    # hashes add cost without meaningfully moving the fp rate
    k = min(30, max(1, int(round(m / expected_items * np.log(2.0)))))
    pos = probes.select(
        F.explode(_bloom_positions(F.col(ngram_col), m, k)).alias("p")
    )
    words = (
        pos.select(
            F.expr("p DIV 64").alias("w"),
            F.expr("shiftleft(1L, cast(pmod(p, 64) as int))").alias("msk"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(msk)").alias("bits"))
        .collect()
    )
    bitset = np.zeros(m // 64 + 1, dtype=np.uint64)
    for r in words:
        bitset[int(r["w"])] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    b_bits = df.sparkSession.sparkContext.broadcast(bitset)

    def _mc(*cols):
        # k flat long columns, each checked in one vectorized pass —
        # passing array<long> instead costs a per-row vstack that
        # dominated the whole operator (~3x wall) at bench scale
        bits = b_bits.value
        one = np.uint64(1)
        acc = None
        for c in cols:
            a = c.to_numpy(dtype=np.int64)
            hit = (bits[a >> 6] >> (a & 63).astype(np.uint64)) & one
            acc = hit if acc is None else (acc & hit)
        return pd.Series(acc.astype(bool))

    _might_contain = pandas_udf(_mc, "boolean")
    pos_cols = [
        F.pmod(F.xxhash64(F.col(ngram_col), F.lit(i)), F.lit(m))
        for i in range(k)
    ]
    grams = df.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, n)).alias(ngram_col),
    )
    flagged = (
        grams.filter(_might_contain(*pos_cols))
        .select(id_col)
        .distinct()
    )
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


def _whitespace_tokens(text_col: str):
    return F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))


def domain_mixture_weights(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    temperature: float = 0.7,
    target_tokens: int | None = None,
) -> DataFrame:
    """Temperature-flattened domain sampling weights — the multinomial
    mixture step of a pretraining data pipeline (alpha-sampling):
    ``w_d ∝ p_d^T`` where ``p_d`` is the domain's share of corpus
    tokens and ``T ∈ (0, 1]`` flattens toward uniform (T=1 keeps the
    natural mix; T→0 equalizes domains).

    One groupBy on the domain key produces the per-domain relation;
    normalization happens inside the plan over the tiny aggregate (a
    global window over ~#domains rows), so the whole thing is a single
    lazy, scale-safe plan: the shuffle carries one row per domain no
    matter the corpus size.

    Output: (domain_col, n_docs, n_tokens, p, w[, sampling_rate]) —
    ``sampling_rate = min(1, w_d * target_tokens / n_tokens_d)`` is the
    per-domain keep probability that lands the expected post-sampling
    token count on ``target_tokens`` (clamped: up-sampling by repeats
    is an epoch decision, not a row filter).
    """
    if not 0.0 < temperature <= 1.0:
        raise ValueError("temperature must be in (0, 1]")
    per_domain = df.groupBy(domain_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(_whitespace_tokens(text_col)).cast("long").alias("n_tokens"),
    )
    everything = Window.partitionBy()
    p = F.col("n_tokens") / F.sum("n_tokens").over(everything)
    pt = F.pow(p, F.lit(float(temperature)))
    w = pt / F.sum(pt).over(everything)
    out = per_domain.select(
        domain_col, "n_docs", "n_tokens", p.alias("p"), w.alias("w")
    )
    if target_tokens is not None:
        out = out.withColumn(
            "sampling_rate",
            F.least(
                F.lit(1.0),
                F.col("w") * F.lit(float(target_tokens)) / F.col("n_tokens"),
            ),
        )
    return out


def temperature_sample(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    temperature: float = 0.7,
    target_tokens: int = 1_000_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Down-sample a corpus to a temperature-flattened domain mixture.

    Each document is kept iff ``u(id) < sampling_rate(domain)`` where
    ``u`` is a Knuth multiplicative hash of the id mapped to [0, 1) —
    deterministic pure-integer arithmetic, so the sample is identical
    on any engine, partitioning, or cluster size (``df.sample`` is
    none of those), and an oracle can replay it row-for-row. The rate
    relation is tiny (one row per domain) and broadcast into a
    map-side join: no extra shuffle on the corpus.
    """
    rates = domain_mixture_weights(
        df, domain_col, text_col, temperature, target_tokens
    ).select(domain_col, "sampling_rate")
    u = _knuth_u(F.col(id_col))
    return (
        df.join(F.broadcast(rates), on=domain_col)
        .filter(u < F.col("sampling_rate"))
        .drop("sampling_rate")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    target_fraction: float,
    id_col: str = "doc_id",
    seed: int = 2,
) -> DataFrame:
    """Down-sample keeping each row with probability proportional to a
    per-row score (quality, token count, recency weight...), scaled so
    the expected kept fraction is ``target_fraction``.

        rate(row) = min(1, weight * target_fraction * n / sum(weight))

    The keep decision is the seeded Knuth-hash Bernoulli (deterministic
    on any engine/partitioning — the same convention as
    ``temperature_sample``); the normalizing scalar comes from a 1-row
    aggregate joined in-plan, so the whole thing is one scan plus a
    broadcast of one row. Rows with null/negative weight are dropped.
    """
    if not 0.0 < target_fraction <= 1.0:
        raise ValueError("target_fraction must be in (0, 1]")
    w = F.col(weight_col).cast("double")
    base = df.filter(w.isNotNull() & (w > 0))
    totals = base.agg(
        F.sum(w).alias("_tw"), F.count("*").alias("_n")
    )
    u = _knuth_u(F.col(id_col), seed)
    rate = F.least(
        F.lit(1.0),
        w * F.lit(float(target_fraction)) * F.col("_n") / F.col("_tw"),
    )
    return (
        base.crossJoin(F.broadcast(totals))
        .filter(u < rate)
        .drop("_tw", "_n")
    )


def hash_split(
    df: DataFrame,
    weights: dict | None = None,
    id_col: str = "doc_id",
    seed: int = 1,
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed id.

    Each row lands in the split whose cumulative weight interval
    contains ``u(id) = Knuth_hash(id + seed) / 2^32`` — pure integer
    arithmetic, so the assignment is identical on any engine,
    partitioning, or rerun (``randomSplit`` is none of those: it
    re-draws per partition). ``seed`` decorrelates the split from
    other hash-derived decisions (``temperature_sample`` uses the
    un-shifted hash). Weights are normalized; dict order defines the
    interval order. Map-only: no shuffle, pipelines with the scan.
    """
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = _knuth_u(F.col(id_col), seed)
    names = list(weights)
    acc = 0.0
    expr = F.lit(names[-1])  # the last interval absorbs rounding
    conds = []
    for name in names[:-1]:
        acc += weights[name] / total
        conds.append((acc, name))
    for threshold, name in reversed(conds):
        expr = F.when(u < F.lit(threshold), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def assign_training_shards(
    df: DataFrame,
    tokens_per_shard: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_col: str | None = None,
    num_buckets: int = 1024,
) -> DataFrame:
    """Assign each document to a training shard by cumulative token
    count: shard s holds a contiguous (in ``order_col``) run of docs
    whose running token total falls in [s*T, (s+1)*T). The standard
    pre-tokenization sharding step before writing training files —
    shards come out token-balanced to within one document.

    shard_id = floor((cumsum(tokens) - tokens) / T) over the ordering,
    i.e. a document starts a new shard when the PRECEDING total crosses
    the boundary. Deterministic given the ordering (defaults to
    ``id_col``; ties broken by id), so the relation is exactly
    SQL-mirrorable.

    The global running sum is a partitioned two-phase prefix sum (the
    same shape as the exact two-sample K-S in operators/stats.py) — no
    single-partition window anywhere:

      1. range-bucket the order value into ``num_buckets`` equi-width
         buckets (width_bucket over the global [lo, hi] — a function of
         the VALUE, independent of physical partitioning);
      2. per-bucket token totals (<= num_buckets + 1 tiny rows) are
         collected, turned into exclusive prefix offsets, broadcast;
      3. one HASH-partitioned window (partitionBy bucket, orderBy
         order + id) computes local cumsums; offset + local cumsum is
         the global running total.

    At 100 TB the only exchanges are the bucket hash exchange and the
    1-row min/max agg; the driver sees <= num_buckets + 1 rows.

    Output: (id_col, n_tokens, shard_id).
    """
    cum = _cumulative_tokens(
        df, text_col, id_col, order_col, num_buckets,
        caller="assign_training_shards",
    )
    if cum is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {df.schema[id_col].dataType.simpleString()}, "
            "n_tokens long, shard_id long"
        )
    return cum.select(
        F.col(id_col),
        "n_tokens",
        F.floor(
            (F.col("_cum") - F.col("_eff")) / F.lit(tokens_per_shard)
        )
        .cast("long")
        .alias("shard_id"),
    )


def _cumulative_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    order_col: str | None,
    num_buckets: int,
    caller: str,
    sep_tokens: int = 0,
    length_col: str | None = None,
) -> DataFrame | None:
    """Global running token totals over a deterministic ordering — the
    partitioned two-phase prefix sum shared by training-shard
    assignment and sequence packing (see assign_training_shards for
    the scale argument). Returns (id_col, n_tokens, _eff, _cum) where
    ``_eff = n_tokens + sep_tokens`` is the summed value and ``_cum``
    its inclusive running total; None when the input is empty.
    ``length_col``: use a precomputed per-doc length column (real
    tokenizer counts, char budgets, ...) instead of the whitespace
    tokenization of ``text_col``."""
    from pyspark.sql import Window
    from pyspark.sql.types import DateType, NumericType, TimestampType

    order = order_col or id_col
    # The range-bucketing needs a numeric order value. Casting an
    # arbitrary type to double would silently null out strings (dropping
    # every row in the inner join below), so map the supported orderable
    # types explicitly and refuse the rest up front.
    order_type = df.schema[order].dataType
    if isinstance(order_type, NumericType):
        ord_expr = F.col(order).cast("double")
    elif isinstance(order_type, TimestampType):
        ord_expr = F.unix_micros(F.col(order)).cast("double")
    elif isinstance(order_type, DateType):
        ord_expr = F.datediff(F.col(order), F.lit("1970-01-01")).cast(
            "double"
        )
    else:
        raise TypeError(
            f"{caller}: order column {order!r} has type "
            f"{order_type.simpleString()}; only numeric, timestamp, and "
            "date order columns are supported — derive a numeric rank "
            "(e.g. a hash or an id) first"
        )
    if length_col is not None:
        toks = F.col(length_col)
    else:
        toks = F.size(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        )
    base = df.select(
        F.col(id_col),
        ord_expr.alias("_ord"),
        toks.cast("long").alias("n_tokens"),
        (toks.cast("long") + F.lit(int(sep_tokens))).alias("_eff"),
    )
    spark = df.sparkSession
    stats = base.agg(
        F.min("_ord").alias("lo"),
        F.max("_ord").alias("hi"),
        F.sum(F.col("_ord").isNull().cast("long")).alias("n_null"),
    ).first()
    if stats["n_null"]:
        raise ValueError(
            f"{caller}: {stats['n_null']} rows have a null "
            f"order value in {order!r}; a null has no position in the "
            "cumulative-token ordering — filter them or choose another "
            "order column"
        )
    if stats["lo"] is None:
        return None
    lo, hi = float(stats["lo"]), float(stats["hi"])
    bk = (
        F.width_bucket(F.col("_ord"), F.lit(lo), F.lit(hi), F.lit(num_buckets))
        if hi > lo
        else F.lit(1)
    )
    bucketed = base.withColumn("_bk", bk)
    btot = (
        bucketed.groupBy("_bk").agg(F.sum("_eff").alias("t")).collect()
    )
    off = 0
    offsets = []
    # null buckets cannot occur (nulls rejected above), but keep the
    # sort None-safe so a future null can't crash the int comparison
    for r in sorted(btot, key=lambda r: (r["_bk"] is None, r["_bk"])):
        offsets.append((int(r["_bk"]), off))
        off += int(r["t"])
    off_df = spark.createDataFrame(offsets, "_bk long, _off long")
    w = Window.partitionBy("_bk").orderBy("_ord", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.col("_off") + F.sum("_eff").over(w)
    return bucketed.join(F.broadcast(off_df), "_bk").select(
        F.col(id_col), "n_tokens", "_eff", cum.alias("_cum")
    )


def pack_training_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_col: str | None = None,
    sep_tokens: int = 1,
    num_buckets: int = 1024,
    length_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the step that turns a
    document stream into fixed-length training sequences: documents are
    concatenated in a deterministic order (``sep_tokens`` separator/EOS
    tokens after each doc) and the token stream is cut every
    ``seq_len`` tokens, so a document may span several sequences.

    Built on the same partitioned two-phase prefix sum as
    :func:`assign_training_shards` (no global sort, no
    single-partition window; driver sees <= num_buckets rows), with
    the chunk arithmetic a map-only epilogue — exactly
    SQL-mirrorable, so an oracle can replay the packing row-for-row.

    Output per document: (id_col, n_tokens, start_offset, first_seq,
    last_seq, n_seqs) where start_offset is the document's global
    token offset, first_seq/last_seq the sequence ids covering its
    span (separator included), and n_seqs how many sequences it
    touches (>1 means the doc crosses chunk boundaries).

    ``length_col``: pack by a PRECOMPUTED per-doc length instead of
    the whitespace token count — the budget-true path: feed
    ``bpe_doc_token_counts``'s ``n_bpe_tokens`` to pack in REAL
    tokenizer tokens (pytest pins the composition), or ``n_chars``
    for character budgets (the oracle-checked path)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if sep_tokens < 0:
        raise ValueError("sep_tokens must be non-negative")
    cum = _cumulative_tokens(
        df, text_col, id_col, order_col, num_buckets,
        caller="pack_training_sequences", sep_tokens=sep_tokens,
        length_col=length_col,
    )
    if cum is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {df.schema[id_col].dataType.simpleString()}, "
            "n_tokens long, start_offset long, first_seq long, "
            "last_seq long, n_seqs long"
        )
    # pure 64-bit integer DIV (never a double: offsets at 100 TB exceed
    # 2^53 tokens)
    tmp = cum.select(
        F.col(id_col),
        "n_tokens",
        (F.col("_cum") - F.col("_eff")).alias("_start"),
        (F.col("_cum") - F.lit(1)).alias("_cend"),
    )
    first = F.expr(f"_start DIV {int(seq_len)}")
    last = F.expr(f"_cend DIV {int(seq_len)}")
    return tmp.select(
        F.col(id_col),
        "n_tokens",
        F.col("_start").alias("start_offset"),
        first.alias("first_seq"),
        last.alias("last_seq"),
        (last - first + F.lit(1)).cast("long").alias("n_seqs"),
    )


def strip_boilerplate_lines(
    df: DataFrame,
    max_doc_frac: float = 0.5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    normalize: bool = True,
) -> DataFrame:
    """Remove lines that repeat across a large fraction of the corpus —
    the C4/RefinedWeb boilerplate strip (nav bars, cookie banners,
    license headers) applied line-wise: a line is boilerplate when it
    appears in at least ``min_docs`` documents AND in at least
    ``max_doc_frac`` of the corpus; boilerplate lines are deleted and
    each document is reassembled in original line order.

    ``line_sep`` is a LITERAL separator (escaped before the split and
    reused verbatim for the rejoin). With ``normalize`` the repeat
    count keys on the lowercased/trimmed line, so casing/indentation
    variants of the same banner pool together; emitted text always
    keeps the ORIGINAL line bytes.

    Dataflow at 100 TB: posexplode -> line-key countDistinct (the map-
    side-combined wide aggregation), line-keyed join back (vocabulary-
    sized relation, the standard term-keyed equi-join — AQE broadcasts
    it when the distinct-line relation turns out small), corpus size N
    as a broadcast 1-row relation, then ONE doc-keyed reassembly
    aggregation (collect_list skips the nulled-out dropped lines;
    sort_array restores line order). No eager action, no global sort.

    Output: (id_col, text_col cleaned, n_lines, n_dropped) — one row
    per input document, including documents stripped to empty."""
    import re as _re

    if not 0.0 < max_doc_frac <= 1.0:
        raise ValueError("max_doc_frac must be in (0, 1]")
    if min_docs < 2:
        raise ValueError(
            "min_docs must be >= 2 (a line must repeat to be boilerplate)"
        )
    if not line_sep:
        raise ValueError("line_sep must be non-empty")
    n_docs = df.agg(
        F.countDistinct(id_col).cast("double").alias("_n_docs")
    )
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(line_sep), -1)
        ).alias("_pos", "_line"),
    )
    key = (
        F.lower(F.trim(F.col("_line"))) if normalize else F.col("_line")
    )
    keyed = lines.withColumn("_key", key)
    ldf = keyed.groupBy("_key").agg(
        F.countDistinct(id_col).alias("_ldf")
    )
    flagged = (
        keyed.join(ldf, "_key")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_drop",
            (F.col("_ldf") >= F.lit(int(min_docs)))
            & (
                F.col("_ldf")
                >= F.lit(float(max_doc_frac)) * F.col("_n_docs")
            ),
        )
    )
    kept_struct = F.when(
        ~F.col("_drop"), F.struct(F.col("_pos"), F.col("_line"))
    )  # null when dropped -> collect_list skips it
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.col("_drop").cast("long")).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(kept_struct)),
                    lambda s: s["_line"],
                ),
                line_sep,
            ).alias(text_col),
        )
        .select(id_col, text_col, "n_lines", "n_dropped")
    )


def select_within_token_budget(
    df: DataFrame,
    max_tokens: int,
    quality_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    descending: bool = True,
    num_buckets: int = 1024,
) -> DataFrame:
    """Greedy corpus selection under a token budget: rank documents
    (best ``quality_col`` first by default; stable ``id_col`` order
    when no quality column is given), take documents while the running
    token total stays within ``max_tokens`` — the data-selection step
    that turns "we can afford N tokens" into a concrete training
    subset.

    Built on the same partitioned two-phase prefix sum as
    :func:`pack_training_sequences` (range-bucketed ordering,
    per-bucket offsets broadcast back, windows riding the bucket
    partitioning — no global sort, no single-partition window), so the
    cut is EXACT: the emitted set is precisely the maximal prefix of
    the ranking whose cumulative token count fits the budget, with
    deterministic (quality, id) tie-breaks. Whitespace tokenization —
    the convention shared with the text-stats/packing operators.

    Output: (id_col, n_tokens, cum_tokens) for SELECTED documents
    only; ``cum_tokens`` is the inclusive running total, so
    ``max(cum_tokens) <= max_tokens`` and adding any rejected document
    would break the budget."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if quality_col is not None:
        qt = df.schema[quality_col].dataType
        from pyspark.sql.types import NumericType

        if not isinstance(qt, NumericType):
            raise TypeError(
                f"quality_col {quality_col!r} must be numeric, got "
                f"{qt.simpleString()}"
            )
        ord_expr = (
            -F.col(quality_col) if descending else F.col(quality_col)
        ).cast("double")
        base = df.withColumn("_sel_ord", ord_expr)
        order_col = "_sel_ord"
    else:
        base = df
        order_col = None
    cum = _cumulative_tokens(
        base, text_col, id_col, order_col, num_buckets,
        caller="select_within_token_budget",
    )
    if cum is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {df.schema[id_col].dataType.simpleString()}, "
            "n_tokens long, cum_tokens long"
        )
    return cum.filter(F.col("_cum") <= F.lit(int(max_tokens))).select(
        F.col(id_col), "n_tokens", F.col("_cum").alias("cum_tokens")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_text: bool = True,
    preserve_case: bool = False,
) -> DataFrame:
    """Split documents into fixed-length token windows with optional
    overlap — the context-window assembly step for pretraining /
    retrieval corpora (complementing :func:`pack_training_sequences`,
    which concatenates ACROSS documents; this one windows WITHIN each
    document, never mixing sources).

    NOTE: by default ``chunk_text`` is LOWERCASED (the normalization
    convention shared with the text-stats operators, which keeps chunk
    boundaries consistent with their token counts). When the chunks
    feed training or retrieval corpora where the source casing must
    survive, pass ``preserve_case=True`` — chunk boundaries are
    unaffected (whitespace tokenization is case-blind), only the
    emitted text changes.

    Chunk starts are ``0, stride, 2*stride, ...`` with
    ``stride = chunk_tokens - overlap``; each chunk covers tokens
    ``[start, min(start + chunk_tokens, n))``. A trailing start whose
    window would add no tokens beyond the previous chunk (i.e.
    ``start > 0`` and ``start + overlap >= n``) is dropped, so every
    emitted chunk contributes new content and the final chunk may be
    short. Tokenization is the whitespace convention shared with the
    text-stats operators.

    Entirely map-side JVM column expressions (``sequence`` +
    higher-order ``filter`` + ``posexplode`` + ``slice`` — no Python,
    no shuffle, no exchange in the plan): at 100 TB this is a pure
    scan whose output is written partition-local. Exactly
    SQL-mirrorable, so an oracle can replay the chunking row-for-row.

    Output: (id_col, chunk_idx, start_token, n_chunk_tokens[,
    chunk_text]) — one row per chunk; documents with no tokens emit
    nothing."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    text = F.trim(F.col(text_col))
    toks = F.split(text if preserve_case else F.lower(text), r"\s+")
    base = df.select(
        F.col(id_col), toks.alias("_toks")
    ).withColumn(
        "_n", F.size("_toks")
    ).filter(
        # a whitespace-split of '' yields [''] — treat as zero tokens
        (F.col("_n") > 0)
        & ~((F.col("_n") == 1) & (F.element_at("_toks", 1) == F.lit("")))
    )
    starts = F.filter(
        F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride)),
        lambda s: (s == 0) | (s + F.lit(overlap) < F.col("_n")),
    )
    exploded = base.select(
        F.col(id_col),
        F.col("_toks"),
        F.col("_n"),
        F.posexplode(starts).alias("chunk_idx", "start_token"),
    )
    out_cols = [
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_token").cast("long").alias("start_token"),
        F.least(
            F.lit(chunk_tokens), F.col("_n") - F.col("start_token")
        ).cast("long").alias("n_chunk_tokens"),
    ]
    if with_text:
        out_cols.append(
            F.array_join(
                F.slice(
                    "_toks", F.col("start_token") + 1, F.lit(chunk_tokens)
                ),
                " ",
            ).alias("chunk_text")
        )
    return exploded.select(*out_cols)


def ngram_novelty(
    df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per-document n-gram novelty against a reference corpus —
    ``novelty = |distinct doc n-grams not in corpus| / |distinct doc
    n-grams|`` — the data-curation selector for "how much NEW text
    does this document add" (dedup asks "is this a copy of one other
    document"; novelty asks "is any of this unseen ANYWHERE in what we
    already have"), used to prioritize acquisition and to score
    synthetic-data regurgitation.

    Direction and scale shape are the REVERSE of
    :func:`contamination_overlap`: there the probe side is small and
    broadcast; here the reference side is a full corpus, so its
    distinct n-gram vocabulary is built with one map-combinable
    distinct and the match is a shuffle hash join co-partitioned on
    the n-gram key — at 100 TB both sides stay hash-partitioned and
    nothing is broadcast or collected. Documents also present in
    ``corpus_df`` should be excluded by the caller (novelty vs a
    corpus containing yourself is 0).

    Output: ``(id_col, n_ngrams, n_novel, novelty)`` for every input
    document, novelty rounded to 6.
    """
    from spark_bestfit_spark.operators.dedup import word_shingles

    if n < 1:
        raise ValueError("n must be >= 1")
    grams = df.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, n)).alias("_g"),
    )
    vocab = (
        corpus_df.select(
            F.explode(word_shingles(text_col, n)).alias("_g")
        )
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    joined = grams.join(vocab, on="_g", how="left")
    novel = F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0))
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_ngrams"),
        novel.cast("long").alias("n_novel"),
        F.round(novel / F.count(F.lit(1)), 6).alias("novelty"),
    )


def leakage_check(
    df: DataFrame,
    split_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    key: Column | None = None,
) -> DataFrame:
    """Train/eval leakage report: per split, how many documents share
    their EXACT normalized text with a document in a DIFFERENT split
    — the contamination audit every train/val/test cut needs before
    an eval number can be trusted (a val doc whose text also sits in
    train measures memorization, not generalization).

    One data-sized exchange: a (normalized-text, split) groupBy; the
    spanning test and both per-split rollups run on that grouped
    relation (distinct texts x splits rows), co-partitioned on the
    text key so the self-join never reshuffles. Normalization matches
    :func:`spark_bestfit_spark.operators.dedup.exact_dedup`
    (lower/trim/whitespace-collapse); a production pipeline would
    group on the 128-bit content hash instead of the string — the
    group structure is identical, the key just smaller.

    ``key`` overrides the content key (a Column expression over the
    input row) for coarser leakage notions — e.g. a leading-k-word
    prefix fingerprint catches near-duplicate leakage that exact text
    equality misses, a URL-domain key catches source-level leakage.

    Returns one row per split: ``(split_col, n_docs, n_leaked,
    leak_frac)`` with leak_frac rounded to 6.
    """
    from spark_bestfit_spark.operators.dedup import (
        _normalized,
        ensure_parallelism,
    )

    base = ensure_parallelism(
        df.filter(
            F.col(split_col).isNotNull() & F.col(text_col).isNotNull()
        )
    ).select(
        F.col(split_col).alias("_split"),
        (key if key is not None else _normalized(text_col)).alias(
            "_key"
        ),
    )
    per = base.groupBy("_key", "_split").agg(
        F.count(F.lit(1)).alias("_c")
    )
    spans = per.groupBy("_key").agg(
        F.count(F.lit(1)).alias("_nsplits")
    )
    joined = per.join(spans, "_key")
    return (
        joined.groupBy("_split")
        .agg(
            F.sum("_c").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("_nsplits") > 1, F.col("_c")).otherwise(0))
            .cast("long")
            .alias("n_leaked"),
        )
        .select(
            F.col("_split").alias(split_col),
            "n_docs",
            "n_leaked",
            F.round(F.col("n_leaked") / F.col("n_docs"), 6).alias(
                "leak_frac"
            ),
        )
    )


def group_split(
    df: DataFrame,
    group_key,
    weights: dict | None = None,
    seed: int = 1,
) -> DataFrame:
    """Group-aware train/val/test assignment: :func:`hash_split`
    keyed on a GROUP identity instead of the row id, so every member
    of a group (near-dup cluster, content-prefix family, source
    domain, user) lands in the SAME split — the construction that
    makes :func:`leakage_check` on that key zero by definition.
    Splitting rows independently and then deduping across splits
    throws data away; splitting by group never creates the leak.

    ``group_key`` is a column name or Column expression; its string
    form hashes through the portable md5-prefix path
    (:func:`spark_bestfit_spark.operators.dedup.portable_hash64`),
    then the Knuth multiplicative stage of :func:`hash_split` maps it
    to the weight intervals. Map-only: no shuffle, engine- and
    partitioning-independent, ANSI-safe.
    """
    from spark_bestfit_spark.operators.dedup import portable_hash64

    key = (
        F.col(group_key) if isinstance(group_key, str) else group_key
    )
    tmp = df.withColumn("_gid", portable_hash64(key.cast("string")))
    return hash_split(tmp, weights, id_col="_gid", seed=seed).drop(
        "_gid"
    )


def kfold_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 5,
    seed: int = 11,
    group_key: Column | None = None,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold
    ``floor(u * k)`` with ``u`` the seeded Knuth hash of the row id
    (or, with ``group_key``, of the GROUP identity via the portable
    md5 path — every member of a group lands in the SAME fold, the
    k-fold analogue of :func:`group_split`'s leakage guarantee).

    Map-only, no shuffle; identical on any engine / partitioning /
    rerun (``randomSplit`` is none of those), so every fold's
    train/test complement is replayable. ``seed`` decorrelates folds
    from other hash-derived decisions (splits, sampling).

    Appends ``fold_col`` (int in [0, k)).
    """
    from spark_bestfit_spark.operators.dedup import portable_hash64

    if k < 2:
        raise ValueError("k must be >= 2")
    if group_key is not None:
        hid = portable_hash64(group_key.cast("string"))
    else:
        hid = F.col(id_col)
    u = _knuth_u(hid, seed)
    # u in [0, 1) exactly, so floor(u * k) lands in [0, k)
    return df.withColumn(
        fold_col, F.floor(u * F.lit(int(k))).cast("int")
    )


def rebalance_classes(
    df: DataFrame,
    label_col: str,
    target_fractions: dict,
    id_col: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Deterministic per-class down-sampling: keep each row of class
    ``c`` with probability ``target_fractions[c]`` (classes absent
    from the dict keep everything) — the class-imbalance corrector
    for training corpora, as replayable pure-integer arithmetic
    instead of ``sampleBy``'s partitioning-dependent RNG.

    Keep decision: ``u(id, seed) < fraction(class)`` with ``u`` the
    seeded Knuth hash — identical on any engine/partitioning/rerun,
    oracle-replayable row-for-row. The fraction relation is one row
    per class, broadcast into a map-side join; no data-sized shuffle.
    """
    if not target_fractions:
        raise ValueError("target_fractions must be non-empty")
    for c, f in target_fractions.items():
        if not 0.0 <= float(f) <= 1.0:
            raise ValueError(f"fraction for {c!r} must be in [0, 1]")
    spark = df.sparkSession
    rates = spark.createDataFrame(
        [(c, float(f)) for c, f in target_fractions.items()],
        [label_col, "_keep_rate"],
    )
    u = _knuth_u(F.col(id_col), seed)
    joined = df.join(F.broadcast(rates), on=label_col, how="left")
    return (
        joined.filter(
            F.col("_keep_rate").isNull() | (u < F.col("_keep_rate"))
        )
        .drop("_keep_rate")
    )


def weighted_sample_exact(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 2,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement with an EXACT sample
    size — Efraimidis-Spirakis A-Res (Inf. Proc. Letters 2006): give
    each row the key ``ln(u) / w`` (u seeded-hash uniform, w the
    weight) and keep the k LARGEST keys; the result is distributed
    exactly as sequential weighted draws without replacement. The
    companion to :func:`weighted_sample` (Bernoulli thinning, exact
    only in expectation): quota pipelines ("exactly 1M docs,
    quality-weighted") need the guaranteed count.

    Deterministic on any engine/partitioning: u comes from the seeded
    Knuth hash of the id (the :func:`temperature_sample` convention),
    so reruns and the SQL oracle reproduce the same sample.
    Execution: map-side key computation + ONE TakeOrdered top-k (no
    global sort); rows with null/non-positive weight never sample.
    Appends ``sample_key`` (rounded to 6).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    # u = 0 (one id in 2^32) would need ln(0): Spark nulls it, DuckDB
    # raises — exclude the measure-zero row explicitly on both sides
    base = df.filter(
        w.isNotNull() & (w > 0) & (_knuth_u(F.col(id_col), seed) > 0)
    )
    key = F.log(_knuth_u(F.col(id_col), seed)) / w
    return (
        base.withColumn("sample_key", F.round(key, 6))
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(int(k))
    )


def stratified_split(
    df: DataFrame,
    strata_cols: list,
    weights: dict | None = None,
    id_col: str = "doc_id",
    seed: int = 1,
) -> DataFrame:
    """EXACT stratified train/val/test split: every stratum hits its
    target count exactly.

    :func:`hash_split` assigns by hash interval, so split sizes are
    only correct in expectation — binomial noise ~sqrt(n) per stratum,
    fatal when a rare class must contribute an exact eval quota.
    Here rows are ranked WITHIN each stratum by the same deterministic
    Knuth hash (ties broken by id, so the assignment is a pure
    function of the data), the stratum size arrives via a count
    window over the identical partition key, and the cumulative-floor
    thresholds cut exact quotas: split i gets rows with
    ``floor(cum_{i-1} * n) < rank <= floor(cum_i * n)``; the last
    split absorbs the remainder rows.

    Scale shape: ONE exchange on the strata key — the rank window, the
    count window, and the threshold projection all share it (no join
    back, no second shuffle, plan-asserted in tests). Skewed strata
    sort within their partition and spill; there is no driver-side
    collection of stratum sizes.
    """
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    if not strata_cols:
        raise ValueError("strata_cols must be non-empty")
    u = _knuth_u(F.col(id_col), seed)
    wp = Window.partitionBy(*strata_cols)
    rn = F.row_number().over(wp.orderBy(u, F.col(id_col)))
    n = F.count(F.lit(1)).over(wp)
    names = list(weights)
    acc = 0.0
    expr = F.lit(names[-1])  # the last split absorbs the remainder
    conds = []
    for name in names[:-1]:
        acc += weights[name] / total
        conds.append((acc, name))
    for cum, name in reversed(conds):
        expr = F.when(
            rn <= F.floor(F.lit(cum) * n), F.lit(name)
        ).otherwise(expr)
    return df.withColumn("split", expr)


def _dsir_doc_features(
    df: DataFrame,
    text_col: str,
    id_col,
    n_buckets: int,
) -> DataFrame:
    """Per-doc hashed-ngram bag features ``(id, _bk, _n)``: unigrams
    plus adjacent bigrams of the whitespace tokens, each hashed into
    ``n_buckets`` with the portable md5 hash (DuckDB-replayable).
    One scan, one map-combinable (id, bucket) groupBy."""
    from spark_bestfit_spark.operators.dedup import portable_hash64

    keep = [id_col] if id_col else []
    arr = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: w != "",
    )
    toks = df.select(*keep, arr.alias("_a")).filter(
        F.size("_a") >= 1
    )
    grams = toks.select(
        *keep,
        F.explode(
            F.concat(
                F.col("_a"),
                F.when(
                    F.size("_a") >= 2,
                    F.expr(
                        "transform(sequence(1, size(_a) - 1), i ->"
                        " concat(_a[i - 1], ' ', _a[i]))"
                    ),
                ).otherwise(F.array()),
            )
        ).alias("_g"),
    )
    bk = portable_hash64(F.col("_g")) % F.lit(int(n_buckets))
    if id_col:
        return grams.select(*keep, bk.alias("_bk")).groupBy(
            *keep, "_bk"
        ).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    return grams.select(bk.alias("_bk")).groupBy("_bk").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-document DSIR importance log-weights (Xie et al., NeurIPS
    2023 — Data Selection via Importance Resampling): score every RAW
    document by how much more likely its hashed-ngram bag is under
    the TARGET distribution than under the raw distribution,

        log w(x) = sum_b n_b(x) * (ln p_t[b] - ln p_r[b])
        p[b]     = (c[b] + 1) / (N + B)        (add-one smoothing)

    with unigram+bigram features hashed into ``B = n_buckets``
    buckets (the paper's hashed n-gram generative model; smoothing
    makes both bucket LMs proper so every weight is finite and
    deterministic).

    Dataflow (scale-safe at 100 TB): each corpus is scanned ONCE —
    the raw scan produces the per-doc (id, bucket, count) features
    and the raw bucket LM derives from them by a bucket re-agg
    (lazily checkpointed, so the scan isn't repeated); the target
    scan collapses straight to its ``<= B``-row bucket LM. Scoring
    left-joins the two broadcast LM relations on the bucket key plus
    a 1-row totals relation and re-aggregates by doc. Nothing
    driver-side, no UDFs.

    Returns ``(id_col, n_grams, logweight)`` — total grams per doc
    and the importance log-weight (round 6; higher = more
    target-like). Docs with no non-empty tokens drop out.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    feats = _dsir_doc_features(
        raw, text_col, id_col, n_buckets
    ).localCheckpoint(eager=False)
    raw_lm = feats.groupBy("_bk").agg(F.sum("_n").alias("_cr"))
    tgt_lm = _dsir_doc_features(
        target, text_col, None, n_buckets
    ).withColumnRenamed("_n", "_ct")
    tots = (
        raw_lm.agg(F.sum("_cr").alias("_nr"))
        .crossJoin(tgt_lm.agg(F.sum("_ct").alias("_nt")))
    )
    b = float(n_buckets)
    term = F.log(
        (F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("_nt"), F.lit(0)) + F.lit(b))
    ) - F.log(
        (F.coalesce(F.col("_cr"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("_nr"), F.lit(0)) + F.lit(b))
    )
    return (
        feats.join(F.broadcast(tgt_lm), "_bk", "left")
        .join(F.broadcast(raw_lm), "_bk", "left")
        .crossJoin(F.broadcast(tots))
        .groupBy(id_col)
        .agg(
            F.sum("_n").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("_n") * term), 6).alias("logweight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    seed: int = 0,
) -> DataFrame:
    """DSIR's selection step: Gumbel top-k resampling over the
    importance log-weights — sampling k documents WITHOUT replacement
    with probability proportional to their importance weights is
    exactly taking the top k by ``logweight + Gumbel noise`` (the
    Gumbel-max trick; Xie et al. 2023 §2.2). The noise is the seeded
    Knuth-hash uniform mapped through ``-ln(-ln u)`` — deterministic
    on any engine and partitioning, so the selected SET is
    oracle-replayable bit-for-bit (u is offset by half an ulp of the
    2^32 grid so it is strictly inside (0, 1); no infinite keys).

    One top-k (TakeOrdered — never a global sort) over the
    :func:`dsir_logweights` relation. Returns
    ``(id_col, n_grams, logweight, gumbel_key, sel_rank)`` ordered by
    the perturbed key desc, ties broken by id.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    lw = dsir_logweights(
        raw, target, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets,
    )
    u = _knuth_u(F.col(id_col), seed) + F.lit(0.5 / 4294967296.0)
    key = F.round(
        F.col("logweight") + (-F.log(-F.log(u))), 6
    ).alias("gumbel_key")
    top = (
        lw.select(id_col, "n_grams", "logweight", key)
        .orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(int(k))
    )
    # rank window runs on the k-row relation the limit already
    # collapsed — never a data-sized single partition
    w = Window.orderBy(F.desc("gumbel_key"), F.col(id_col))
    return top.select(
        id_col,
        "n_grams",
        "logweight",
        "gumbel_key",
        F.row_number().over(w).cast("long").alias("sel_rank"),
    )


def dsir_logweights_by_group(
    raw: DataFrame,
    target: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-group DSIR importance log-weights — the form a
    multilingual pipeline runs (one target/raw LM pair per language,
    the CCNet convention): every raw document is scored against ITS
    OWN group's bucket LMs. Same model as :func:`dsir_logweights`
    with every LM relation keyed by (group, bucket); per-group totals
    are a groups-sized relation joined on the group key (never a
    1-row crossJoin). Groups with no target documents have no LM to
    score against and surface as NULL logweights — no driver-side
    group discovery, matching the grouped-KN convention.

    Shuffle profile: the grouped keys partition the SAME key space as
    the flat tier (group adds entropy to the bucket key, never
    removes it), so the exchange distribution matches the flat tier's.

    Returns ``(group_col, id_col, n_grams, logweight)``.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    from spark_bestfit_spark.operators.dedup import portable_hash64

    def feats(df, with_id):
        keep = [group_col, id_col] if with_id else [group_col]
        arr = F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda w: w != "",
        )
        toks = df.select(*keep, arr.alias("_a")).filter(
            F.size("_a") >= 1
        )
        grams = toks.select(
            *keep,
            F.explode(
                F.concat(
                    F.col("_a"),
                    F.when(
                        F.size("_a") >= 2,
                        F.expr(
                            "transform(sequence(1, size(_a) - 1), i ->"
                            " concat(_a[i - 1], ' ', _a[i]))"
                        ),
                    ).otherwise(F.array()),
                )
            ).alias("_g"),
        )
        bk = portable_hash64(F.col("_g")) % F.lit(int(n_buckets))
        return grams.select(*keep, bk.alias("_bk")).groupBy(
            *keep, "_bk"
        ).agg(F.count(F.lit(1)).cast("long").alias("_n"))

    rf = feats(raw, True).localCheckpoint(eager=False)
    raw_lm = rf.groupBy(group_col, "_bk").agg(
        F.sum("_n").alias("_cr")
    )
    tgt_lm = feats(target, False).withColumnRenamed("_n", "_ct")
    rtot = raw_lm.groupBy(group_col).agg(F.sum("_cr").alias("_nr"))
    ttot = tgt_lm.groupBy(group_col).agg(F.sum("_ct").alias("_nt"))
    b = float(n_buckets)
    term = F.log(
        (F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(1.0))
        / (F.col("_nt") + F.lit(b))
    ) - F.log(
        (F.coalesce(F.col("_cr"), F.lit(0)) + F.lit(1.0))
        / (F.col("_nr") + F.lit(b))
    )
    return (
        rf.join(tgt_lm, [group_col, "_bk"], "left")
        .join(raw_lm, [group_col, "_bk"], "left")
        .join(F.broadcast(rtot), group_col, "left")
        .join(F.broadcast(ttot), group_col, "left")
        .groupBy(group_col, id_col)
        .agg(
            F.sum("_n").cast("long").alias("n_grams"),
            F.when(
                F.count(F.when(F.col("_nt").isNull(), 1)) > 0,
                F.lit(None).cast("double"),
            )
            .otherwise(F.round(F.sum(F.col("_n") * term), 6))
            .alias("logweight"),
        )
    )


def dsir_select_by_group(
    raw: DataFrame,
    target: DataFrame,
    k_per_group: int,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    seed: int = 0,
) -> DataFrame:
    """Per-group Gumbel top-k DSIR selection: within each group, the
    top ``k_per_group`` documents by Gumbel-perturbed importance
    log-weight (see :func:`dsir_select` — same seeded Knuth-hash
    noise, deterministic and oracle-replayable). Groups whose NULL
    logweights mark a missing target LM are excluded — they cannot
    be ranked; a one-exchange window over the group closes the plan
    (no global sort anywhere).

    Returns ``(group_col, id_col, n_grams, logweight, gumbel_key,
    sel_rank)`` with ``sel_rank`` 1-based within its group.
    """
    if k_per_group < 1:
        raise ValueError("k_per_group must be >= 1")
    lw = dsir_logweights_by_group(
        raw, target, group_col=group_col, text_col=text_col,
        id_col=id_col, n_buckets=n_buckets,
    ).filter(F.col("logweight").isNotNull())
    u = _knuth_u(F.col(id_col), seed) + F.lit(0.5 / 4294967296.0)
    keyed = lw.withColumn(
        "gumbel_key",
        F.round(F.col("logweight") + (-F.log(-F.log(u))), 6),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("gumbel_key"), F.col(id_col)
    )
    return (
        keyed.withColumn(
            "sel_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("sel_rank") <= int(k_per_group))
    )


def unimax_allocation(
    df: DataFrame,
    budget: float,
    group_col: str = "lang",
    max_epochs: float = 1.0,
    text_col: str = "text",
    length_col: str | None = None,
) -> DataFrame:
    """UniMax multilingual budget allocation (Chung et al., ICLR
    2023): split a total training-token ``budget`` across groups
    (languages/domains) as UNIFORMLY as possible subject to the
    repetition cap ``alloc_g <= max_epochs * n_tokens_g`` — the
    published answer to "temperature sampling starves heads or
    over-epochs tails": every group gets the common water level
    except groups whose cap binds, which contribute their whole
    corpus.

    Closed-form waterfill, fully in-plan on the GROUPS-sized
    relation: one corpus scan collapses to per-group token counts
    (map-combined; pass ``length_col`` to use precomputed per-doc
    lengths, e.g. real BPE counts from
    :func:`~spark_bestfit_spark.operators.textstats.bpe_doc_token_counts`),
    then a window over caps sorted ascending decides which caps bind
    — group i binds iff ``prefix_i + cap_i * (n - i + 1) <= budget``
    (monotone in i, constant across equal caps, so the flag is
    deterministic under ties) — and the water level
    ``L = (budget - sum of bound caps) / n_unbound`` fills everyone
    else. The window and the 1-row totals join touch only the
    groups-sized relation — never data.

    Returns one row per group: ``(group_col, n_tokens, cap, alloc,
    epochs)`` with ``sum(alloc) = min(budget, sum(cap))`` and
    ``epochs = alloc / n_tokens <= max_epochs`` (both pytest-pinned).
    Null groups are excluded.
    """
    if budget <= 0:
        raise ValueError("budget must be > 0")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be > 0")
    toks = (
        F.col(length_col).cast("double")
        if length_col is not None
        else F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda w: w != "",
            )
        ).cast("double")
    )
    counts = (
        df.filter(F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("g"), toks.alias("_t"))
        .groupBy("g")
        .agg(F.sum("_t").alias("n_tokens"))
    )
    b = float(budget)
    caps = counts.select(
        "g",
        "n_tokens",
        (F.col("n_tokens") * F.lit(float(max_epochs))).alias("cap"),
    )
    w = Window.orderBy("cap", "g")
    # exclusive prefix of caps + position — groups-sized window
    ranked = caps.select(
        "g",
        "n_tokens",
        "cap",
        F.coalesce(
            F.sum("cap").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ).alias("_prefix"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    bound = ranked.withColumn(
        "_bound",
        F.col("_prefix")
        + F.col("cap") * (F.col("_n") - F.col("_rn") + 1)
        <= F.lit(b),
    )
    tot = bound.agg(
        F.sum(F.when(F.col("_bound"), F.col("cap"))).alias("_bsum"),
        F.sum(F.when(~F.col("_bound"), 1).otherwise(0)).alias("_nu"),
    )
    level = (
        F.lit(b) - F.coalesce(F.col("_bsum"), F.lit(0.0))
    ) / F.col("_nu")
    alloc = F.when(F.col("_bound"), F.col("cap")).otherwise(
        F.least(level, F.col("cap"))
    )
    return (
        bound.crossJoin(F.broadcast(tot))
        .select(
            F.col("g").alias(group_col),
            F.col("n_tokens").cast("double").alias("n_tokens"),
            F.round("cap", 6).alias("cap"),
            F.round(alloc, 6).alias("alloc"),
            F.round(alloc / F.col("n_tokens"), 6).alias("epochs"),
        )
    )
