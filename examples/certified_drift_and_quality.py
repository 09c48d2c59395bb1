"""Round-12 operator families end to end: certified-approximate
drift at 100 TB shape, the CCNet-style LM quality filter, the BPE
train -> apply tokenizer story, and snapshot compaction after a
replayed delivery.

The scenario: a weekly corpus delivery needs (1) a drift check
against last week's corpus that would still be cheap at 100 TB,
(2) a quality score for every new document under a trusted reference
corpus, (3) token budgets under the shipped tokenizer, and (4) state
hygiene after the delivery job was replayed by a retry.

1. Drift: `two_sample_ks_approx_df` / `wasserstein_approx_df` give
   certified sandwiches (d <= D_exact <= d + err_bound) from TWO
   bounded scans — plus the per-group forms, one certificate per
   segment.
2. Quality: `kn_doc_logprob` trains a Kneser-Ney bigram LM on the
   reference half and scores the delivery with continuation backoff
   (every unseen bigram gets a finite, deterministic log-prob).
3. Tokenizer: `bpe_learn` trains the merge table; `bpe_encode`
   applies it to word types; `bpe_doc_token_counts` prices each doc
   in real BPE tokens.
4. Hygiene: `compact_exact_state` / `compact_band_index` /
   `compact_keeper_snapshot` restore the one-row-per-key invariant
   on all three dedup snapshots after a replay.

Run from the repo root:  python examples/certified_drift_and_quality.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from spark_bestfit_spark import get_spark
from spark_bestfit_spark.operators.dedup import (
    compact_band_index,
    compact_exact_state,
    duplicate_groups,
    minhash_band_index,
)
from spark_bestfit_spark.operators.similarity import (
    IvfIndex,
    compact_keeper_snapshot,
)
from spark_bestfit_spark.operators.stats import (
    two_sample_ks_approx_by_group,
    two_sample_ks_approx_df,
    wasserstein_approx_by_group,
    wasserstein_approx_df,
)
from spark_bestfit_spark.operators.textstats import (
    bpe_doc_token_counts,
    bpe_encode,
    bpe_learn,
    kn_doc_logprob,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="certified-drift-and-quality")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # ---- 1. certified-approximate drift (the 100 TB shape) --------
    last_week = li.filter("l_linestatus = 'F'")
    this_week = li.filter("l_linestatus = 'O'")
    ks = two_sample_ks_approx_df(
        last_week, this_week, "l_extendedprice", grid_size=2048
    ).first()
    w1 = wasserstein_approx_df(
        last_week, this_week, "l_extendedprice", grid_size=2048
    ).first()
    print(
        f"K-S: {ks['d_stat']:.4f} <= D_exact <= "
        f"{ks['d_stat'] + ks['err_bound']:.4f}  "
        f"(two bounded scans, certificate from the same counts)"
    )
    print(
        f"W1 : {w1['w1']:.2f} +/- {w1['err_bound']:.2f} "
        f"price units"
    )
    print("per-segment certificates:")
    grouped = wasserstein_approx_by_group(
        last_week, this_week, "l_extendedprice", "l_returnflag", 512
    ).join(
        two_sample_ks_approx_by_group(
            last_week, this_week, "l_extendedprice", "l_returnflag", 512
        ).select("l_returnflag", "d_stat"),
        "l_returnflag",
    )
    for r in grouped.orderBy("l_returnflag").collect():
        print(
            f"  {r['l_returnflag']}: W1 {r['w1']:.2f} "
            f"+/- {r['err_bound']:.2f}, K-S d>={r['d_stat']:.4f}"
        )

    # ---- 2. LM quality filter (CCNet shape) -----------------------
    reference = docs.filter("doc_id % 2 = 0")
    delivery = docs.filter("doc_id % 2 = 1")
    scored = kn_doc_logprob(delivery, reference).cache()
    q = scored.agg(
        F.expr("percentile_approx(mean_kn_logprob, 0.1)").alias("p10"),
        F.avg("mean_kn_logprob").alias("mean"),
        F.sum("n_unseen").alias("unseen"),
    ).first()
    kept = scored.filter(F.col("mean_kn_logprob") >= q["p10"])
    print(
        f"\nKN quality filter: {scored.count()} docs scored, "
        f"mean logprob {q['mean']:.3f}, {q['unseen']} unseen bigrams; "
        f"keeping {kept.count()} above the p10 perplexity cut"
    )

    # ---- 3. tokenizer: train -> apply -> budget -------------------
    merges = bpe_learn(docs, "text", n_merges=10)
    print(f"\nBPE merges learned: {[(a + '+' + b) for a, b, _ in merges]}")
    enc = bpe_encode(docs, merges)
    top = enc.orderBy(F.desc("word_count")).limit(3).collect()
    for r in top:
        print(
            f"  '{r['word']}' ({r['word_count']}x) -> "
            f"{'|'.join(r['tokens'])}"
        )
    budget = bpe_doc_token_counts(docs, merges).agg(
        F.sum("n_bpe_tokens").alias("bpe"),
        F.sum("n_ws_tokens").alias("ws"),
    ).first()
    print(
        f"corpus budget: {budget['bpe']} BPE tokens over "
        f"{budget['ws']} words "
        f"(fertility {budget['bpe'] / budget['ws']:.3f})"
    )

    # ---- 3b. head/middle/tail + budget-true packing ---------------
    from spark_bestfit_spark.operators.curation import (
        pack_training_sequences,
    )
    from spark_bestfit_spark.operators.textstats import (
        kn_doc_logprob_by_group,
        perplexity_buckets,
    )

    lang_scored = kn_doc_logprob_by_group(delivery, reference)
    buckets = perplexity_buckets(lang_scored)
    dist = {
        (r["lang"], r["label"]): r["n"]
        for r in buckets.groupBy("lang", "label").agg(
            F.count("*").alias("n")
        ).collect()
    }
    langs = sorted({k[0] for k in dist})
    print("\nCCNet head/middle/tail per language:")
    for lg in langs:
        print(
            f"  {lg}: head {dist.get((lg, 'head'), 0)}, middle "
            f"{dist.get((lg, 'middle'), 0)}, tail "
            f"{dist.get((lg, 'tail'), 0)}"
        )
    counts = bpe_doc_token_counts(docs, merges)
    packed = pack_training_sequences(
        docs.join(counts, "doc_id"), seq_len=2048,
        length_col="n_bpe_tokens",
    )
    n_seqs = packed.agg(F.max("last_seq")).first()[0] + 1
    print(
        f"budget-true packing: corpus -> {n_seqs} sequences of 2048"
        f" REAL BPE tokens"
    )

    # ---- 3c. certified drift as a STREAM ---------------------------
    from spark_bestfit_spark.streaming import CertifiedDriftMonitor
    from spark_bestfit_spark.streaming.run import drain_foreach_batch

    monitor = CertifiedDriftMonitor(
        last_week.select(F.col("l_extendedprice").alias("value")),
        column="value", grid_size=512, d_threshold=0.1,
    )
    import tempfile

    stage = tempfile.mkdtemp(prefix="drift_stream_")
    this_week.select(
        F.col("l_extendedprice").alias("value")
    ).repartition(3).write.mode("overwrite").parquet(stage)
    drain_foreach_batch(
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1).parquet(stage),
        monitor,
    )
    c = monitor.cumulative()
    print(
        f"\nstreaming certified drift ({len(monitor.history)} "
        f"micro-batches): cumulative K-S {c['d_stat']:.4f} "
        f"+/- {c['err_bound']:.4f}, W1 {c['w1']:.2f}"
    )

    # ---- 4. snapshot hygiene after a replayed delivery ------------
    exact_state = duplicate_groups(docs).select("fingerprint", "keeper_id")
    band_index = minhash_band_index(docs.limit(100))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = IvfIndex.build(emb, n_clusters=4, seed=7, method="local")
    for name, raw, compact in [
        ("exact", exact_state.unionAll(exact_state), compact_exact_state),
        ("band", band_index.unionAll(band_index),
         lambda s: compact_band_index(s, max_bucket_size=4)),
        ("semantic", idx.assigned.unionAll(idx.assigned),
         compact_keeper_snapshot),
    ]:
        before, after = raw.count(), compact(raw).count()
        print(f"compaction [{name}]: {before} replayed rows -> {after}")

    spark.stop()


if __name__ == "__main__":
    main()
