"""Assemble a training corpus: mix domains, split, and shard.

The post-curation half of a training-data pipeline — decide how much
of each domain to keep (temperature-flattened mixture), carve
deterministic train/val/test splits, and pack the train split into
token-balanced shards ready for a tokenizer job.

Run from the repo root:  python examples/corpus_assembly.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from spark_bestfit_spark import get_spark
from spark_bestfit_spark.operators.curation import (
    assign_training_shards,
    decontaminate_by_ngrams_bloom,
    domain_mixture_weights,
    hash_split,
    pack_training_sequences,
    temperature_sample,
)
from spark_bestfit_spark.operators.dedup import (
    duplicated_ngram_stats,
    word_shingles,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="corpus-assembly")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 0. flag documents whose 8-grams repeat across the corpus
    # (substring-dedup candidates a full pipeline would clip)
    dup = duplicated_ngram_stats(docs, n=8)
    n_flagged = dup.filter(F.col("shared_fraction") > 0.5).count()
    print(f"docs >50% duplicated 8-grams: {n_flagged}")

    # 0b. decontaminate against an eval set via the Bloom sketch — the
    # probe n-grams travel as ~3.6 bytes each, and the corpus pass is
    # map-only (no join); here the "eval set" is three held-out docs
    eval_probes = docs.filter(F.col("doc_id").isin(3, 17, 40)).select(
        F.explode(word_shingles("text", 8)).alias("ngram")
    )
    docs, flagged = decontaminate_by_ngrams_bloom(docs, eval_probes)
    print(f"decontamination flagged {flagged.count()} docs (bloom sketch)")

    # 1. inspect the natural domain mix and the T=0.7 flattened weights
    weights = domain_mixture_weights(
        docs, "source", temperature=0.7, target_tokens=2_000
    )
    print("domain mixture (alpha-sampling, T=0.7):")
    weights.orderBy(F.desc("n_tokens")).show(5, truncate=False)

    # 2. down-sample to the mixture (deterministic, replayable)
    mixed = temperature_sample(
        docs, "source", temperature=0.7, target_tokens=2_000
    )
    print(f"kept {mixed.count()} / {docs.count()} docs after mixing")

    # 3. deterministic 90/5/5 split (never randomSplit: that re-draws
    # per partition)
    split = hash_split(mixed, {"train": 0.9, "val": 0.05, "test": 0.05})
    split.groupBy("split").count().orderBy("split").show()

    # 4. token-balanced shards for the train split (partitioned
    # two-phase prefix sum — no single-partition window)
    train = split.filter(F.col("split") == "train")
    shards = assign_training_shards(train, tokens_per_shard=500)
    shards.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy("shard_id").show(8)

    # 5. pack the train split into fixed-length sequences (concat +
    # chunk at seq_len tokens, 1 EOS per doc) — the docs that span a
    # chunk boundary are the ones a loader must split
    packed = pack_training_sequences(train, seq_len=256)
    n_seqs = packed.agg(F.max("last_seq")).first()[0] + 1
    crossers = packed.filter(F.col("n_seqs") > 1).count()
    print(
        f"packed into {n_seqs} sequences of 256 tokens; "
        f"{crossers} docs cross a boundary"
    )

    # 6. OR window each document into overlapping context chunks
    # (retrieval-style, never mixing sources) — zero-exchange map plan
    from spark_bestfit_spark.operators.curation import chunk_documents

    chunks = chunk_documents(train, chunk_tokens=64, overlap=8)
    print(f"chunked into {chunks.count()} windows of <=64 tokens")

    # 7. label what survived: per-doc TF-IDF keywords for a quick
    # audit of what the mixed corpus is actually about
    from spark_bestfit_spark.operators.textstats import top_terms_per_doc

    top_terms_per_doc(train, k=3).orderBy("doc_id", "rank").show(
        9, truncate=False
    )

    spark.stop()


if __name__ == "__main__":
    main()
