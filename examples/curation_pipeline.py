"""Training-data curation over the documents/embeddings tables.

Run from the repo root:  python examples/curation_pipeline.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_bestfit_spark import get_spark
from spark_bestfit_spark.operators.pipeline import curate_corpus
from spark_bestfit_spark.operators.similarity import (
    embedding_neardup_pairs,
    self_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # quality filter -> exact dedup -> MinHash near-dup removal
    curated, audit = curate_corpus(
        docs, min_quality=0.15, min_tokens=5, near_dup_threshold=0.8
    )
    print("curation audit:")
    for stage, n in audit.items():
        print(f"  {stage:24s} {n}")

    # cosine top-k neighbors for a few query vectors
    print("\ncosine top-3 neighbors:")
    self_topk(emb, k=3, query_ids=[0, 1]).show()

    # embedding-level near-duplicate pairs (LSH-bucketed scale path)
    pairs = embedding_neardup_pairs(
        emb, threshold=0.42, use_lsh=True, n_planes=4, n_tables=16
    )
    print(f"embedding near-dup pairs over 0.42: {pairs.count()}")

    # quality signals a pretraining filter runs per document:
    # boilerplate repetition, unigram-logprob (perplexity proxy), PII
    from spark_bestfit_spark.operators.textstats import (
        flag_pii,
        unigram_logprob,
        with_repetition_ratio,
    )

    import pyspark.sql.functions as F

    signals = (
        with_repetition_ratio(flag_pii(docs))
        .join(unigram_logprob(docs), "doc_id")
        .select(
            "doc_id", "dup_shingle_ratio", "mean_logprob",
            "has_email", "has_phone", "has_ssn",
        )
    )
    print("\nmost repetitive documents:")
    signals.orderBy(F.desc("dup_shingle_ratio"), "doc_id").show(5)

    # semantic dedup over the embedding space (SemDeDup: KMeans
    # buckets -> in-cluster cosine pairs -> components -> min-id keep)
    from spark_bestfit_spark.operators.similarity import semantic_dedup

    sem = semantic_dedup(emb, threshold=0.999, n_clusters=8)
    print(f"\nsemantic dedup keeps {sem.filter('is_kept').count()} "
          f"of {sem.count()} vectors")

    # weighted TEXT near-dups by TF-IDF cosine (inverted index; exact
    # when max_df is None) — the weighted complement to MinHash
    from spark_bestfit_spark.operators.textstats import (
        tfidf_neardup_pairs,
    )

    tp = tfidf_neardup_pairs(docs, threshold=0.9)
    print(f"tf-idf cosine pairs over 0.9: {tp.count()}")

    # per-group robust quality gates: each source's own median/MAD
    # thresholds, so one heavy-tailed domain can't drag another's
    from spark_bestfit_spark.operators.stats import (
        grouped_robust_stats_df,
    )
    from spark_bestfit_spark.operators.textstats import (
        with_quality_score,
    )

    scored = with_quality_score(docs)
    grouped_robust_stats_df(scored, "quality_score", "source").orderBy(
        "source"
    ).show(truncate=False)

    # graded decontamination: fractional 8-gram overlap against a
    # probe set (threshold it instead of dropping on any collision)
    from spark_bestfit_spark.operators.curation import (
        contamination_overlap,
        select_within_token_budget,
    )
    from spark_bestfit_spark.operators.dedup import word_shingles

    probes = docs.filter("doc_id < 3").select(
        F.explode(word_shingles("text", 8)).alias("ngram")
    )
    overlap = contamination_overlap(docs, probes, n=8)
    n_graded = overlap.filter("overlap_frac >= 0.5").count()
    print(f"\ndocs with >=50% probe 8-gram overlap: {n_graded}")

    # final assembly: best-quality documents until the token budget
    # is spent (exact greedy prefix on the distributed prefix sum)
    budget = select_within_token_budget(
        scored, max_tokens=5_000, quality_col="quality_score"
    )
    print(f"token-budget selection keeps {budget.count()} docs, "
          f"{budget.agg(F.max('cum_tokens')).first()[0]} tokens")
    spark.stop()


if __name__ == "__main__":
    main()
