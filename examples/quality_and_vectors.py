"""Quality filtering, span clipping, exact splits, and compressed
vector retrieval — the round-10 operator families end to end.

1. Audit the corpus with a one-row dataset card.
2. Filter with the Gopher rule set + character entropy.
3. Clip corpus-duplicated spans (Lee et al. removal step).
4. Carve an EXACT stratified train/val/test split per language.
5. Quantize the embeddings to int8, verify the error bound, and run
   a hard-negative mining pass over the compressed vectors.
6. Bootstrap a CI for mean document quality with the one-pass
   Poisson bootstrap.

Run from the repo root:  python examples/quality_and_vectors.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from spark_bestfit_spark import get_spark
from spark_bestfit_spark.operators.bootstrap import poisson_bootstrap_ci
from spark_bestfit_spark.operators.curation import stratified_split
from spark_bestfit_spark.operators.dedup import clip_duplicate_spans
from spark_bestfit_spark.operators.pipeline import dataset_card
from spark_bestfit_spark.operators.similarity import (
    dequantize_embeddings,
    embedding_quant_params,
    mine_hard_negatives,
    quantization_error_report,
    quantize_embeddings,
)
from spark_bestfit_spark.operators.textstats import (
    char_entropy,
    gopher_quality_flags,
    with_quality_score,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="quality-and-vectors")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # 1. dataset card
    card = dataset_card(docs).collect()[0]
    print(
        f"corpus: {card.n_docs} docs, {card.total_tokens} tokens, "
        f"dup_rate={card.dup_rate}, mean_tokens={card.mean_tokens}"
    )

    # 2. Gopher rules + entropy
    flagged = gopher_quality_flags(docs, min_words=10)
    # documents already carries an n_chars column; keep only the score
    ent = char_entropy(docs).select("doc_id", "char_entropy")
    kept = (
        flagged.join(ent, "doc_id")
        .filter(F.col("passes_gopher") & (F.col("char_entropy") > 2.0))
        .select(*docs.columns)
    )
    print(f"gopher+entropy filter: {docs.count()} -> {kept.count()} docs")

    # 3. span clipping
    clipped = clip_duplicate_spans(kept, n=6, min_docs=2)
    removed = clipped.agg(F.sum("n_removed")).first()[0]
    print(f"span clipping removed {removed} duplicated-span words")

    # 4. exact stratified split per language
    split = stratified_split(
        docs, ["lang"], {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    split.groupBy("lang", "split").count().orderBy("lang", "split").show(
        12, truncate=False
    )

    # 5. int8 vectors: bound check + hard negatives on compressed data
    params = embedding_quant_params(emb, 64)
    report = quantization_error_report(emb, 64)
    n_bad = report.filter(~F.col("within_bound")).count()
    print(f"int8 quantization: {n_bad} dims outside the scale/2 bound")
    compressed = dequantize_embeddings(
        quantize_embeddings(emb, params), params
    ).select("vec_id", F.col("embedding_hat").alias("embedding"))
    anchors = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("anchor_vec"),
    )
    negs = mine_hard_negatives(compressed, anchors, k=3, lo=0.1, hi=0.9)
    negs.show(9, truncate=False)

    # 6. Poisson bootstrap CI for mean quality
    scored = with_quality_score(docs).select(
        "doc_id", "quality_score"
    )
    ci = poisson_bootstrap_ci(
        scored, "quality_score", "doc_id", n_replicates=100
    )
    print(
        f"mean quality {ci['mean']:.4f} "
        f"[{ci['lower']:.4f}, {ci['upper']:.4f}] "
        f"({ci['n_replicates']} replicates, one pass)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
