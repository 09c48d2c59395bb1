"""The growing-corpus workflow — round-11 operator families end to
end: snapshot dedup at all three tiers, plus the compressed-vector
index ladder (PQ -> OPQ -> IVF+PQ) with single-scan batch queries.

A nightly delivery lands a NEW batch of documents and embeddings.
Instead of re-running dedup over the whole corpus, the pipeline keeps
three small snapshot relations and touches only the delta:

1. Exact tier: (fingerprint, keeper_id) snapshot ->
   incremental_exact_dedup flags the delta's exact dups.
2. Near-dup tier: persisted (id, band, band_sig) LSH index ->
   incremental_minhash_pairs finds delta-involving near-dup pairs.
3. Semantic tier: a frozen-quantizer IvfIndex of keeper embeddings ->
   incremental_semantic_dedup resolves embedding-level dups.
4. Retrieval: train a product quantizer, compare plain PQ vs
   parametric OPQ reconstruction, build an IVF+PQ index, save it
   cell-partitioned, and answer a 16-query batch in ONE scan.
5. Tokenizer artifact: a distributed BPE train loop driven to a
   shippable merge table.

Run from the repo root:  python examples/incremental_corpus.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from spark_bestfit_spark import get_spark
from spark_bestfit_spark.operators.dedup import (
    duplicate_groups,
    incremental_exact_dedup,
    incremental_minhash_pairs,
    minhash_band_index,
)
from spark_bestfit_spark.operators.similarity import (
    IvfIndex,
    IvfPqIndex,
    incremental_semantic_dedup,
    opq_encode,
    opq_train,
    pq_encode,
    pq_train,
)
from spark_bestfit_spark.operators.textstats import bpe_merge_table

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="incremental-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    prev = docs.filter("doc_id < 300")
    delta = docs.filter("doc_id >= 300")

    # 1. exact tier: snapshot = (fingerprint, keeper_id)
    state = duplicate_groups(prev).select("fingerprint", "keeper_id")
    exact = incremental_exact_dedup(delta, state).cache()
    by_status = {
        r.status: r.n
        for r in exact.groupBy("status").agg(
            F.count("*").alias("n")
        ).collect()
    }
    print("exact tier over the delta:", by_status)

    # 2. near-dup tier: persisted LSH band index
    index = minhash_band_index(prev)
    pairs = incremental_minhash_pairs(
        delta, index, prev, threshold=0.7
    )
    print("delta-involving near-dup pairs:", pairs.count())

    # 3. semantic tier: frozen-quantizer keeper index
    emb_prev = emb.filter("vec_id < 300")
    emb_delta = emb.filter("vec_id >= 300")
    ivf = IvfIndex.build(
        emb_prev, n_clusters=8, seed=42, method="local"
    )
    sem = incremental_semantic_dedup(
        emb_delta, ivf, threshold=0.95
    )
    n_sem_dups = sem.filter("NOT is_kept").count()
    print("semantic dups in the delta (random vectors -> ~0):",
          n_sem_dups)

    # 4. the compressed-vector index ladder
    books = pq_train(emb, dim=64, m=8, n_codes=16)
    rot, obooks = opq_train(emb, dim=64, m=8, n_codes=16)
    n_pq = pq_encode(emb, books).count()
    n_opq = opq_encode(emb, rot, obooks).count()
    print(f"PQ/OPQ encoded {n_pq}/{n_opq} vectors at 8 bytes each")
    idx = IvfPqIndex.build(emb, n_clusters=8, m=8, n_codes=16)
    queries = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter("vec_id < 16").collect()
    ]
    hits = idx.query(queries, k=3, nprobe=2)
    print("IVF+PQ batch: 16 queries, one scan,",
          hits.count(), "result rows")
    with tempfile.TemporaryDirectory() as tmp:
        idx.save(f"{tmp}/ivfpq")
        loaded = IvfPqIndex.load(spark, f"{tmp}/ivfpq")
        assert loaded.query(queries, k=3, nprobe=2).count() == hits.count()
        print("saved + reloaded the cell-partitioned index")

    # 5. tokenizer artifact
    merges = bpe_merge_table(docs, n_merges=5)
    print("BPE merge table:")
    for r in merges.collect():
        print(f"  {r.merge_rank}: {r.left!r} + {r.right!r}"
              f" -> {r.merged!r}  (weight {r.weight})")

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
