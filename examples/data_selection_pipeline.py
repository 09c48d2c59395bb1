"""Late-round-12 operator families end to end: DSIR data selection,
winnowing partial-overlap dedup, trigram LM quality, BPE token ids,
and certified-approximate quantiles for the budget report.

The scenario: assemble a training slice from a raw crawl that looks
like a trusted target corpus.

1. Select: `dsir_select` scores every raw document by how target-like
   its hashed-ngram bag is (Xie et al. 2023) and Gumbel-top-k
   resamples without replacement — deterministically (seeded hash
   noise), so the selected set is reproducible run to run.
2. Dedup: `winnow_neardup_pairs` (the MOSS algorithm) catches
   copied-paragraph partial overlap inside the selection that
   whole-document MinHash resemblance would dilute away.
3. Quality: `kn_doc_logprob3` scores the survivors under an
   interpolated Kneser-Ney TRIGRAM LM trained on the target corpus —
   two backoff levels, every level a proper distribution.
4. Tokenize: `bpe_vocab` + `bpe_encode_ids` turn the learned merge
   table into the shipped (token -> id) artifact and price each word
   type in real token ids.
5. Report: `quantiles_approx_certified` gives the score
   distribution's quartiles with a certified error bound — the
   100 TB shape (two bounded scans, no sort).

Run from the repo root:  python examples/data_selection_pipeline.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from spark_bestfit_spark import get_spark
from spark_bestfit_spark.operators.curation import dsir_select
from spark_bestfit_spark.operators.dedup import winnow_neardup_pairs
from spark_bestfit_spark.operators.stats import (
    quantiles_approx_certified,
)
from spark_bestfit_spark.operators.textstats import (
    bpe_encode_ids,
    bpe_learn,
    bpe_vocab,
    kn_doc_logprob3,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="data-selection-pipeline")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    target = docs.filter(F.col("doc_id") % 2 == 0)
    raw = docs.filter(F.col("doc_id") % 2 == 1)

    # 1. DSIR: keep the 60 most target-like raw docs (deterministic
    # Gumbel top-k — rerunning selects the same set)
    picked = dsir_select(raw, target, k=60, n_buckets=2048, seed=7)
    print(f"selected {picked.count()} docs by importance weight")
    sel_docs = raw.join(picked.select("doc_id"), "doc_id")

    # 2. winnowing: partial-overlap pairs inside the selection
    pairs = winnow_neardup_pairs(sel_docs, min_shared=10)
    n_pairs = pairs.count()
    drop = pairs.select(
        F.col("id_b").alias("doc_id")
    ).distinct()
    kept = sel_docs.join(drop, "doc_id", "left_anti")
    print(
        f"winnowing: {n_pairs} overlap pairs, kept {kept.count()} docs"
    )

    # 3. trigram KN quality under the target corpus
    scored = kn_doc_logprob3(kept, target).cache()
    worst = scored.orderBy("mean_kn_logprob").first()
    print(
        "worst survivor: doc"
        f" {worst['doc_id']} logprob {worst['mean_kn_logprob']}"
    )

    # 4. the shipped tokenizer artifact + token-id encoding
    merges = bpe_learn(target, n_merges=10)
    vocab = bpe_vocab(target, merges).cache()
    ids = bpe_encode_ids(kept, merges, vocab=vocab)
    n_unk = ids.agg(F.sum("n_unk")).collect()[0][0] or 0
    print(
        f"vocab size {vocab.count()}, encoded"
        f" {ids.count()} word types, {n_unk} byte-fallback tokens"
    )

    # 5. certified quartiles of the quality distribution
    rep = quantiles_approx_certified(
        scored, "mean_kn_logprob", qs=(0.25, 0.5, 0.75),
        grid_size=1024,
    )
    for r in rep.orderBy("q").collect():
        print(
            f"q{int(r['q'] * 100):02d}: {r['value']:.4f}"
            f" (+/- {r['err_bound'] / 2:.6f} certified)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
