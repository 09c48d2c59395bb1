"""Viral-duplicate robustness probe: what one boilerplate family does
to the near-dup tier, and what the documented mitigations cost.

Real corpora are never skew-free: one chain letter / license stub /
template page repeated tens of thousands of times is the rule. All
k copies share every band signature, so the LSH candidate stage emits
k(k-1)/2 pairs from ONE bucket — the quadratic the banding scheme
exists to avoid, reintroduced by data instead of by plan.

The probe builds sf1 documents (50k docs) + a planted viral family
(VIRAL_K exact copies of one text) and measures three pipelines:

  raw        — minhash_dedup_pairs, no guard: pays the k^2 bucket
  guarded    — max_bucket_size=100: viral bucket dropped from
               CANDIDATE GENERATION (pairs within the family are the
               exact tier's job)
  exact_first— exact_dedup -> minhash on survivors: the documented
               best practice; the family collapses to one
               representative BEFORE banding, near-dup recall intact

Prints one JSON line {"metric": "viral_probe", "k": K, "lines":
{name: {"wall": s, "pairs": n}}}.

Usage: python tools/viral_probe.py [VIRAL_K]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import pyspark.sql.functions as F

    from spark_bestfit_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup_pairs,
    )
    from spark_bestfit_spark.session import get_spark

    viral_k = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_docs = os.path.join(repo, ".scale_cache", "sf1", "documents.parquet")
    if not os.path.isdir(sf1_docs):
        print("run tools/scale_probe.py (or bench.py) once to build "
              ".scale_cache/sf1 first")
        return 1

    spark = get_spark(app_name="viral-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(sf1_docs)
    viral = spark.range(viral_k).select(
        (F.lit(900_000_000) + F.col("id")).alias("doc_id"),
        F.lit(
            "breaking news please forward this message to everyone "
            "you know the offer expires at midnight tonight act now"
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(viral)
    corpus.count()  # warm the scan

    out: dict = {}

    def run(name, fn):
        t0 = time.perf_counter()
        n = fn()
        out[name] = {"wall": round(time.perf_counter() - t0, 3),
                     "pairs": int(n)}
        print(f"{name:>12}: {out[name]['wall']:8.2f} s  "
              f"{out[name]['pairs']:>12,} pairs", flush=True)

    run("raw", lambda: minhash_dedup_pairs(
        corpus, threshold=0.7).count())
    run("guarded", lambda: minhash_dedup_pairs(
        corpus, threshold=0.7, max_bucket_size=100).count())

    def exact_first():
        kept = exact_dedup(corpus)
        return minhash_dedup_pairs(kept, threshold=0.7).count()

    run("exact_first", exact_first)

    print(json.dumps(
        {"metric": "viral_probe", "unit": "sec", "k": viral_k,
         "lines": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
