"""Capture .explain('formatted') for the round-13 optimization targets.

Usage: python tools/r13_plans.py <tag> [query ...]

Writes plans/r13/<query>_<tag>.txt for each requested query (default:
all). Constructions mirror bench.py exactly so the captured plan is
the plan the bench times.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale_dir = os.path.join(repo, ".scale_cache", "sf1")

    from spark_bestfit_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4)
    spark = get_spark(
        app_name="r13-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    from spark_bestfit_spark.operators.curation import decontaminate_fuzzy
    from spark_bestfit_spark.operators.dedup import (
        clip_duplicate_spans,
        duplicate_spans,
        minhash_dedup_pairs,
        winnow_neardup_pairs,
    )
    from spark_bestfit_spark.operators.linkage import (
        jaro_winkler_join,
        set_similarity_join,
    )
    from spark_bestfit_spark.operators.textstats import (
        tfidf_neardup_pairs,
        with_repetition_ratio,
    )

    queries = {
        "q_tfidf_neardup_prefix": lambda: tfidf_neardup_pairs(
            docs, threshold=0.9, candidates="prefix"
        ),
        "q_minhash_dedup": lambda: minhash_dedup_pairs(docs, threshold=0.7),
        "q_fuzzy_decontam": lambda: decontaminate_fuzzy(
            docs.filter("doc_id % 10 != 0"),
            docs.filter("doc_id % 10 = 0"),
            threshold=0.7,
        ),
        "q_duplicate_spans": lambda: duplicate_spans(docs),
        "q_clip_spans": lambda: clip_duplicate_spans(docs, n=8).agg(
            F.sum("n_removed")
        ),
        "q_winnow_pairs": lambda: winnow_neardup_pairs(
            docs, min_shared=20, max_bucket_size=200
        ),
        "q_set_similarity": lambda: set_similarity_join(
            docs.filter("doc_id % 10 != 0").selectExpr(
                "doc_id AS id_l", "text AS ta"
            ),
            docs.filter("doc_id % 10 = 0").selectExpr(
                "doc_id AS id_r", "text AS tb"
            ),
            "ta", "tb", "id_l", "id_r", 0.95,
        ),
        "q_repetition_ratio": lambda: with_repetition_ratio(docs),
    }
    for name, build in queries.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(build()))
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
