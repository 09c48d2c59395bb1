"""Capture .explain('formatted') for the round-12 optimization targets.

Usage: python tools/r12_plans.py <tag> [query ...]

Writes plans/r12/<query>_<tag>.txt for each requested query (default:
all). Constructions mirror bench.py exactly so the captured plan is the
plan the bench times.
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
    out_dir = os.path.join(repo, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale_dir = os.path.join(repo, ".scale_cache", "sf1")

    from spark_bestfit_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4)
    spark = get_spark(
        app_name="r12-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs1 = (
        spark.read.parquet(os.path.join(scale_dir, "documents.parquet"))
        if os.path.isdir(os.path.join(scale_dir, "documents.parquet"))
        else docs
    )

    from spark_bestfit_spark.operators.curation import (
        decontaminate_fuzzy,
        pack_training_sequences,
    )
    from spark_bestfit_spark.operators.dedup import (
        clip_duplicate_spans,
        duplicate_spans,
        minhash_dedup_pairs,
        neardup_clusters,
        winnow_neardup_pairs,
    )
    from spark_bestfit_spark.operators.linkage import (
        fuzzy_join,
        jaro_winkler_join,
        resolve_entities,
        set_similarity_join,
    )
    from spark_bestfit_spark.operators.similarity import semantic_dedup
    from spark_bestfit_spark.operators.stats import (
        energy_distance,
        pr_metrics,
        qini_curve,
        two_sample_ks_by_group,
        two_sample_ks_df,
    )
    from spark_bestfit_spark.operators.textstats import tfidf_neardup_pairs

    li_a = li.filter("l_returnflag = 'A'")
    li_n = li.filter("l_returnflag = 'N'")
    li_y = li.withColumn("_y", (F.col("l_returnflag") == "R").cast("int"))
    li_uplift = li.withColumn(
        "_t", (F.col("l_discount") > 0.05).cast("int")
    ).withColumn("_yy", (F.col("l_returnflag") == "R").cast("int"))

    jw_keys = docs.select(
        "doc_id",
        F.substring("text", 1, 40).alias("_k"),
        F.concat_ws(
            " ",
            F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 2),
        ).alias("_blk"),
    )
    jwa = jw_keys.select(
        F.col("doc_id").alias("jw_a"),
        F.col("_k").alias("ka"),
        F.col("_blk").alias("blk_a"),
    )
    jwb = jw_keys.select(
        F.col("doc_id").alias("jw_b"),
        F.col("_k").alias("kb"),
        F.col("_blk").alias("blk_b"),
    )

    builders = {
        "q_tfidf_neardup_prefix": lambda: tfidf_neardup_pairs(
            docs, threshold=0.9, candidates="prefix"
        ),
        "q_fuzzy_decontam": lambda: decontaminate_fuzzy(
            docs.filter("doc_id % 10 != 0"),
            docs.filter("doc_id % 10 = 0"),
            threshold=0.7,
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
        "q_fuzzy_join": lambda: fuzzy_join(
            cust, cust, "c_name", "c_name", "c_custkey", "c_custkey", 1
        ).filter("id_l < id_r"),
        "q_resolve_entities": lambda: resolve_entities(
            part, "p_name", "p_partkey", max_dist=1
        ),
        "q_semantic_dedup": lambda: semantic_dedup(
            emb, threshold=0.99, n_clusters=16, method="local"
        ).filter("is_kept"),
        "q_minhash_dedup": lambda: minhash_dedup_pairs(docs, threshold=0.7),
        "q_neardup_clusters": lambda: neardup_clusters(
            minhash_dedup_pairs(docs, threshold=0.7)
        ),
        "q_duplicate_spans": lambda: duplicate_spans(
            docs, k=5, min_len=10, max_posting=50
        ),
        "q_winnow_pairs": lambda: winnow_neardup_pairs(
            docs, min_shared=20, max_bucket_size=200
        ),
        "q_clip_spans": lambda: clip_duplicate_spans(docs1, n=8).agg(
            F.sum("n_removed")
        ),
        "q_jw_linkage": lambda: jaro_winkler_join(
            jwa, jwb, "ka", "kb", "jw_a", "jw_b", 0.9,
            left_block="blk_a", right_block="blk_b",
        ).filter("jw_a < jw_b"),
        "q_pack_sequences": lambda: pack_training_sequences(
            docs, seq_len=2048
        ),
        "q_two_sample_ks": lambda: two_sample_ks_df(li_a, li_n, "l_quantity"),
        "q_energy_distance": lambda: energy_distance(
            li_a, li_n, "l_extendedprice"
        ),
        "q_ks_by_group": lambda: two_sample_ks_by_group(
            li.filter("pmod(cast(l_extendedprice * 100 as bigint), 2) = 0"),
            li.filter("pmod(cast(l_extendedprice * 100 as bigint), 2) = 1"),
            "l_quantity", "l_returnflag",
        ),
        "q_pr_metrics": lambda: pr_metrics(li_y, "l_extendedprice", "_y"),
        "q_qini": lambda: qini_curve(
            li_uplift, "l_extendedprice", "_t", "_yy", 10
        ),
    }

    for name, build in builders.items():
        if only and name not in only:
            continue
        try:
            txt = explain_str(build())
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building {name}: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
