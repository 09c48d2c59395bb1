"""One-off deep scale probe: the flagship bench lines at sf10 (100x
the sf0.1 base tables) beside their sf1 (10x) twins, measured in ONE
session with ONE methodology, so the printed ratio is a clean
decade-over-decade scale exponent.

Why this exists: bench.py's per-round scale curve stops at sf1
(6M lineitem rows / 50k docs / 20k vectors) to keep the driver's
per-round wall bounded. This probe extends the curve one more decade
(60M rows / 500k docs / 200k vectors) for the operators whose 100 TB
credibility rests on a measured exponent, not a plan argument:
the histogram-fit engine (predicted near-FLAT — fit cost is
O(scan) + O(D/executors)), the prefix-sum spines (predicted ~linear),
and the candidate-generation dedup/linkage family (predicted
~linear-in-output on replica-disjoint corpora).

Replication conventions are bench.py's exactly (same duplicate-rate
preservation arguments): per-replica word suffixes keep document
replicas textually disjoint; per-replica sign-flip patterns preserve
in-replica cosines exactly while scrambling cross-replica ones;
name keys get a 4-char-repeated replica suffix (>= 4 edits across
replicas, 0 within). semantic_dedup's n_clusters scales with the
corpus (64 @ sf1 -> 640 @ sf10) so the in-cluster quadratic term —
the thing the operator bounds by design — stays constant-sized.

Methodology: each line runs ONCE at sf1 then ONCE at sf10, cold, in
a fixed order (cheap lines first). Single cold runs are noisier than
bench.py's min-of-N, but both decades share the noise model, so the
RATIO is honest; absolute walls should be read against bench.py's
fresh-session pins, not as replacements.

Usage: python tools/scale_probe.py [line ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_PROBE_LINES (comma list, same as argv)
Prints one JSON line: {"metric": "scale_probe", "lines": {name:
{"sf1": s, "sf10": s, "ratio": r}}, "reps": 100}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import pyspark.sql.functions as F
    from pyspark.sql import functions as FB

    from spark_bestfit_spark.fitter import DistributionFitter
    from spark_bestfit_spark.operators.curation import (
        decontaminate_fuzzy,
        pack_training_sequences,
    )
    from spark_bestfit_spark.operators.dedup import (
        clip_duplicate_spans,
        duplicate_spans,
        incremental_minhash_pairs,
        minhash_band_index,
        minhash_dedup_pairs,
        neardup_clusters,
    )
    from spark_bestfit_spark.operators.skew import salted_join
    from spark_bestfit_spark.operators.similarity import (
        IvfPqIndex,
        pq_encode,
        pq_topk,
        pq_train,
        quantization_error_report,
    )
    from spark_bestfit_spark.operators.textstats import char_entropy
    from spark_bestfit_spark.operators.frequency import heavy_hitters
    from spark_bestfit_spark.operators.histogram import compute_histogram
    from spark_bestfit_spark.operators.linkage import (
        fuzzy_join,
        jaro_winkler_join,
        resolve_entities,
        set_similarity_join,
    )
    from spark_bestfit_spark.operators.normalize import quantile_rank
    from spark_bestfit_spark.operators.similarity import semantic_dedup
    from spark_bestfit_spark.operators.stats import (
        two_sample_ks_approx_df,
        two_sample_ks_df,
        wasserstein_approx_df,
    )
    from spark_bestfit_spark.operators.textstats import (
        _tokens,
        bpe_doc_token_counts,
        bpe_learn,
        kn_doc_logprob,
        kn_doc_logprob3,
        kn_doc_logprob_by_group,
        kneser_ney_bigrams,
        tfidf_neardup_pairs,
    )
    from spark_bestfit_spark.operators.curation import dsir_select
    from spark_bestfit_spark.operators.dedup import winnow_neardup_pairs
    from spark_bestfit_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = os.path.join(repo, ".scale_cache", "sf1")
    sf10_dir = os.path.join(repo, ".scale_cache", "sf10")
    only = {q.strip() for q in sys.argv[1:] if q.strip()}
    only |= {
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_PROBE_LINES", "").split(",")
        if q.strip()
    }

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4)

    base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base_cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base_part = spark.read.parquet(f"{sf_dir}/part.parquet")

    def replicate(n_reps: int, out_dir: str, lineitem_only=False) -> None:
        """bench.py's sf1 replication recipe at an arbitrary factor."""
        reps = spark.range(n_reps).select(F.col("id").alias("_rep"))
        li_path = os.path.join(out_dir, "lineitem.parquet")
        if not os.path.isdir(li_path):
            (
                base_li.select(
                    "l_extendedprice", "l_quantity", "l_returnflag",
                    "l_discount",
                )
                .crossJoin(F.broadcast(reps))
                .drop("_rep")
                .repartition(cpus)
                .write.mode("overwrite").parquet(li_path)
            )
        # SALTED twin for the lineitem spines: the plain n_reps-fold
        # replica dictionary/RLE-compresses absurdly (600M rows ->
        # 399 MB), so its scan cost is not representative — the r9
        # probe's own honesty caveat. Row-unique mantissa jitter
        # (~1M distinct offsets per column chunk) defeats dictionary
        # encoding, so the salted file carries a realistic
        # bytes-per-row scan term while perturbing values by <= 0.1%
        # relative — the distribution-level lines see the same shape.
        li_salt_path = os.path.join(out_dir, "lineitem_salted.parquet")
        if not os.path.isdir(li_salt_path):
            rid = F.pmod(
                F.xxhash64(F.monotonically_increasing_id(), F.col("_rep")),
                F.lit(1_000_003),
            ).cast("double")
            (
                base_li.select(
                    "l_extendedprice", "l_quantity", "l_returnflag",
                    "l_discount",
                )
                # pre-partition BEFORE the 1000x expand: the base is
                # tiny (1-2 scan partitions), so expanding first would
                # funnel the whole salted relation through 1-2 tasks
                # and then shuffle ~20 GB to spread it; expanding from
                # cpus partitions parallelizes the generation AND makes
                # the post-expand repartition unnecessary
                .repartition(cpus)
                .crossJoin(F.broadcast(reps))
                .select(
                    (F.col("l_extendedprice")
                     * (F.lit(1.0) + rid * F.lit(1e-9)))
                    .alias("l_extendedprice"),
                    (F.col("l_quantity") + rid * F.lit(1e-9))
                    .alias("l_quantity"),
                    F.col("l_returnflag"),
                    (F.col("l_discount") + rid * F.lit(1e-12))
                    .alias("l_discount"),
                )
                .write.mode("overwrite").parquet(li_salt_path)
            )
        if lineitem_only:
            return
        docs_path = os.path.join(out_dir, "documents.parquet")
        if not os.path.isdir(docs_path):
            text_r = FB.when(F.col("_rep") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.col("_rep").cast("string")),
                    ),
                    " ",
                )
            )
            (
                base_docs.select("doc_id", "text")
                .crossJoin(F.broadcast(reps))
                .select(
                    (F.col("doc_id") + F.col("_rep") * F.lit(10_000_000))
                    .alias("doc_id"),
                    text_r.alias("text"),
                )
                .repartition(cpus)
                .write.mode("overwrite").parquet(docs_path)
            )
        emb_path = os.path.join(out_dir, "embeddings.parquet")
        if not os.path.isdir(emb_path):
            signed = F.transform(
                F.col("embedding"),
                lambda x, i: FB.when(F.col("_rep") == 0, x).otherwise(
                    FB.when(
                        (
                            (
                                i.cast("bigint") * FB.lit(1103515245)
                                + F.col("_rep") * FB.lit(12345)
                            )
                            % 97
                        ) % 2
                        == 0,
                        x,
                    ).otherwise(-x)
                ),
            )
            (
                base_emb.crossJoin(F.broadcast(reps))
                .select(
                    (F.col("vec_id") + F.col("_rep") * F.lit(10_000_000))
                    .alias("vec_id"),
                    signed.alias("embedding"),
                )
                .repartition(cpus)
                .write.mode("overwrite").parquet(emb_path)
            )
        cust_path = os.path.join(out_dir, "customer.parquet")
        if not os.path.isdir(cust_path):
            suff = FB.when(F.col("_rep") == 0, F.lit("")).otherwise(
                F.repeat(F.col("_rep").cast("string"), 4)
            )
            (
                base_cust.select("c_custkey", "c_name")
                .crossJoin(F.broadcast(reps))
                .select(
                    (F.col("c_custkey") + F.col("_rep") * F.lit(10_000_000))
                    .alias("c_custkey"),
                    F.concat(F.col("c_name"), suff).alias("c_name"),
                )
                .repartition(cpus)
                .write.mode("overwrite").parquet(cust_path)
            )
        part_path = os.path.join(out_dir, "part.parquet")
        if not os.path.isdir(part_path):
            suff = FB.when(F.col("_rep") == 0, F.lit("")).otherwise(
                F.repeat(F.col("_rep").cast("string"), 4)
            )
            (
                base_part.select("p_partkey", "p_name")
                .crossJoin(F.broadcast(reps))
                .select(
                    (F.col("p_partkey") + F.col("_rep") * F.lit(10_000_000))
                    .alias("p_partkey"),
                    F.concat(F.col("p_name"), suff).alias("p_name"),
                )
                .repartition(cpus)
                .write.mode("overwrite").parquet(part_path)
            )

    sf100 = "--sf100" in only
    only.discard("--sf100")
    print("building replicas (reused if present) ...", flush=True)
    replicate(10, sf1_dir)
    if sf100:
        # third decade, lineitem spines only (600M rows): the fit
        # engine and the bucketed prefix-sum spines are the operators
        # whose flat/linear claims matter most, and lineitem is the
        # only table whose 1000x replica stays disk- and time-cheap
        sf100_dir = os.path.join(repo, ".scale_cache", "sf100")
        replicate(1000, sf100_dir, lineitem_only=True)
        # lineitem spines read the SALTED twins at both decade ends, so
        # the scan I/O term is realistic (see replicate())
        li1 = spark.read.parquet(
            os.path.join(sf1_dir, "lineitem_salted.parquet")
        )
        li100 = spark.read.parquet(
            os.path.join(sf100_dir, "lineitem_salted.parquet")
        )
        fitter = DistributionFitter(spark)
        lines100 = [
            ("hist",
             lambda: compute_histogram(li1, "l_extendedprice", bins=50),
             lambda: compute_histogram(li100, "l_extendedprice", bins=50)),
            ("fit_full",
             lambda: fitter.fit(li1, column="l_extendedprice").count(),
             lambda: fitter.fit(li100, column="l_extendedprice").count()),
            ("two_sample_ks",
             lambda: two_sample_ks_df(
                 li1.filter("l_returnflag = 'A'"),
                 li1.filter("l_returnflag = 'N'"), "l_quantity").first(),
             lambda: two_sample_ks_df(
                 li100.filter("l_returnflag = 'A'"),
                 li100.filter("l_returnflag = 'N'"), "l_quantity").first()),
            # the 100 TB recommendation: deterministic-grid approx tier —
            # two bounded scans at ANY size (no per-value relation, no
            # window over data), so the 100x ratio should track raw
            # scan growth, not the exact tier's jump-relation term
            ("two_sample_ks_approx",
             lambda: two_sample_ks_approx_df(
                 li1.filter("l_returnflag = 'A'"),
                 li1.filter("l_returnflag = 'N'"), "l_quantity").first(),
             lambda: two_sample_ks_approx_df(
                 li100.filter("l_returnflag = 'A'"),
                 li100.filter("l_returnflag = 'N'"), "l_quantity").first()),
            ("wasserstein_approx",
             lambda: wasserstein_approx_df(
                 li1.filter("l_returnflag = 'A'"),
                 li1.filter("l_returnflag = 'N'"), "l_quantity").first(),
             lambda: wasserstein_approx_df(
                 li100.filter("l_returnflag = 'A'"),
                 li100.filter("l_returnflag = 'N'"), "l_quantity").first()),
            ("quantile_rank",
             lambda: quantile_rank(li1, "l_extendedprice").count(),
             lambda: quantile_rank(li100, "l_extendedprice").count()),
        ]
        out: dict = {}
        for name, f1, f100 in lines100:
            if only and name not in only:
                continue
            t0 = time.perf_counter()
            f1()
            w1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            f100()
            w100 = time.perf_counter() - t0
            out[name] = {
                "sf1": round(w1, 3), "sf100": round(w100, 3),
                "ratio": round(w100 / w1, 2) if w1 > 0 else None,
            }
            print(f"{name:>18}: sf1 {w1:7.2f} s   sf100 {w100:8.2f} s"
                  f"   x{out[name]['ratio']} (100x the rows)", flush=True)
        print(json.dumps(
            {"metric": "scale_probe_sf100", "unit": "sec", "reps": 1000,
             "lines": out}))
        return 0
    replicate(100, sf10_dir)

    def tables(d):
        return (
            # salted lineitem: realistic scan bytes (see replicate())
            spark.read.parquet(os.path.join(d, "lineitem_salted.parquet")),
            spark.read.parquet(os.path.join(d, "documents.parquet")),
            spark.read.parquet(os.path.join(d, "embeddings.parquet")),
            spark.read.parquet(os.path.join(d, "customer.parquet")),
            spark.read.parquet(os.path.join(d, "part.parquet")),
        )

    li1, docs1, emb1, cust1, part1 = tables(sf1_dir)
    li10, docs10, emb10, cust10, part10 = tables(sf10_dir)
    fitter = DistributionFitter(spark)

    def inc_minhash(state_docs, state_index):
        # production incremental shape: FIXED delta (the 5k base
        # docs, re-identified out of the state's id range), persisted
        # band index of the GROWING state — the line isolates the
        # state-growth term of the delta cost (the full recompute's
        # growth term is the whole minhash_sf* line)
        delta = base_docs.select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"), "text"
        )
        return incremental_minhash_pairs(
            delta, state_index, state_docs.select("doc_id", "text"),
            threshold=0.7,
        ).count()

    def jw_sides(docs):
        """bench.py's q_jw_linkage blocked-mode inputs: 40-char key,
        first-2-words block."""
        keys = docs.select(
            "doc_id",
            F.substring("text", 1, 40).alias("_k"),
            F.concat_ws(
                " ",
                F.slice(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 2
                ),
            ).alias("_blk"),
        )
        a = keys.select(
            F.col("doc_id").alias("jw_a"), F.col("_k").alias("ka"),
            F.col("_blk").alias("blk_a"),
        )
        b = keys.select(
            F.col("doc_id").alias("jw_b"), F.col("_k").alias("kb"),
            F.col("_blk").alias("blk_b"),
        )
        return a, b

    # salted_join's regime: the dim side must be too big to broadcast
    # (a broadcast join has no skew problem to fix) — 2M rows x ~40B
    # clears the 10 MB autoBroadcastJoinThreshold, forcing the
    # sort-merge path where a hot key funnels to one reducer
    DIM_KEYS = 2_000_000

    def hot_keyed(li):
        """90%-hot join key over a lineitem replica."""
        return li.select(
            FB.when(
                F.xxhash64("l_extendedprice", "l_quantity") % 10 < 9,
                F.lit(0),
            ).otherwise(
                F.pmod(F.xxhash64("l_extendedprice"), F.lit(DIM_KEYS))
            ).alias("jk"),
            "l_quantity",
        )

    def join_dim():
        return spark.range(0, DIM_KEYS).select(
            F.col("id").alias("jk"),
            F.concat(F.lit("dim-payload-"), F.col("id")).alias("label"),
        )

    # (name, sf1 thunk, sf10 thunk) — cheap lines first so a late OOM
    # (none expected) still leaves a mostly-complete report
    lines = [
        ("hist", lambda: compute_histogram(li1, "l_extendedprice", bins=50),
         lambda: compute_histogram(li10, "l_extendedprice", bins=50)),
        ("fit_full",
         lambda: fitter.fit(li1, column="l_extendedprice").count(),
         lambda: fitter.fit(li10, column="l_extendedprice").count()),
        ("two_sample_ks",
         lambda: two_sample_ks_df(
             li1.filter("l_returnflag = 'A'"),
             li1.filter("l_returnflag = 'N'"), "l_quantity").first(),
         lambda: two_sample_ks_df(
             li10.filter("l_returnflag = 'A'"),
             li10.filter("l_returnflag = 'N'"), "l_quantity").first()),
        ("two_sample_ks_approx",
         lambda: two_sample_ks_approx_df(
             li1.filter("l_returnflag = 'A'"),
             li1.filter("l_returnflag = 'N'"), "l_quantity").first(),
         lambda: two_sample_ks_approx_df(
             li10.filter("l_returnflag = 'A'"),
             li10.filter("l_returnflag = 'N'"), "l_quantity").first()),
        ("wasserstein_approx",
         lambda: wasserstein_approx_df(
             li1.filter("l_returnflag = 'A'"),
             li1.filter("l_returnflag = 'N'"), "l_quantity").first(),
         lambda: wasserstein_approx_df(
             li10.filter("l_returnflag = 'A'"),
             li10.filter("l_returnflag = 'N'"), "l_quantity").first()),
        ("quantile_rank",
         lambda: quantile_rank(li1, "l_extendedprice").count(),
         lambda: quantile_rank(li10, "l_extendedprice").count()),
        ("heavy_hitters",
         lambda: heavy_hitters(
             docs1.select(F.explode(_tokens(F.col("text"))).alias("tok")),
             "tok", phi=0.002).count(),
         lambda: heavy_hitters(
             docs10.select(F.explode(_tokens(F.col("text"))).alias("tok")),
             "tok", phi=0.002).count()),
        ("fuzzy_join",
         lambda: fuzzy_join(cust1, cust1, "c_name", "c_name", "c_custkey",
                            "c_custkey", 1).filter("id_l < id_r").count(),
         lambda: fuzzy_join(cust10, cust10, "c_name", "c_name", "c_custkey",
                            "c_custkey", 1).filter("id_l < id_r").count()),
        ("minhash",
         lambda: minhash_dedup_pairs(docs1, threshold=0.7).count(),
         lambda: minhash_dedup_pairs(docs10, threshold=0.7).count()),
        ("neardup_clusters",
         lambda: neardup_clusters(
             minhash_dedup_pairs(docs1, threshold=0.7)).count(),
         lambda: neardup_clusters(
             minhash_dedup_pairs(docs10, threshold=0.7)).count()),
        ("semantic_dedup",
         lambda: semantic_dedup(emb1, threshold=0.99, n_clusters=64,
                                method="local").filter("is_kept").count(),
         lambda: semantic_dedup(emb10, threshold=0.99, n_clusters=640,
                                method="local").filter("is_kept").count()),
        ("fuzzy_decontam",
         lambda: decontaminate_fuzzy(
             docs1.filter("doc_id % 10 != 0"),
             docs1.filter("doc_id % 10 = 0"), threshold=0.7).count(),
         lambda: decontaminate_fuzzy(
             docs10.filter("doc_id % 10 != 0"),
             docs10.filter("doc_id % 10 = 0"), threshold=0.7).count()),
        ("set_similarity",
         lambda: set_similarity_join(
             docs1.filter("doc_id % 10 != 0").selectExpr(
                 "doc_id AS id_l", "text AS ta"),
             docs1.filter("doc_id % 10 = 0").selectExpr(
                 "doc_id AS id_r", "text AS tb"),
             "ta", "tb", "id_l", "id_r", 0.95).count(),
         lambda: set_similarity_join(
             docs10.filter("doc_id % 10 != 0").selectExpr(
                 "doc_id AS id_l", "text AS ta"),
             docs10.filter("doc_id % 10 = 0").selectExpr(
                 "doc_id AS id_r", "text AS tb"),
             "ta", "tb", "id_l", "id_r", 0.95).count()),
        ("tfidf_neardup",
         lambda: tfidf_neardup_pairs(
             docs1, threshold=0.9, candidates="prefix").count(),
         lambda: tfidf_neardup_pairs(
             docs10, threshold=0.9, candidates="prefix").count()),
        ("pack_sequences",
         lambda: pack_training_sequences(docs1, seq_len=2048).count(),
         lambda: pack_training_sequences(docs10, seq_len=2048).count()),
        ("kneser_ney",
         lambda: kneser_ney_bigrams(docs1, "text", k=20).count(),
         lambda: kneser_ney_bigrams(docs10, "text", k=20).count()),
        # trigram tier: same spine as the bigram line, one more join
        # level; the corpus-proportional terms are the two scans plus
        # the triple explodes feeding map-combined groupBys
        ("kn_trigram_logprob",
         lambda: kn_doc_logprob3(
             docs1.filter("doc_id % 2 = 1"),
             docs1.filter("doc_id % 2 = 0")).count(),
         lambda: kn_doc_logprob3(
             docs10.filter("doc_id % 2 = 1"),
             docs10.filter("doc_id % 2 = 0")).count()),
        # DSIR: two corpus scans into <=B-row bucket LMs + a TakeOrdered
        # top-k — predicted scan-bound (near-linear, no data-sized
        # shuffle beyond the (id, bucket) map-combined groupBy)
        ("dsir_select",
         lambda: dsir_select(
             docs1.filter("doc_id % 2 = 1"),
             docs1.filter("doc_id % 2 = 0"), k=1000).count(),
         lambda: dsir_select(
             docs10.filter("doc_id % 2 = 1"),
             docs10.filter("doc_id % 2 = 0"), k=1000).count()),
        # winnowing: map-only fingerprint selection + one exchange on
        # the fp key for the pair step; replicas are textually
        # disjoint so cross-replica pairs stay empty and the pair
        # count is ~linear in the replica count
        ("winnow_pairs",
         lambda: winnow_neardup_pairs(
             docs1, min_shared=20, max_bucket_size=200).count(),
         lambda: winnow_neardup_pairs(
             docs10, min_shared=20, max_bucket_size=200).count()),
        ("kn_doc_logprob",
         lambda: kn_doc_logprob(
             docs1.filter("doc_id % 2 = 1"),
             docs1.filter("doc_id % 2 = 0")).count(),
         lambda: kn_doc_logprob(
             docs10.filter("doc_id % 2 = 1"),
             docs10.filter("doc_id % 2 = 0")).count()),
        # grouped tier shares the flat plan spine with every LM
        # relation group-keyed; replicas carry no lang column, so a
        # 4-way synthetic group stands in (floor(id/2) % 4 so the
        # even/odd train/score split leaves every group populated on
        # BOTH sides — id % 4 would make ref and target groups
        # disjoint and the joins degenerate to all-NULL)
        ("kn_doc_logprob_by_group",
         lambda: kn_doc_logprob_by_group(
             docs1.filter("doc_id % 2 = 1").withColumn(
                 "lang",
                 (F.floor(F.col("doc_id") / 2) % 4).cast("string")),
             docs1.filter("doc_id % 2 = 0").withColumn(
                 "lang",
                 (F.floor(F.col("doc_id") / 2) % 4).cast("string"))
             ).count(),
         lambda: kn_doc_logprob_by_group(
             docs10.filter("doc_id % 2 = 1").withColumn(
                 "lang",
                 (F.floor(F.col("doc_id") / 2) % 4).cast("string")),
             docs10.filter("doc_id % 2 = 0").withColumn(
                 "lang",
                 (F.floor(F.col("doc_id") / 2) % 4).cast("string"))
             ).count()),
        # fixed 10-merge table (sf-independent artifact) applied at
        # both ends: the encode stage is vocab-sized — and the doc
        # replicas suffix tokens per rep, so the sf10 vocab is ~10x
        # the sf1 vocab, making this a real stress of the type-level
        # encode + word-key join, not just the corpus scan
        ("bpe_doc_token_counts",
         lambda: bpe_doc_token_counts(
             docs1, bpe_learn(docs1.limit(5000), "text", 10)).count(),
         lambda: bpe_doc_token_counts(
             docs10, bpe_learn(docs10.limit(5000), "text", 10)).count()),
        ("resolve_entities",
         lambda: resolve_entities(
             part1, "p_name", "p_partkey", max_dist=1).count(),
         lambda: resolve_entities(
             part10, "p_name", "p_partkey", max_dist=1).count()),
        ("jw_linkage",
         lambda: (lambda a, b: jaro_winkler_join(
             a, b, "ka", "kb", "jw_a", "jw_b", 0.9,
             left_block="blk_a", right_block="blk_b",
         ).filter("jw_a < jw_b").count())(*jw_sides(docs1)),
         lambda: (lambda a, b: jaro_winkler_join(
             a, b, "ka", "kb", "jw_a", "jw_b", 0.9,
             left_block="blk_a", right_block="blk_b",
         ).filter("jw_a < jw_b").count())(*jw_sides(docs10))),
        ("duplicate_spans",
         lambda: duplicate_spans(
             docs1, k=5, min_len=10, max_posting=50).count(),
         lambda: duplicate_spans(
             docs10, k=5, min_len=10, max_posting=50).count()),
        # the PRODUCTION decontamination shape: the benchmark set is
        # FIXED (an eval set doesn't grow with the corpus) — only the
        # corpus side scales, so this line isolates the corpus-linear
        # term that the paired-growth "fuzzy_decontam" line above mixes
        # with probe-side growth
        ("fuzzy_decontam_fixed_probe",
         lambda: decontaminate_fuzzy(
             docs1, base_docs.select("doc_id", "text"),
             threshold=0.7).count(),
         lambda: decontaminate_fuzzy(
             docs10, base_docs.select("doc_id", "text"),
             threshold=0.7).count()),
        # ---- round-10 additions (probe-before-bench rule) ----
        ("clip_spans",
         lambda: clip_duplicate_spans(docs1, n=8).agg(
             FB.sum("n_removed")).first(),
         lambda: clip_duplicate_spans(docs10, n=8).agg(
             FB.sum("n_removed")).first()),
        ("char_entropy",
         lambda: char_entropy(docs1).agg(
             FB.sum("n_chars")).first(),
         lambda: char_entropy(docs10).agg(
             FB.sum("n_chars")).first()),
        ("quant_report",
         lambda: quantization_error_report(emb1, dim=64).count(),
         lambda: quantization_error_report(emb10, dim=64).count()),
        ("pq_encode",
         lambda: pq_encode(
             emb1, pq_train(emb1, dim=64, m=8)).agg(
             FB.sum(F.element_at("pq_code", 1))).first(),
         lambda: pq_encode(
             emb10, pq_train(emb10, dim=64, m=8)).agg(
             FB.sum(F.element_at("pq_code", 1))).first()),
        # ---- round-11 additions (probe-before-bench rule) ----
        # snapshot dedup: fixed 5k-doc delta against a PRE-BUILT band
        # index of the growing state (index build cost excluded — it
        # is the persisted artifact; the lambda pays banding the
        # delta, the band join, and exact candidate verification)
        ("incremental_minhash_fixed_delta",
         (lambda idx1: lambda: inc_minhash(docs1, idx1))(
             minhash_band_index(docs1).localCheckpoint()),
         (lambda idx10: lambda: inc_minhash(docs10, idx10))(
             minhash_band_index(docs10).localCheckpoint())),
        # single-scan batch ADC: 64 queries, one pass per decade; the
        # r10 shape would have run 64 corpus scans here
        ("pq_topk_batch64",
         (lambda: (lambda books: pq_topk(
             pq_encode(emb1, books).select("vec_id", "pq_code"),
             books,
             [(r.vec_id, list(r.embedding))
              for r in emb1.filter("vec_id < 64").collect()],
             k=5).count())(pq_train(emb1, dim=64, m=8, n_codes=64))),
         (lambda: (lambda books: pq_topk(
             pq_encode(emb10, books).select("vec_id", "pq_code"),
             books,
             [(r.vec_id, list(r.embedding))
              for r in emb10.filter("vec_id < 64").collect()],
             k=5).count())(pq_train(emb10, dim=64, m=8, n_codes=64)))),
        # IVF+PQ composed: build + 64-query batch at nprobe=4 of 64
        # cells — the probed-cells scan should hold the decade ratio
        # under the full-scan ADC line above
        ("ivfpq_batch64",
         (lambda: (lambda idx: idx.query(
             [(r.vec_id, list(r.embedding))
              for r in emb1.filter("vec_id < 64").collect()],
             k=5, nprobe=4).count())(
             IvfPqIndex.build(emb1, n_clusters=64, m=8, n_codes=64))),
         (lambda: (lambda idx: idx.query(
             [(r.vec_id, list(r.embedding))
              for r in emb10.filter("vec_id < 64").collect()],
             k=5, nprobe=4).count())(
             IvfPqIndex.build(emb10, n_clusters=64, m=8, n_codes=64)))),
        # salted_join vs the plain join it replaces, on a 90%-hot key
        # (the interesting number is the salted/plain ratio at sf10,
        # where the hot key owns ~54M rows)
        ("salted_join",
         lambda: salted_join(
             hot_keyed(li1), join_dim(), ["jk"], salt=16).count(),
         lambda: salted_join(
             hot_keyed(li10), join_dim(), ["jk"], salt=16).count()),
        ("plain_join_hotkey",
         lambda: hot_keyed(li1).join(join_dim(), "jk").count(),
         lambda: hot_keyed(li10).join(join_dim(), "jk").count()),
    ]

    # Warm the code paths whose sf1 end otherwise carries one-time JVM
    # warmup (Arrow/pandas-UDF stage init, codebook-fit imports): the
    # round-11 table printed pq_topk_batch64 at "0.5x" and
    # incremental_minhash_fixed_delta at "0.63x" per decade only
    # because their sf1 measurement paid the first-ever Arrow stage.
    # A 100-row call before measuring makes the printed ratios mean
    # what they say; the measured lambdas are unchanged.
    warmups = {
        "pq_topk_batch64": lambda: (lambda sm: (lambda books: pq_topk(
            pq_encode(sm, books).select("vec_id", "pq_code"), books,
            [(r.vec_id, list(r.embedding))
             for r in sm.limit(2).collect()],
            k=2).count())(pq_train(sm, dim=64, m=8, n_codes=4,
                                   sample_size=100)))(
            emb1.limit(100).localCheckpoint()),
        "incremental_minhash_fixed_delta": lambda: (
            lambda sm: incremental_minhash_pairs(
                sm.select((F.col("doc_id") + 200_000_000).alias("doc_id"),
                          "text"),
                minhash_band_index(sm), sm.select("doc_id", "text"),
                threshold=0.7,
            ).count())(docs1.limit(100).localCheckpoint()),
    }

    out: dict = {}
    for name, f1, f10 in lines:
        if only and name not in only:
            continue
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        if name in warmups:
            warmups[name]()
        t0 = time.perf_counter()
        f1()
        w1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        f10()
        w10 = time.perf_counter() - t0
        out[name] = {
            "sf1": round(w1, 3),
            "sf10": round(w10, 3),
            "ratio": round(w10 / w1, 2) if w1 > 0 else None,
        }
        print(f"{name:>18}: sf1 {w1:7.2f} s   sf10 {w10:8.2f} s   "
              f"x{out[name]['ratio']}", flush=True)

    print(json.dumps(
        {"metric": "scale_probe", "unit": "sec", "reps": 100,
         "lines": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
