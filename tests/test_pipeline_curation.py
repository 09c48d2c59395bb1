"""Tests for the end-to-end corpus curation pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from spark_bestfit_spark.operators.pipeline import curate_corpus

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def messy_corpus(spark):
    rows = [
        # high-quality originals
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "a completely different sentence with many distinct interesting words here now"),
        # exact duplicate of 0 (whitespace/case variant)
        (2, "The  Quick  Brown fox jumps over the lazy dog near the river bank today"),
        # near duplicate of 1 (one word changed)
        (3, "a completely different sentence with many distinct interesting words here soon"),
        # junk: too short
        (4, "short text"),
        # junk: low quality (repetition + punctuation)
        (5, "!!! ??? !!! ??? !!! ??? !!! ??? !!! ??? !!! ???"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestCurateCorpus:
    def test_full_pipeline(self, messy_corpus):
        curated, audit = curate_corpus(
            messy_corpus,
            min_quality=0.2,
            min_tokens=5,
            near_dup_threshold=0.7,
        )
        ids = sorted(r.doc_id for r in curated.select("doc_id").collect())
        # 4 dies on length, 5 on quality, 2 on exact dedup, 3 on near-dup
        assert ids == [0, 1]
        assert audit["input"] == 6
        assert audit["after_quality_filter"] == 4
        assert audit["after_exact_dedup"] == 3
        assert audit["after_near_dedup"] == 2
        assert audit["near_dup_pairs"] >= 1

    def test_language_filter(self, spark):
        rows = [
            (0, "the cat is in the house and it was a good day for everyone there"),
            (1, "der hund ist nicht da und das ist ein problem mit vielen worten jetzt"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        curated, audit = curate_corpus(
            df, min_quality=0.0, min_tokens=3, languages=["en"]
        )
        ids = [r.doc_id for r in curated.collect()]
        assert ids == [0]

    def test_runs_on_documents_table(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(300)
        curated, audit = curate_corpus(
            docs, min_quality=0.1, min_tokens=3, near_dup_threshold=0.8
        )
        assert audit["after_near_dedup"] <= audit["after_exact_dedup"]
        assert audit["after_exact_dedup"] <= audit["after_quality_filter"]
        assert audit["after_quality_filter"] <= audit["input"]
        assert curated.count() == audit["after_near_dedup"]
        # curated keeps the original schema
        assert set(docs.columns) <= set(curated.columns)


class TestConfigValidation:
    def test_bad_prefilter_rejected(self, spark):
        import pandas as pd

        from spark_bestfit_spark.fitter import DistributionFitter

        df = spark.createDataFrame(pd.DataFrame({"v": [1.0, 2.0, 3.0]}))
        with pytest.raises(ValueError, match="prefilter"):
            DistributionFitter(spark).fit(
                df, column="v", distributions=["norm"], prefilter="typo"
            )


class TestNeardupClusters:
    def test_transitive_chain_collapses(self, spark):
        from spark_bestfit_spark.operators.dedup import neardup_clusters

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
            "id_a long, id_b long",
        )
        got = {
            r.doc_id: r.cluster_id for r in neardup_clusters(pairs).collect()
        }
        assert got == {
            1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20
        }

    def test_long_path_converges(self, spark):
        from spark_bestfit_spark.operators.dedup import neardup_clusters

        # 40-node path: naive one-hop propagation needs 40 rounds; path
        # halving must converge inside the default iteration budget
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(40)], "id_a long, id_b long"
        )
        got = neardup_clusters(pairs).collect()
        assert {r.cluster_id for r in got} == {0}
        assert len(got) == 41

    def test_empty_pairs(self, spark):
        from spark_bestfit_spark.operators.dedup import neardup_clusters

        pairs = spark.createDataFrame([], "id_a long, id_b long")
        assert neardup_clusters(pairs).count() == 0

    def test_driver_unionfind_matches_iterative(self, spark):
        """r12: the small-graph driver union-find path must produce
        labels identical to the iterative propagation path on a graph
        with chains, cliques, singleton-free components and string-id
        ordering — on both long and string id types."""
        import random

        from spark_bestfit_spark.operators.dedup import neardup_clusters

        rng = random.Random(7)
        edges = set()
        # 30 random components over 300 nodes + a long chain
        nodes = list(range(300))
        rng.shuffle(nodes)
        for i in range(0, 280, 10):
            comp = nodes[i:i + 10]
            for a, b in zip(comp, comp[1:]):
                edges.add((min(a, b), max(a, b)))
            edges.add((min(comp[0], comp[-1]), max(comp[0], comp[-1])))
        for i in range(400, 440):
            edges.add((i, i + 1))
        pairs = spark.createDataFrame(
            sorted(edges), "id_a long, id_b long"
        )
        drv = {
            r.doc_id: r.cluster_id
            for r in neardup_clusters(pairs).collect()
        }
        it = {
            r.doc_id: r.cluster_id
            for r in neardup_clusters(
                pairs, driver_threshold=0
            ).collect()
        }
        assert drv == it and len(drv) > 300

        spairs = spark.createDataFrame(
            [(f"d{a:04d}", f"d{b:04d}") for a, b in sorted(edges)],
            "id_a string, id_b string",
        )
        sdrv = {
            r.doc_id: r.cluster_id
            for r in neardup_clusters(spairs).collect()
        }
        sit = {
            r.doc_id: r.cluster_id
            for r in neardup_clusters(
                spairs, driver_threshold=0
            ).collect()
        }
        assert sdrv == sit


class TestCuration:
    def test_flag_contamination(self, spark, messy_corpus):
        from spark_bestfit_spark.operators.curation import flag_contamination

        out = flag_contamination(
            messy_corpus, ["quick brown fox"], text_col="text"
        )
        flagged = {r.doc_id for r in out.filter("contaminated").collect()}
        assert 0 in flagged and 2 in flagged  # both fox variants
        assert 1 not in flagged

    def test_flag_contamination_empty_probes(self, spark, messy_corpus):
        from spark_bestfit_spark.operators.curation import flag_contamination

        out = flag_contamination(messy_corpus, [], text_col="text")
        assert out.filter("contaminated").count() == 0

    def test_decontaminate_by_ngrams(self, spark, messy_corpus):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            decontaminate_by_ngrams,
        )

        probe_df = spark.createDataFrame(
            [("quick brown fox",)], "ngram string"
        )
        clean, flagged = decontaminate_by_ngrams(
            messy_corpus, probe_df, n=3
        )
        flagged_ids = {r.doc_id for r in flagged.collect()}
        assert 0 in flagged_ids and 2 in flagged_ids
        assert clean.filter(F.col("doc_id").isin(list(flagged_ids))).count() == 0
        assert clean.count() + len(flagged_ids) == messy_corpus.count()

    def test_quota_sample_deterministic_and_bounded(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            stratified_quota_sample,
        )

        df = spark.range(0, 500).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("string").alias("lang"),
        )
        s1 = stratified_quota_sample(df, ["lang"], quota=7)
        s2 = stratified_quota_sample(df, ["lang"], quota=7)
        assert s1.groupBy("lang").count().agg(
            F.max("count")
        ).first()[0] == 7
        a = sorted(r.doc_id for r in s1.collect())
        b = sorted(r.doc_id for r in s2.collect())
        assert a == b

    def test_quota_sample_rejects_bad_quota(self, spark):
        from spark_bestfit_spark.operators.curation import (
            stratified_quota_sample,
        )

        with pytest.raises(ValueError, match="quota"):
            stratified_quota_sample(spark.range(3), ["id"], quota=0)


class TestDomainMixture:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        import pyspark.sql.functions as F

        # 3 domains with very different sizes: big=200 docs, mid=50, small=10
        return (
            spark.range(0, 260)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") < 200, "big")
                .when(F.col("id") < 250, "mid")
                .otherwise("small")
                .alias("source"),
                F.lit("five tokens in this doc").alias("text"),
            )
        )

    def test_weights_sum_to_one_and_flatten(self, corpus):
        from spark_bestfit_spark.operators.curation import (
            domain_mixture_weights,
        )

        rows = {
            r.source: r
            for r in domain_mixture_weights(
                corpus, temperature=0.5
            ).collect()
        }
        assert abs(sum(r.p for r in rows.values()) - 1.0) < 1e-12
        assert abs(sum(r.w for r in rows.values()) - 1.0) < 1e-12
        # flattening: big domain's weight shrinks vs its natural share,
        # small domain's grows
        assert rows["big"].w < rows["big"].p
        assert rows["small"].w > rows["small"].p
        # ordering between domains is preserved
        assert rows["big"].w > rows["mid"].w > rows["small"].w

    def test_temperature_one_is_natural_mix(self, corpus):
        from spark_bestfit_spark.operators.curation import (
            domain_mixture_weights,
        )

        for r in domain_mixture_weights(corpus, temperature=1.0).collect():
            assert abs(r.w - r.p) < 1e-12

    def test_bad_temperature_rejected(self, corpus):
        from spark_bestfit_spark.operators.curation import (
            domain_mixture_weights,
        )

        for bad in (0.0, -1.0, 1.5):
            with pytest.raises(ValueError, match="temperature"):
                domain_mixture_weights(corpus, temperature=bad)

    def test_rate_clamped_at_one(self, corpus):
        from spark_bestfit_spark.operators.curation import (
            domain_mixture_weights,
        )

        rows = domain_mixture_weights(
            corpus, temperature=0.3, target_tokens=10_000_000
        ).collect()
        assert all(r.sampling_rate == 1.0 for r in rows)

    def test_sample_deterministic_and_targets_budget(self, corpus):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            temperature_sample,
        )

        target = 650  # half the 1300-token corpus
        s1 = temperature_sample(corpus, target_tokens=target)
        s2 = temperature_sample(
            corpus.repartition(7), target_tokens=target
        )
        ids1 = sorted(r.doc_id for r in s1.collect())
        ids2 = sorted(r.doc_id for r in s2.collect())
        assert ids1 == ids2  # partitioning-independent
        kept_tokens = s1.select(
            F.sum(F.size(F.split(F.col("text"), " ")))
        ).first()[0]
        # expected post-sampling tokens ~= target (Bernoulli variance
        # over 260 docs of 5 tokens: allow a generous band)
        assert 0.6 * target <= kept_tokens <= 1.4 * target


class TestHashSplit:
    def test_fractions_and_determinism(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import hash_split

        df = spark.range(0, 20_000).select(F.col("id").alias("doc_id"))
        out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
        assert set(counts) == {"train", "val", "test"}
        assert abs(counts["train"] / 20_000 - 0.8) < 0.02
        assert abs(counts["val"] / 20_000 - 0.1) < 0.01
        # identical on a different partitioning
        again = hash_split(df.repartition(17), {"train": 0.8, "val": 0.1, "test": 0.1})
        a = sorted((r.doc_id, r.split) for r in out.collect())
        b = sorted((r.doc_id, r.split) for r in again.collect())
        assert a == b

    def test_seed_decorrelates(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import hash_split

        df = spark.range(0, 5_000).select(F.col("id").alias("doc_id"))
        s1 = {r.doc_id: r.split for r in hash_split(df, seed=1).collect()}
        s2 = {r.doc_id: r.split for r in hash_split(df, seed=999).collect()}
        assert s1 != s2

    def test_weights_normalized_and_validated(self, spark):
        import pyspark.sql.functions as F
        import pytest as _pt

        from spark_bestfit_spark.operators.curation import hash_split

        df = spark.range(0, 1_000).select(F.col("id").alias("doc_id"))
        # un-normalized weights behave like their normalized form
        out = hash_split(df, {"a": 8, "b": 2})
        counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
        assert abs(counts["a"] / 1_000 - 0.8) < 0.05
        with _pt.raises(ValueError):
            hash_split(df, {"a": -1.0, "b": 2.0})
        with _pt.raises(ValueError):
            hash_split(df, {})


class TestStratifiedSplit:
    def test_exact_quotas_per_stratum(self, spark):
        """Every stratum hits floor(w*n) EXACTLY — the property
        hash_split (binomial noise) cannot give."""
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import stratified_split

        df = spark.range(0, 10_000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).alias("label"),
        )
        out = stratified_split(
            df, ["label"], {"train": 0.8, "val": 0.1, "test": 0.1}
        )
        counts = {
            (r.label, r.split): r.n
            for r in out.groupBy("label", "split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for lab in range(7):
            n = 10_000 // 7 + (1 if lab < 10_000 % 7 else 0)
            t1 = int(0.8 * n)
            t2 = int(0.9 * n)
            assert counts[(lab, "train")] == t1
            assert counts[(lab, "val")] == t2 - t1
            assert counts[(lab, "test")] == n - t2  # remainder absorber

    def test_partitioning_invariant_and_deterministic(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import stratified_split

        df = spark.range(0, 3_000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).alias("label"),
        )
        a = sorted(
            (r.doc_id, r.split)
            for r in stratified_split(df, ["label"]).collect()
        )
        b = sorted(
            (r.doc_id, r.split)
            for r in stratified_split(df.repartition(17), ["label"]).collect()
        )
        assert a == b

    def test_one_exchange(self, spark):
        """Rank window, count window, and thresholds all share one
        hash exchange on the strata key."""
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import stratified_split

        df = spark.range(0, 1_000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).alias("label"),
        )
        plan = (
            stratified_split(df, ["label"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan

    def test_validation(self, spark):
        import pyspark.sql.functions as F
        import pytest as _pt

        from spark_bestfit_spark.operators.curation import stratified_split

        df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
        with _pt.raises(ValueError):
            stratified_split(df, [])
        with _pt.raises(ValueError):
            stratified_split(df, ["doc_id"], {"a": -1.0})


class TestWeightedSample:
    def test_targets_fraction_and_favors_heavy_rows(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import weighted_sample

        df = spark.range(0, 10_000).select(
            F.col("id").alias("doc_id"),
            # weights 1..4: heavier rows must survive more often
            (F.col("id") % 4 + 1).cast("double").alias("score"),
        )
        kept = weighted_sample(df, "score", 0.4)
        n = kept.count()
        assert abs(n / 10_000 - 0.4) < 0.03
        by_w = {
            r.score: r["count"]
            for r in kept.groupBy("score").count().collect()
        }
        assert by_w[4.0] > by_w[2.0] > by_w[1.0]

    def test_deterministic_and_validated(self, spark):
        import pyspark.sql.functions as F
        import pytest as _pt

        from spark_bestfit_spark.operators.curation import weighted_sample

        df = spark.range(0, 2_000).select(
            F.col("id").alias("doc_id"),
            F.lit(1.0).alias("score"),
        )
        a = sorted(r.doc_id for r in weighted_sample(df, "score", 0.3).collect())
        b = sorted(
            r.doc_id
            for r in weighted_sample(df.repartition(9), "score", 0.3).collect()
        )
        assert a == b
        with _pt.raises(ValueError):
            weighted_sample(df, "score", 0.0)
        with _pt.raises(ValueError):
            weighted_sample(df, "score", 1.5)

    def test_nonpositive_weights_dropped(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import weighted_sample

        df = spark.createDataFrame(
            [(0, -1.0), (1, 0.0), (2, None), (3, 5.0)],
            "doc_id bigint, score double",
        )
        kept = weighted_sample(df, "score", 1.0)
        assert [r.doc_id for r in kept.collect()] == [3]


class TestKnuthHashDomain:
    """The hash must be exact over the whole long id domain — the naive
    `(id * A) % 2^32` went negative for negative ids and for any id
    >= ~3.5e9 (int64 wrap), which made every sampler keep everything
    and hash_split route all such rows to the first split."""

    def test_matches_exact_integer_hash_across_domain(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            _KNUTH_A,
            _knuth_u,
        )

        ids = [
            0, 1, 7, 123456, -1, -12345,
            3_500_000_000,          # id * A wraps int64 here
            2**33 + 17, 2**62, -(2**62), 2**63 - 1, -(2**63),
        ]
        df = spark.createDataFrame([(i,) for i in ids], "id long")
        out = {
            r["id"]: r["u"]
            for r in df.select(
                "id", _knuth_u(F.col("id")).alias("u")
            ).collect()
        }
        for i in ids:
            # Python big-int arithmetic is the exact reference
            expect = ((i % 2**32) * _KNUTH_A % 2**32) / 2**32
            assert out[i] == pytest.approx(expect, abs=1e-12), i
            assert 0.0 <= out[i] < 1.0

    def test_hash_split_spreads_extreme_ids(self, spark):
        from spark_bestfit_spark.operators.curation import hash_split

        ids = list(range(-500, 0)) + [
            3_500_000_000 + i for i in range(500)
        ]
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        out = hash_split(df, {"train": 0.5, "test": 0.5})
        counts = {
            r["split"]: r["n"]
            for r in out.groupBy("split").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        assert sum(counts.values()) == len(ids)
        # the old formula sent every one of these rows to "train";
        # a correct uniform hash splits them roughly in half
        assert counts.get("train", 0) > 300
        assert counts.get("test", 0) > 300

    def test_weighted_sample_extreme_ids_not_all_kept(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import weighted_sample

        df = spark.createDataFrame(
            [(-(i + 1), 1.0) for i in range(400)]
            + [(3_500_000_000 + i, 1.0) for i in range(400)],
            "doc_id long, score double",
        )
        kept = weighted_sample(df, "score", 0.25).count()
        # uniform rate 0.25 over 800 rows; the broken hash kept all 800
        assert 100 < kept < 320


class TestBloomDecontamination:
    def test_superset_of_exact_and_no_false_negatives(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            decontaminate_by_ngrams,
            decontaminate_by_ngrams_bloom,
        )
        from spark_bestfit_spark.operators.dedup import word_shingles

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        probes = docs.filter(F.col("doc_id") < 5).select(
            F.explode(word_shingles("text", 8)).alias("ngram")
        )
        clean_e, flag_e = decontaminate_by_ngrams(docs, probes)
        clean_b, flag_b = decontaminate_by_ngrams_bloom(
            docs, probes, fpp=1e-6
        )
        exact_ids = {r.doc_id for r in flag_e.collect()}
        bloom_ids = {r.doc_id for r in flag_b.collect()}
        # no false negatives: everything truly contaminated is flagged
        assert exact_ids <= bloom_ids
        # sized fpp keeps over-flagging tiny on this corpus
        assert len(bloom_ids - exact_ids) <= 5
        # clean + flagged partition the corpus
        assert clean_b.count() + len(bloom_ids) == docs.count()

    def test_deterministic_across_partitionings(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            decontaminate_by_ngrams_bloom,
        )
        from spark_bestfit_spark.operators.dedup import word_shingles

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        probes = docs.filter(F.col("doc_id") < 5).select(
            F.explode(word_shingles("text", 8)).alias("ngram")
        )
        _, a = decontaminate_by_ngrams_bloom(docs, probes, fpp=1e-4)
        _, b = decontaminate_by_ngrams_bloom(
            docs.repartition(7), probes.repartition(5), fpp=1e-4
        )
        # the bitset OR-merge is order-independent, so the flagged set
        # is a pure function of the data
        assert sorted(r.doc_id for r in a.collect()) == sorted(
            r.doc_id for r in b.collect()
        )

    def test_rejects_bad_fpp(self, spark):
        import pytest as _pt

        from spark_bestfit_spark.operators.curation import (
            decontaminate_by_ngrams_bloom,
        )

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        pr = spark.createDataFrame([("a b",)], "ngram string")
        with _pt.raises(ValueError):
            decontaminate_by_ngrams_bloom(df, pr, fpp=0.0)


class TestAnsiModeSafety:
    """The docstrings claim the hash samplers and bloom positions are
    ANSI-safe (no overflowing multiply/add for Spark to throw on).
    Prove it: same extreme-id inputs, ansi on, identical outputs."""

    def test_hash_and_bloom_survive_ansi(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            _bloom_positions,
            _knuth_u,
            hash_split,
        )

        ids = [0, -1, -12345, 3_500_000_000, 2**62, -(2**62), 2**63 - 1]
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        texts = spark.createDataFrame(
            [("some probe gram",), ("another one",)], "ngram string"
        )

        def run():
            u = {
                r["doc_id"]: r["u"]
                for r in df.select(
                    "doc_id", _knuth_u(F.col("doc_id")).alias("u")
                ).collect()
            }
            splits = sorted(
                (r["doc_id"], r["split"]) for r in hash_split(df).collect()
            )
            pos = sorted(
                tuple(r["p"])
                for r in texts.select(
                    _bloom_positions(F.col("ngram"), 4096, 5).alias("p")
                ).collect()
            )
            return u, splits, pos

        before = run()
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            after = run()
        finally:
            spark.conf.set("spark.sql.ansi.enabled", "false")
        assert before == after
        assert all(0.0 <= v < 1.0 for v in before[0].values())

    def test_round7_operators_survive_ansi(self, spark):
        """Boilerplate strip, token-budget selection, and Wasserstein
        must produce identical outputs under ansi=true (no overflowing
        arithmetic, no invalid casts) — extreme ids included."""
        import pandas as pd
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            select_within_token_budget,
            strip_boilerplate_lines,
        )
        from spark_bestfit_spark.operators.stats import (
            wasserstein_distance_df,
        )

        ids = [0, 1, 2, 2**62, 2**63 - 1]
        docs = spark.createDataFrame(
            [(i, f"banner line\nbody {k} unique") for k, i in enumerate(ids)],
            "doc_id long, text string",
        )
        vals = spark.createDataFrame(
            pd.DataFrame({"v": [1.0, 2.0, 5.0, 5.0, 9.0]})
        )

        def run():
            strip = sorted(
                (r["doc_id"], r["text"], r["n_dropped"])
                for r in strip_boilerplate_lines(
                    docs, max_doc_frac=0.5
                ).collect()
            )
            budget = sorted(
                (r["doc_id"], r["cum_tokens"])
                for r in select_within_token_budget(
                    docs, max_tokens=9
                ).collect()
            )
            w1 = wasserstein_distance_df(
                vals, vals.withColumn("v", F.col("v") + 1.0), "v"
            ).first()["w1"]
            return strip, budget, w1

        before = run()
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            after = run()
        finally:
            spark.conf.set("spark.sql.ansi.enabled", "false")
        assert before == after
        assert before[2] == pytest.approx(1.0)  # pure shift identity


class TestChunkDocuments:
    """chunk_documents: fixed-token windows with overlap, checked
    against a plain-Python reference fold."""

    @staticmethod
    def _reference(text, chunk, overlap):
        toks = text.strip().lower().split()
        if not toks:
            return []
        stride = chunk - overlap
        out = []
        idx = 0
        for start in range(0, len(toks), stride):
            if start > 0 and start + overlap >= len(toks):
                continue
            piece = toks[start : start + chunk]
            out.append((idx, start, len(piece), " ".join(piece)))
            idx += 1
        return out

    def test_matches_python_reference(self, spark):
        from spark_bestfit_spark.operators.curation import chunk_documents

        rng = np.random.default_rng(17)
        docs = [
            (i, " ".join(f"w{rng.integers(0, 50)}" for _ in range(n)))
            for i, n in enumerate(
                [0, 1, 3, 7, 16, 17, 31, 32, 33, 100, 257]
            )
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        for chunk, overlap in ((16, 0), (16, 4), (8, 7), (32, 1)):
            got = {}
            rows = chunk_documents(
                df, chunk_tokens=chunk, overlap=overlap
            ).collect()
            for r in rows:
                got.setdefault(r["doc_id"], []).append(
                    (r["chunk_idx"], r["start_token"],
                     r["n_chunk_tokens"], r["chunk_text"])
                )
            for doc_id, text in docs:
                exp = self._reference(text, chunk, overlap)
                assert sorted(got.get(doc_id, [])) == exp, (
                    doc_id, chunk, overlap
                )

    def test_every_token_covered_once_without_overlap(self, spark):
        from spark_bestfit_spark.operators.curation import chunk_documents

        df = spark.createDataFrame(
            [(1, " ".join(str(i) for i in range(100)))],
            "doc_id long, text string",
        )
        rows = chunk_documents(df, chunk_tokens=7, overlap=0).collect()
        toks = []
        for r in sorted(rows, key=lambda r: r["chunk_idx"]):
            toks.extend(r["chunk_text"].split(" "))
        assert toks == [str(i) for i in range(100)]
        assert sum(r["n_chunk_tokens"] for r in rows) == 100

    def test_validation_and_empty(self, spark):
        from spark_bestfit_spark.operators.curation import chunk_documents

        df = spark.createDataFrame(
            [(1, "a b"), (2, ""), (3, "   ")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="chunk_tokens"):
            chunk_documents(df, chunk_tokens=0)
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, chunk_tokens=4, overlap=4)
        rows = chunk_documents(df, chunk_tokens=4).collect()
        # blank / whitespace-only docs emit nothing
        assert {r["doc_id"] for r in rows} == {1}

    def test_with_text_false_drops_payload(self, spark):
        from spark_bestfit_spark.operators.curation import chunk_documents

        df = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id long, text string"
        )
        out = chunk_documents(df, chunk_tokens=2, with_text=False)
        assert "chunk_text" not in out.columns
        assert out.count() == 3

    def test_preserve_case_keeps_source_text(self, spark):
        """Default normalizes to lowercase (the text-stats convention);
        preserve_case=True must emit the source casing verbatim with
        identical chunk boundaries."""
        from spark_bestfit_spark.operators.curation import chunk_documents

        df = spark.createDataFrame(
            [(1, "The Quick BROWN fox Jumps Over the LAZY dog now")],
            "doc_id long, text string",
        )
        lower = chunk_documents(df, chunk_tokens=4).collect()
        kept = chunk_documents(
            df, chunk_tokens=4, preserve_case=True
        ).collect()
        assert sorted(r["chunk_text"] for r in lower) == sorted(
            ["the quick brown fox", "jumps over the lazy", "dog now"]
        )
        assert sorted(r["chunk_text"] for r in kept) == sorted(
            ["The Quick BROWN fox", "Jumps Over the LAZY", "dog now"]
        )
        # boundaries identical either way
        for a, b in zip(
            sorted(lower, key=lambda r: r["chunk_idx"]),
            sorted(kept, key=lambda r: r["chunk_idx"]),
        ):
            assert (a["start_token"], a["n_chunk_tokens"]) == (
                b["start_token"], b["n_chunk_tokens"]
            )


class TestStripBoilerplateLines:
    """C4/RefinedWeb-style line-level boilerplate removal."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        banner = "Accept our cookies to continue"
        rows = [
            (0, f"{banner}\nalpha beta gamma\ndoc zero body"),
            (1, f"{banner}\ndelta epsilon\ndoc one body"),
            (2, f"  ACCEPT OUR COOKIES TO CONTINUE \nzeta eta\ndoc two body"),
            (3, "no banner here\njust content"),
            (4, f"{banner}"),  # banner-only doc -> stripped to empty
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_banner_stripped_case_insensitively(self, corpus):
        from spark_bestfit_spark.operators.curation import (
            strip_boilerplate_lines,
        )

        got = {
            r["doc_id"]: r
            for r in strip_boilerplate_lines(
                corpus, max_doc_frac=0.5
            ).collect()
        }
        assert len(got) == 5
        assert got[0]["text"] == "alpha beta gamma\ndoc zero body"
        assert got[1]["text"] == "delta epsilon\ndoc one body"
        # normalized key pools the SHOUTED banner with the others
        assert got[2]["text"] == "zeta eta\ndoc two body"
        assert got[3]["text"] == "no banner here\njust content"
        assert got[4]["text"] == ""
        assert (got[0]["n_lines"], got[0]["n_dropped"]) == (3, 1)
        assert (got[3]["n_lines"], got[3]["n_dropped"]) == (2, 0)
        assert (got[4]["n_lines"], got[4]["n_dropped"]) == (1, 1)

    def test_thresholds(self, corpus, spark):
        from spark_bestfit_spark.operators.curation import (
            strip_boilerplate_lines,
        )

        # frac too high -> banner (4/5 docs) survives
        kept = strip_boilerplate_lines(corpus, max_doc_frac=0.9).collect()
        assert all(r["n_dropped"] == 0 for r in kept)
        # normalize=False: the SHOUTED variant no longer pools; the
        # lowercase banner is still in 3/5 >= 0.5 of docs -> dropped,
        # doc 2 keeps its variant
        got = {
            r["doc_id"]: r
            for r in strip_boilerplate_lines(
                corpus, max_doc_frac=0.5, normalize=False
            ).collect()
        }
        assert got[0]["n_dropped"] == 1
        assert got[2]["n_dropped"] == 0
        with pytest.raises(ValueError, match="max_doc_frac"):
            strip_boilerplate_lines(corpus, max_doc_frac=0.0)
        with pytest.raises(ValueError, match="min_docs"):
            strip_boilerplate_lines(corpus, min_docs=1)
        with pytest.raises(ValueError, match="line_sep"):
            strip_boilerplate_lines(corpus, line_sep="")

    def test_line_order_preserved_and_custom_sep(self, spark):
        from spark_bestfit_spark.operators.curation import (
            strip_boilerplate_lines,
        )

        rows = [
            (i, f"SPAM | first{i} | second{i} | third{i} | SPAM")
            for i in range(3)
        ]
        rows.append((9, "only | content"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in strip_boilerplate_lines(
                df, max_doc_frac=0.5, line_sep=" | "
            ).collect()
        }
        assert got[0]["text"] == "first0 | second0 | third0"
        assert got[0]["n_dropped"] == 2  # both SPAM occurrences
        assert got[9]["text"] == "only | content"

    def test_no_eager_jobs(self, spark):
        from spark_bestfit_spark.operators.curation import (
            strip_boilerplate_lines,
        )

        df = spark.createDataFrame(
            [(0, "a\nb"), (1, "a\nc")], "doc_id long, text string"
        )
        sc = spark.sparkContext
        sc.setJobGroup("boiler-probe", "plan build must be free")
        try:
            out = strip_boilerplate_lines(df)
            out._jdf.queryExecution().executedPlan()
        finally:
            sc.setJobGroup("default", "")
        assert len(
            sc.statusTracker().getJobIdsForGroup("boiler-probe")
        ) == 0


class TestSelectWithinTokenBudget:
    def test_greedy_by_quality(self, spark):
        from spark_bestfit_spark.operators.curation import (
            select_within_token_budget,
        )

        rows = [
            (0, "one two three", 0.9),          # 3 tokens, best
            (1, "one two three four five", 0.8),  # 5 tokens
            (2, "one two", 0.7),                # 2 tokens
            (3, "one two three four", 0.6),     # 4 tokens
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, q double")
        got = {
            r["doc_id"]: r
            for r in select_within_token_budget(
                df, max_tokens=10, quality_col="q"
            ).collect()
        }
        # greedy prefix: 3 + 5 = 8 <= 10; adding doc 2 -> 10 <= 10; doc 3 would be 14
        assert set(got) == {0, 1, 2}
        assert got[0]["cum_tokens"] == 3
        assert got[1]["cum_tokens"] == 8
        assert got[2]["cum_tokens"] == 10
        # ascending quality flips the ranking
        asc = {
            r["doc_id"]
            for r in select_within_token_budget(
                df, max_tokens=7, quality_col="q", descending=False
            ).collect()
        }
        assert asc == {3, 2}  # 4 then 4+2=6 <= 7; doc 1 would be 11

    def test_id_order_without_quality_and_validation(self, spark):
        from spark_bestfit_spark.operators.curation import (
            select_within_token_budget,
        )

        rows = [(i, "a b c") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = select_within_token_budget(df, max_tokens=10).collect()
        assert {r["doc_id"] for r in got} == {0, 1, 2}  # 3+3+3=9 <= 10
        with pytest.raises(ValueError, match="max_tokens"):
            select_within_token_budget(df, max_tokens=0)
        with pytest.raises(TypeError, match="quality_col"):
            select_within_token_budget(
                df.withColumn("s", df.doc_id.cast("string")),
                max_tokens=5, quality_col="s",
            )
        empty = select_within_token_budget(
            df.filter("doc_id < 0"), max_tokens=5
        )
        assert empty.count() == 0

    def test_matches_driver_greedy_on_documents(self, spark):
        """Cross-check against a driver-side greedy fold over the real
        documents table with a derived quality score."""
        from spark_bestfit_spark.operators.curation import (
            select_within_token_budget,
        )
        import pyspark.sql.functions as F

        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter("doc_id < 200")
            .withColumn("q", (F.col("doc_id") % 17).cast("double"))
        )
        budget = 3000
        got = sorted(
            (r["doc_id"], r["cum_tokens"])
            for r in select_within_token_budget(
                docs, max_tokens=budget, quality_col="q"
            ).collect()
        )
        rows = docs.select("doc_id", "text", "q").collect()
        ranked = sorted(rows, key=lambda r: (-r["q"], r["doc_id"]))
        exp, cum = [], 0
        for r in ranked:
            n = len(r["text"].strip().lower().split())
            if cum + n > budget:
                break
            cum += n
            exp.append(r["doc_id"])
        assert [d for d, _ in got] == sorted(exp)
        assert max(c for _, c in got) <= budget


class TestContaminationOverlap:
    def test_hand_computed_fractions(self, spark):
        from spark_bestfit_spark.operators.curation import (
            contamination_overlap,
        )

        rows = [
            (0, "a b c d e"),      # 3-grams: abc bcd cde
            (1, "a b c x y"),      # abc bcx cxy
            (2, "p q r s t"),      # pqr qrs rst
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        probes = spark.createDataFrame(
            [("a b c",), ("c d e",), ("zzz",)], "ngram string"
        )
        got = {
            r["doc_id"]: r
            for r in contamination_overlap(df, probes, n=3).collect()
        }
        assert (got[0]["n_ngrams"], got[0]["n_matched"]) == (3, 2)
        assert got[0]["overlap_frac"] == pytest.approx(round(2 / 3, 6))
        assert (got[1]["n_matched"], got[1]["overlap_frac"]) == (1, round(1 / 3, 6))
        assert (got[2]["n_matched"], got[2]["overlap_frac"]) == (0, 0.0)
        with pytest.raises(ValueError, match="n must"):
            contamination_overlap(df, probes, n=0)

    def test_refines_boolean_gate(self, spark):
        """Every doc the boolean gate flags must have overlap_frac > 0
        and vice versa — the graded tier is a strict refinement."""
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            contamination_overlap,
            decontaminate_by_ngrams,
        )
        from spark_bestfit_spark.operators.dedup import word_shingles

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        probes = docs.filter("doc_id < 5").select(
            F.explode(word_shingles("text", 8)).alias("ngram")
        )
        _, flagged = decontaminate_by_ngrams(docs, probes, n=8)
        flagged_ids = {r["doc_id"] for r in flagged.collect()}
        overlap = contamination_overlap(docs, probes, n=8).collect()
        graded_ids = {r["doc_id"] for r in overlap if r["n_matched"] > 0}
        assert graded_ids == flagged_ids
        # probe-source docs overlap fully
        full = {r["doc_id"] for r in overlap if r["overlap_frac"] == 1.0}
        assert set(range(5)) <= full
        # output covers every doc
        assert len(overlap) == docs.count()


class TestFuzzyDecontamination:
    @staticmethod
    def _jac(a, b, k=3):
        def sh(t):
            w = " ".join(t.lower().split()).split(" ")
            return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}
        sa, sb = sh(a), sh(b)
        return len(sa & sb) / len(sa | sb)

    def test_flags_near_copies_with_exact_jaccard(self, spark):
        from spark_bestfit_spark.operators.curation import decontaminate_fuzzy

        bench = "what is the capital of france the answer is paris of course"
        corpus = [
            (0, bench),  # verbatim paste -> jaccard 1.0
            (1, "what is the capital of france the answer is paris "
                "of course indeed"),  # light paraphrase
            (2, "an entirely unrelated document about distributed "
                "query engines and shuffles"),
            (3, "too short"),  # < k words: never bands, never crashes
        ]
        df = spark.createDataFrame(corpus, "doc_id bigint, text string")
        probes = spark.createDataFrame(
            [(100, bench)], "doc_id bigint, text string"
        )
        got = {
            (r.doc_id, r.probe_doc_id): r.jaccard
            for r in decontaminate_fuzzy(
                df, probes, threshold=0.3
            ).collect()
        }
        assert (0, 100) in got and got[(0, 100)] == 1.0
        # every reported jaccard equals the brute-force value
        texts = dict((i, t) for i, t in corpus)
        for (cid, pid_), j in got.items():
            assert j == round(self._jac(texts[cid], bench), 6)
        assert all(cid != 2 and cid != 3 for cid, _ in got)

    def test_threshold_filters_and_validation(self, spark):
        from spark_bestfit_spark.operators.curation import decontaminate_fuzzy

        a = "one two three four five six seven eight nine ten"
        b = "one two three four five six seven different words entirely"
        df = spark.createDataFrame([(0, a)], "doc_id bigint, text string")
        probes = spark.createDataFrame([(1, b)], "doc_id bigint, text string")
        jac = self._jac(a, b)
        low = decontaminate_fuzzy(df, probes, threshold=0.1).collect()
        if low:  # candidate only if some band collides; verify is exact
            assert low[0].jaccard == round(jac, 6)
        high = decontaminate_fuzzy(df, probes, threshold=0.99).collect()
        assert high == []
        with pytest.raises(ValueError, match="threshold"):
            decontaminate_fuzzy(df, probes, threshold=0.0)

    def test_max_probe_bucket_drops_degenerate_buckets(self, spark):
        from spark_bestfit_spark.operators.curation import decontaminate_fuzzy

        boiler = "all rights reserved copyright notice standard header text"
        df = spark.createDataFrame(
            [(0, boiler)], "doc_id bigint, text string"
        )
        probes = spark.createDataFrame(
            [(i, boiler) for i in range(10)], "doc_id bigint, text string"
        )
        full = decontaminate_fuzzy(df, probes, threshold=0.5).collect()
        assert len(full) == 10
        capped = decontaminate_fuzzy(
            df, probes, threshold=0.5, max_probe_bucket=5
        ).collect()
        assert capped == []

    def test_corpus_never_shuffles_for_the_candidate_join(self, spark):
        from spark_bestfit_spark.operators.curation import decontaminate_fuzzy

        df = spark.createDataFrame(
            [(0, "a b c d e f g h")], "doc_id bigint, text string"
        )
        probes = spark.createDataFrame(
            [(1, "a b c d e f g h")], "doc_id bigint, text string"
        )
        plan = (
            decontaminate_fuzzy(df, probes)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan
        assert "CartesianProduct" not in plan


class TestAnsiModeSafetyRound7Wave2:
    def test_hash_features_and_fuzzy_decontam_survive_ansi(self, spark):
        """The md5-derived bucket/sign arithmetic (conv of 14 hex
        digits fits in 56 bits; pmod; small multiplies) must be
        identical under ANSI — no ARITHMETIC_OVERFLOW."""
        from spark_bestfit_spark.operators.curation import decontaminate_fuzzy
        from spark_bestfit_spark.operators.similarity import hash_features

        df = spark.createDataFrame(
            [(2**62, "alpha beta gamma delta"), (-(2**62), "alpha beta")],
            "doc_id long, text string",
        )
        probes = spark.createDataFrame(
            [(2**63 - 1, "alpha beta gamma delta")], "doc_id long, text string"
        )

        def run():
            f = sorted(
                (r.doc_id, tuple(r.features))
                for r in hash_features(df, dim=8).collect()
            )
            d = sorted(
                (r.doc_id, r.probe_doc_id, r.jaccard)
                for r in decontaminate_fuzzy(
                    df, probes, threshold=0.3
                ).collect()
            )
            return f, d

        base = run()
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            assert run() == base
        finally:
            spark.conf.set("spark.sql.ansi.enabled", "false")


class TestNgramNovelty:
    def test_hand_computed_novelty(self, spark):
        from spark_bestfit_spark.operators.curation import ngram_novelty

        corpus = spark.createDataFrame(
            [(1, "the quick brown fox jumps")],
            "doc_id long, text string",
        )
        probe = spark.createDataFrame(
            [
                # 3-grams: "the quick brown", "quick brown fox" both
                # in corpus; "brown fox sleeps" novel -> 1/3
                (10, "the quick brown fox sleeps"),
                # fully novel text -> 1.0
                (11, "completely different words entirely here"),
                # exact copy -> 0.0
                (12, "the quick brown fox jumps"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in ngram_novelty(probe, corpus, n=3).collect()
        }
        assert out[10].n_ngrams == 3 and out[10].n_novel == 1
        assert out[10].novelty == pytest.approx(round(1 / 3, 6))
        assert out[11].novelty == 1.0
        assert out[12].novelty == 0.0

    def test_distinct_grams_counted_once_and_validation(self, spark):
        from spark_bestfit_spark.operators.curation import ngram_novelty

        corpus = spark.createDataFrame(
            [(1, "x y")], "doc_id long, text string"
        )
        # "a b a b a" has 3-grams: "a b a", "b a b", "a b a" — the
        # word_shingles spine is DISTINCT shingles, so n_ngrams = 2
        probe = spark.createDataFrame(
            [(10, "a b a b a")], "doc_id long, text string"
        )
        r = ngram_novelty(probe, corpus, n=3).first()
        assert r.n_ngrams == 2 and r.n_novel == 2
        import pytest as _pt

        with _pt.raises(ValueError, match="n must"):
            ngram_novelty(probe, corpus, n=0)


class TestGroupSplit:
    def test_groups_never_straddle_and_weights_hold(self, spark):
        from spark_bestfit_spark.operators.curation import group_split

        rows = [
            (i, f"family{i % 40} member {i}") for i in range(2000)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        import pyspark.sql.functions as F

        key = F.split(F.col("text"), " ")[0]
        out = group_split(
            df, key, weights={"train": 0.6, "val": 0.4}
        )
        # every family maps to exactly one split
        fam = (
            out.select(
                F.split(F.col("text"), " ")[0].alias("fam"), "split"
            )
            .groupBy("fam")
            .agg(F.countDistinct("split").alias("k"))
            .collect()
        )
        assert all(r.k == 1 for r in fam)
        # split sizes roughly track weights (40 families, coarse)
        counts = {
            r["split"]: r["cnt"]
            for r in out.groupBy("split")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        assert set(counts) <= {"train", "val"}
        assert counts["train"] > counts["val"]

    def test_deterministic_and_leak_free(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            group_split,
            leakage_check,
        )

        rows = [
            (0, "shared prefix one"), (1, "shared prefix two"),
            (2, "other text a"), (3, "other text b"),
            (4, "third thing c"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        key = F.concat_ws(
            " ", F.slice(F.split(F.col("text"), " "), 1, 2)
        )
        a = sorted(
            (r.doc_id, r.split)
            for r in group_split(df, key).collect()
        )
        b = sorted(
            (r.doc_id, r.split)
            for r in group_split(df.repartition(4), key).collect()
        )
        assert a == b  # partitioning-independent
        leak = leakage_check(
            group_split(df, key), "split", key=key
        ).collect()
        assert all(r.n_leaked == 0 for r in leak)


class TestKfoldAssign:
    def test_folds_deterministic_balanced_and_in_range(self, spark):
        from spark_bestfit_spark.operators.curation import kfold_assign

        df = spark.range(5000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.fold for r in kfold_assign(df, k=5).collect()}
        b = {
            r.doc_id: r.fold
            for r in kfold_assign(df.repartition(16), k=5).collect()
        }
        assert a == b  # partitioning-independent
        assert set(a.values()) == {0, 1, 2, 3, 4}
        import collections

        counts = collections.Counter(a.values())
        for c in counts.values():
            assert abs(c - 1000) < 150  # roughly balanced

    def test_group_key_never_straddles(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import kfold_assign

        rows = [(i, f"fam{i % 30}") for i in range(900)]
        df = spark.createDataFrame(rows, "doc_id long, fam string")
        out = kfold_assign(df, k=4, group_key=F.col("fam"))
        straddle = (
            out.groupBy("fam")
            .agg(F.countDistinct("fold").alias("nf"))
            .filter("nf > 1")
            .count()
        )
        assert straddle == 0
        with pytest.raises(ValueError, match="k must"):
            kfold_assign(df, k=1)


class TestRebalanceClasses:
    def test_downsamples_to_target_and_deterministic(self, spark):
        from spark_bestfit_spark.operators.curation import (
            rebalance_classes,
        )

        rows = [(i, "maj" if i % 10 else "min") for i in range(10000)]
        df = spark.createDataFrame(rows, "doc_id long, label string")
        import pyspark.sql.functions as F

        out = rebalance_classes(df, "label", {"maj": 0.1})
        counts = {
            r.label: r.cnt
            for r in out.groupBy("label")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        assert counts["min"] == 1000  # untouched class kept fully
        assert abs(counts["maj"] - 900) < 120  # ~10% of 9000
        ids1 = sorted(r.doc_id for r in out.collect())
        ids2 = sorted(
            r.doc_id
            for r in rebalance_classes(
                df.repartition(8), "label", {"maj": 0.1}
            ).collect()
        )
        assert ids1 == ids2

    def test_validation(self, spark):
        from spark_bestfit_spark.operators.curation import (
            rebalance_classes,
        )

        df = spark.createDataFrame([(1, "a")], "doc_id long, label string")
        with pytest.raises(ValueError, match="non-empty"):
            rebalance_classes(df, "label", {})
        with pytest.raises(ValueError, match="fraction"):
            rebalance_classes(df, "label", {"a": 1.5})


class TestAnsiModeSafetyRound8:
    def test_round8_hash_and_window_ops_survive_ansi(self, spark):
        """Round-8 hash arithmetic (group_split's md5-Knuth on
        extreme ids, kfold's seeded hash, deletion-neighborhood
        substr windows) and the decomposition/rolling windows must be
        bit-identical under ANSI — no ARITHMETIC_OVERFLOW, no
        substring edge throw."""
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.asof import rolling_quantile
        from spark_bestfit_spark.operators.curation import (
            group_split,
            kfold_assign,
            rebalance_classes,
        )
        from spark_bestfit_spark.operators.linkage import fuzzy_join

        df = spark.createDataFrame(
            [
                (2**62, "alpha beta gamma", "x"),
                (-(2**62), "alpha beta gamm", "y"),
                (2**63 - 1, "", "x"),
                (7, "zeta", "y"),
            ],
            "doc_id long, text string, label string",
        )

        def run():
            gs = sorted(
                (r.doc_id, r.split)
                for r in group_split(df, F.col("text")).collect()
            )
            kf = sorted(
                (r.doc_id, r.fold)
                for r in kfold_assign(df, k=7).collect()
            )
            rb = sorted(
                r.doc_id
                for r in rebalance_classes(
                    df, "label", {"x": 0.5}
                ).collect()
            )
            fj = sorted(
                (r.id_l, r.id_r, r.dist)
                for r in fuzzy_join(
                    df, df, "text", "text", "doc_id", "doc_id", 1
                ).collect()
            )
            ts = spark.createDataFrame(
                [("u", i, float(i % 3)) for i in range(8)],
                "e string, t long, v double",
            )
            rq = [
                r.rolling_q
                for r in rolling_quantile(
                    ts, "v", "t", "e", window=3, tiebreak_col="t"
                )
                .orderBy("t")
                .collect()
            ]
            return gs, kf, rb, fj, rq

        base = run()
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            assert run() == base
        finally:
            spark.conf.set("spark.sql.ansi.enabled", "false")


class TestDatasetCard:
    def test_values_on_known_corpus(self, spark):
        from spark_bestfit_spark.operators.pipeline import dataset_card

        rows = [
            (0, "alpha beta gamma"),
            (1, "alpha beta gamma"),       # exact dup of 0
            (2, "  ALPHA   beta GAMMA "),  # normalized dup of 0
            (3, ""),                       # empty
            (4, "one"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        card = dataset_card(df).collect()[0]
        assert card.n_docs == 5
        assert card.n_empty == 1
        assert card.total_tokens == 3 + 3 + 3 + 0 + 1
        assert card.min_tokens == 0
        assert card.max_tokens == 3
        # 0,1,2 share one normalized fingerprint; "" and "one" differ
        assert card.n_distinct_docs == 3
        assert card.dup_rate == round(1.0 - 3 / 5, 6)
        assert card.mean_tokens == round(10 / 5, 6)

    def test_two_aggregation_passes_no_window(self, spark):
        from spark_bestfit_spark.operators.pipeline import dataset_card

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            dataset_card(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        assert "SortMergeJoin" not in plan

    def test_dup_rate_matches_exact_dedup(self, spark):
        """The card's dup_rate must agree with what exact_dedup would
        actually remove (same normalization, same fingerprint)."""
        from spark_bestfit_spark.operators.dedup import exact_dedup
        from spark_bestfit_spark.operators.pipeline import dataset_card

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        card = dataset_card(docs).collect()[0]
        kept = exact_dedup(docs).count()
        assert card.n_distinct_docs == kept


class TestIncrementalDedup:
    """Delta-batch vs full-recompute equivalence for the snapshot
    dedup tier (round-11): the incremental operators must reproduce
    exactly the batch operators' answers restricted to the new batch,
    without re-fingerprinting / re-banding the previous corpus."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        return (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
            .filter("doc_id < 300")
            .cache()
        )

    def test_exact_matches_full_recompute(self, spark, docs):
        from spark_bestfit_spark.operators.dedup import (
            duplicate_groups,
            exact_dedup,
            incremental_exact_dedup,
        )

        prev = docs.filter("doc_id < 200")
        new = docs.filter("doc_id >= 200")
        state = duplicate_groups(prev).select("fingerprint", "keeper_id")
        out = incremental_exact_dedup(new, state)
        kept_inc = {r.doc_id for r in out.collect() if r.status == "kept"}
        kept_full = {
            r.doc_id
            for r in exact_dedup(docs).collect()
            if r.doc_id >= 200
        }
        assert kept_inc == kept_full
        # every new doc appears exactly once, keeper semantics hold
        rows = {r.doc_id: r for r in out.collect()}
        assert set(rows) == {r.doc_id for r in new.collect()}
        for r in rows.values():
            if r.status == "kept":
                assert r.keeper_id == r.doc_id
            elif r.status == "dup_of_state":
                assert r.keeper_id < 200
            else:
                assert 200 <= r.keeper_id < r.doc_id

    def test_exact_synthetic_statuses(self, spark):
        from spark_bestfit_spark.operators.dedup import (
            duplicate_groups,
            incremental_exact_dedup,
        )

        prev = spark.createDataFrame(
            [(0, "alpha  beta"), (1, "Alpha beta"), (2, "gamma")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(10, "ALPHA   BETA"),   # dup of state keeper 0
             (11, "delta"), (12, "delta"),  # kept + in-batch dup
             (13, "epsilon")],
            "doc_id long, text string",
        )
        state = duplicate_groups(prev).select("fingerprint", "keeper_id")
        out = {r.doc_id: (r.status, r.keeper_id)
               for r in incremental_exact_dedup(new, state).collect()}
        assert out[10] == ("dup_of_state", 0)
        assert out[11] == ("kept", 11)
        assert out[12] == ("dup_in_batch", 11)
        assert out[13] == ("kept", 13)

    def test_minhash_matches_full_recompute(self, spark, docs):
        from spark_bestfit_spark.operators.dedup import (
            incremental_minhash_pairs,
            minhash_band_index,
            minhash_dedup_pairs,
        )

        prev = docs.filter("doc_id < 200")
        new = docs.filter("doc_id >= 200")
        index = minhash_band_index(prev)
        inc = {
            (r.id_a, r.id_b, r.jaccard)
            for r in incremental_minhash_pairs(
                new, index, prev, threshold=0.7
            ).collect()
        }
        full = {
            (r.id_a, r.id_b, r.jaccard)
            for r in minhash_dedup_pairs(docs, threshold=0.7).collect()
            if r.id_a >= 200 or r.id_b >= 200
        }
        assert inc == full
        assert len(inc) > 0  # the slice must actually exercise pairs

    def test_minhash_snapshot_rolls_forward(self, spark, docs):
        """Appending the new batch's band rows to the snapshot must
        reproduce a from-scratch index of the union — the roll-forward
        contract."""
        from spark_bestfit_spark.operators.dedup import (
            minhash_band_index,
        )

        prev = docs.filter("doc_id < 200")
        new = docs.filter("doc_id >= 200")
        rolled = minhash_band_index(prev).unionByName(
            minhash_band_index(new)
        )
        scratch = minhash_band_index(docs)
        a = sorted(map(tuple, rolled.collect()))
        b = sorted(map(tuple, scratch.collect()))
        assert a == b


class TestStateCompaction:
    """Snapshot hygiene (round-12): compacting the exact-dedup
    fingerprint state and the LSH band index must be invisible to the
    incremental queries — and must REPAIR the duplicate-state hazard a
    replayed delivery creates."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        return (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
            .filter("doc_id < 300")
            .cache()
        )

    def test_exact_state_compaction_equivalence(self, spark, docs):
        from spark_bestfit_spark.operators.dedup import (
            compact_exact_state,
            duplicate_groups,
            incremental_exact_dedup,
        )

        prev = docs.filter("doc_id < 200")
        new = docs.filter("doc_id >= 200")
        state = duplicate_groups(prev).select("fingerprint", "keeper_id")
        # a replayed delivery doubles every state row
        polluted = state.unionByName(state)
        compacted = compact_exact_state(polluted)
        # duplicate-free, one row per fingerprint, same content
        assert compacted.count() == state.count()
        assert sorted(map(tuple, compacted.collect())) == sorted(
            map(tuple, state.collect())
        )
        # incremental on the compacted state == on the clean state
        a = sorted(map(tuple,
                       incremental_exact_dedup(new, compacted).collect()))
        b = sorted(map(tuple,
                       incremental_exact_dedup(new, state).collect()))
        assert a == b

    def test_exact_compaction_repairs_doubled_rows(self, spark):
        """On a POLLUTED state the un-compacted incremental query
        doubles matching output rows (the join multiplies); compaction
        restores the correct cardinality. Planted: the delta re-sends
        a state document."""
        from spark_bestfit_spark.operators.dedup import (
            compact_exact_state,
            duplicate_groups,
            incremental_exact_dedup,
        )

        prev = spark.createDataFrame(
            [(0, "alpha beta"), (1, "gamma")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(10, "alpha  beta"), (11, "delta")],
            "doc_id long, text string",
        )
        state = duplicate_groups(prev).select("fingerprint", "keeper_id")
        polluted = state.unionByName(state)
        n_polluted = incremental_exact_dedup(new, polluted).count()
        n_compacted = incremental_exact_dedup(
            new, compact_exact_state(polluted)
        ).count()
        assert n_compacted == 2
        assert n_polluted == 3  # doc 10's row doubled by the join

    def test_exact_compaction_min_keeper_rule(self, spark):
        """Sloppy append (same fingerprint under a later keeper):
        compaction keeps the FIRST keeper, matching append-only id
        order."""
        from spark_bestfit_spark.operators.dedup import (
            compact_exact_state,
        )

        raw = spark.createDataFrame(
            [("fp1", 3), ("fp1", 207), ("fp2", 11)],
            "fingerprint string, keeper_id long",
        )
        out = {r.fingerprint: r.keeper_id
               for r in compact_exact_state(raw).collect()}
        assert out == {"fp1": 3, "fp2": 11}

    def test_exact_compaction_preserves_string_ids(self, spark):
        from spark_bestfit_spark.operators.dedup import (
            compact_exact_state,
        )

        raw = spark.createDataFrame(
            [("fp1", "doc-a"), ("fp1", "doc-b")],
            "fingerprint string, keeper_id string",
        )
        out = compact_exact_state(raw).collect()
        assert out[0].keeper_id == "doc-a"

    def test_band_index_compaction_equivalence(self, spark, docs):
        """Querying the compacted (capped) index uncapped equals
        querying the raw index with the query-time cap — the cap is
        paid once offline instead of per delivery."""
        from spark_bestfit_spark.operators.dedup import (
            compact_band_index,
            incremental_minhash_pairs,
            minhash_band_index,
        )

        prev = docs.filter("doc_id < 200")
        new = docs.filter("doc_id >= 200")
        index = minhash_band_index(prev)
        replayed = index.unionByName(index)
        compacted = compact_band_index(replayed, max_bucket_size=3)
        a = sorted(map(tuple, incremental_minhash_pairs(
            new, compacted, prev, threshold=0.7
        ).collect()))
        b = sorted(map(tuple, incremental_minhash_pairs(
            new, index, prev, threshold=0.7, max_bucket_size=3
        ).collect()))
        assert a == b

    def test_band_index_cap_is_deterministic_lowest_first(self, spark):
        from spark_bestfit_spark.operators.dedup import (
            compact_band_index,
        )

        rows = [(i, 0, "sig-x") for i in (9, 3, 7, 1)] + [
            (5, 1, "sig-y")
        ]
        raw = spark.createDataFrame(
            rows + rows,  # replayed
            "doc_id long, band int, band_sig string",
        )
        out = sorted(map(tuple, compact_band_index(
            raw, max_bucket_size=2
        ).collect()))
        assert out == [(1, 0, "sig-x"), (3, 0, "sig-x"), (5, 1, "sig-y")]
