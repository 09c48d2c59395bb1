"""Tests for embedding-cosine near-dup and salted aggregation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import pyspark.sql.functions as F

from spark_bestfit_spark.operators.similarity import embedding_neardup_pairs
from spark_bestfit_spark.operators.skew import (
    salted_aggregate,
    salted_count,
    salted_sum,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    """50 random vectors; 3 pairs of near-duplicates planted."""
    rng = np.random.default_rng(42)
    base = rng.standard_normal((50, 16)).astype(np.float32)
    base[1] = base[0] + rng.normal(0, 1e-3, 16).astype(np.float32)
    base[11] = base[10]
    base[21] = base[20] + rng.normal(0, 1e-3, 16).astype(np.float32)
    rows = [(i, [float(v) for v in base[i]]) for i in range(50)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


class TestEmbeddingNearDup:
    def test_exact_finds_planted_pairs(self, vec_df):
        pairs = embedding_neardup_pairs(
            vec_df, threshold=0.999, use_lsh=False
        ).collect()
        found = {(r.id_a, r.id_b) for r in pairs}
        assert {(0, 1), (10, 11), (20, 21)} <= found
        # random 16-d vectors essentially never reach cosine 0.999
        assert len(found) == 3

    def test_lsh_matches_exact_on_high_threshold(self, vec_df):
        exact = {
            (r.id_a, r.id_b)
            for r in embedding_neardup_pairs(
                vec_df, threshold=0.999, use_lsh=False
            ).collect()
        }
        lsh = {
            (r.id_a, r.id_b)
            for r in embedding_neardup_pairs(
                vec_df, threshold=0.999, use_lsh=True,
                n_planes=6, n_tables=12,
            ).collect()
        }
        # LSH candidates verified exactly -> subset relation + recall
        assert lsh <= exact
        assert len(lsh & exact) / len(exact) >= 2 / 3

    def test_cosine_values_exact(self, vec_df):
        rows = embedding_neardup_pairs(
            vec_df, threshold=0.999, use_lsh=False
        ).collect()
        pair = {(r.id_a, r.id_b): r.cosine for r in rows}
        assert pair[(10, 11)] == pytest.approx(1.0, abs=1e-6)

    def test_runs_on_test_table(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = embedding_neardup_pairs(emb, threshold=0.9, use_lsh=True)
        for r in out.collect():
            assert r.cosine >= 0.9
            assert r.id_a < r.id_b


class TestSaltedAggregation:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        rng = np.random.default_rng(0)
        keys = np.where(rng.uniform(size=20_000) < 0.8, "hot", None)
        keys = [k if k is not None else f"k{rng.integers(100)}" for k in keys]
        return spark.createDataFrame(
            pd.DataFrame({"k": keys, "v": rng.uniform(0, 10, 20_000)})
        )

    def test_salted_count_matches_direct(self, skewed):
        direct = {
            r.k: r["count"]
            for r in skewed.groupBy("k").count().collect()
        }
        salted = {r.k: r.cnt for r in salted_count(skewed, ["k"]).collect()}
        assert salted == direct

    def test_salted_sum_matches_direct(self, skewed):
        direct = {
            r.k: r.s for r in skewed.groupBy("k")
            .agg(F.sum("v").alias("s")).collect()
        }
        salted = {r.k: r.total for r in salted_sum(skewed, ["k"], "v").collect()}
        assert set(salted) == set(direct)
        for k in direct:
            assert salted[k] == pytest.approx(direct[k], rel=1e-9)

    def test_min_max_composition(self, skewed):
        out = salted_aggregate(
            skewed, ["k"],
            [F.min("v").alias("_pmin"), F.max("v").alias("_pmax")],
            [F.min("_pmin").alias("v_min"), F.max("_pmax").alias("v_max")],
        )
        direct = skewed.groupBy("k").agg(
            F.min("v").alias("v_min"), F.max("v").alias("v_max")
        )
        a = {r.k: (r.v_min, r.v_max) for r in out.collect()}
        b = {r.k: (r.v_min, r.v_max) for r in direct.collect()}
        assert a == b

    def test_salt_validation(self, skewed):
        with pytest.raises(ValueError):
            salted_count(skewed, ["k"], salt=1)

    def test_skew_safe_count_distinct_matches_plain(self, spark):
        from spark_bestfit_spark.operators.skew import (
            skew_safe_count_distinct,
        )

        rows = (
            [("hot", f"v{i % 7}") for i in range(200)]
            + [("cold", "a"), ("cold", "b"), ("cold", "a")]
            + [("nulls", None), ("nulls", None), ("mixed", None),
               ("mixed", "x")]
        )
        df = spark.createDataFrame(rows, "k string, v string").repartition(8)
        ours = {
            r.k: r.n_distinct
            for r in skew_safe_count_distinct(df, ["k"], "v").collect()
        }
        plain = {
            r.k: r.nd
            for r in df.groupBy("k")
            .agg(F.countDistinct("v").alias("nd"))
            .collect()
        }
        assert ours == plain  # incl. nulls-excluded semantics
        assert ours["hot"] == 7 and ours["nulls"] == 0 and ours["mixed"] == 1

    def test_skew_safe_count_distinct_count_named_key(self, spark):
        """A grouping key literally named 'count' must work (the old
        first-stage .count() synthesized a colliding column), and
        value_col duplicating a key is a loud error."""
        from spark_bestfit_spark.operators.skew import (
            skew_safe_count_distinct,
        )

        df = spark.createDataFrame(
            [("a", 1), ("a", 2), ("a", 2), ("b", 3)],
            "count string, v int",
        )
        out = {
            r["count"]: r.n_distinct
            for r in skew_safe_count_distinct(df, ["count"], "v").collect()
        }
        assert out == {"a": 2, "b": 1}
        with pytest.raises(ValueError, match="grouping key"):
            skew_safe_count_distinct(df, ["count"], "count")


class TestIvfIndex:
    @pytest.fixture(scope="class")
    def index(self, spark):
        from spark_bestfit_spark.operators.similarity import IvfIndex

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        return IvfIndex.build(emb, n_clusters=8, seed=42)

    def test_query_ids_matches_ivf_topk(self, spark, index):
        from spark_bestfit_spark.operators.similarity import ivf_topk

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        direct = ivf_topk(emb, k=3, n_clusters=8, nprobe=2, query_ids=[0, 1])
        via_index = index.query_ids([0, 1], k=3, nprobe=2)
        a = sorted((r.query_id, r.neighbor_id, r.cosine) for r in direct.collect())
        b = sorted((r.query_id, r.neighbor_id, r.cosine) for r in via_index.collect())
        assert a == b

    def test_external_queries(self, spark, index):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = emb.filter("vec_id = 5").selectExpr(
            "vec_id AS query_id", "embedding AS query_vec"
        )
        out = index.query(q, k=3, nprobe=2).collect()
        # the identical corpus vector must come back at rank 1
        top = min(out, key=lambda r: r.rank)
        assert top.neighbor_id == 5
        assert top.cosine == pytest.approx(1.0, abs=1e-6)

    def test_save_load_roundtrip(self, spark, index, tmp_path):
        from spark_bestfit_spark.operators.similarity import IvfIndex

        p = str(tmp_path / "ivf_index")
        index.save(p)
        loaded = IvfIndex.load(spark, p)
        a = sorted(
            (r.query_id, r.neighbor_id, r.cosine)
            for r in index.query_ids([3], k=3).collect()
        )
        b = sorted(
            (r.query_id, r.neighbor_id, r.cosine)
            for r in loaded.query_ids([3], k=3).collect()
        )
        assert a == b
        loaded.unpersist()


class TestSemanticDedup:
    """Cluster-bucketed SemDeDup: in-cluster exact verification +
    connected components + min-id keepers."""

    @pytest.fixture(scope="class")
    def dup_corpus(self, spark):
        rng = np.random.default_rng(5)
        base = rng.normal(0.0, 1.0, (120, 12))
        # ids 120..149 duplicate ids 0..29; 150 duplicates 120 (chain)
        dups = base[:30] + 1e-3 * rng.normal(0.0, 1.0, (30, 12))
        chain = (dups[0] + 1e-3 * rng.normal(0.0, 1.0, 12))[None, :]
        pts = np.vstack([base, dups, chain])
        rows = [(int(i), [float(x) for x in pts[i]]) for i in range(151)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(6)

    def test_matches_exact_components(self, spark, dup_corpus):
        from spark_bestfit_spark.operators.dedup import neardup_clusters
        from spark_bestfit_spark.operators.similarity import semantic_dedup

        out = semantic_dedup(
            dup_corpus, threshold=0.98, n_clusters=6, seed=9
        ).cache()
        assert out.count() == 151
        got = {r["vec_id"]: (r["rep_id"], r["is_kept"]) for r in out.collect()}
        exact_pairs = embedding_neardup_pairs(
            dup_corpus, threshold=0.98, use_lsh=False
        )
        exact = {
            r["vec_id"]: r["cluster_id"]
            for r in neardup_clusters(exact_pairs, id_col="vec_id").collect()
        }
        # exact keepers are never dropped (components only refine)
        for vid in range(151):
            exact_rep = exact.get(vid, vid)
            if exact_rep == vid:
                assert got[vid][1], f"exact keeper {vid} was dropped"
        # the planted near-identical dups co-cluster easily: the full
        # transitive structure must be recovered here (0~120~150 chain)
        assert got[120] == (0, False)
        assert got[150] == (0, False)
        for vid in range(121, 150):
            assert got[vid] == (vid - 120, False)

    def test_keepers_consistent_and_reps_kept(self, dup_corpus):
        from spark_bestfit_spark.operators.similarity import semantic_dedup

        out = semantic_dedup(
            dup_corpus, threshold=0.98, n_clusters=6, seed=9
        )
        rows = out.collect()
        kept = {r["vec_id"] for r in rows if r["is_kept"]}
        for r in rows:
            assert r["rep_id"] <= r["vec_id"]
            assert r["rep_id"] in kept  # every representative survives
            assert (r["rep_id"] == r["vec_id"]) == bool(r["is_kept"])

    def test_cluster_size_guard_and_threshold_validation(
        self, spark, dup_corpus
    ):
        from spark_bestfit_spark.operators.similarity import semantic_dedup

        with pytest.raises(ValueError, match="max_cluster_size"):
            semantic_dedup(
                dup_corpus, threshold=0.99, n_clusters=2,
                max_cluster_size=10,
            )
        with pytest.raises(ValueError, match="threshold"):
            semantic_dedup(dup_corpus, threshold=0.0)

    def test_local_quantizer_matches_ml_dedup(self, dup_corpus):
        """method='local' (driver-sample Lloyd fit + one Arrow argmin
        assignment pass — no KMeans jobs over the corpus) must recover
        the same planted-dup structure as the Spark ML path and be
        deterministic for a fixed seed."""
        from spark_bestfit_spark.operators.similarity import semantic_dedup

        out = semantic_dedup(
            dup_corpus, threshold=0.98, n_clusters=6, seed=9,
            method="local",
        )
        rows = {r["vec_id"]: (r["rep_id"], r["is_kept"]) for r in out.collect()}
        assert sum(1 for _, k in rows.values() if k) == 120
        assert rows[120] == (0, False) and rows[150] == (0, False)
        again = semantic_dedup(
            dup_corpus, threshold=0.98, n_clusters=6, seed=9,
            method="local",
        )
        assert sorted(map(tuple, again.collect())) == sorted(
            (i, *v) for i, v in rows.items()
        )
        with pytest.raises(ValueError, match="method"):
            semantic_dedup(dup_corpus, method="bogus")

    def test_lloyd_kmeans_kernel(self):
        from spark_bestfit_spark.operators.similarity import _lloyd_kmeans

        rng = np.random.default_rng(2)
        centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
        x = np.vstack(
            [c + 0.3 * rng.normal(0, 1, (200, 2)) for c in centers]
        )
        fit = _lloyd_kmeans(x, 3, seed=5)
        # each true center is recovered within the noise scale
        for c in centers:
            d = np.min(np.linalg.norm(fit - c, axis=1))
            assert d < 0.2
        np.testing.assert_allclose(fit, _lloyd_kmeans(x, 3, seed=5))

    def test_index_reuse_across_thresholds(self, dup_corpus):
        from spark_bestfit_spark.operators.similarity import (
            IvfIndex,
            semantic_dedup,
        )

        idx = IvfIndex.build(dup_corpus, n_clusters=6, seed=9)
        strict = semantic_dedup(dup_corpus, threshold=0.999, index=idx)
        loose = semantic_dedup(dup_corpus, threshold=0.9, index=idx)
        # lower threshold merges at least as much
        assert (
            loose.filter("is_kept").count()
            <= strict.filter("is_kept").count()
        )
        idx.unpersist()


class TestHierarchicalQuantizer:
    """Two-level local quantizer (auto at n_clusters >= 128): the flat
    Lloyd fit and the flat argmin assignment are both O(k) per sample
    point / per vector — the measured sf10 wall. The two-level path
    must keep every user-visible contract: dense valid cell ids,
    determinism, planted near-identical dups co-clustering, and the
    flat path staying bit-identical for small k."""

    @pytest.fixture(scope="class")
    def big_corpus(self, spark):
        rng = np.random.default_rng(17)
        base = rng.normal(0.0, 1.0, (2000, 16))
        dups = base[:200] + 1e-4 * rng.normal(0.0, 1.0, (200, 16))
        pts = np.vstack([base, dups])
        rows = [(int(i), [float(x) for x in pts[i]]) for i in range(2200)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(8)

    def test_kernel_structure(self):
        from spark_bestfit_spark.operators.similarity import (
            _hierarchical_kmeans,
        )

        rng = np.random.default_rng(3)
        x = rng.normal(0.0, 1.0, (5000, 8))
        coarse, subs, flat, offsets = _hierarchical_kmeans(x, 200, seed=7)
        k1 = int(np.ceil(np.sqrt(200)))
        assert coarse.shape == (k1, 8)
        assert len(subs) == k1
        np.testing.assert_array_equal(flat, np.vstack(subs))
        # offsets are the prefix sums of the sub-center counts
        sizes = [s.shape[0] for s in subs]
        np.testing.assert_array_equal(
            offsets, np.concatenate([[0], np.cumsum(sizes)[:-1]])
        )
        # the realized total NEVER exceeds k (the old uniform
        # ceil(k/k1) quota could overshoot: k1*ceil(k/k1) > k)
        assert flat.shape[0] <= 200
        # deterministic
        _, _, flat2, _ = _hierarchical_kmeans(x, 200, seed=7)
        np.testing.assert_allclose(flat, flat2)

    @pytest.mark.parametrize("k", [150, 640])
    def test_center_count_never_exceeds_k(self, k):
        """k values where k1*ceil(k/k1) > k (150 -> 156, 640 -> 650
        under the old uniform quota) must realize <= k centers."""
        from spark_bestfit_spark.operators.similarity import (
            _hierarchical_kmeans,
        )

        rng = np.random.default_rng(4)
        x = rng.normal(0.0, 1.0, (4000, 8))
        _, _, flat, _ = _hierarchical_kmeans(x, k, seed=7)
        assert flat.shape[0] <= k
        # dense data, generous sample: quota allocation should land
        # close to k, not collapse
        assert flat.shape[0] >= int(0.9 * k)

    def test_assignment_is_global_argmin(self, big_corpus):
        """Hierarchical fit, but assignment must be global argmin over
        the flat centers — the same rule query() probes with, so the
        two can never disagree (the old two-stage assignment could,
        near coarse-cell boundaries)."""
        from spark_bestfit_spark.operators.similarity import IvfIndex

        idx = IvfIndex.build(
            big_corpus, n_clusters=150, seed=11, method="local"
        )
        assert idx._fit_mode == "hierarchical"  # auto threshold engaged
        centers = np.asarray(idx.centers)
        rows = idx.assigned.select("embedding", "cell").collect()
        assert all(0 <= r["cell"] < centers.shape[0] for r in rows)
        for r in rows[:200]:
            v = np.asarray(r["embedding"])
            assert r["cell"] == int(
                np.argmin(np.sum((centers - v) ** 2, axis=1))
            )
        idx.unpersist()

    def test_hierarchical_query_finds_exact_match_at_nprobe_1(
        self, big_corpus
    ):
        """The ADVICE recall regression: with two-stage assignment a
        vector's cell could differ from the cell query() probes first,
        so an exact-match query could MISS its own vector at nprobe=1.
        Global-argmin assignment makes that impossible — pin it."""
        from spark_bestfit_spark.operators.similarity import IvfIndex

        idx = IvfIndex.build(
            big_corpus, n_clusters=150, seed=11, method="local"
        )
        assert idx._fit_mode == "hierarchical"
        queries = big_corpus.filter("vec_id < 40").select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        hits = {
            r["query_id"]
            for r in idx.query(queries, k=3, nprobe=1).collect()
            if r["neighbor_id"] == r["query_id"]
        }
        assert hits == set(range(40))  # every query finds itself
        idx.unpersist()

    def test_flat_path_unchanged_below_threshold(self, big_corpus):
        from spark_bestfit_spark.operators.similarity import IvfIndex

        idx = IvfIndex.build(
            big_corpus, n_clusters=16, seed=11, method="local"
        )
        assert idx._fit_mode == "flat"
        centers = np.asarray(idx.centers)
        for r in idx.assigned.select("embedding", "cell").collect()[:100]:
            v = np.asarray(r["embedding"])
            assert r["cell"] == int(
                np.argmin(np.sum((centers - v) ** 2, axis=1))
            )
        idx.unpersist()

    def test_forced_modes_and_determinism(self, big_corpus):
        from spark_bestfit_spark.operators.similarity import IvfIndex

        hier_small = IvfIndex.build(
            big_corpus, n_clusters=16, seed=11, method="local",
            hierarchical=True,
        )
        assert hier_small._fit_mode == "hierarchical"
        flat_big = IvfIndex.build(
            big_corpus, n_clusters=150, seed=11, method="local",
            hierarchical=False,
        )
        assert flat_big._fit_mode == "flat"
        a = IvfIndex.build(
            big_corpus, n_clusters=150, seed=11, method="local"
        )
        b = IvfIndex.build(
            big_corpus, n_clusters=150, seed=11, method="local"
        )
        assert sorted(
            (r["vec_id"], r["cell"]) for r in a.assigned.collect()
        ) == sorted((r["vec_id"], r["cell"]) for r in b.assigned.collect())
        for i in (hier_small, flat_big, a, b):
            i.unpersist()

    def test_semantic_dedup_recovers_planted_dups(self, big_corpus):
        """At n_clusters=150 (hierarchical auto-engaged) the planted
        near-identical duplicates still co-cluster — cell geometry may
        differ from flat Lloyd, but near-zero-distance pairs land in
        one cell under any quantizer — and the keeper invariants
        hold."""
        from spark_bestfit_spark.operators.similarity import semantic_dedup

        out = semantic_dedup(
            big_corpus, threshold=0.9999, n_clusters=150, seed=11,
            method="local",
        ).cache()
        rows = {r["vec_id"]: (r["rep_id"], r["is_kept"])
                for r in out.collect()}
        assert len(rows) == 2200
        recovered = sum(
            1 for i in range(200) if rows[2000 + i] == (i, False)
        )
        assert recovered >= 190  # >= 95% of planted dups merged
        kept = {i for i, (_, k) in rows.items() if k}
        for vid, (rep, is_kept) in rows.items():
            assert rep <= vid
            assert rep in kept
            assert (rep == vid) == bool(is_kept)
        out.unpersist()


class TestSkewReport:
    def test_hand_computed_report(self, spark):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.skew import skew_report

        rows = [("hot",)] * 80 + [("warm",)] * 15 + [("a",)] * 3 + [
            ("b",)] * 2
        df = spark.createDataFrame(rows, "k string").repartition(8)
        r = skew_report(df, ["k"], top_n=2).first()
        assert r.n_rows == 100 and r.n_keys == 4
        assert r.mean_bucket == 25.0 and r.max_bucket == 80
        assert r.skew_ratio == 3.2 and r.top_share == 0.8
        assert [(t["key"], t["cnt"]) for t in r.top_keys] == [
            ("hot", 80), ("warm", 15)
        ]

    def test_composite_keys_and_validation(self, spark):
        import pytest

        from spark_bestfit_spark.operators.skew import skew_report

        df = spark.createDataFrame(
            [("x", 1), ("x", 1), ("x", 2)], "a string, b int"
        )
        r = skew_report(df, ["a", "b"], top_n=1).first()
        assert r.n_keys == 2 and r.max_bucket == 2
        assert r.top_keys[0]["key"] == "x|1"
        with pytest.raises(ValueError, match="keys"):
            skew_report(df, [])

    def test_no_full_key_collect_in_plan(self, spark):
        from spark_bestfit_spark.operators.skew import skew_report

        df = spark.createDataFrame([("x",)], "k string")
        plan = (
            skew_report(df, ["k"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the heavy-keys leg must be a TakeOrdered, not a global sort
        # or a full-relation collect_list
        assert "TakeOrderedAndProject" in plan, plan


class TestEmbeddingQuantization:
    """int8 affine quantization: the 4x storage/IO cut for vector
    corpora. Contracts: params in one agg pass (no explode), map-only
    encode/decode, |x - x_hat| <= scale/2 everywhere (lo/hi are the
    exact range so nothing clamps), and merge-order-invariant report."""

    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )

    def test_roundtrip_error_within_half_scale(self, emb):
        from spark_bestfit_spark.operators.similarity import (
            dequantize_embeddings,
            embedding_quant_params,
            quantize_embeddings,
        )

        params = embedding_quant_params(emb, 64)
        assert len(params) == 64
        assert all(lo <= hi for lo, hi in params)
        q = quantize_embeddings(emb, params)
        xh = dequantize_embeddings(q, params)
        rows = xh.select("embedding", "q_embedding", "embedding_hat") \
                 .collect()
        for r in rows[:50]:
            for i, (x, qi, h) in enumerate(
                zip(r.embedding, r.q_embedding, r.embedding_hat)
            ):
                lo, hi = params[i]
                scale = (hi - lo) / 255 if hi > lo else 1.0
                assert 0 <= qi <= 255
                assert abs(x - h) <= scale * 0.5000001

    def test_report_bounds_and_shape(self, emb):
        from spark_bestfit_spark.operators.similarity import (
            quantization_error_report,
        )

        rep = quantization_error_report(emb, 64)
        rows = rep.collect()
        assert len(rows) == 64
        assert all(r.within_bound for r in rows)
        assert all(r.max_abs_err <= r.scale * 0.5000001 for r in rows)

    def test_quantize_is_map_only(self, emb):
        from spark_bestfit_spark.operators.similarity import (
            embedding_quant_params,
            quantize_embeddings,
        )

        params = embedding_quant_params(emb, 64)
        plan = (
            quantize_embeddings(emb, params)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_degenerate_constant_dim(self, spark):
        from spark_bestfit_spark.operators.similarity import (
            dequantize_embeddings,
            embedding_quant_params,
            quantize_embeddings,
        )

        df = spark.createDataFrame(
            [(0, [1.5, 2.0]), (1, [1.5, 3.0])],
            "vec_id long, embedding array<double>",
        )
        params = embedding_quant_params(df, 2)
        assert params[0] == (1.5, 1.5)  # constant dim: scale guard
        xh = dequantize_embeddings(
            quantize_embeddings(df, params), params
        ).collect()
        for r in xh:
            assert abs(r.embedding_hat[0] - 1.5) < 1e-12

    def test_empty_or_all_null_raises(self, spark):
        from spark_bestfit_spark.operators.similarity import (
            embedding_quant_params,
        )

        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="empty|all null"):
            embedding_quant_params(empty, 2)
        nulldim = spark.createDataFrame(
            [(0, [1.0, None]), (1, [2.0, None])],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(ValueError, match="dimension"):
            embedding_quant_params(nulldim, 2)


class TestHardNegativeMining:
    def test_band_and_ranking(self, spark):
        from spark_bestfit_spark.operators.similarity import (
            mine_hard_negatives,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        anchors = emb.filter("vec_id < 2").select(
            F.col("vec_id").alias("anchor_id"),
            F.col("embedding").alias("anchor_vec"),
        )
        out = mine_hard_negatives(
            emb, anchors, k=3, lo=0.1, hi=0.9
        ).collect()
        by_anchor = {}
        for r in out:
            assert 0.1 <= r.cosine < 0.9
            assert r.negative_id != r.anchor_id
            by_anchor.setdefault(r.anchor_id, []).append(r)
        for rows in by_anchor.values():
            rows.sort(key=lambda r: r.rank)
            assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
            cosines = [r.cosine for r in rows]
            assert cosines == sorted(cosines, reverse=True)
            assert len(rows) <= 3

    def test_near_dup_excluded_above_hi(self, spark):
        """A planted exact duplicate (cosine 1.0) must NEVER appear as
        a hard negative -- the hi bound is the false-negative guard."""
        from spark_bestfit_spark.operators.similarity import (
            mine_hard_negatives,
        )

        rng = np.random.default_rng(5)
        base = rng.normal(0.0, 1.0, (30, 8))
        base[1] = base[0]  # exact dup of anchor 0
        rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        anchors = df.filter("vec_id = 0").select(
            F.col("vec_id").alias("anchor_id"),
            F.col("embedding").alias("anchor_vec"),
        )
        negs = {
            r.negative_id
            for r in mine_hard_negatives(
                df, anchors, k=10, lo=0.0, hi=0.95
            ).collect()
        }
        assert 1 not in negs  # the dup sits above hi
        assert 0 not in negs  # self-exclusion

    def test_custom_anchor_columns_and_clear_error(self, spark):
        from spark_bestfit_spark.operators.similarity import (
            mine_hard_negatives,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        anchors = emb.filter("vec_id < 2").select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
        )
        out = mine_hard_negatives(
            emb, anchors, k=3, lo=0.1, hi=0.9,
            anchor_id_col="qid", anchor_vec_col="qvec",
        )
        assert out.columns == ["anchor_id", "negative_id", "cosine", "rank"]
        assert out.count() > 0
        with pytest.raises(ValueError, match="missing column"):
            mine_hard_negatives(emb, anchors, k=3)

    def test_corpus_is_never_shuffled_before_band_filter(self, spark):
        """Plan shape: broadcast anchors (BroadcastNestedLoopJoin),
        exactly one exchange (the per-anchor top-k window) fed by
        band-filtered candidates."""
        from spark_bestfit_spark.operators.similarity import (
            mine_hard_negatives,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        anchors = emb.filter("vec_id < 2").select(
            F.col("vec_id").alias("anchor_id"),
            F.col("embedding").alias("anchor_vec"),
        )
        plan = (
            mine_hard_negatives(emb, anchors, k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan
        # one hash exchange (the top-k window); BroadcastExchange of
        # the tiny anchor side is not a shuffle
        assert plan.count("Exchange hashpartitioning") == 1
        # the top-k is pushed below the exchange as a partial group
        # limit, so the shuffle carries at most k rows per anchor per
        # map partition
        assert "WindowGroupLimit" in plan


class TestSaltedJoin:
    def test_inner_matches_plain_join(self, spark):
        from spark_bestfit_spark.operators.skew import salted_join

        big = spark.createDataFrame(
            [(i, "hot" if i % 10 else f"k{i}") for i in range(2000)],
            "row_id long, k string",
        ).repartition(8)
        # duplicate small keys + a key with no big match + null key
        small = spark.createDataFrame(
            [("hot", 1), ("hot", 2), ("k10", 3), ("orphan", 4),
             (None, 5)],
            "k string, payload int",
        )
        ours = sorted(
            (r.row_id, r.k, r.payload)
            for r in salted_join(big, small, ["k"], salt=4).collect()
        )
        plain = sorted(
            (r.row_id, r.k, r.payload)
            for r in big.join(small, "k").collect()
        )
        assert ours == plain
        assert len(ours) == 1800 * 2 + 1  # hot dups + k10

    def test_left_matches_plain_join(self, spark):
        from spark_bestfit_spark.operators.skew import salted_join

        big = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None)], "row_id long, k string"
        )
        small = spark.createDataFrame(
            [("a", 10)], "k string, payload int"
        )
        ours = sorted(
            (r.row_id, r.payload)
            for r in salted_join(big, small, ["k"], salt=3,
                                 how="left").collect()
        )
        plain = sorted(
            (r.row_id, r.payload)
            for r in big.join(small, "k", "left").collect()
        )
        assert ours == plain  # unmatched + null-key rows kept once

    def test_join_is_keyed_on_salt(self, spark):
        from spark_bestfit_spark.operators.skew import salted_join

        big = spark.createDataFrame(
            [(i, "x") for i in range(100)], "row_id long, k string"
        )
        small = spark.createDataFrame(
            [("x", 1)], "k string, payload int"
        )
        plan = (
            salted_join(big, small, ["k"], salt=4)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "_salt" in plan  # the hot key fans over salt reducers

    def test_validation(self, spark):
        from spark_bestfit_spark.operators.skew import salted_join

        big = spark.createDataFrame([(1, "a")], "row_id long, k string")
        small = spark.createDataFrame([("a", 1)], "k string, payload int")
        with pytest.raises(ValueError, match="inner"):
            salted_join(big, small, ["k"], how="full")
        with pytest.raises(ValueError, match="salt"):
            salted_join(big, small, ["k"], salt=1)
        with pytest.raises(ValueError, match="missing keys"):
            salted_join(big, small, ["nope"])
        clash = spark.createDataFrame(
            [("a", 9)], "k string, row_id long"
        )
        with pytest.raises(ValueError, match="both sides"):
            salted_join(big, clash, ["k"])


class TestProductQuantization:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )

    def test_train_encode_shapes(self, emb):
        from spark_bestfit_spark.operators.similarity import (
            pq_encode,
            pq_train,
        )

        books = pq_train(emb, dim=64, m=8, n_codes=16)
        assert len(books) == 8
        assert all(b.shape == (16, 8) for b in books)
        rows = pq_encode(emb, books).select("pq_code").collect()
        for r in rows:
            assert len(r.pq_code) == 8
            assert all(0 <= c < 16 for c in r.pq_code)

    def test_encode_is_map_only(self, emb):
        from spark_bestfit_spark.operators.similarity import (
            pq_encode,
            pq_train,
        )

        books = pq_train(emb, dim=64, m=8, n_codes=16)
        plan = (
            pq_encode(emb, books)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_adc_recall_on_clustered_corpus(self, spark):
        """On a clustered corpus with planted near-identical dups, the
        ADC top-1 must recover each query's planted twin (PQ preserves
        large distance gaps; the twin's code equals the query's)."""
        from spark_bestfit_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            pq_train,
        )

        rng = np.random.default_rng(11)
        centers = 5.0 * rng.normal(0.0, 1.0, (6, 32))
        labels = rng.integers(0, 6, 400)
        base = centers[labels] + 0.3 * rng.normal(0.0, 1.0, (400, 32))
        twins = base[:10] + 1e-6 * rng.normal(0.0, 1.0, (10, 32))
        pts = np.vstack([base, twins])  # twins get ids 400..409
        rows = [(int(i), [float(x) for x in pts[i]])
                for i in range(410)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(4)
        books = pq_train(df, dim=32, m=4, n_codes=64)
        enc = pq_encode(df, books).select("vec_id", "pq_code").cache()
        queries = [(i, [float(x) for x in pts[i]]) for i in range(10)]
        top1 = {
            r.query_id: r.neighbor_id
            for r in pq_topk(enc, books, queries, k=1).collect()
        }
        hits = sum(1 for i in range(10) if top1[i] == 400 + i)
        assert hits == 10
        enc.unpersist()

    def test_validation(self, emb):
        from spark_bestfit_spark.operators.similarity import pq_train

        with pytest.raises(ValueError, match="divisible"):
            pq_train(emb, dim=64, m=7)

    def test_topk_empty_queries_raises(self, emb):
        from spark_bestfit_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            pq_train,
        )

        books = pq_train(emb, dim=64, m=8, n_codes=16)
        enc = pq_encode(emb, books).select("vec_id", "pq_code")
        with pytest.raises(ValueError, match="non-empty"):
            pq_topk(enc, books, [])

    def test_topk_duplicate_query_ids_raise(self, emb):
        from spark_bestfit_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            pq_train,
        )

        books = pq_train(emb, dim=64, m=8, n_codes=16)
        enc = pq_encode(emb, books).select("vec_id", "pq_code")
        q0 = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 1).collect()
        ]
        with pytest.raises(ValueError, match="duplicate query ids"):
            pq_topk(enc, books, q0 + q0)

    def test_topk_single_scan_for_query_batch(self, emb):
        """Scan count must be independent of Q: a 6-query batch runs
        ONE Arrow-batched ADC pass over the encoded corpus (the old
        per-query loop produced Q ArrowEvalPython stages unioned)."""
        from spark_bestfit_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            pq_train,
        )

        books = pq_train(emb, dim=64, m=8, n_codes=16)
        enc = pq_encode(emb, books).select("vec_id", "pq_code")
        queries = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 6).collect()
        ]
        out = pq_topk(enc, books, queries, k=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 2  # encode + one ADC
        rows = out.collect()
        assert {r.query_id for r in rows} == set(range(6))
        for r in rows:
            assert r.neighbor_id != r.query_id
            assert 1 <= r.rank <= 3

    def test_topk_exclude_self_off_keeps_colliding_ids(self, spark):
        """External-id queries that collide with corpus ids keep the
        colliding neighbor when exclude_self=False."""
        from spark_bestfit_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            pq_train,
        )

        rng = np.random.default_rng(7)
        pts = rng.normal(0.0, 1.0, (64, 16))
        rows = [(int(i), [float(x) for x in pts[i]]) for i in range(64)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        books = pq_train(df, dim=16, m=4, n_codes=16)
        enc = pq_encode(df, books).select("vec_id", "pq_code")
        queries = [(0, [float(x) for x in pts[0]])]
        with_self = pq_topk(enc, books, queries, k=1, exclude_self=False)
        assert with_self.first().neighbor_id == 0  # own code: dist 0
        without = pq_topk(enc, books, queries, k=1).first()
        assert without.neighbor_id != 0


class TestIvfPqIndex:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )

    def test_build_and_query_shapes(self, emb):
        from spark_bestfit_spark.operators.similarity import IvfPqIndex

        idx = IvfPqIndex.build(emb, n_clusters=4, m=8, n_codes=16)
        rows = idx.encoded.collect()
        assert {r.cell for r in rows} <= set(range(4))
        for r in rows:
            assert len(r.pq_code) == 8
            assert all(0 <= c < 16 for c in r.pq_code)
        queries = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 3).collect()
        ]
        out = idx.query(queries, k=3, nprobe=2).collect()
        assert {r.query_id for r in out} <= {0, 1, 2}
        for r in out:
            assert r.neighbor_id != r.query_id
            assert 1 <= r.rank <= 3
        idx.unpersist()

    def test_exact_match_found_at_nprobe_1(self, spark):
        """A planted near-identical twin must be the ADC top-1 at
        nprobe=1: assignment and probing share the global-argmin rule,
        so the twin's cell is always the first probed (the same
        contract the flat IvfIndex pins)."""
        from spark_bestfit_spark.operators.similarity import IvfPqIndex

        rng = np.random.default_rng(3)
        centers = 8.0 * rng.normal(0.0, 1.0, (5, 32))
        labels = rng.integers(0, 5, 300)
        base = centers[labels] + 0.2 * rng.normal(0.0, 1.0, (300, 32))
        twins = base[:8] + 1e-6 * rng.normal(0.0, 1.0, (8, 32))
        pts = np.vstack([base, twins])  # twins: ids 300..307
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]])
             for i in range(308)],
            "vec_id long, embedding array<double>",
        )
        idx = IvfPqIndex.build(df, n_clusters=5, m=4, n_codes=64)
        queries = [(i, [float(x) for x in pts[i]]) for i in range(8)]
        top1 = {
            r.query_id: r.neighbor_id
            for r in idx.query(queries, k=1, nprobe=1).collect()
        }
        assert sum(1 for i in range(8) if top1[i] == 300 + i) == 8
        idx.unpersist()

    def test_query_batch_is_single_scan(self, emb):
        from spark_bestfit_spark.operators.similarity import IvfPqIndex

        idx = IvfPqIndex.build(emb, n_clusters=4, m=8, n_codes=16)
        q2 = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 2).collect()
        ]
        q6 = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 6).collect()
        ]
        p2 = idx.query(q2, k=3)._jdf.queryExecution() \
            .executedPlan().toString()
        p6 = idx.query(q6, k=3)._jdf.queryExecution() \
            .executedPlan().toString()
        # ADC stage count must not grow with the query batch
        assert p2.count("ArrowEvalPython") == p6.count("ArrowEvalPython")
        idx.unpersist()

    def test_save_load_round_trip_and_pruning(self, emb, tmp_path):
        from spark_bestfit_spark.operators.similarity import IvfPqIndex

        spark = emb.sparkSession
        idx = IvfPqIndex.build(emb, n_clusters=4, m=8, n_codes=16)
        path = str(tmp_path / "ivfpq")
        idx.save(path)
        loaded = IvfPqIndex.load(spark, path)
        queries = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 3).collect()
        ]
        a = sorted(map(tuple, idx.query(queries, k=3).collect()))
        b = sorted(map(tuple, loaded.query(queries, k=3).collect()))
        assert a == b
        # cell-partitioned storage: the probe filter prunes partitions
        plan = loaded.query(queries, k=3, nprobe=1) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        idx.unpersist()

    def test_validation(self, emb):
        from spark_bestfit_spark.operators.similarity import IvfPqIndex

        with pytest.raises(ValueError, match="divisible"):
            IvfPqIndex.build(emb, n_clusters=4, m=7)
        idx = IvfPqIndex.build(emb, n_clusters=4, m=8, n_codes=16)
        with pytest.raises(ValueError, match="non-empty"):
            idx.query([])
        q0 = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 1).collect()
        ]
        with pytest.raises(ValueError, match="duplicate query ids"):
            idx.query(q0 + q0)
        idx.unpersist()

    def test_query_lut_closure_guard(self, emb, monkeypatch):
        """A batch whose stacked LUTs exceed the documented closure
        bound fails loudly with the knobs named — never silently ships
        gigabytes to every task."""
        import spark_bestfit_spark.operators.similarity as sim

        idx = sim.IvfPqIndex.build(emb, n_clusters=4, m=8, n_codes=16)
        q3 = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 3).collect()
        ]
        monkeypatch.setattr(sim, "MAX_QUERY_LUT_BYTES", 1024)
        with pytest.raises(ValueError, match="Split the query batch"):
            idx.query(q3, k=3, nprobe=2)
        monkeypatch.undo()
        assert idx.query(q3, k=3, nprobe=2).count() > 0
        idx.unpersist()


class TestOpq:
    def test_mse_beats_plain_pq_on_correlated_data(self, spark):
        """The whole point of the rotation: on anisotropic Gaussians
        eigenvalue allocation balances subspace variances and lowers
        quantization error vs plain PQ at the same code budget."""
        from spark_bestfit_spark.operators.similarity import (
            opq_encode,
            opq_train,
            pq_encode,
            pq_train,
        )

        rng = np.random.default_rng(0)
        A = rng.normal(0, 1, (16, 16))
        cov = A @ A.T + np.diag(np.linspace(0.01, 25, 16))
        L = np.linalg.cholesky(cov)
        pts = rng.normal(0, 1, (3000, 16)) @ L.T
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(3000)],
            "vec_id long, embedding array<double>",
        )
        rot, books_o = opq_train(df, dim=16, m=4, n_codes=16)
        books_p = pq_train(df, dim=16, m=4, n_codes=16)

        def mse(enc_pdf, books, X, R=None):
            Xr = X @ R.T if R is not None else X
            codes = np.asarray([np.asarray(v) for v in enc_pdf.pq_code])
            rec = np.hstack(
                [books[j][codes[:, j]] for j in range(len(books))]
            )
            return float(np.mean((Xr - rec) ** 2))

        eo = opq_encode(df, rot, books_o).orderBy("vec_id") \
            .select("pq_code").toPandas()
        ep = pq_encode(df, books_p).orderBy("vec_id") \
            .select("pq_code").toPandas()
        m_o = mse(eo, books_o, pts, rot)
        m_p = mse(ep, books_p, pts)
        assert m_o < m_p * 0.9  # >= 10% error reduction

    def test_rotation_is_orthonormal_and_balanced(self, spark):
        from spark_bestfit_spark.operators.similarity import opq_train

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        rot, books = opq_train(emb, dim=64, m=8, n_codes=16)
        assert rot.shape == (64, 64)
        assert np.allclose(rot @ rot.T, np.eye(64), atol=1e-8)
        assert len(books) == 8

    def test_topk_exact_twin_recovered(self, spark):
        """Rotated-space L2 == original L2 (orthonormal rotation), so
        a planted near-identical twin is the ADC top-1."""
        from spark_bestfit_spark.operators.similarity import (
            opq_encode,
            opq_topk,
            opq_train,
        )

        rng = np.random.default_rng(11)
        centers = 5.0 * rng.normal(0.0, 1.0, (6, 32))
        labels = rng.integers(0, 6, 400)
        base = centers[labels] + 0.3 * rng.normal(0.0, 1.0, (400, 32))
        twins = base[:10] + 1e-6 * rng.normal(0.0, 1.0, (10, 32))
        pts = np.vstack([base, twins])
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(410)],
            "vec_id long, embedding array<double>",
        )
        rot, books = opq_train(df, dim=32, m=4, n_codes=64)
        enc = opq_encode(df, rot, books).select("vec_id", "pq_code")
        queries = [(i, [float(x) for x in pts[i]]) for i in range(10)]
        top1 = {
            r.query_id: r.neighbor_id
            for r in opq_topk(enc, rot, books, queries, k=1).collect()
        }
        assert sum(1 for i in range(10) if top1[i] == 400 + i) == 10

    def test_eigenvalue_allocation_balances(self):
        from spark_bestfit_spark.operators.similarity import (
            _eigenvalue_allocation,
        )

        vals = np.array([100.0, 50.0, 10.0, 5.0, 2.0, 1.0, 0.5, 0.1])
        perm = _eigenvalue_allocation(vals, 2)
        assert sorted(perm.tolist()) == list(range(8))
        half = len(vals) // 2
        p1 = float(np.sum(np.log(vals[perm[:half]])))
        p2 = float(np.sum(np.log(vals[perm[half:]])))
        # log-products balanced far better than the sorted split
        naive = abs(float(np.sum(np.log(vals[:4])))
                    - float(np.sum(np.log(vals[4:]))))
        assert abs(p1 - p2) < naive / 2


class TestIncrementalSemanticDedup:
    @staticmethod
    def _planted(spark):
        rng = np.random.default_rng(13)
        n, dim, kc = 900, 16, 8
        centers = 3.0 * rng.normal(0, 1, (kc, dim))
        labels = rng.integers(0, kc, n)
        base = centers[labels] + 0.2 * rng.normal(0, 1, (n, dim))
        dups = base[:150] + 1e-3 * rng.normal(0, 1, (150, dim))
        pts = np.vstack([base, dups])

        def mk(lo, hi):
            return spark.createDataFrame(
                [(int(i), [float(x) for x in pts[i]])
                 for i in range(lo, hi)],
                "vec_id long, embedding array<double>",
            )

        return mk

    def test_matches_frozen_index_full_recompute(self, spark):
        from spark_bestfit_spark.operators.similarity import (
            IvfIndex,
            incremental_semantic_dedup,
            semantic_dedup,
        )

        mk = self._planted(spark)
        prev, new = mk(0, 700), mk(700, 1050)
        th = 0.9999
        idx0 = IvfIndex.build(prev, n_clusters=8, seed=13, method="local")
        prev_res = semantic_dedup(prev, threshold=th, index=idx0)
        keep_ids = [r.vec_id for r in prev_res.filter("is_kept").collect()]
        keepers_assigned = idx0.assigned.filter(
            F.col("vec_id").isin(keep_ids)
        ).cache()
        kidx = IvfIndex(keepers_assigned, idx0.centers)
        inc = sorted(map(tuple, incremental_semantic_dedup(
            new, kidx, threshold=th
        ).collect()))
        union = prev.filter(F.col("vec_id").isin(keep_ids)) \
            .unionByName(new)
        uidx = IvfIndex(kidx.assign(union).cache(), idx0.centers)
        full = sorted(
            tuple(r)
            for r in semantic_dedup(union, threshold=th,
                                    index=uidx).collect()
            if r.vec_id >= 700
        )
        assert inc == full
        n_dup = sum(1 for r in inc if not r[2])
        assert n_dup > 0  # the slice must exercise real duplicates
        keepers_assigned.unpersist()

    def test_transitive_dup_through_new_doc_reps_to_keeper(self, spark):
        """A -> keeper edge plus B -> A edge must pull B into the
        keeper's component even when B never matches the keeper
        directly."""
        from spark_bestfit_spark.operators.similarity import (
            IvfIndex,
            incremental_semantic_dedup,
        )

        base = np.array([1.0] + [0.0] * 7)
        tilt1 = base + np.array([0.0, 0.02] + [0.0] * 6)
        tilt2 = base + np.array([0.0, 0.04] + [0.0] * 6)
        far = np.array([0.0] * 7 + [5.0])
        state = spark.createDataFrame(
            [(0, [float(x) for x in base]),
             (1, [float(x) for x in far])],
            "vec_id long, embedding array<double>",
        )
        idx = IvfIndex.build(state, n_clusters=2, seed=1, method="local",
                             sample_size=10)
        new = spark.createDataFrame(
            [(10, [float(x) for x in tilt1]),
             (11, [float(x) for x in tilt2])],
            "vec_id long, embedding array<double>",
        )
        # cos(base, tilt1) ~ 0.9998, cos(tilt1, tilt2) ~ 0.9998,
        # cos(base, tilt2) ~ 0.9992 < threshold
        out = {r.vec_id: r for r in incremental_semantic_dedup(
            new, idx, threshold=0.9995
        ).collect()}
        assert out[10].rep_id == 0 and not out[10].is_kept
        assert out[11].rep_id == 0 and not out[11].is_kept

    def test_guard_and_validation(self, spark):
        from spark_bestfit_spark.operators.similarity import (
            IvfIndex,
            incremental_semantic_dedup,
        )

        mk = self._planted(spark)
        prev, new = mk(0, 100), mk(100, 200)
        idx = IvfIndex.build(prev, n_clusters=2, seed=13, method="local")
        with pytest.raises(ValueError, match="max_cluster_size"):
            incremental_semantic_dedup(new, idx, max_cluster_size=10)
        with pytest.raises(ValueError, match="threshold"):
            incremental_semantic_dedup(new, idx, threshold=0.0)


class TestResidualQuantization:
    def test_adc_identity(self, spark):
        """The exact-ADC claim: rq_topk's distance equals the true
        squared L2 to the additive reconstruction, cross terms and
        all (to the 1e-6 rounding of the relation)."""
        from spark_bestfit_spark.operators.similarity import (
            rq_encode,
            rq_topk,
            rq_train,
        )

        rng = np.random.default_rng(2)
        pts = rng.normal(0, 1, (300, 16))
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(300)],
            "vec_id long, embedding array<double>",
        )
        books = rq_train(df, dim=16, n_levels=2, n_codes=16)
        enc = rq_encode(df, books).orderBy("vec_id").collect()
        codes = np.asarray([r.rq_code for r in enc])
        xhat = books[0][codes[:, 0]] + books[1][codes[:, 1]]
        q = pts[0]
        true_d = np.sum((q[None, :] - xhat) ** 2, axis=1)
        enc_df = spark.createDataFrame(
            [(int(i), [int(c) for c in codes[i]]) for i in range(300)],
            "vec_id long, rq_code array<int>",
        )
        got = {
            r.neighbor_id: r.adc_dist
            for r in rq_topk(
                enc_df, books, [(0, list(q))], k=300,
                exclude_self=False,
            ).collect()
        }
        for i in range(300):
            assert abs(got[i] - true_d[i]) < 1e-5

    def test_stagewise_mse_beats_single_level(self, spark):
        from spark_bestfit_spark.operators.similarity import (
            rq_encode,
            rq_train,
        )

        rng = np.random.default_rng(2)
        pts = rng.normal(0, 1, (400, 16))
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(400)],
            "vec_id long, embedding array<double>",
        )

        def mse(n_levels):
            books = rq_train(df, dim=16, n_levels=n_levels, n_codes=16)
            enc = rq_encode(df, books).orderBy("vec_id").collect()
            codes = np.asarray([r.rq_code for r in enc])
            xhat = np.zeros_like(pts)
            for lv in range(n_levels):
                xhat += books[lv][codes[:, lv]]
            return float(np.mean((pts - xhat) ** 2))

        m1, m2 = mse(1), mse(2)
        assert m2 < m1 * 0.85  # the second level must earn its bytes

    def test_batch_single_scan_and_validation(self, spark):
        from spark_bestfit_spark.operators.similarity import (
            rq_encode,
            rq_topk,
            rq_train,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        books = rq_train(emb, dim=64, n_levels=2, n_codes=16)
        enc = rq_encode(emb, books).select("vec_id", "rq_code")
        q2 = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 2).collect()
        ]
        q6 = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 6).collect()
        ]
        p2 = rq_topk(enc, books, q2, k=3)._jdf.queryExecution() \
            .executedPlan().toString()
        p6 = rq_topk(enc, books, q6, k=3)._jdf.queryExecution() \
            .executedPlan().toString()
        assert p2.count("ArrowEvalPython") == p6.count("ArrowEvalPython")
        with pytest.raises(ValueError, match="non-empty"):
            rq_topk(enc, books, [])
        with pytest.raises(ValueError, match="duplicate query ids"):
            rq_topk(enc, books, q2 + q2)
        with pytest.raises(ValueError, match="n_levels"):
            rq_train(emb, dim=64, n_levels=0)


class TestIvfOpq:
    """IVF+OPQ+PQ fully composed (FAISS's production
    ``OPQ..,IVF..,PQ..`` default): the OPQ rotation lives in the
    CELL-RESIDUAL space inside IvfPqIndex."""

    def test_exact_twin_recovered_with_rotation(self, spark):
        """Orthonormal rotation preserves residual-space L2, so the
        planted-twin contract of the plain IVFADC holds unchanged."""
        from spark_bestfit_spark.operators.similarity import IvfPqIndex

        rng = np.random.default_rng(5)
        centers = 8.0 * rng.normal(0.0, 1.0, (5, 32))
        labels = rng.integers(0, 5, 300)
        base = centers[labels] + 0.2 * rng.normal(0.0, 1.0, (300, 32))
        twins = base[:8] + 1e-6 * rng.normal(0.0, 1.0, (8, 32))
        pts = np.vstack([base, twins])
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(308)],
            "vec_id long, embedding array<double>",
        )
        idx = IvfPqIndex.build(df, n_clusters=5, m=4, n_codes=64,
                               opq=True)
        assert idx.rotation is not None
        assert np.allclose(
            idx.rotation @ idx.rotation.T, np.eye(32), atol=1e-8
        )
        queries = [(i, [float(x) for x in pts[i]]) for i in range(8)]
        top1 = {
            r.query_id: r.neighbor_id
            for r in idx.query(queries, k=1, nprobe=1).collect()
        }
        assert sum(1 for i in range(8) if top1[i] == 300 + i) == 8
        idx.unpersist()

    def test_residual_mse_beats_plain_ivfpq_on_correlated_data(
        self, spark
    ):
        """The composition must earn its matmul: on anisotropic
        residuals the rotated codebooks reconstruct with lower error
        than plain IVFADC at the same code budget."""
        from spark_bestfit_spark.operators.similarity import IvfPqIndex

        rng = np.random.default_rng(2)
        A = rng.normal(0, 1, (16, 16))
        cov = A @ A.T + np.diag(np.linspace(0.01, 25, 16))
        L = np.linalg.cholesky(cov)
        centers = 12.0 * rng.normal(0, 1, (4, 16))
        labels = rng.integers(0, 4, 4000)
        pts = centers[labels] + rng.normal(0, 1, (4000, 16)) @ L.T
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(4000)],
            "vec_id long, embedding array<double>",
        )

        def recon_mse(idx):
            pdf = idx.encoded.orderBy("vec_id").toPandas()
            c = np.asarray(idx.centers)
            codes = np.asarray([np.asarray(v) for v in pdf.pq_code])
            rec_res = np.hstack([
                idx.codebooks[j][codes[:, j]]
                for j in range(len(idx.codebooks))
            ])
            if idx.rotation is not None:
                rec_res = rec_res @ idx.rotation  # rot.T.T = rot
            rec = c[pdf.cell.to_numpy()] + rec_res
            return float(np.mean((pts - rec) ** 2))

        plain = IvfPqIndex.build(df, n_clusters=4, m=4, n_codes=16)
        opq = IvfPqIndex.build(df, n_clusters=4, m=4, n_codes=16,
                               opq=True)
        m_plain, m_opq = recon_mse(plain), recon_mse(opq)
        assert m_opq < m_plain * 0.9
        plain.unpersist()
        opq.unpersist()

    def test_composed_query_still_single_scan(self, spark):
        from spark_bestfit_spark.operators.similarity import IvfPqIndex

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        idx = IvfPqIndex.build(emb, n_clusters=4, m=8, n_codes=16,
                               opq=True)
        q2 = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 2).collect()
        ]
        q6 = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 6).collect()
        ]
        p2 = idx.query(q2, k=3)._jdf.queryExecution() \
            .executedPlan().toString()
        p6 = idx.query(q6, k=3)._jdf.queryExecution() \
            .executedPlan().toString()
        assert p2.count("ArrowEvalPython") == p6.count("ArrowEvalPython")
        idx.unpersist()

    def test_save_load_round_trip_with_rotation(self, spark, tmp_path):
        from spark_bestfit_spark.operators.similarity import IvfPqIndex

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        idx = IvfPqIndex.build(emb, n_clusters=4, m=8, n_codes=16,
                               opq=True)
        path = str(tmp_path / "ivfopq")
        idx.save(path)
        loaded = IvfPqIndex.load(spark, path)
        assert loaded.rotation is not None
        assert np.array_equal(loaded.rotation, idx.rotation)
        queries = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 3).collect()
        ]
        a = sorted(map(tuple, idx.query(queries, k=3).collect()))
        b = sorted(map(tuple, loaded.query(queries, k=3).collect()))
        assert a == b
        idx.unpersist()


class TestPersistedQuantizers:
    """save_/load_ for frozen PQ / OPQ / RQ quantizers: bit-exact
    round trips (json shortest-repr floats), kind-checked loaders."""

    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )

    def test_opq_round_trip_bit_exact(self, spark, emb, tmp_path):
        from spark_bestfit_spark.operators.similarity import (
            load_opq,
            opq_encode,
            opq_topk,
            opq_train,
            save_opq,
        )

        rot, books = opq_train(emb, dim=64, m=8, n_codes=16)
        save_opq(spark, str(tmp_path / "opq"), rot, books)
        rot2, books2 = load_opq(spark, str(tmp_path / "opq"))
        assert np.array_equal(rot, rot2)
        assert all(np.array_equal(a, b) for a, b in zip(books, books2))
        # and the reloaded quantizer reproduces queries bit-for-bit
        enc = opq_encode(emb, rot, books).select("vec_id", "pq_code")
        q = [
            (r.vec_id, list(r.embedding))
            for r in emb.filter(F.col("vec_id") < 3).collect()
        ]
        a = sorted(map(tuple, opq_topk(enc, rot, books, q, k=3)
                       .collect()))
        enc2 = opq_encode(emb, rot2, books2).select("vec_id", "pq_code")
        b = sorted(map(tuple, opq_topk(enc2, rot2, books2, q, k=3)
                       .collect()))
        assert a == b

    def test_rq_and_pq_round_trips(self, spark, emb, tmp_path):
        from spark_bestfit_spark.operators.similarity import (
            load_pq,
            load_rq,
            pq_train,
            rq_train,
            save_pq,
            save_rq,
        )

        books_r = rq_train(emb, dim=64, n_levels=2, n_codes=16)
        save_rq(spark, str(tmp_path / "rq"), books_r)
        got_r = load_rq(spark, str(tmp_path / "rq"))
        assert all(np.array_equal(a, b) for a, b in zip(books_r, got_r))

        books_p = pq_train(emb, dim=64, m=8, n_codes=16)
        save_pq(spark, str(tmp_path / "pq"), books_p)
        got_p = load_pq(spark, str(tmp_path / "pq"))
        assert all(np.array_equal(a, b) for a, b in zip(books_p, got_p))

    def test_kind_mismatch_raises(self, spark, emb, tmp_path):
        from spark_bestfit_spark.operators.similarity import (
            load_rq,
            pq_train,
            save_pq,
        )

        books = pq_train(emb, dim=64, m=8, n_codes=16)
        save_pq(spark, str(tmp_path / "pq2"), books)
        with pytest.raises(ValueError, match="kind='pq', expected 'rq'"):
            load_rq(spark, str(tmp_path / "pq2"))
