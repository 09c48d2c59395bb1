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
