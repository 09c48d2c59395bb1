"""Tests for the end-to-end corpus curation pipeline."""

from __future__ import annotations

import pytest

from spark_bestfit_spark.operators.pipeline import curate_corpus


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
