"""BPE vocabulary (token -> id) relation and token-id encoding.

Load-bearing properties: ids are contiguous from 0 with base
characters in sorted order followed by merged tokens in merge-rank
order (the HF/tiktoken artifact shape); duplicate merged strings keep
the FIRST rank's id; bpe_encode_ids is exactly bpe_encode's token
sequence mapped through the vocabulary (position order preserved);
tokens outside the shipped vocabulary map to -1 and are counted
(the byte-fallback seam), while the training corpus itself is closed
(n_unk == 0 everywhere).
"""

import pyspark.sql.functions as F
import pytest

from spark_bestfit_spark.operators.textstats import (
    bpe_encode,
    bpe_encode_ids,
    bpe_learn,
    bpe_vocab,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "low lower lowest new newer newest"),
            (1, "low low new slow slower"),
            (2, "the newest slowest lowest low"),
        ],
        "doc_id long, text string",
    )


class TestBpeVocab:
    def test_shape_and_order(self, spark, corpus):
        merges = bpe_learn(corpus, n_merges=5)
        rows = sorted(
            bpe_vocab(corpus, merges).collect(),
            key=lambda r: r["token_id"],
        )
        ids = [r["token_id"] for r in rows]
        assert ids == list(range(len(rows)))  # contiguous from 0
        base = [r for r in rows if r["kind"] == "base"]
        merged = [r for r in rows if r["kind"] == "merged"]
        # base = sorted distinct chars of the corpus word types
        chars = sorted(
            {c for _, t in corpus.collect() for w in t.split() for c in w}
        )
        assert [r["token"] for r in base] == chars
        # merged tokens follow in merge-rank order, after all base ids
        assert [r["token"] for r in merged] == [
            a + b for a, b, _ in merges
        ]
        assert min(r["token_id"] for r in merged) == len(base)

    def test_duplicate_merged_string_keeps_first_rank(self, spark):
        df = spark.createDataFrame(
            [(0, "abc abc ab bc a b c")], "doc_id long, text string"
        )
        # ranks 3 and 4 both produce "abc" — first wins, no dup row
        merges = [("a", "b"), ("b", "c"), ("ab", "c"), ("a", "bc")]
        rows = bpe_vocab(df, merges).collect()
        abc = [r for r in rows if r["token"] == "abc"]
        assert len(abc) == 1
        tokens = [r["token"] for r in rows]
        assert len(tokens) == len(set(tokens))
        # "abc" (rank 3) ids before any rank-4-only token would
        merged = sorted(
            (r for r in rows if r["kind"] == "merged"),
            key=lambda r: r["token_id"],
        )
        assert [r["token"] for r in merged] == ["ab", "bc", "abc"]

    def test_empty_merge_table(self, spark, corpus):
        rows = bpe_vocab(corpus, []).collect()
        assert all(r["kind"] == "base" for r in rows)
        assert len(rows) > 0


class TestBpeEncodeIds:
    def test_ids_are_encode_through_vocab(self, spark, corpus):
        merges = bpe_learn(corpus, n_merges=6)
        v = {
            r["token"]: r["token_id"]
            for r in bpe_vocab(corpus, merges).collect()
        }
        enc = {
            r["word"]: list(r["tokens"])
            for r in bpe_encode(corpus, merges).collect()
        }
        got = {
            r["word"]: (list(r["token_ids"]), r["n_unk"])
            for r in bpe_encode_ids(corpus, merges).collect()
        }
        assert set(got) == set(enc)
        for w, toks in enc.items():
            assert got[w] == ([v[t] for t in toks], 0)

    def test_oov_maps_to_minus_one(self, spark, corpus):
        merges = bpe_learn(corpus, n_merges=5)
        v = bpe_vocab(corpus, merges)
        new = spark.createDataFrame(
            [(0, "xyzq low")], "doc_id long, text string"
        )
        got = {
            r["word"]: (list(r["token_ids"]), r["n_unk"])
            for r in bpe_encode_ids(new, merges, vocab=v).collect()
        }
        ids, n_unk = got["xyzq"]
        assert n_unk == len([i for i in ids if i == -1]) > 0
        assert got["low"][1] == 0  # in-vocab word: closed

    def test_partition_invariance(self, spark, corpus):
        merges = bpe_learn(corpus, n_merges=5)
        a = sorted(
            bpe_encode_ids(corpus, merges).collect(),
            key=lambda r: r["word"],
        )
        b = sorted(
            bpe_encode_ids(corpus.repartition(7), merges).collect(),
            key=lambda r: r["word"],
        )
        assert [
            (r["word"], list(r["token_ids"]), r["n_unk"]) for r in a
        ] == [(r["word"], list(r["token_ids"]), r["n_unk"]) for r in b]


class TestBpeDecodeIds:
    def test_roundtrip_lossless(self, spark, corpus):
        """decode(encode(word)) == word for every type, with zero
        undecodable ids — the artifact's losslessness certificate."""
        from spark_bestfit_spark.operators.textstats import (
            bpe_decode_ids,
        )

        merges = bpe_learn(corpus, n_merges=6)
        v = bpe_vocab(corpus, merges)
        ids = bpe_encode_ids(corpus, merges, vocab=v)
        dec = bpe_decode_ids(ids, v).collect()
        assert dec, "no rows decoded"
        for r in dec:
            assert r["decoded"] == r["word"]
            assert r["n_undecodable"] == 0

    def test_unknown_ids_counted(self, spark, corpus):
        from spark_bestfit_spark.operators.textstats import (
            bpe_decode_ids,
        )

        merges = bpe_learn(corpus, n_merges=5)
        v = bpe_vocab(corpus, merges)
        fake = spark.createDataFrame(
            [("xq", [0, -1, 99999])],
            "word string, token_ids array<long>",
        )
        r = bpe_decode_ids(fake, v).collect()[0]
        assert r["n_undecodable"] == 2
