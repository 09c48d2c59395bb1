"""Exact cross-document duplicate-span detection (the substring-level
dedup): hand-built span geometry, island splitting, posting-guard
behavior, and partitioning invariance."""

from __future__ import annotations

import pytest

from spark_bestfit_spark.operators.dedup import (
    duplicate_spans,
    edit_distance_pairs,
)


def _lev(a, b):
    """Reference DP Levenshtein for the cross-check."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


class TestDuplicateSpans:
    def test_exact_span_geometry(self, spark):
        shared = _words("s", 12)  # 12-token verbatim span
        df = _mk(spark, [
            (1, _words("a", 4) + " " + shared + " " + _words("b", 3)),
            (2, _words("c", 7) + " " + shared),
            (3, _words("z", 30)),  # unrelated
        ])
        rows = duplicate_spans(df, k=5, min_len=10).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["doc_a"], r["doc_b"]) == (1, 2)
        assert r["start_a"] == 4 and r["start_b"] == 7
        assert r["span_tokens"] == 12

    def test_two_islands_on_one_diagonal(self, spark):
        # same diagonal (equal offsets) but a gap between two runs:
        # must come out as TWO spans, not one merged 25-token span
        run1, run2 = _words("p", 10), _words("q", 10)
        mid_a, mid_b = "xxa1 xxa2 xxa3", "yyb1 yyb2 yyb3"
        df = _mk(spark, [
            (1, run1 + " " + mid_a + " " + run2),
            (2, run1 + " " + mid_b + " " + run2),
        ])
        rows = sorted(
            (r["start_a"], r["start_b"], r["span_tokens"])
            for r in duplicate_spans(df, k=5, min_len=8).collect()
        )
        assert rows == [(0, 0, 10), (13, 13, 10)]

    def test_repeated_span_in_one_doc(self, spark):
        shared = _words("r", 10)
        df = _mk(spark, [
            (1, shared),
            (2, shared + " " + _words("m", 5) + " " + shared),
        ])
        rows = sorted(
            (r["start_a"], r["start_b"], r["span_tokens"])
            for r in duplicate_spans(df, k=5, min_len=10).collect()
        )
        assert rows == [(0, 0, 10), (0, 15, 10)]

    def test_posting_guard_suppresses_hot_shingles(self, spark):
        # the same 10-token banner in 30 docs: with max_posting=10 the
        # banner's shingles are dropped and NO quadratic pair output
        banner = _words("h", 10)
        df = _mk(
            spark,
            [(i, banner + f" tail{i}x tail{i}y") for i in range(30)],
        )
        assert (
            duplicate_spans(df, k=5, min_len=10, max_posting=10).count()
            == 0
        )
        # raising the cap above the corpus frequency surfaces them all
        assert (
            duplicate_spans(df, k=5, min_len=10, max_posting=100).count()
            == 30 * 29 // 2
        )

    def test_partitioning_invariant(self, spark):
        shared = _words("s", 15)
        rows = [(i, _words(f"u{i}_", 6) + " " + shared) for i in range(6)]
        base = None
        for parts in (1, 8):
            df = _mk(spark, rows).repartition(parts)
            got = sorted(
                tuple(r)
                for r in duplicate_spans(df, k=4, min_len=12).collect()
            )
            if base is None:
                base = got
            else:
                assert got == base
        assert len(base) == 15  # all C(6,2) pairs share the span

    def test_short_docs_and_validation(self, spark):
        df = _mk(spark, [(1, "a b c"), (2, "a b c")])
        # 3 tokens < k=5: no shingles, no crash
        assert duplicate_spans(df, k=5, min_len=10).count() == 0
        with pytest.raises(ValueError, match="k must"):
            duplicate_spans(df, k=0)
        with pytest.raises(ValueError, match="min_len"):
            duplicate_spans(df, k=5, min_len=3)
        with pytest.raises(ValueError, match="max_posting"):
            duplicate_spans(df, max_posting=1)

    def test_plan_windows_hash_partitioned(self, spark):
        df = _mk(spark, [(1, _words("a", 20)), (2, _words("a", 20))])
        plan = (
            duplicate_spans(df, k=5, min_len=10)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SinglePartition" not in plan


class TestEditDistancePairs:
    @staticmethod
    def _corpus(seed=11, n=40):
        import numpy as np

        rng = np.random.default_rng(seed)
        alpha = list("abcdefgh ")
        docs = []
        base = "".join(rng.choice(alpha, 60))
        for i in range(n):
            if i % 4 == 0:
                # near-dup of base: a few random point edits
                s = list(base)
                for _ in range(rng.integers(0, 5)):
                    s[rng.integers(0, len(s))] = rng.choice(alpha)
                docs.append((i, "".join(s)))
            else:
                docs.append((i, "".join(rng.choice(alpha, 60))))
        return docs

    def test_matches_brute_force(self, spark):
        docs = self._corpus()
        df = spark.createDataFrame(docs, "doc_id long, text string")
        md = 8
        got = sorted(
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(df, max_dist=md).collect()
        )
        exp = []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                d = _lev(docs[i][1], docs[j][1])
                if d <= md:
                    exp.append((docs[i][0], docs[j][0], d))
        assert got == sorted(exp)
        assert len(exp) >= 3  # the planted near-dups are found

    def test_length_band_prunes_but_never_loses(self, spark):
        # widely different lengths can never be within max_dist
        docs = [(1, "a" * 10), (2, "a" * 200), (3, "a" * 12)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {(r["id_a"], r["id_b"]): r["dist"]
               for r in edit_distance_pairs(df, max_dist=5).collect()}
        assert got == {(1, 3): 2}

    def test_block_guard_and_validation(self, spark):
        docs = [(i, "same length text!") for i in range(20)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        assert (
            edit_distance_pairs(df, max_dist=5, max_block_size=10).count()
            == 0
        )
        assert (
            edit_distance_pairs(df, max_dist=5).count() == 20 * 19 // 2
        )
        with pytest.raises(ValueError, match="max_dist"):
            edit_distance_pairs(df, max_dist=0)


class TestClipDuplicateSpans:
    def test_shared_span_removed_unique_kept(self, spark):
        from spark_bestfit_spark.operators.dedup import (
            clip_duplicate_spans,
        )

        shared = "one two three four"  # the 4-gram both docs carry
        rows = [
            (0, f"alpha {shared} omega"),
            (1, f"beta gamma {shared} delta"),
            (2, "entirely unique words in this document"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in clip_duplicate_spans(df, n=4, min_docs=2).collect()
        }
        assert out[0].clipped_text == "alpha omega"
        assert out[0].n_words == 6 and out[0].n_removed == 4
        assert out[1].clipped_text == "beta gamma delta"
        assert out[2].clipped_text == rows[2][1]  # untouched
        assert out[2].n_removed == 0

    def test_overlapping_spans_union_coverage(self, spark):
        """Two duplicated grams overlapping by n-1 words must clip the
        UNION of their positions, not double-count."""
        from spark_bestfit_spark.operators.dedup import (
            clip_duplicate_spans,
        )

        run = "a b c d e"  # both 4-grams (a..d) and (b..e) duplicated
        rows = [(0, f"x {run} y"), (1, f"p {run} q")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in clip_duplicate_spans(df, n=4, min_docs=2).collect()
        }
        assert out[0].clipped_text == "x y"
        assert out[0].n_removed == 5

    def test_case_insensitive_matching_preserves_case(self, spark):
        from spark_bestfit_spark.operators.dedup import (
            clip_duplicate_spans,
        )

        rows = [
            (0, "KEEP One Two Three Four TAIL"),
            (1, "one two three four"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in clip_duplicate_spans(df, n=4, min_docs=2).collect()
        }
        assert out[0].clipped_text == "KEEP TAIL"  # original case kept
        assert out[1].clipped_text == ""

    def test_short_docs_pass_through(self, spark):
        from spark_bestfit_spark.operators.dedup import (
            clip_duplicate_spans,
        )

        rows = [(0, "too short"), (1, "too short"), (2, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in clip_duplicate_spans(df, n=4, min_docs=2).collect()
        }
        for i in range(3):
            assert out[i].n_removed == 0
        assert out[0].clipped_text == "too short"

    def test_partitioning_invariance(self, spark):
        from spark_bestfit_spark.operators.dedup import (
            clip_duplicate_spans,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(200)
        a = sorted(map(tuple,
                       clip_duplicate_spans(docs, n=6).collect()))
        b = sorted(map(tuple,
                       clip_duplicate_spans(docs.repartition(13),
                                            n=6).collect()))
        assert a == b

    def test_long_fully_duplicated_doc_is_linear(self, spark):
        """The quadratic-rebuild catcher: a pair of identical 20k-word
        documents puts EVERY position in the covered set; the old
        array_contains-per-word rebuild was O(n^2) = 4e8 comparisons
        per doc here, the run/range rebuild is O(n). Wall-clock bound
        is generous (CI noise) but the quadratic blew far past it."""
        import time

        from spark_bestfit_spark.operators.dedup import (
            clip_duplicate_spans,
        )

        words = " ".join(f"w{i % 977}x{i % 31}" for i in range(20_000))
        df = spark.createDataFrame(
            [(0, words), (1, words)], "doc_id long, text string"
        )
        t0 = time.time()
        out = {
            r.doc_id: r
            for r in clip_duplicate_spans(df, n=6, min_docs=2).collect()
        }
        elapsed = time.time() - t0
        for i in (0, 1):
            assert out[i].n_words == 20_000
            assert out[i].n_removed == 20_000
            assert out[i].clipped_text == ""
        assert elapsed < 60, f"rebuild took {elapsed:.1f}s — quadratic?"

    def test_interleaved_coverage_runs(self, spark):
        """Multiple disjoint covered runs inside one doc: the run/range
        complement must rebuild exactly the uncovered words, in order."""
        from spark_bestfit_spark.operators.dedup import (
            clip_duplicate_spans,
        )

        dup1 = "alpha beta gamma delta"
        dup2 = "eps zeta eta theta"
        doc0 = f"HEAD {dup1} MID1 MID2 {dup2} TAIL"
        rows = [(0, doc0), (1, dup1), (2, dup2)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in clip_duplicate_spans(df, n=4, min_docs=2).collect()
        }
        assert out[0].clipped_text == "HEAD MID1 MID2 TAIL"
        assert out[0].n_removed == 8
        assert out[1].clipped_text == ""
        assert out[2].clipped_text == ""
