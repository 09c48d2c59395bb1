"""Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003
— the MOSS local-fingerprinting algorithm) and the shared-fingerprint
near-dup match step.

Load-bearing properties: selected (fingerprint, position) sets must
match a from-scratch python replica including the rightmost-minimum
tie rule; the paper's detection GUARANTEE must hold — any shared
substring of length >= k + window - 1 yields at least one common
selected fingerprint; short-document contracts (fewer than `window`
k-grams → one window; text shorter than `k` → whole-text k-gram) are
part of the oracle surface; the pair step must surface partial
overlap that whole-document resemblance dilutes.
"""

import hashlib
import random
import re
import string

import pytest

from spark_bestfit_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_neardup_pairs,
)


def _h(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:14], 16)


def _winnow_ref(t, k=8, w=4):
    norm = re.sub(r"\s+", " ", t.lower().strip())
    kgs = (
        [norm[i:i + k] for i in range(len(norm) - k + 1)]
        if len(norm) >= k
        else [norm]
    )
    hs = [_h(g) for g in kgs]
    out = set()
    for i in range(max(len(hs) - w + 1, 1)):
        win = hs[i:i + w]
        best_h, best_p = None, None
        for j, hv in enumerate(win):
            if best_h is None or hv <= best_h:
                best_h, best_p = hv, i + j + 1
        out.add((best_h, best_p))
    return out


class TestWinnowFingerprints:
    def test_matches_reference(self, spark):
        rng = random.Random(11)
        texts = {
            i: " ".join(
                "".join(
                    rng.choice(string.ascii_lowercase)
                    for _ in range(rng.randint(2, 9))
                )
                for _ in range(rng.randint(1, 30))
            )
            for i in range(25)
        }
        texts[100] = "short"
        texts[101] = ""
        texts[102] = "  Mixed   CASE\t\ttext  "
        df = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        got = {}
        for r in winnow_fingerprints(df, k=8, window=4).collect():
            got.setdefault(r["doc_id"], set()).add((r["fp"], r["pos"]))
        exp = {i: _winnow_ref(t) for i, t in texts.items()}
        assert got == exp

    def test_shared_substring_guarantee(self, spark):
        """Any shared run of >= k + window - 1 chars yields a common
        fingerprint — the winnowing theorem, on adversarial docs."""
        rng = random.Random(5)
        k, w = 8, 4
        shared = "".join(
            rng.choice(string.ascii_lowercase) for _ in range(k + w - 1)
        )
        def noise(n):
            return "".join(
                rng.choice(string.ascii_lowercase) for _ in range(n)
            )
        df = spark.createDataFrame(
            [(0, noise(50) + shared + noise(50)),
             (1, noise(80) + shared + noise(20))],
            "doc_id long, text string",
        )
        fps = {}
        for r in winnow_fingerprints(df, k=k, window=w).collect():
            fps.setdefault(r["doc_id"], set()).add(r["fp"])
        assert fps[0] & fps[1]

    def test_no_match_below_k(self, spark):
        """Substrings shorter than k can never produce a shared
        fingerprint between otherwise-disjoint alphabets."""
        df = spark.createDataFrame(
            [(0, "abcdefg" * 5), (1, "hijklmn" * 5)],
            "doc_id long, text string",
        )
        fps = {}
        for r in winnow_fingerprints(df, k=8, window=4).collect():
            fps.setdefault(r["doc_id"], set()).add(r["fp"])
        assert not (fps[0] & fps[1])

    def test_partition_invariance(self, spark):
        df = spark.createDataFrame(
            [(i, f"document number {i} with some repeated text payload")
             for i in range(20)],
            "doc_id long, text string",
        )
        a = sorted(
            map(tuple, winnow_fingerprints(df).collect())
        )
        b = sorted(
            map(tuple, winnow_fingerprints(df.repartition(7)).collect())
        )
        assert a == b

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            winnow_fingerprints(df, k=0)
        with pytest.raises(ValueError):
            winnow_fingerprints(df, window=0)


class TestWinnowPairs:
    def test_partial_overlap_detected(self, spark):
        """A copied paragraph inside otherwise-different documents
        produces a pair — the case whole-doc MinHash dilutes."""
        rng = random.Random(9)
        para = " ".join(
            "".join(rng.choice(string.ascii_lowercase)
                    for _ in range(6))
            for _ in range(30)
        )
        def filler(n):
            return " ".join(
                "".join(rng.choice(string.ascii_lowercase)
                        for _ in range(6))
                for _ in range(n)
            )
        df = spark.createDataFrame(
            [(0, filler(100) + " " + para),
             (1, para + " " + filler(100)),
             (2, filler(120))],
            "doc_id long, text string",
        )
        pairs = {
            (r["id_a"], r["id_b"]): r["shared_fps"]
            for r in winnow_neardup_pairs(
                df, min_shared=5
            ).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] >= 5
        assert (0, 2) not in pairs and (1, 2) not in pairs

    def test_viral_fingerprint_capped(self, spark):
        """A fingerprint shared by more docs than max_bucket_size is
        dropped — boilerplate carries no pair signal and must not
        fan out quadratically."""
        df = spark.createDataFrame(
            [(i, "identical boilerplate text everywhere")
             for i in range(12)],
            "doc_id long, text string",
        )
        rows = winnow_neardup_pairs(
            df, min_shared=1, max_bucket_size=5
        ).collect()
        assert rows == []

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            winnow_neardup_pairs(df, min_shared=0)


class TestContainmentPairs:
    def test_quote_detected_where_jaccard_dilutes(self, spark):
        """The asymmetric case: a short doc fully quoted inside a long
        host has containment 1.0 while its Jaccard shrinks with host
        size — the pair must survive a threshold Jaccard would miss."""
        from spark_bestfit_spark.operators.dedup import (
            containment_pairs,
        )

        quote = "to be or not to be that is the question of the ages"
        host = (
            "many words come before the quotation "
            + quote
            + " and then a long tail of completely unrelated filler"
            " words extends the host document far beyond the quote"
        )
        df = spark.createDataFrame(
            [(0, quote), (1, host), (2, "entirely different text here"
                                        " about query optimizers")],
            "doc_id long, text string",
        )
        rows = {
            (r["id_a"], r["id_b"]): r
            for r in containment_pairs(df, threshold=0.9).collect()
        }
        assert (0, 1) in rows
        r = rows[(0, 1)]
        assert r["containment_a"] == 1.0
        # Jaccard = inter/union is well below the threshold
        assert r["n_common"] / (
            r["size_a"] + r["size_b"] - r["n_common"]
        ) < 0.9
        assert len(rows) == 1

    def test_matches_reference(self, spark):
        import random

        from spark_bestfit_spark.operators.dedup import (
            containment_pairs,
        )

        rng = random.Random(13)
        vocab = [f"w{i}" for i in range(40)]
        texts = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30)))
            for i in range(20)
        }
        df = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )

        def sh(t, k=3):
            ws = t.lower().strip().split()
            if len(ws) >= k:
                return {
                    " ".join(ws[i:i + k])
                    for i in range(len(ws) - k + 1)
                }
            return {" ".join(ws)}

        exp = {}
        ids = sorted(texts)
        for i in ids:
            for j in ids:
                if i >= j:
                    continue
                a, b = sh(texts[i]), sh(texts[j])
                inter = len(a & b)
                ca = round(inter / len(a), 6)
                cb = round(inter / len(b), 6)
                if inter and (ca >= 0.2 or cb >= 0.2):
                    exp[(i, j)] = (inter, len(a), len(b), ca, cb)
        got = {
            (r["id_a"], r["id_b"]): (
                r["n_common"], r["size_a"], r["size_b"],
                r["containment_a"], r["containment_b"],
            )
            for r in containment_pairs(df, threshold=0.2).collect()
        }
        assert got == exp

    def test_validation(self, spark):
        from spark_bestfit_spark.operators.dedup import (
            containment_pairs,
        )

        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            containment_pairs(df, threshold=0.0)


class TestCorpusDiff:
    def test_all_statuses(self, spark):
        from spark_bestfit_spark.operators.pipeline import corpus_diff

        old = spark.createDataFrame(
            [(0, "alpha beta"), (1, "gamma delta"), (2, "stays put")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, "gamma CHANGED"), (2, "Stays   PUT"), (3, "brand new")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["status"]
            for r in corpus_diff(old, new).collect()
        }
        # normalization: case/whitespace churn is NOT a change
        assert got == {
            0: "removed", 1: "changed", 2: "unchanged", 3: "added"
        }

    def test_fingerprints_present(self, spark):
        from spark_bestfit_spark.operators.pipeline import corpus_diff

        old = spark.createDataFrame(
            [(0, "a")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(1, "b")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in corpus_diff(old, new).collect()}
        assert rows[0]["old_fp"] and rows[0]["new_fp"] is None
        assert rows[1]["new_fp"] and rows[1]["old_fp"] is None
