"""BPE pair statistics / vocab coverage / Mann-Kendall trend.

The load-bearing properties: bpe_learn must reproduce the greedy
reference BPE trainer merge-for-merge (same tie-breaks); vocab_coverage
must be exact from the count-class relation alone (no type ordering);
mann_kendall must match a brute-force pairwise computation.
"""

import datetime
import random

import numpy as np
import pyspark.sql.functions as F
import pytest

from spark_bestfit_spark.operators.events import mann_kendall
from spark_bestfit_spark.operators.textstats import (
    bpe_learn,
    bpe_pair_stats,
    vocab_coverage,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestBpePairStats:
    def test_hand_computed(self, spark):
        df = _docs(spark, ["aa ab", "ab"])
        rows = bpe_pair_stats(df, "text", k=5).collect()
        got = [(r.rank, r.pair, r.weight) for r in rows]
        assert got == [(1, "ab", 2), (2, "aa", 1)]

    def test_tie_break_by_pair_text(self, spark):
        df = _docs(spark, ["xy ab"])
        rows = bpe_pair_stats(df, "text", k=5).collect()
        assert [(r.rank, r.pair) for r in rows] == [(1, "ab"), (2, "xy")]

    def test_k_limits(self, spark):
        df = _docs(spark, ["abcd"])
        assert bpe_pair_stats(df, "text", k=2).count() == 2
        with pytest.raises(ValueError):
            bpe_pair_stats(df, "text", k=0)

    def test_single_char_words_contribute_nothing(self, spark):
        df = _docs(spark, ["a b c"])
        assert bpe_pair_stats(df, "text", k=5).count() == 0


def _reference_bpe(word_counts, n_merges):
    """Greedy reference trainer with the operator's exact tie-break:
    (weight desc, left+SEP+right asc)."""
    SEP = "\x1f"
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + c
                )
        if not pairs:
            break
        (a, b), w = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + SEP + kv[0][1])
        )
        merges.append((a, b, w))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


class TestBpeLearn:
    def test_matches_reference_trainer(self, spark):
        rng = random.Random(31)
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
            for _ in range(300)
        ]
        df = _docs(spark, [" ".join(words[i::10]) for i in range(10)])
        got = bpe_learn(df, "text", n_merges=6)
        from collections import Counter

        want = _reference_bpe(Counter(words), 6)
        assert got == want

    def test_merged_symbols_compound(self, spark):
        # "aaaa" x3: merge 1 = (a, a); merge 2 must pair the MERGED
        # symbol with itself — proof the rewrite feeds later rounds
        df = _docs(spark, ["aaaa aaaa aaaa"])
        got = bpe_learn(df, "text", n_merges=2)
        # pair counting sees ALL adjacent occurrences (3 per word);
        # the rewrite is greedy non-overlapping, so round 2 pairs the
        # two merged "aa" symbols
        assert got == [("a", "a", 9), ("aa", "aa", 3)]

    def test_zero_merges(self, spark):
        df = _docs(spark, ["abc abc"])
        assert bpe_learn(df, "text", n_merges=0) == []
        with pytest.raises(ValueError):
            bpe_learn(df, "text", n_merges=-1)


class TestVocabCoverage:
    def test_hand_computed(self, spark):
        df = _docs(spark, ["a a a a b b c d"])
        rows = {
            r.coverage_target: r
            for r in vocab_coverage(
                df, "text", targets=(0.5, 0.75, 0.9)
            ).collect()
        }
        assert rows[0.5].types_needed == 1
        assert rows[0.5].tokens_covered == 4
        assert rows[0.5].share_covered == 0.5
        assert rows[0.75].types_needed == 2
        assert rows[0.75].tokens_covered == 6
        # 0.9 of 8 = 7.2 -> a(4) + b(2) + 2 singletons
        assert rows[0.9].types_needed == 4
        assert rows[0.9].tokens_covered == 8
        assert rows[0.9].total_types == 4
        assert rows[0.9].total_tokens == 8

    def test_full_coverage_target(self, spark):
        df = _docs(spark, ["x y z x"])
        (row,) = vocab_coverage(df, "text", targets=(1.0,)).collect()
        assert row.types_needed == 3
        assert row.tokens_covered == 4
        assert row.share_covered == 1.0

    def test_validation_and_empty(self, spark):
        df = _docs(spark, [])
        assert vocab_coverage(df, "text").count() == 0
        with pytest.raises(ValueError):
            vocab_coverage(_docs(spark, ["a"]), "text", targets=(0.0,))

    def test_partitioning_invariance(self, spark):
        texts = ["alpha beta gamma " * 5, "beta gamma " * 9, "alpha"]
        a = vocab_coverage(_docs(spark, texts), "text").collect()
        b = vocab_coverage(
            _docs(spark, texts).repartition(7), "text"
        ).collect()
        key = lambda r: r.coverage_target  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, value double, event_type string"
    )


def _mk_brute(series):
    v = np.array([x for _, x in series], dtype=float)
    t = np.array([d for d, _ in series], dtype=float)
    n = len(v)
    iu = np.triu_indices(n, k=1)
    dv = (v[None, :] - v[:, None])[iu]
    dt = (t[None, :] - t[:, None])[iu]
    s = int(np.sign(dv).sum())
    _, tc = np.unique(v, return_counts=True)
    tt = float((tc * (tc - 1) * (2 * tc + 5)).sum())
    var_s = (n * (n - 1) * (2 * n + 5) - tt) / 18.0
    if var_s > 0:
        z = (
            (s - 1) / np.sqrt(var_s)
            if s > 0
            else ((s + 1) / np.sqrt(var_s) if s < 0 else 0.0)
        )
        z = round(float(z), 6)
    else:
        z = None
    return s, round(var_s, 6), z, round(float(np.median(dv / dt)), 6)


class TestMannKendall:
    def _daily(self, spark, values, event_type="t"):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (base + datetime.timedelta(days=i), float(x), event_type)
            for i, x in enumerate(values)
        ]
        return _events(spark, rows)

    def test_strictly_increasing(self, spark):
        df = self._daily(spark, [2.0 * i for i in range(10)])
        (row,) = mann_kendall(df, "ts", "value", "event_type").collect()
        assert row.s == 45  # n(n-1)/2
        assert row.z > 0
        assert row.sen_slope == 2.0
        assert row.n_buckets == 10

    def test_constant_series_degenerate(self, spark):
        df = self._daily(spark, [5.0] * 8)
        (row,) = mann_kendall(df, "ts", "value", "event_type").collect()
        assert row.s == 0
        assert row.var_s == 0.0
        assert row.z is None
        assert row.sen_slope == 0.0

    def test_matches_brute_force_with_ties(self, spark):
        rng = random.Random(7)
        values = [round(rng.choice([1.0, 2.0, 3.0, 4.5]), 6) for _ in range(25)]
        df = self._daily(spark, values)
        (row,) = mann_kendall(df, "ts", "value", "event_type").collect()
        s, var_s, z, sen = _mk_brute(list(enumerate(values)))
        assert (row.s, row.var_s, row.z, row.sen_slope) == (s, var_s, z, sen)

    def test_groups_independent(self, spark):
        up = self._daily(spark, [1.0, 2.0, 3.0, 4.0], "up")
        down = self._daily(spark, [4.0, 3.0, 2.0, 1.0], "down")
        rows = {
            r.group: r
            for r in mann_kendall(
                up.unionAll(down), "ts", "value", "event_type"
            ).collect()
        }
        assert rows["up"].s == 6 and rows["down"].s == -6
        assert rows["up"].sen_slope == 1.0
        assert rows["down"].sen_slope == -1.0

    def test_intraday_rows_average_into_buckets(self, spark):
        base = datetime.datetime(2024, 3, 1)
        rows = []
        for i in range(6):
            for off, v in ((0, 1.0), (3600, 3.0)):  # mean 2.0 + i
                rows.append(
                    (
                        base
                        + datetime.timedelta(days=i, seconds=off),
                        v + i,
                        "t",
                    )
                )
        df = _events(spark, rows)
        (row,) = mann_kendall(df, "ts", "value", "event_type").collect()
        assert row.n_buckets == 6
        assert row.sen_slope == 1.0


from spark_bestfit_spark.operators.events import holt_backtest  # noqa: E402


def _holt_brute(values, a=0.5, bt=0.3):
    v = [float(x) for x in values]
    l, b = v[0], 0.0
    err = err_n = 0.0
    for t in range(1, len(v)):
        err += abs(v[t] - (l + b))
        err_n += abs(v[t] - v[t - 1])
        l_new = a * v[t] + (1 - a) * (l + b)
        b = bt * (l_new - l) + (1 - bt) * b
        l = l_new
    n = len(v) - 1
    mae, mae_n = err / n, err_n / n
    skill = round(1.0 - mae / mae_n, 6) if mae_n > 0 else None
    return n, round(mae, 6), round(mae_n, 6), skill


class TestHoltBacktest:
    def _daily(self, spark, values, g="t"):
        base = datetime.datetime(2024, 2, 1)
        rows = [
            (base + datetime.timedelta(days=i), float(v), g)
            for i, v in enumerate(values)
        ]
        return spark.createDataFrame(
            rows, "ts timestamp, value double, event_type string"
        )

    def test_trend_beats_naive(self, spark):
        df = self._daily(spark, [2.0 * i for i in range(30)])
        (r,) = holt_backtest(df, "ts", "value", "event_type").collect()
        assert r.skill > 0.3  # trend model crushes "yesterday again"
        assert r.n_evals == 29

    def test_matches_reference_recursion(self, spark):
        rng = random.Random(19)
        values = [round(rng.uniform(0, 20), 3) for _ in range(40)]
        df = self._daily(spark, values)
        (r,) = holt_backtest(df, "ts", "value", "event_type").collect()
        n, mae, mae_n, skill = _holt_brute(values)
        assert (r.n_evals, r.mae, r.mae_naive1, r.skill) == (
            n, mae, mae_n, skill,
        )

    def test_constant_series_null_skill(self, spark):
        df = self._daily(spark, [7.0] * 10)
        (r,) = holt_backtest(df, "ts", "value", "event_type").collect()
        assert r.mae == 0.0 and r.skill is None

    def test_short_series_and_validation(self, spark):
        df = self._daily(spark, [1.0])
        (r,) = holt_backtest(df, "ts", "value", "event_type").collect()
        assert r.n_evals == 0 and r.mae is None
        with pytest.raises(ValueError):
            holt_backtest(df, "ts", "value", alpha=0.0)


from spark_bestfit_spark.operators.textstats import (  # noqa: E402
    heaps_law,
    vocab_richness,
)


class TestVocabRichness:
    def test_hand_computed(self, spark):
        # counts: a:3, b:2, c:1, d:1 -> D=4, N=7, f1=2, f2=1
        df = _docs(spark, ["a a a b", "b c d"])
        (r,) = vocab_richness(df, "text").collect()
        assert (r.observed_types, r.n_tokens, r.f1, r.f2) == (4, 7, 2, 1)
        assert r.chao1 == round(4 + 2 * 1 / (2 * 2), 6)  # 4.5
        assert r.unseen_mass == round(2 / 7, 6)
        assert r.coverage == round(1 - 2 / 7, 6)

    def test_no_singletons_full_coverage(self, spark):
        df = _docs(spark, ["x x y y"])
        (r,) = vocab_richness(df, "text").collect()
        assert r.f1 == 0
        assert r.chao1 == float(r.observed_types)
        assert r.coverage == 1.0

    def test_chao1_lower_bounds_true_vocab(self, spark):
        rng = random.Random(4)
        # zipf-ish draws from a 400-type vocabulary
        vocab = [f"w{i}" for i in range(400)]
        weights = [1.0 / (i + 1) for i in range(400)]
        texts = [
            " ".join(rng.choices(vocab, weights=weights, k=80))
            for _ in range(40)
        ]
        (r,) = vocab_richness(_docs(spark, texts), "text").collect()
        assert r.observed_types < 400
        assert r.chao1 > r.observed_types  # predicts unseen types


class TestHeapsLaw:
    def test_power_law_corpus_recovers_beta(self, spark):
        rng = random.Random(9)
        vocab = [f"w{i}" for i in range(5000)]
        weights = [1.0 / (i + 1) for i in range(5000)]
        texts = [
            " ".join(rng.choices(vocab, weights=weights, k=60))
            for _ in range(300)
        ]
        (r,) = heaps_law(_docs(spark, texts), "text").collect()
        assert 0.3 < r.beta < 0.95
        assert r.r2 > 0.95  # Heaps is a good fit for zipfian text
        assert r.n_docs == 300
        assert r.n_types <= 5000

    def test_saturated_vocab_flat_beta(self, spark):
        df = _docs(spark, ["a b c"] * 50)
        (r,) = heaps_law(df, "text", checkpoints=10).collect()
        assert r.n_types == 3
        assert r.beta is not None and abs(r.beta) < 0.2

    def test_validation_and_empty(self, spark):
        df = _docs(spark, [])
        (r,) = heaps_law(df, "text").collect()
        assert r.n_docs == 0 and r.beta is None
        with pytest.raises(ValueError):
            heaps_law(_docs(spark, ["a"]), "text", checkpoints=2)


class TestBpeMergeTable:
    def test_relation_matches_learned_list(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            bpe_merge_table,
        )

        df = _docs(spark, ["aaaa aaaa aaaa", "abab abab"])
        rows = bpe_merge_table(df, "text", n_merges=3).collect()
        want = bpe_learn(df, "text", n_merges=3)
        assert [(r.left, r.right, r.weight) for r in rows] == want
        assert [r.merge_rank for r in rows] == [1, 2, 3]
        for r in rows:
            assert r.merged == r.left + r.right

    def test_partition_invariance(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            bpe_merge_table,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(200)
        a = [tuple(r) for r in bpe_merge_table(docs, n_merges=5).collect()]
        b = [
            tuple(r)
            for r in bpe_merge_table(
                docs.repartition(13), n_merges=5
            ).collect()
        ]
        assert a == b
