"""Round-12 extension operators: cross-corpus Kneser-Ney document
scoring (the CCNet-style quality filter), per-group certified-
approximate 1-Wasserstein, and semantic keeper-snapshot compaction.

Load-bearing properties: KN doc scores must match a from-scratch
python replica bigram-for-bigram (including OOV backoff paths, which
the self-scoring operators never exercise); the smoothed continuation
distribution must be proper (sums to 1 over vocab + OOV bucket); the
grouped approx-W1 must sandwich each group's exact W1 within its own
certified bound; keeper compaction must restore the one-row-per-keeper
invariant and leave incremental semantic dedup's output unchanged.
"""

import math
import random
from collections import Counter

import numpy as np
import pyspark.sql.functions as F
import pytest

from spark_bestfit_spark.operators.similarity import (
    IvfIndex,
    compact_keeper_snapshot,
    incremental_semantic_dedup,
)
from spark_bestfit_spark.operators.stats import (
    wasserstein_approx_by_group,
    wasserstein_by_group,
)
from spark_bestfit_spark.operators.textstats import kn_doc_logprob


def _kn_score_reference(ref_texts, tgt_docs, d=0.75):
    """From-scratch KN scorer: P(w2|w1) with continuation backoff and
    the add-one-smoothed P1+ (proper over vocab + one OOV bucket)."""
    refpairs = []
    for t in ref_texts:
        ws = [w for w in t.lower().strip().split() if w]
        refpairs += list(zip(ws, ws[1:]))
    c12 = Counter(refpairs)
    c1 = Counter(w1 for w1, _ in refpairs)
    fw, bw = Counter(), Counter()
    for (w1, w2) in c12:
        fw[w1] += 1
        bw[w2] += 1
    types, vref = len(c12), len(bw)

    def pcont1(w2):
        return (bw.get(w2, 0) + 1.0) / (types + vref + 1.0)

    def p(w1, w2):
        if w1 in c1:
            return (
                max(c12.get((w1, w2), 0) - d, 0.0) / c1[w1]
                + (d * fw[w1] / c1[w1]) * pcont1(w2)
            )
        return pcont1(w2)

    out = {}
    for did, t in tgt_docs:
        ws = [w for w in t.lower().strip().split() if w]
        prs = list(zip(ws, ws[1:]))
        if not prs:
            continue
        unseen = sum(1 for pr in prs if pr not in c12)
        mean = sum(math.log(p(a, b)) for a, b in prs) / len(prs)
        out[did] = (len(prs), unseen, round(mean, 6))
    return out


class TestKnDocLogprob:
    def _corpora(self, spark, seed=23):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        ref_texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40)))
            for _ in range(60)
        ]
        # target mixes in-vocab phrasing with OOV words so every
        # backoff branch fires: seen bigram / unseen bigram with seen
        # context / unseen context / fully-OOV pair
        tgt_docs = [
            (i, " ".join(
                rng.choice(vocab + ["zzq", "xxv", "qqj"])
                for _ in range(rng.randint(2, 25))
            ))
            for i in range(40)
        ] + [(100, ref_texts[0]), (101, "solo"), (102, "")]
        ref = spark.createDataFrame(
            [(i, t) for i, t in enumerate(ref_texts)],
            "doc_id long, text string",
        )
        tgt = spark.createDataFrame(tgt_docs, "doc_id long, text string")
        return ref_texts, tgt_docs, ref, tgt

    def test_matches_reference(self, spark):
        ref_texts, tgt_docs, ref, tgt = self._corpora(spark)
        got = {
            r["doc_id"]: (r["n_bigrams"], r["n_unseen"], r["mean_kn_logprob"])
            for r in kn_doc_logprob(tgt, ref).collect()
        }
        exp = _kn_score_reference(ref_texts, tgt_docs)
        assert got == exp
        # the degenerate docs (1 token / empty) dropped out
        assert 101 not in got and 102 not in got
        # OOV branches actually fired somewhere
        assert any(v[1] > 0 for v in got.values())
        assert got[100][1] == 0  # verbatim ref doc: every bigram seen

    def test_proper_distribution(self, spark):
        """sum_w2 P(w2|w1) over vocab + OOV bucket == 1 for seen and
        unseen contexts — no probability mass is leaked or invented."""
        ref_texts, _, ref, _ = self._corpora(spark)
        refpairs = []
        for t in ref_texts:
            ws = t.lower().split()
            refpairs += list(zip(ws, ws[1:]))
        c12 = Counter(refpairs)
        vocab = sorted({w for pr in c12 for w in pr})
        for ctx in [vocab[0], "neverseen"]:
            probes = [(i, f"{ctx} {w}") for i, w in enumerate(vocab)]
            probes.append((len(vocab), f"{ctx} __oov__"))
            tgt = spark.createDataFrame(probes, "doc_id long, text string")
            rows = kn_doc_logprob(tgt, ref).collect()
            s = sum(math.exp(r["mean_kn_logprob"]) for r in rows)
            assert s == pytest.approx(1.0, abs=1e-4)

    def test_partition_invariance(self, spark):
        _, _, ref, tgt = self._corpora(spark)
        base = sorted(
            kn_doc_logprob(tgt, ref).collect(), key=lambda r: r["doc_id"]
        )
        shuffled = sorted(
            kn_doc_logprob(tgt.repartition(7), ref.repartition(5)).collect(),
            key=lambda r: r["doc_id"],
        )
        assert base == shuffled

    def test_reference_phrasing_scores_higher(self, spark):
        """The CCNet property: text phrased like the reference corpus
        gets a higher mean logprob than shuffled-vocab noise."""
        rng = random.Random(7)
        template = "the cat sat on the mat and the dog sat on the rug"
        ref = spark.createDataFrame(
            [(i, template) for i in range(20)], "doc_id long, text string"
        )
        words = template.split()
        noise = " ".join(rng.sample(words, len(words)))
        tgt = spark.createDataFrame(
            [(0, template), (1, noise)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["mean_kn_logprob"]
            for r in kn_doc_logprob(tgt, ref).collect()
        }
        assert got[0] > got[1]

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            kn_doc_logprob(df, df, discount=1.5)


class TestWassersteinApproxByGroup:
    def _sides(self, spark, rng):
        rows_a, rows_b = [], []
        for g, (mu_a, mu_b, sd) in {
            "x": (0.0, 0.0, 1.0),
            "y": (0.0, 2.5, 1.0),
            "z": (5.0, 5.0, 3.0),
        }.items():
            rows_a += [(g, float(v)) for v in rng.normal(mu_a, sd, 800)]
            rows_b += [(g, float(v)) for v in rng.normal(mu_b, sd, 600)]
        # degenerate groups: one-sided and single-valued
        rows_a += [("only_a", float(v)) for v in rng.normal(0, 1, 50)]
        rows_a += [("const", 3.0)] * 40
        rows_b += [("const", 3.0)] * 40
        a = spark.createDataFrame(rows_a, "g string, v double")
        b = spark.createDataFrame(rows_b, "g string, v double")
        return a, b

    def test_sandwich_per_group(self, spark, rng):
        a, b = self._sides(spark, rng)
        approx = {
            r["g"]: r
            for r in wasserstein_approx_by_group(a, b, "v", "g", 512).collect()
        }
        exact = {
            r["g"]: r["w1"]
            for r in wasserstein_by_group(a, b, "v", "g").collect()
        }
        for g in ["x", "y", "z"]:
            got, ex = approx[g], exact[g]
            assert abs(ex - got["w1"]) <= got["err_bound"] + 1e-9, g
            assert got["err_bound"] > 0.0
        # the shifted group dominates; approx must see the shift
        assert approx["y"]["w1"] == pytest.approx(2.5, abs=0.2)
        assert approx["x"]["w1"] < 0.3

    def test_bound_shrinks_with_grid(self, spark, rng):
        a, b = self._sides(spark, rng)
        outs = {
            gsz: {
                r["g"]: r["err_bound"]
                for r in wasserstein_approx_by_group(
                    a, b, "v", "g", gsz
                ).collect()
            }
            for gsz in (64, 256, 1024)
        }
        for g in ["x", "y", "z"]:
            assert outs[64][g] > outs[256][g] > outs[1024][g]

    def test_degenerate_groups(self, spark, rng):
        a, b = self._sides(spark, rng)
        got = {
            r["g"]: r
            for r in wasserstein_approx_by_group(a, b, "v", "g", 256).collect()
        }
        assert got["only_a"]["w1"] == 0.0
        assert got["only_a"]["err_bound"] == 0.0
        assert got["only_a"]["n_b"] == 0
        assert got["const"]["w1"] == 0.0
        assert got["const"]["err_bound"] == 0.0
        assert got["const"]["n_a"] == 40

    def test_matches_ungrouped_single_group(self, spark, rng):
        from spark_bestfit_spark.operators.stats import wasserstein_approx_df

        a, b = self._sides(spark, rng)
        a1, b1 = a.filter("g = 'y'"), b.filter("g = 'y'")
        grouped = wasserstein_approx_by_group(a1, b1, "v", "g", 512).first()
        flat = wasserstein_approx_df(a1, b1, "v", grid_size=512).first()
        # identical grid and expressions; only float-sum order differs
        assert grouped["w1"] == pytest.approx(flat["w1"], abs=2e-6)
        assert grouped["err_bound"] == flat["err_bound"]


class TestCompactKeeperSnapshot:
    def _index(self, spark, rng, n=300, dim=8):
        vecs = rng.normal(0, 1, (n, dim))
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        idx = IvfIndex.build(df, n_clusters=4, seed=1, method="local")
        return df, idx

    def test_restores_invariant(self, spark, rng):
        _, idx = self._index(spark, rng)
        replayed = idx.assigned.unionAll(idx.assigned.limit(120))
        compacted = compact_keeper_snapshot(replayed)
        assert compacted.count() == idx.assigned.count()
        assert (
            compacted.groupBy("vec_id").count().filter("count > 1").count()
            == 0
        )
        # row content identical to the pristine snapshot
        pristine = {
            r["vec_id"]: (r["cell"], tuple(r["embedding"]))
            for r in idx.assigned.collect()
        }
        got = {
            r["vec_id"]: (r["cell"], tuple(r["embedding"]))
            for r in compacted.collect()
        }
        assert got == pristine

    def test_incremental_equivalence(self, spark, rng):
        """Incremental semdedup against the compacted replayed state
        == against the pristine state (and the replayed state would
        have doubled pair work / guard counts)."""
        base, idx = self._index(spark, rng)
        # delta: clones of existing vectors (forced dups) + fresh rows
        clones = base.filter("vec_id < 5").selectExpr(
            "vec_id + 1000 AS vec_id", "embedding"
        )
        fresh = spark.createDataFrame(
            [
                (2000 + i, [float(x) for x in rng.normal(0, 1, 8)])
                for i in range(10)
            ],
            "vec_id long, embedding array<double>",
        )
        delta = clones.unionAll(fresh)
        pristine_out = sorted(
            incremental_semantic_dedup(delta, idx, threshold=0.999).collect(),
            key=lambda r: r["vec_id"],
        )
        replayed = idx.assigned.unionAll(idx.assigned)
        comp_idx = IvfIndex(
            compact_keeper_snapshot(replayed), idx.centers
        )
        compact_out = sorted(
            incremental_semantic_dedup(
                delta, comp_idx, threshold=0.999
            ).collect(),
            key=lambda r: r["vec_id"],
        )
        assert compact_out == pristine_out
        assert any(not r["is_kept"] for r in pristine_out)

    def test_guard_repair(self, spark, rng):
        """A replayed snapshot inflates the combined-cell population
        past max_cluster_size; compaction repairs the spurious trip."""
        base, idx = self._index(spark, rng, n=300)
        delta = spark.createDataFrame(
            [(5000, [float(x) for x in rng.normal(0, 1, 8)])],
            "vec_id long, embedding array<double>",
        )
        replayed = idx.assigned.unionAll(idx.assigned).unionAll(idx.assigned)
        bad_idx = IvfIndex(replayed, idx.centers)
        biggest = (
            idx.assigned.groupBy("cell").count()
            .agg({"count": "max"}).first()[0]
        )
        cap = biggest * 2  # > any true cell (+delta), < 3x the biggest
        with pytest.raises(ValueError, match="max_cluster_size"):
            incremental_semantic_dedup(
                delta, bad_idx, max_cluster_size=cap
            ).collect()
        good_idx = IvfIndex(compact_keeper_snapshot(replayed), idx.centers)
        out = incremental_semantic_dedup(
            delta, good_idx, max_cluster_size=cap
        ).collect()
        assert len(out) == 1

    def test_one_exchange(self, spark, rng):
        _, idx = self._index(spark, rng)
        plan = compact_keeper_snapshot(
            idx.assigned.unionAll(idx.assigned)
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


def _bpe_train_reference(texts, n_merges):
    """From-scratch python BPE train (greedy, (weight desc, pair asc)
    tie-break) returning the merge table — mirrors bpe_learn."""
    words = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), _wt = best
        merges.append((a, b))
        for w, syms in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[w] = res
    return merges, vocab, words


class TestBpeEncode:
    def _texts(self, seed=11, n=50):
        rng = random.Random(seed)
        stems = ["lower", "newest", "widest", "low", "er", "est",
                 "running", "runner", "parquet", "partition"]
        return [
            " ".join(rng.choice(stems) for _ in range(rng.randint(3, 20)))
            for _ in range(n)
        ]

    def test_matches_rank_order_train_state(self, spark):
        """Priority-apply encode == the train loop's own final symbol
        state (rank-order application), word type for word type."""
        from spark_bestfit_spark.operators.textstats import (
            bpe_encode,
            bpe_learn,
        )

        texts = self._texts()
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        merges = bpe_learn(df, "text", n_merges=8)
        ref_merges, ref_vocab, ref_counts = _bpe_train_reference(texts, 8)
        assert [(a, b) for a, b, _ in merges] == ref_merges
        got = {
            r["word"]: (r["word_count"], list(r["tokens"]), r["n_tokens"])
            for r in bpe_encode(df, merges).collect()
        }
        exp = {
            w: (ref_counts[w], syms, len(syms))
            for w, syms in ref_vocab.items()
        }
        assert got == exp

    def test_lossless_and_monotone(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            bpe_encode,
            bpe_learn,
        )

        texts = self._texts(seed=5)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        merges = bpe_learn(df, "text", n_merges=10)
        rows = bpe_encode(df, merges).collect()
        for r in rows:
            assert "".join(r["tokens"]) == r["word"]
        total10 = sum(r["n_tokens"] * r["word_count"] for r in rows)
        rows0 = bpe_encode(df, []).collect()
        for r in rows0:
            assert r["n_tokens"] == len(r["word"])
        total0 = sum(r["n_tokens"] * r["word_count"] for r in rows0)
        rows5 = bpe_encode(df, merges[:5]).collect()
        total5 = sum(r["n_tokens"] * r["word_count"] for r in rows5)
        assert total0 > total5 > total10

    def test_merge_table_relation_input(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            bpe_encode,
            bpe_learn,
            bpe_merge_table,
        )

        texts = self._texts(seed=3)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        merges = bpe_learn(df, "text", n_merges=6)
        table = bpe_merge_table(df, "text", n_merges=6)
        a = sorted(
            bpe_encode(df, merges).collect(), key=lambda r: r["word"]
        )
        b = sorted(
            bpe_encode(df, table).collect(), key=lambda r: r["word"]
        )
        assert a == b

    def test_doc_token_counts(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            bpe_doc_token_counts,
            bpe_learn,
        )

        texts = self._texts(seed=9, n=20)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)] + [(99, "  ")],
            "doc_id long, text string",
        )
        merges = bpe_learn(df, "text", n_merges=8)
        _, ref_vocab, _ = _bpe_train_reference(texts, 8)
        got = {
            r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"], r["fertility"])
            for r in bpe_doc_token_counts(df, merges).collect()
        }
        assert 99 not in got  # empty doc drops out
        for i, t in enumerate(texts):
            ws = [w for w in t.lower().split() if w]
            bpe = sum(len(ref_vocab[w]) for w in ws)
            assert got[i] == (
                len(ws), bpe, pytest.approx(round(bpe / len(ws), 6))
            ), i


class TestKnDocLogprobByGroup:
    def _corpora(self, spark, seed=31):
        rng = random.Random(seed)
        vocabs = {
            "en": [f"e{i}" for i in range(20)],
            "de": [f"d{i}" for i in range(20)],
        }
        ref_rows, tgt_rows = [], []
        i = 0
        for g, vocab in vocabs.items():
            for _ in range(30):
                ref_rows.append((i, g, " ".join(
                    rng.choice(vocab)
                    for _ in range(rng.randint(2, 30)))))
                i += 1
        for g, vocab in vocabs.items():
            for _ in range(15):
                tgt_rows.append((i, g, " ".join(
                    rng.choice(vocab + ["zz"])
                    for _ in range(rng.randint(2, 20)))))
                i += 1
        # a target group with NO reference slice
        tgt_rows.append((900, "fr", "le chat dort"))
        ref = spark.createDataFrame(
            ref_rows, "doc_id long, lang string, text string"
        )
        tgt = spark.createDataFrame(
            tgt_rows, "doc_id long, lang string, text string"
        )
        return ref_rows, tgt_rows, ref, tgt

    def test_matches_per_group_flat_reference(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            kn_doc_logprob_by_group,
        )

        ref_rows, tgt_rows, ref, tgt = self._corpora(spark)
        got = {
            r["doc_id"]: (
                r["lang"], r["n_bigrams"], r["n_unseen"],
                r["mean_kn_logprob"],
            )
            for r in kn_doc_logprob_by_group(tgt, ref).collect()
        }
        for g in ["en", "de"]:
            ref_texts = [t for _, gg, t in ref_rows if gg == g]
            tgt_docs = [(i, t) for i, gg, t in tgt_rows if gg == g]
            exp = _kn_score_reference(ref_texts, tgt_docs)
            for did, (n, unseen, mean) in exp.items():
                assert got[did] == (g, n, unseen, mean), did

    def test_missing_group_scores_null(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            kn_doc_logprob_by_group,
        )

        _, _, ref, tgt = self._corpora(spark)
        row = [
            r for r in kn_doc_logprob_by_group(tgt, ref).collect()
            if r["doc_id"] == 900
        ]
        assert len(row) == 1
        assert row[0]["mean_kn_logprob"] is None
        assert row[0]["n_bigrams"] == 2
        assert row[0]["n_unseen"] == 2

    def test_agrees_with_flat_on_single_group(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            kn_doc_logprob,
            kn_doc_logprob_by_group,
        )

        _, _, ref, tgt = self._corpora(spark)
        ref_en, tgt_en = ref.filter("lang = 'en'"), tgt.filter("lang = 'en'")
        flat = {
            r["doc_id"]: (r["n_bigrams"], r["n_unseen"], r["mean_kn_logprob"])
            for r in kn_doc_logprob(tgt_en, ref_en).collect()
        }
        grouped = {
            r["doc_id"]: (r["n_bigrams"], r["n_unseen"], r["mean_kn_logprob"])
            for r in kn_doc_logprob_by_group(tgt_en, ref_en).collect()
        }
        assert flat == grouped

    def test_validation(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            kn_doc_logprob_by_group,
        )

        df = spark.createDataFrame(
            [(0, "en", "a b")], "doc_id long, lang string, text string"
        )
        with pytest.raises(ValueError):
            kn_doc_logprob_by_group(df, df, discount=0.0)


class TestKnLmState:
    def test_merged_state_equals_full_retrain(self, spark, tmp_path):
        from spark_bestfit_spark.operators.textstats import (
            kn_bigram_counts,
            kn_doc_logprob,
            kn_doc_logprob_from_counts,
            kn_merge_counts,
        )

        rng = random.Random(41)
        vocab = [f"w{i}" for i in range(25)]
        texts = [
            (i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(2, 30))))
            for i in range(90)
        ]
        ref = spark.createDataFrame(texts, "doc_id long, text string")
        tgt = spark.createDataFrame(
            [(100 + i, " ".join(rng.choice(vocab + ["qq"])
                                for _ in range(rng.randint(2, 15))))
             for i in range(30)],
            "doc_id long, text string",
        )
        # three deliveries, persisted and reloaded through parquet
        states = []
        for k in range(3):
            part = ref.filter(F.col("doc_id") % 3 == k)
            path = str(tmp_path / f"state_{k}.parquet")
            kn_bigram_counts(part).write.parquet(path)
            states.append(spark.read.parquet(path))
        merged = kn_merge_counts(*states)
        got = sorted(
            kn_doc_logprob_from_counts(tgt, merged).collect(),
            key=lambda r: r["doc_id"],
        )
        full = sorted(
            kn_doc_logprob(tgt, ref).collect(),
            key=lambda r: r["doc_id"],
        )
        assert got == full

    def test_counts_are_the_sufficient_statistic(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            kn_bigram_counts,
        )

        df = spark.createDataFrame(
            [(0, "a b a b c"), (1, "b c")], "doc_id long, text string"
        )
        got = {
            (r["w1"], r["w2"]): r["c12"]
            for r in kn_bigram_counts(df).collect()
        }
        assert got == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 2}

    def test_merge_validation(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            kn_merge_counts,
        )

        with pytest.raises(ValueError):
            kn_merge_counts()


class TestBpeArtifactRoundTrip:
    def test_parquet_round_trip_encodes_identically(self, spark, tmp_path):
        """The merge table IS the shipped artifact: persisted through
        Spark parquet and reloaded, it must drive bpe_encode to the
        bit-identical token stream (bpe_encode accepts the reloaded
        relation directly)."""
        from spark_bestfit_spark.operators.textstats import (
            bpe_encode,
            bpe_merge_table,
        )

        rng = random.Random(19)
        stems = ["lower", "newest", "widest", "low", "er", "est"]
        df = spark.createDataFrame(
            [(i, " ".join(rng.choice(stems)
                          for _ in range(rng.randint(3, 15))))
             for i in range(30)],
            "doc_id long, text string",
        )
        table = bpe_merge_table(df, "text", n_merges=8)
        path = str(tmp_path / "bpe_merges.parquet")
        table.write.parquet(path)
        reloaded = spark.read.parquet(path)
        a = sorted(
            bpe_encode(df, table).collect(), key=lambda r: r["word"]
        )
        b = sorted(
            bpe_encode(df, reloaded).collect(), key=lambda r: r["word"]
        )
        assert a == b
        # the reloaded relation carries the full artifact schema
        assert {"merge_rank", "left", "right", "merged", "weight"} <= set(
            reloaded.columns
        )


class TestKnLmStateByGroup:
    def test_merged_grouped_state_equals_full_retrain(
        self, spark, tmp_path
    ):
        from spark_bestfit_spark.operators.textstats import (
            kn_bigram_counts_by_group,
            kn_doc_logprob_by_group,
            kn_doc_logprob_by_group_from_counts,
            kn_merge_counts,
        )

        rng = random.Random(47)
        rows = []
        for g, vocab in [("en", [f"e{i}" for i in range(15)]),
                         ("de", [f"d{i}" for i in range(15)])]:
            for i in range(60):
                rows.append((len(rows), g, " ".join(
                    rng.choice(vocab)
                    for _ in range(rng.randint(2, 25)))))
        ref = spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        )
        tgt = spark.createDataFrame(
            [(500 + i, g, " ".join(
                rng.choice([f"{g[0]}{j}" for j in range(15)] + ["zz"])
                for _ in range(rng.randint(2, 12))))
             for i, g in enumerate(["en", "de"] * 10)],
            "doc_id long, lang string, text string",
        )
        parts = []
        for k in range(2):
            path = str(tmp_path / f"gstate_{k}.parquet")
            kn_bigram_counts_by_group(
                ref.filter(F.col("doc_id") % 2 == k)
            ).write.parquet(path)
            parts.append(spark.read.parquet(path))
        merged = kn_merge_counts(*parts, keys=("lang", "w1", "w2"))
        got = sorted(
            kn_doc_logprob_by_group_from_counts(tgt, merged).collect(),
            key=lambda r: r["doc_id"],
        )
        full = sorted(
            kn_doc_logprob_by_group(tgt, ref).collect(),
            key=lambda r: r["doc_id"],
        )
        assert got == full
        assert len(got) == 20

    def test_groups_merge_independently(self, spark):
        """A delivery carrying only one group must not disturb the
        other group's LM."""
        from spark_bestfit_spark.operators.textstats import (
            kn_bigram_counts_by_group,
            kn_merge_counts,
        )

        a = spark.createDataFrame(
            [(0, "en", "x y x y"), (1, "de", "u v")],
            "doc_id long, lang string, text string",
        )
        b = spark.createDataFrame(
            [(2, "en", "x y")], "doc_id long, lang string, text string"
        )
        merged = kn_merge_counts(
            kn_bigram_counts_by_group(a),
            kn_bigram_counts_by_group(b),
            keys=("lang", "w1", "w2"),
        )
        got = {
            (r["lang"], r["w1"], r["w2"]): r["c12"]
            for r in merged.collect()
        }
        assert got[("en", "x", "y")] == 3
        assert got[("en", "y", "x")] == 1
        assert got[("de", "u", "v")] == 1


class TestPerplexityBuckets:
    def _scored(self, spark):
        rows = []
        for g, n in [("en", 9), ("de", 7)]:
            for i in range(n):
                rows.append((len(rows), g, -1.0 - i * 0.5))
        rows.append((100, "fr", None))  # unscored (no LM)
        return spark.createDataFrame(
            rows, "doc_id long, lang string, mean_kn_logprob double"
        )

    def test_equal_population_per_group(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            perplexity_buckets,
        )

        out = perplexity_buckets(self._scored(spark)).collect()
        assert all(r["lang"] != "fr" for r in out)  # nulls excluded
        en = sorted(
            (r for r in out if r["lang"] == "en"),
            key=lambda r: r["doc_id"],
        )
        # 9 docs -> 3/3/3; best scores (least negative) are head
        assert [r["label"] for r in en] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )
        de = [r for r in out if r["lang"] == "de"]
        # 7 docs -> 3/2/2 (SQL-standard remainder to first buckets)
        from collections import Counter as C
        assert C(r["bucket"] for r in de) == {1: 3, 2: 2, 3: 2}

    def test_per_group_independence(self, spark):
        """Each language keeps its own head even when its absolute
        scores are globally worse than another language's tail."""
        from spark_bestfit_spark.operators.textstats import (
            perplexity_buckets,
        )

        rows = [(i, "en", -1.0 - i) for i in range(3)] + [
            (10 + i, "de", -100.0 - i) for i in range(3)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, mean_kn_logprob double"
        )
        out = {
            r["doc_id"]: r["label"]
            for r in perplexity_buckets(df).collect()
        }
        assert out[0] == "head" and out[10] == "head"

    def test_deterministic_tie_break(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            perplexity_buckets,
        )

        df = spark.createDataFrame(
            [(i, "en", -2.0) for i in range(6)],
            "doc_id long, lang string, mean_kn_logprob double",
        )
        a = {r["doc_id"]: r["bucket"]
             for r in perplexity_buckets(df).collect()}
        b = {r["doc_id"]: r["bucket"]
             for r in perplexity_buckets(df.repartition(5)).collect()}
        assert a == b == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3}

    def test_validation(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            perplexity_buckets,
        )

        with pytest.raises(ValueError, match="labels"):
            perplexity_buckets(self._scored(spark), n_buckets=4)


class TestBudgetTruePacking:
    def test_length_col_matches_manual_prefix_sum(self, spark):
        from spark_bestfit_spark.operators.curation import (
            pack_training_sequences,
        )

        rows = [(i, "x " * (i + 1), (i + 1) * 7) for i in range(20)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, mylen long"
        )
        got = {
            r["doc_id"]: (
                r["n_tokens"], r["start_offset"], r["first_seq"],
                r["last_seq"], r["n_seqs"],
            )
            for r in pack_training_sequences(
                df, seq_len=64, sep_tokens=1, length_col="mylen"
            ).collect()
        }
        cum = 0
        for i in range(20):
            eff = (i + 1) * 7 + 1
            start, cend = cum, cum + eff - 1
            cum += eff
            assert got[i] == (
                (i + 1) * 7, start, start // 64, cend // 64,
                cend // 64 - start // 64 + 1,
            ), i

    def test_bpe_composition(self, spark):
        """Pack in REAL learned-tokenizer tokens: doc budgets from
        bpe_doc_token_counts drive the packer."""
        from spark_bestfit_spark.operators.curation import (
            pack_training_sequences,
        )
        from spark_bestfit_spark.operators.textstats import (
            bpe_doc_token_counts,
            bpe_learn,
        )

        rng = random.Random(3)
        stems = ["lower", "newest", "widest", "low", "er", "est"]
        df = spark.createDataFrame(
            [(i, " ".join(rng.choice(stems)
                          for _ in range(rng.randint(3, 15))))
             for i in range(25)],
            "doc_id long, text string",
        )
        merges = bpe_learn(df, "text", n_merges=8)
        counts = bpe_doc_token_counts(df, merges)
        packed = pack_training_sequences(
            df.join(counts, "doc_id"), seq_len=128,
            length_col="n_bpe_tokens",
        )
        got = {r["doc_id"]: r for r in packed.collect()}
        exp_len = {
            r["doc_id"]: r["n_bpe_tokens"] for r in counts.collect()
        }
        cum = 0
        for i in sorted(exp_len):
            eff = exp_len[i] + 1
            assert got[i]["n_tokens"] == exp_len[i]
            assert got[i]["start_offset"] == cum
            cum += eff
        # BPE budgets exceed whitespace budgets (fertility > 1), so
        # the packing genuinely differs from the whitespace path
        ws = pack_training_sequences(df, seq_len=128)
        assert (
            sum(r["n_tokens"] for r in packed.collect())
            > sum(r["n_tokens"] for r in ws.collect())
        )


class TestQuantilesApproxCertified:
    def test_sandwich_against_exact(self, spark):
        """The certificate: the exact lower-edge quantile lies inside
        [lo_edge, hi_edge] for every q, and the bound is the
        data-independent (hi-lo)/grid."""
        import numpy as np
        from spark_bestfit_spark.operators.stats import (
            quantiles_approx_certified,
        )

        rng = np.random.default_rng(3)
        vals = rng.gamma(2.0, 10.0, 20_000)
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "v double"
        )
        qs = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
        rows = {
            r["q"]: r
            for r in quantiles_approx_certified(
                df, "v", qs=qs, grid_size=512
            ).collect()
        }
        svals = np.sort(vals)
        n = len(svals)
        import math

        width = (svals[-1] - svals[0]) / 512
        for q in qs:
            exact = svals[max(0, math.ceil(q * n) - 1)]
            r = rows[q]
            assert r["lo_edge"] <= exact <= r["hi_edge"]
            # err_bound is rounded to 6 decimals on output
            assert r["err_bound"] == pytest.approx(width, abs=1e-6)
            assert r["n"] == n

    def test_bound_shrinks_with_grid(self, spark):
        import numpy as np
        from spark_bestfit_spark.operators.stats import (
            quantiles_approx_certified,
        )

        rng = np.random.default_rng(7)
        df = spark.createDataFrame(
            [(float(v),) for v in rng.normal(0, 1, 5000)], "v double"
        )
        b64 = quantiles_approx_certified(
            df, "v", qs=(0.5,), grid_size=64
        ).first()["err_bound"]
        b1024 = quantiles_approx_certified(
            df, "v", qs=(0.5,), grid_size=1024
        ).first()["err_bound"]
        assert b1024 == pytest.approx(b64 / 16, abs=1e-5)

    def test_degenerate(self, spark):
        from spark_bestfit_spark.operators.stats import (
            quantiles_approx_certified,
        )

        one = spark.createDataFrame([(5.0,), (5.0,)], "v double")
        rows = quantiles_approx_certified(one, "v").collect()
        assert all(
            r["value"] == 5.0 and r["err_bound"] == 0.0 for r in rows
        )
        empty = spark.createDataFrame([], "v double")
        assert quantiles_approx_certified(empty, "v").count() == 0

    def test_partition_invariance(self, spark):
        import numpy as np
        from spark_bestfit_spark.operators.stats import (
            quantiles_approx_certified,
        )

        rng = np.random.default_rng(11)
        df = spark.createDataFrame(
            [(float(v),) for v in rng.uniform(0, 100, 3000)],
            "v double",
        )
        a = sorted(
            map(tuple, quantiles_approx_certified(df, "v").collect())
        )
        b = sorted(
            map(
                tuple,
                quantiles_approx_certified(
                    df.repartition(13), "v"
                ).collect(),
            )
        )
        assert a == b

    def test_validation(self, spark):
        from spark_bestfit_spark.operators.stats import (
            quantiles_approx_certified,
        )

        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError):
            quantiles_approx_certified(df, "v", qs=(0.0,))
        with pytest.raises(ValueError):
            quantiles_approx_certified(df, "v", grid_size=0)
