"""DSIR importance resampling (Xie et al., NeurIPS 2023): hashed
unigram+bigram bucket LMs, add-one-smoothed importance log-weights,
Gumbel top-k selection with the seeded Knuth-hash uniform.

Load-bearing properties: log-weights must match a from-scratch python
replica bucket-for-bucket (portable md5 hashing, identical smoothing
arithmetic); target-like documents must outweigh off-distribution
noise (the paper's whole point); the Gumbel-perturbed selection must
be deterministic under any partitioning (the selected SET is part of
the oracle contract, not just the weights).
"""

import collections
import hashlib
import math

import pytest

from spark_bestfit_spark.operators.curation import (
    dsir_logweights,
    dsir_select,
)

TARGET_TEXT = "the experiment measured the quantum state of the electron"
RAW_DOCS = {
    0: "the experiment measured the electron state",
    1: "buy cheap pills online now discount",
    2: "quantum state of the electron was measured",
    3: "football score last night match report",
    4: "the electron quantum experiment",
    5: "",
    6: "   ",
}


def _grams(t):
    ws = [w for w in t.lower().strip().split() if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _bkt(g, B):
    return int(hashlib.md5(g.encode()).hexdigest()[:14], 16) % B


def _reference_logweights(raw_docs, tgt_texts, B):
    ct = collections.Counter()
    for t in tgt_texts:
        for g in _grams(t):
            ct[_bkt(g, B)] += 1
    feats = {
        i: collections.Counter(_bkt(g, B) for g in _grams(t))
        for i, t in raw_docs.items()
    }
    cr = collections.Counter()
    for f in feats.values():
        for b, n in f.items():
            cr[b] += n
    nt, nr = sum(ct.values()), sum(cr.values())
    out = {}
    for i, f in feats.items():
        if not f:
            continue
        lw = sum(
            n
            * (
                math.log((ct.get(b, 0) + 1.0) / (nt + B))
                - math.log((cr.get(b, 0) + 1.0) / (nr + B))
            )
            for b, n in f.items()
        )
        out[i] = (sum(f.values()), round(lw, 6))
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    tgt = spark.createDataFrame(
        [(i, TARGET_TEXT) for i in range(10)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        list(RAW_DOCS.items()), "doc_id long, text string"
    )
    return raw, tgt


class TestDsirLogweights:
    def test_matches_reference(self, spark, corpora):
        raw, tgt = corpora
        B = 512
        got = {
            r["doc_id"]: (r["n_grams"], r["logweight"])
            for r in dsir_logweights(raw, tgt, n_buckets=B).collect()
        }
        exp = _reference_logweights(RAW_DOCS, [TARGET_TEXT] * 10, B)
        assert got == exp
        # empty/whitespace docs dropped
        assert 5 not in got and 6 not in got

    def test_target_like_outweighs_noise(self, spark, corpora):
        raw, tgt = corpora
        got = {
            r["doc_id"]: r["logweight"]
            for r in dsir_logweights(raw, tgt, n_buckets=512).collect()
        }
        for like in (0, 2, 4):
            for noise in (1, 3):
                assert got[like] > got[noise]

    def test_partition_invariance(self, spark, corpora):
        raw, tgt = corpora
        a = sorted(
            dsir_logweights(raw, tgt, n_buckets=256).collect(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            dsir_logweights(
                raw.repartition(5), tgt.repartition(3), n_buckets=256
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        assert a == b

    def test_validation(self, spark, corpora):
        raw, tgt = corpora
        with pytest.raises(ValueError):
            dsir_logweights(raw, tgt, n_buckets=1)


class TestDsirSelect:
    def test_selection_matches_reference(self, spark, corpora):
        raw, tgt = corpora
        B, seed = 512, 0
        lw = _reference_logweights(RAW_DOCS, [TARGET_TEXT] * 10, B)
        keyed = {}
        for i, (_, w) in lw.items():
            u = ((i * 2654435761) % 4294967296 + 0.5) / 4294967296.0
            keyed[i] = round(w + (-math.log(-math.log(u))), 6)
        exp_order = sorted(keyed, key=lambda i: (-keyed[i], i))[:3]
        got = [
            (r["doc_id"], r["gumbel_key"], r["sel_rank"])
            for r in dsir_select(
                raw, tgt, k=3, n_buckets=B, seed=seed
            ).collect()
        ]
        assert [g[0] for g in got] == exp_order
        assert [g[2] for g in got] == [1, 2, 3]
        for did, key, _ in got:
            assert key == pytest.approx(keyed[did], abs=1e-6)

    def test_seed_changes_noise_not_weights(self, spark, corpora):
        raw, tgt = corpora
        a = dsir_select(raw, tgt, k=5, n_buckets=512, seed=0).collect()
        b = dsir_select(raw, tgt, k=5, n_buckets=512, seed=99).collect()
        wa = {r["doc_id"]: r["logweight"] for r in a}
        wb = {r["doc_id"]: r["logweight"] for r in b}
        for i in set(wa) & set(wb):
            assert wa[i] == wb[i]
        ka = {r["doc_id"]: r["gumbel_key"] for r in a}
        kb = {r["doc_id"]: r["gumbel_key"] for r in b}
        assert any(ka[i] != kb[i] for i in set(ka) & set(kb))

    def test_k_larger_than_corpus(self, spark, corpora):
        raw, tgt = corpora
        rows = dsir_select(raw, tgt, k=100, n_buckets=512).collect()
        assert len(rows) == 5  # all non-empty raw docs

    def test_validation(self, spark, corpora):
        raw, tgt = corpora
        with pytest.raises(ValueError):
            dsir_select(raw, tgt, k=0)


class TestDsirByGroup:
    def _grouped(self, spark):
        from spark_bestfit_spark.operators.curation import (
            dsir_logweights_by_group,
        )
        import pyspark.sql.functions as F

        raw = spark.createDataFrame(
            [(0, "en", "the quantum experiment measured the state"),
             (1, "en", "cheap pills discount online now"),
             (2, "fr", "le chat est sur la table"),
             (3, "fr", "acheter pas cher maintenant vite"),
             (4, "de", "das ist ein test")],
            "doc_id long, lang string, text string",
        )
        tgt = spark.createDataFrame(
            [(10, "en", "the quantum state of the electron experiment"),
             (11, "fr", "le chat mange sur la table")],
            "doc_id long, lang string, text string",
        )
        return raw, tgt, dsir_logweights_by_group, F

    def test_equals_flat_per_group(self, spark):
        raw, tgt, grouped, F = self._grouped(spark)
        lw = grouped(raw, tgt, n_buckets=256)
        for g in ("en", "fr"):
            flat = {
                r["doc_id"]: (r["n_grams"], r["logweight"])
                for r in dsir_logweights(
                    raw.filter(F.col("lang") == g),
                    tgt.filter(F.col("lang") == g),
                    n_buckets=256,
                ).collect()
            }
            grp = {
                r["doc_id"]: (r["n_grams"], r["logweight"])
                for r in lw.filter(F.col("lang") == g).collect()
            }
            assert flat == grp

    def test_missing_target_group_is_null(self, spark):
        raw, tgt, grouped, F = self._grouped(spark)
        rows = grouped(raw, tgt, n_buckets=256).filter(
            F.col("lang") == "de"
        ).collect()
        assert len(rows) == 1 and rows[0]["logweight"] is None

    def test_select_excludes_null_groups_and_ranks_within(self, spark):
        from spark_bestfit_spark.operators.curation import (
            dsir_select_by_group,
        )
        raw, tgt, _, F = self._grouped(spark)
        rows = dsir_select_by_group(
            raw, tgt, k_per_group=1, n_buckets=256, seed=0
        ).collect()
        by_lang = {r["lang"]: r for r in rows}
        assert set(by_lang) == {"en", "fr"}  # de has no LM
        assert all(r["sel_rank"] == 1 for r in rows)

    def test_validation(self, spark):
        from spark_bestfit_spark.operators.curation import (
            dsir_select_by_group,
        )
        raw, tgt, _, _ = self._grouped(spark)
        with pytest.raises(ValueError):
            dsir_select_by_group(raw, tgt, k_per_group=0)


class TestUnimaxAllocation:
    def _waterfill_ref(self, caps, budget):
        """From-scratch waterfill: ascending caps, bind while the
        uniform share exceeds the cap."""
        items = sorted(caps.items(), key=lambda kv: (kv[1], kv[0]))
        n = len(items)
        alloc, bsum, nb = {}, 0.0, 0
        for i, (g, c) in enumerate(items):
            if bsum + c * (n - i) <= budget:
                alloc[g] = c
                bsum += c
                nb += 1
            else:
                level = (budget - bsum) / (n - nb)
                for g2, c2 in items[i:]:
                    alloc[g2] = min(level, c2)
                break
        return alloc

    def test_matches_reference_and_invariants(self, spark):
        from spark_bestfit_spark.operators.curation import (
            unimax_allocation,
        )

        rows = []
        did = 0
        sizes = {"a": 40, "b": 12, "c": 90, "d": 11, "e": 25}
        for g, n in sizes.items():
            for _ in range(n):
                rows.append((did, g, "tok one two"))  # 3 tokens each
                did += 1
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        )
        budget = 300.0
        got = {
            r["lang"]: (r["n_tokens"], r["cap"], r["alloc"], r["epochs"])
            for r in unimax_allocation(
                df, budget=budget, max_epochs=1.0
            ).collect()
        }
        caps = {g: 3.0 * n for g, n in sizes.items()}
        exp = self._waterfill_ref(caps, budget)
        for g, a in exp.items():
            assert got[g][2] == pytest.approx(a, abs=1e-6)
            assert got[g][3] <= 1.0 + 1e-9  # epoch cap
        assert sum(v[2] for v in got.values()) == pytest.approx(
            min(budget, sum(caps.values())), abs=1e-4
        )

    def test_budget_exceeds_caps(self, spark):
        from spark_bestfit_spark.operators.curation import (
            unimax_allocation,
        )

        df = spark.createDataFrame(
            [(0, "a", "x y"), (1, "b", "z")],
            "doc_id long, lang string, text string",
        )
        rows = unimax_allocation(df, budget=1e9, max_epochs=2.0).collect()
        assert all(r["alloc"] == r["cap"] for r in rows)
        assert all(r["epochs"] == pytest.approx(2.0) for r in rows)

    def test_tie_determinism(self, spark):
        from spark_bestfit_spark.operators.curation import (
            unimax_allocation,
        )

        df = spark.createDataFrame(
            [(i, f"g{i % 4}", "one two three") for i in range(40)],
            "doc_id long, lang string, text string",
        )
        a = sorted(map(tuple, unimax_allocation(df, budget=50).collect()))
        b = sorted(
            map(
                tuple,
                unimax_allocation(df.repartition(7), budget=50).collect(),
            )
        )
        assert a == b
        # equal caps with a binding budget: equal allocations
        allocs = {t[3] for t in a}
        assert len(allocs) == 1

    def test_validation(self, spark):
        from spark_bestfit_spark.operators.curation import (
            unimax_allocation,
        )

        df = spark.createDataFrame(
            [(0, "a", "x")], "doc_id long, lang string, text string"
        )
        with pytest.raises(ValueError):
            unimax_allocation(df, budget=0)
        with pytest.raises(ValueError):
            unimax_allocation(df, budget=10, max_epochs=0)
