"""Interpolated Kneser-Ney TRIGRAM document scoring (Chen & Goodman
1999, two backoff levels) — the LM-quality rung above the bigram tier.

Load-bearing properties: scores must match a from-scratch python
replica trigram-for-trigram across every backoff branch (seen trigram /
unseen trigram in a seen context / unseen context with seen middle
word / fully-OOV triple); every level of the backoff cascade must be a
PROPER distribution (sums to 1 over vocab + one OOV bucket — the
add-one closure guarantees a finite deterministic logprob with no
tunable floor); and scoring from a merged trigram-count snapshot must
equal the full retrain exactly (counts are the sufficient statistic).
"""

import math
import random
from collections import Counter

import pytest

from spark_bestfit_spark.operators.textstats import (
    kn_doc_logprob3,
    kn_doc_logprob3_from_counts,
    kn_merge_counts,
    kn_trigram_counts,
)


def _kn3_reference(ref_texts, tgt_docs, d=0.75):
    """From-scratch interpolated-KN trigram scorer: raw counts at the
    top, continuation counts at both lower orders, add-one-with-OOV
    closure at the base."""
    tris = Counter()
    for t in ref_texts:
        ws = [w for w in t.lower().strip().split() if w]
        for i in range(2, len(ws)):
            tris[(ws[i - 2], ws[i - 1], ws[i])] += 1
    ctx2, fw12 = Counter(), Counter()
    mid = Counter()
    for (w1, w2, w3), c in tris.items():
        ctx2[(w1, w2)] += c
        fw12[(w1, w2)] += 1
        mid[(w2, w3)] += 1
    mid2, fw2c = Counter(), Counter()
    for (w2, _w3), n in mid.items():
        mid2[w2] += n
        fw2c[w2] += 1
    low = Counter()
    for (_w2, w3) in mid:
        low[w3] += 1
    types, vref = len(mid), len(low)

    def p_low(w3):
        return (low.get(w3, 0) + 1.0) / (types + vref + 1.0)

    def p_mid(w2, w3):
        if w2 in mid2:
            return (
                max(mid.get((w2, w3), 0) - d, 0.0) / mid2[w2]
                + (d * fw2c[w2] / mid2[w2]) * p_low(w3)
            )
        return p_low(w3)

    def p_hi(w1, w2, w3):
        if (w1, w2) in ctx2:
            return (
                max(tris.get((w1, w2, w3), 0) - d, 0.0) / ctx2[(w1, w2)]
                + (d * fw12[(w1, w2)] / ctx2[(w1, w2)]) * p_mid(w2, w3)
            )
        return p_mid(w2, w3)

    out = {}
    for did, t in tgt_docs:
        ws = [w for w in t.lower().strip().split() if w]
        trs = [
            (ws[i - 2], ws[i - 1], ws[i]) for i in range(2, len(ws))
        ]
        if not trs:
            continue
        unseen = sum(1 for tr in trs if tr not in tris)
        mean = sum(math.log(p_hi(*tr)) for tr in trs) / len(trs)
        out[did] = (len(trs), unseen, round(mean, 6))
    return out


class TestKnTrigram:
    def _corpora(self, spark, seed=31):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(25)]
        ref_texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))
            for _ in range(60)
        ]
        # OOV mix so every backoff branch fires: seen trigram / unseen
        # trigram with seen (w1,w2) / unseen context with seen w2 /
        # fully-OOV triple
        tgt_docs = [
            (i, " ".join(
                rng.choice(vocab + ["zzq", "xxv", "qqj"])
                for _ in range(rng.randint(3, 25))
            ))
            for i in range(40)
        ] + [(100, ref_texts[0]), (101, "two words"), (102, "")]
        ref = spark.createDataFrame(
            [(i, t) for i, t in enumerate(ref_texts)],
            "doc_id long, text string",
        )
        tgt = spark.createDataFrame(tgt_docs, "doc_id long, text string")
        return ref_texts, tgt_docs, ref, tgt

    def test_matches_reference(self, spark):
        ref_texts, tgt_docs, ref, tgt = self._corpora(spark)
        got = {
            r["doc_id"]: (
                r["n_trigrams"], r["n_unseen"], r["mean_kn_logprob"]
            )
            for r in kn_doc_logprob3(tgt, ref).collect()
        }
        exp = _kn3_reference(ref_texts, tgt_docs)
        assert got == exp
        # degenerate docs (<3 tokens) dropped out
        assert 101 not in got and 102 not in got
        # OOV branches actually fired somewhere
        assert any(v[1] > 0 for v in got.values())
        assert got[100][1] == 0  # verbatim ref doc: every trigram seen

    def test_proper_distribution_all_levels(self, spark):
        """sum_w3 P(w3|w1 w2) over vocab + OOV bucket == 1 for (a) a
        seen (w1,w2) context, (b) an unseen context whose w2 is seen
        (middle-level backoff), and (c) a fully unseen context (base
        level) — no mass leaked or invented at any backoff depth."""
        ref_texts, _, ref, _ = self._corpora(spark)
        mid_words = set()
        ctxs = set()
        vocab3 = set()
        for t in ref_texts:
            ws = [w for w in t.lower().strip().split() if w]
            for i in range(2, len(ws)):
                ctxs.add((ws[i - 2], ws[i - 1]))
                mid_words.add(ws[i - 1])
                vocab3.add(ws[i])
        vocab = sorted(vocab3)
        seen_ctx = sorted(ctxs)[0]
        seen_mid = sorted(mid_words)[0]
        for (w1, w2) in [seen_ctx, ("neverseen", seen_mid),
                         ("neverseen", "alsonever")]:
            probes = [
                (i, f"{w1} {w2} {w3}") for i, w3 in enumerate(vocab)
            ]
            probes.append((len(vocab), f"{w1} {w2} __oov__"))
            tgt = spark.createDataFrame(
                probes, "doc_id long, text string"
            )
            rows = kn_doc_logprob3(tgt, ref).collect()
            s = sum(math.exp(r["mean_kn_logprob"]) for r in rows)
            assert s == pytest.approx(1.0, abs=1e-4)

    def test_partition_invariance(self, spark):
        _, _, ref, tgt = self._corpora(spark)
        base = sorted(
            kn_doc_logprob3(tgt, ref).collect(),
            key=lambda r: r["doc_id"],
        )
        shuffled = sorted(
            kn_doc_logprob3(
                tgt.repartition(7), ref.repartition(5)
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        assert base == shuffled

    def test_merged_snapshot_equals_full_retrain(self, spark):
        """Trigram counts are the LM's sufficient statistic: two
        delivery snapshots merged with one union-sum score exactly
        like a full retrain over the union corpus."""
        ref_texts, _, ref, tgt = self._corpora(spark)
        d1 = ref.filter("doc_id % 2 = 0")
        d2 = ref.filter("doc_id % 2 = 1")
        merged = kn_merge_counts(
            kn_trigram_counts(d1),
            kn_trigram_counts(d2),
            keys=("w1", "w2", "w3"),
            count_col="c123",
        )
        inc = kn_doc_logprob3_from_counts(tgt, merged)
        full = kn_doc_logprob3(tgt, ref)
        assert inc.exceptAll(full).count() == 0
        assert full.exceptAll(inc).count() == 0

    def test_reference_phrasing_scores_higher(self, spark):
        """The CCNet property at the trigram tier: text phrased like
        the reference corpus outscores shuffled-vocab noise."""
        rng = random.Random(7)
        template = "the cat sat on the mat and the dog sat on the rug"
        ref = spark.createDataFrame(
            [(i, template) for i in range(20)],
            "doc_id long, text string",
        )
        words = template.split()
        noise = " ".join(rng.sample(words, len(words)))
        tgt = spark.createDataFrame(
            [(0, template), (1, noise)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["mean_kn_logprob"]
            for r in kn_doc_logprob3(tgt, ref).collect()
        }
        assert got[0] > got[1]

    def test_validation(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c")], "doc_id long, text string"
        )
        with pytest.raises(ValueError):
            kn_doc_logprob3(df, df, discount=1.5)


class TestKnTrigramByGroup:
    def _data(self, spark):
        import pyspark.sql.functions as F
        import random

        rng = random.Random(41)
        vocab = {
            "en": [f"e{i}" for i in range(15)],
            "fr": [f"f{i}" for i in range(15)],
        }
        rows_ref, rows_tgt = [], []
        did = 0
        for g, vs in vocab.items():
            for _ in range(25):
                rows_ref.append(
                    (did, g, " ".join(
                        rng.choice(vs) for _ in range(rng.randint(3, 25))
                    ))
                )
                did += 1
            for _ in range(15):
                rows_tgt.append(
                    (did, g, " ".join(
                        rng.choice(vs + ["zzq"])
                        for _ in range(rng.randint(3, 20))
                    ))
                )
                did += 1
        rows_tgt.append((9000, "de", "kein modell hier vorhanden"))
        ref = spark.createDataFrame(
            rows_ref, "doc_id long, lang string, text string"
        )
        tgt = spark.createDataFrame(
            rows_tgt, "doc_id long, lang string, text string"
        )
        return ref, tgt, F

    def test_equals_flat_per_group(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            kn_doc_logprob3_by_group,
        )

        ref, tgt, F = self._data(spark)
        grouped = {
            (r["lang"], r["doc_id"]): (
                r["n_trigrams"], r["n_unseen"], r["mean_kn_logprob"]
            )
            for r in kn_doc_logprob3_by_group(tgt, ref).collect()
        }
        for g in ("en", "fr"):
            flat = {
                (g, r["doc_id"]): (
                    r["n_trigrams"], r["n_unseen"], r["mean_kn_logprob"]
                )
                for r in kn_doc_logprob3(
                    tgt.filter(F.col("lang") == g),
                    ref.filter(F.col("lang") == g),
                ).collect()
            }
            sub = {k: v for k, v in grouped.items() if k[0] == g}
            assert sub == flat

    def test_missing_group_scores_null(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            kn_doc_logprob3_by_group,
        )

        ref, tgt, F = self._data(spark)
        rows = kn_doc_logprob3_by_group(tgt, ref).filter(
            F.col("lang") == "de"
        ).collect()
        assert len(rows) == 1
        assert rows[0]["mean_kn_logprob"] is None
        assert rows[0]["n_trigrams"] == 2

    def test_merged_grouped_snapshot(self, spark):
        from spark_bestfit_spark.operators.textstats import (
            kn_doc_logprob3_by_group,
            kn_doc_logprob3_by_group_from_counts,
            kn_trigram_counts_by_group,
        )

        ref, tgt, F = self._data(spark)
        d1 = ref.filter("doc_id % 2 = 0")
        d2 = ref.filter("doc_id % 2 = 1")
        merged = kn_merge_counts(
            kn_trigram_counts_by_group(d1),
            kn_trigram_counts_by_group(d2),
            keys=("lang", "w1", "w2", "w3"),
            count_col="c123",
        )
        inc = kn_doc_logprob3_by_group_from_counts(tgt, merged)
        full = kn_doc_logprob3_by_group(tgt, ref)
        assert inc.exceptAll(full).count() == 0
        assert full.exceptAll(inc).count() == 0
