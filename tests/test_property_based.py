"""Property-based tests (hypothesis) — reference test layer 3
(test_property_based.py semantics): serialization round-trips preserve
fields; PDF >= 0; CDF in [0,1] and monotone; PPF inverts CDF — over
randomized parameters for a set of stable distributions."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from spark_bestfit_spark.functions.distributions.registry import (
    get_continuous,
    get_discrete,
)
from spark_bestfit_spark.results import DistributionFitResult

# Stable families and their valid param strategies (loc, scale kept sane)
LOC = st.floats(-100.0, 100.0)
SCALE = st.floats(0.01, 100.0)
POS_SHAPE = st.floats(0.3, 8.0)

CONTINUOUS_STRATEGIES = {
    "norm": st.tuples(LOC, SCALE),
    "expon": st.tuples(LOC, SCALE),
    "uniform": st.tuples(LOC, SCALE),
    "logistic": st.tuples(LOC, SCALE),
    "laplace": st.tuples(LOC, SCALE),
    "gumbel_r": st.tuples(LOC, SCALE),
    "gumbel_l": st.tuples(LOC, SCALE),
    "rayleigh": st.tuples(LOC, SCALE),
    "gamma": st.tuples(POS_SHAPE, LOC, SCALE),
    "lognorm": st.tuples(st.floats(0.1, 2.0), LOC, SCALE),
    "weibull_min": st.tuples(st.floats(0.5, 5.0), LOC, SCALE),
    "pareto": st.tuples(st.floats(1.2, 8.0), LOC, SCALE),
    "chi2": st.tuples(st.floats(1.0, 30.0), LOC, SCALE),
    "beta": st.tuples(POS_SHAPE, POS_SHAPE, LOC, SCALE),
    "t": st.tuples(st.floats(2.5, 30.0), LOC, SCALE),
    "invgamma": st.tuples(st.floats(1.5, 8.0), LOC, SCALE),
    # a*c >= 0.5 keeps ppf(0.01) above ~1e-8: below that the quantile is
    # absorbed by loc in float64 and no engine can round-trip it
    "gengamma": st.tuples(
        POS_SHAPE, st.floats(0.4, 4.0), LOC, SCALE
    ).filter(lambda t: t[0] * t[1] >= 0.5),
    "rice": st.tuples(st.floats(0.0, 12.0), LOC, SCALE),
    "jf_skew_t": st.tuples(
        st.floats(1.0, 6.0), st.floats(1.0, 6.0), LOC, SCALE
    ),
    "norminvgauss": st.tuples(
        st.floats(0.8, 5.0), st.floats(-0.5, 0.5), LOC, SCALE
    ),
    # excluded-set kernels with cheap closed-form/series numerics (the
    # quadrature-heavy ones — levy_stable, studentized_range,
    # genhyperbolic — are covered by fixed-case tests; per-example
    # hypothesis would dominate suite wall-time)
    "mielke": st.tuples(
        st.floats(0.5, 5.0), st.floats(0.8, 5.0), LOC, SCALE
    ),
    "recipinvgauss": st.tuples(st.floats(0.2, 3.0), LOC, SCALE),
    "exponpow": st.tuples(st.floats(0.5, 4.0), LOC, SCALE),
    "tukeylambda": st.tuples(st.floats(-0.5, 0.9), LOC, SCALE),
    "kstwobign": st.tuples(LOC, SCALE),
}

QS = np.array([0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99])


@pytest.mark.parametrize("name", sorted(CONTINUOUS_STRATEGIES))
class TestContinuousProperties:
    @settings(max_examples=25, deadline=None)
    @given(data=st.data())
    def test_cdf_in_unit_interval_and_monotone(self, name, data):
        params = data.draw(CONTINUOUS_STRATEGIES[name])
        d = get_continuous(name)
        x = d.ppf(QS, *params)
        c = d.cdf(x, *params)
        assert np.all((c >= 0.0) & (c <= 1.0))
        assert np.all(np.diff(c) >= -1e-9)

    @settings(max_examples=25, deadline=None)
    @given(data=st.data())
    def test_pdf_nonnegative(self, name, data):
        params = data.draw(CONTINUOUS_STRATEGIES[name])
        d = get_continuous(name)
        x = d.ppf(np.linspace(0.05, 0.95, 13), *params)
        assert np.all(d.pdf(x, *params) >= 0.0)

    @settings(max_examples=25, deadline=None)
    @given(data=st.data())
    def test_ppf_inverts_cdf(self, name, data):
        params = data.draw(CONTINUOUS_STRATEGIES[name])
        d = get_continuous(name)
        x = d.ppf(QS, *params)
        assert np.all(np.isfinite(x))
        back = d.cdf(x, *params)
        assert np.allclose(back, QS, atol=5e-4)


DISCRETE_STRATEGIES = {
    "poisson": st.tuples(st.floats(0.2, 40.0)),
    "geom": st.tuples(st.floats(0.05, 0.95)),
    "bernoulli": st.tuples(st.floats(0.05, 0.95)),
    "nbinom": st.tuples(st.floats(1.0, 20.0), st.floats(0.1, 0.9)),
    "binom": st.tuples(st.integers(1, 40), st.floats(0.05, 0.95)),
    "dlaplace": st.tuples(st.floats(0.1, 2.0)),
}


@pytest.mark.parametrize("name", sorted(DISCRETE_STRATEGIES))
class TestDiscreteProperties:
    @settings(max_examples=20, deadline=None)
    @given(data=st.data())
    def test_pmf_sums_to_one(self, name, data):
        params = tuple(
            float(v) for v in data.draw(DISCRETE_STRATEGIES[name])
        ) + (0.0,)
        d = get_discrete(name)
        hi = d.ppf(np.array([0.99999]), *params)[0]
        if not np.isfinite(hi):
            hi = 1000
        # two-sided support (e.g. dlaplace) needs a low tail too
        lo = 0 if np.isfinite(d.a) and d.a >= 0 else -int(hi) - 200
        ks = np.arange(lo, min(int(hi) + 200, 5000))
        total = float(np.sum(d.pmf(ks, *params)))
        assert total == pytest.approx(1.0, abs=2e-3)

    @settings(max_examples=20, deadline=None)
    @given(data=st.data())
    def test_cdf_matches_pmf_cumsum(self, name, data):
        params = tuple(
            float(v) for v in data.draw(DISCRETE_STRATEGIES[name])
        ) + (0.0,)
        d = get_discrete(name)
        lo = 0 if np.isfinite(d.a) and d.a >= 0 else -300
        ks = np.arange(lo, 30)
        cum = np.cumsum(d.pmf(ks, *params))
        base = float(d.cdf(np.array([lo - 1.0]), *params)[0])
        cdf = d.cdf(ks, *params)
        assert np.allclose(base + cum, cdf, atol=1e-5)


class TestSerializationProperties:
    @settings(max_examples=30, deadline=None)
    @given(
        dist=st.sampled_from(["norm", "gamma", "lognorm", "expon"]),
        col=st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1, max_size=12,
        ),
        sse=st.floats(0, 1e6, allow_nan=False),
        lb=st.none() | st.floats(-1e6, 0),
    )
    def test_result_roundtrip_preserves_fields(self, dist, col, sse, lb):
        n_shapes = {"norm": 0, "expon": 0, "gamma": 1, "lognorm": 1}[dist]
        params = tuple([1.5] * n_shapes) + (0.0, 1.0)
        r = DistributionFitResult(
            column_name=col, distribution=dist, parameters=params,
            sse=sse, aic=1.0, bic=2.0, ks_statistic=0.1, pvalue=0.5,
            lower_bound=lb,
        )
        back = DistributionFitResult.from_dict(r.to_dict())
        assert back.column_name == r.column_name
        assert back.distribution == r.distribution
        assert back.parameters == pytest.approx(r.parameters)
        assert back.sse == pytest.approx(r.sse)
        assert back.lower_bound == (
            pytest.approx(lb) if lb is not None else None
        )

    @settings(max_examples=15, deadline=None)
    @given(
        n=st.integers(2, 5),
        seed=st.integers(0, 10_000),
    )
    def test_copula_roundtrip_sampling_identical(self, n, seed, tmp_path_factory):
        from spark_bestfit_spark.models.copula import GaussianCopula, _Marginal

        rng = np.random.default_rng(seed)
        a = rng.uniform(-0.5, 0.5, (n, n))
        corr = np.corrcoef(rng.normal(0, 1, (max(n + 2, 8), n)) @ (np.eye(n) + a), rowvar=False)
        cols = [f"c{i}" for i in range(n)]
        cop = GaussianCopula(
            cols,
            {c: _Marginal("norm", (0.0, 1.0)) for c in cols},
            corr,
        )
        back = GaussianCopula.from_dict(cop.to_dict())
        s1 = cop.sample(50, seed=seed)
        s2 = back.sample(50, seed=seed)
        for c in cols:
            assert np.allclose(s1[c], s2[c])


class TestCurationProperties:
    """Hypothesis properties for the deterministic curation operators:
    whatever the weights, every row is assigned, assignments are
    partitioning-independent, and sampling rates respond monotonically
    to the token budget."""

    @given(
        ws=st.lists(st.floats(0.1, 5.0), min_size=2, max_size=4),
        seed=st.integers(0, 10_000),
    )
    @settings(max_examples=8, deadline=None)
    def test_hash_split_total_and_determinism(self, spark, ws, seed):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import hash_split

        names = [f"s{i}" for i in range(len(ws))]
        weights = dict(zip(names, ws))
        df = spark.range(0, 400).select(F.col("id").alias("doc_id"))
        out = hash_split(df, weights, seed=seed)
        rows = out.collect()
        assert len(rows) == 400
        assert {r.split for r in rows} <= set(names)
        again = sorted(
            (r.doc_id, r.split)
            for r in hash_split(
                df.repartition(7), weights, seed=seed
            ).collect()
        )
        assert sorted((r.doc_id, r.split) for r in rows) == again

    @given(t=st.floats(0.2, 1.0), budget=st.integers(100, 2000))
    @settings(max_examples=8, deadline=None)
    def test_temperature_sample_subset_and_monotone(self, spark, t, budget):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            temperature_sample,
        )

        df = spark.range(0, 300).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("string").alias("source"),
            F.lit("a b c d e").alias("text"),
        )
        kept = {
            r.doc_id
            for r in temperature_sample(
                df, temperature=t, target_tokens=budget
            ).collect()
        }
        assert kept <= set(range(300))
        # a bigger budget only raises per-domain rates: supersets only
        bigger = {
            r.doc_id
            for r in temperature_sample(
                df, temperature=t, target_tokens=budget * 2
            ).collect()
        }
        assert kept <= bigger

    @given(t_low=st.floats(0.2, 0.5), t_high=st.floats(0.6, 1.0))
    @settings(max_examples=8, deadline=None)
    def test_mixture_flattening_is_monotone_in_temperature(
        self, spark, t_low, t_high
    ):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            domain_mixture_weights,
        )

        df = spark.range(0, 330).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 300, "big").otherwise("small").alias(
                "source"
            ),
            F.lit("x y z").alias("text"),
        )
        lo = {
            r.source: r.w
            for r in domain_mixture_weights(df, temperature=t_low).collect()
        }
        hi = {
            r.source: r.w
            for r in domain_mixture_weights(df, temperature=t_high).collect()
        }
        # lower temperature flattens harder: the small domain's weight
        # under t_low must be >= its weight under t_high
        assert lo["small"] >= hi["small"] - 1e-12
        assert abs(sum(lo.values()) - 1.0) < 1e-9


class TestSequencePackingProperties:
    @settings(max_examples=8, deadline=None)
    @given(
        lens=st.lists(st.integers(1, 40), min_size=1, max_size=30),
        seq_len=st.integers(4, 64),
        sep=st.integers(0, 3),
    )
    def test_packing_matches_python_reference(
        self, spark, lens, seq_len, sep
    ):
        """Chunk arithmetic vs a direct Python fold: offsets are the
        exclusive prefix sum of effective lengths, spans follow from
        integer division, and the stream is gapless."""
        from spark_bestfit_spark.operators.curation import (
            pack_training_sequences,
        )

        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in pack_training_sequences(
                df, seq_len=seq_len, sep_tokens=sep
            ).collect()
        }
        cum = 0
        for i, n in enumerate(lens):
            eff = n + sep
            r = out[i]
            assert r["n_tokens"] == n
            assert r["start_offset"] == cum  # gapless concatenation
            assert r["first_seq"] == cum // seq_len
            assert r["last_seq"] == (cum + eff - 1) // seq_len
            assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
            cum += eff


class TestChunkingProperties:
    @settings(max_examples=8, deadline=None)
    @given(
        lens=st.lists(st.integers(0, 60), min_size=1, max_size=20),
        chunk=st.integers(2, 32),
        overlap_frac=st.floats(0.0, 0.99),
    )
    def test_chunking_matches_python_reference(
        self, spark, lens, chunk, overlap_frac
    ):
        """chunk_documents vs a direct Python fold for arbitrary doc
        lengths, chunk sizes, and overlaps: starts advance by stride,
        no-new-content tails are dropped, spans cover each document
        exactly once per stride step, and the chunk text is the literal
        token slice."""
        from spark_bestfit_spark.operators.curation import chunk_documents

        overlap = min(int(overlap_frac * chunk), chunk - 1)
        stride = chunk - overlap
        rows = [
            (i, " ".join(f"t{j}" for j in range(n)))
            for i, n in enumerate(lens)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got: dict = {}
        for r in chunk_documents(
            df, chunk_tokens=chunk, overlap=overlap
        ).collect():
            got.setdefault(r["doc_id"], []).append(r)
        for i, n in enumerate(lens):
            toks = [f"t{j}" for j in range(n)]
            exp = []
            for idx, start in enumerate(
                s for s in range(0, n, stride)
                if s == 0 or s + overlap < n
            ):
                piece = toks[start : start + chunk]
                exp.append((idx, start, len(piece), " ".join(piece)))
            act = sorted(
                (r["chunk_idx"], r["start_token"], r["n_chunk_tokens"],
                 r["chunk_text"])
                for r in got.get(i, [])
            )
            assert act == exp, (i, n, chunk, overlap)


class TestWassersteinProperties:
    @settings(max_examples=8, deadline=None)
    @given(
        xs=st.lists(
            st.integers(-50, 50), min_size=1, max_size=60
        ),
        ys=st.lists(
            st.integers(-50, 50), min_size=1, max_size=60
        ),
        buckets=st.integers(1, 64),
    )
    def test_w1_matches_numpy_reference(self, spark, xs, ys, buckets):
        """wasserstein_distance_df vs the direct sorted-ECDF integral
        for arbitrary integer samples (maximal ties, arbitrary bucket
        counts — bucket boundaries must never change the answer)."""
        import numpy as np
        import pandas as pd

        from spark_bestfit_spark.operators.stats import (
            wasserstein_distance_df,
        )

        x = np.asarray(xs, dtype=float)
        y = np.asarray(ys, dtype=float)
        a = spark.createDataFrame(pd.DataFrame({"v": x}))
        b = spark.createDataFrame(pd.DataFrame({"v": y}))
        got = wasserstein_distance_df(
            a, b, "v", num_buckets=buckets
        ).first()

        vs = np.unique(np.concatenate([np.sort(x), np.sort(y)]))
        fa = np.searchsorted(np.sort(x), vs, side="right") / len(x)
        fb = np.searchsorted(np.sort(y), vs, side="right") / len(y)
        ref = (
            float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(vs)))
            if len(vs) > 1
            else 0.0
        )
        assert got["w1"] == pytest.approx(round(ref, 6), abs=2e-6)
        assert (got["n_a"], got["n_b"]) == (len(x), len(y))


class TestTokenBudgetProperties:
    @settings(max_examples=8, deadline=None)
    @given(
        docs=st.lists(
            st.tuples(
                st.integers(1, 30),       # token count
                st.integers(0, 5),        # quality bucket (ties!)
            ),
            min_size=1,
            max_size=25,
        ),
        budget=st.integers(1, 300),
    )
    def test_budget_selection_matches_greedy_fold(
        self, spark, docs, budget
    ):
        """select_within_token_budget vs a direct greedy fold over the
        (quality DESC, id ASC) ranking for arbitrary corpora, tie-heavy
        qualities, and arbitrary budgets — the cut must be the exact
        maximal prefix."""
        from spark_bestfit_spark.operators.curation import (
            select_within_token_budget,
        )

        rows = [
            (i, " ".join(f"w{j}" for j in range(n)), float(q))
            for i, (n, q) in enumerate(docs)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, q double")
        got = sorted(
            (r["doc_id"], r["n_tokens"], r["cum_tokens"])
            for r in select_within_token_budget(
                df, max_tokens=budget, quality_col="q"
            ).collect()
        )
        ranked = sorted(
            ((i, n, q) for i, (n, q) in enumerate(docs)),
            key=lambda t: (-t[2], t[0]),
        )
        exp, cum = [], 0
        for i, n, _ in ranked:
            if cum + n > budget:
                break
            cum += n
            exp.append((i, n, cum))
        assert got == sorted(exp), (docs, budget)


class TestStratifiedSplitProperties:
    """Whatever the weights and strata: every row assigned, every
    stratum hits its cumulative-floor quota EXACTLY, and the
    assignment is a pure function of the data (partition-invariant)."""

    @given(
        ws=st.lists(st.floats(0.05, 5.0), min_size=2, max_size=4),
        n_strata=st.integers(1, 5),
        seed=st.integers(0, 10_000),
    )
    @settings(max_examples=8, deadline=None)
    def test_exact_quotas_any_weights(self, spark, ws, n_strata, seed):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            stratified_split,
        )

        names = [f"s{i}" for i in range(len(ws))]
        weights = dict(zip(names, ws))
        total = sum(ws)
        df = spark.range(0, 331).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % n_strata).alias("lab"),
        )
        out = stratified_split(df, ["lab"], weights, seed=seed)
        rows = out.collect()
        assert len(rows) == 331
        counts = {}
        strata_n = {}
        for r in rows:
            counts[(r.lab, r.split)] = counts.get((r.lab, r.split), 0) + 1
            strata_n[r.lab] = strata_n.get(r.lab, 0) + 1
        import math

        for lab, n in strata_n.items():
            acc = 0.0
            prev_t = 0
            for name in names[:-1]:
                acc += weights[name] / total
                t = math.floor(acc * n)
                assert counts.get((lab, name), 0) == t - prev_t
                prev_t = t
            assert counts.get((lab, names[-1]), 0) == n - prev_t

    @given(seed=st.integers(0, 10_000))
    @settings(max_examples=5, deadline=None)
    def test_partition_invariance(self, spark, seed):
        import pyspark.sql.functions as F

        from spark_bestfit_spark.operators.curation import (
            stratified_split,
        )

        df = spark.range(0, 200).select(
            F.col("id").alias("doc_id"), (F.col("id") % 3).alias("lab")
        )
        a = sorted(
            (r.doc_id, r.split)
            for r in stratified_split(df, ["lab"], seed=seed).collect()
        )
        b = sorted(
            (r.doc_id, r.split)
            for r in stratified_split(
                df.repartition(11), ["lab"], seed=seed
            ).collect()
        )
        assert a == b


class TestSaltedJoinProperties:
    """For any random relations and salt factor, salted_join's output
    multiset equals the plain join's — inner and left."""

    @given(
        n_big=st.integers(10, 200),
        n_keys=st.integers(1, 8),
        dup=st.integers(1, 3),
        salt=st.integers(2, 9),
        how=st.sampled_from(["inner", "left"]),
        seed=st.integers(0, 1000),
    )
    @settings(max_examples=8, deadline=None)
    def test_matches_plain_join(
        self, spark, n_big, n_keys, dup, salt, how, seed
    ):
        import numpy as np

        from spark_bestfit_spark.operators.skew import salted_join

        rng = np.random.default_rng(seed)
        big_rows = [
            (int(i), f"k{rng.integers(0, n_keys + 2)}")
            for i in range(n_big)
        ]  # +2: some keys miss the dim
        small_rows = [
            (f"k{k}", int(k * 10 + d))
            for k in range(n_keys)
            for d in range(dup)
        ] + [(None, -1)]
        big = spark.createDataFrame(big_rows, "row_id long, k string")
        small = spark.createDataFrame(
            small_rows, "k string, payload int"
        )
        ours = sorted(
            (r.row_id, r.k, r.payload)
            for r in salted_join(big, small, ["k"], salt=salt,
                                 how=how).collect()
        )
        plain = sorted(
            (r.row_id, r.k, r.payload)
            for r in big.join(small, "k", how).collect()
        )
        assert ours == plain


class TestQuantizationProperties:
    """For any random vectors: every reconstruction error within
    scale/2, codes in range, round-trip deterministic."""

    @given(
        n=st.integers(3, 60),
        dim=st.integers(1, 12),
        spread=st.floats(0.1, 1000.0),
        seed=st.integers(0, 1000),
    )
    @settings(max_examples=8, deadline=None)
    def test_error_bound_holds(self, spark, n, dim, spread, seed):
        import numpy as np

        from spark_bestfit_spark.operators.similarity import (
            dequantize_embeddings,
            embedding_quant_params,
            quantize_embeddings,
        )

        rng = np.random.default_rng(seed)
        pts = spread * rng.normal(0.0, 1.0, (n, dim))
        rows = [(int(i), [float(x) for x in pts[i]]) for i in range(n)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        params = embedding_quant_params(df, dim)
        out = dequantize_embeddings(
            quantize_embeddings(df, params), params
        ).collect()
        for r in out:
            for i, (x, q, h) in enumerate(
                zip(r.embedding, r.q_embedding, r.embedding_hat)
            ):
                lo, hi = params[i]
                scale = (hi - lo) / 255 if hi > lo else 1.0
                assert 0 <= q <= 255
                assert abs(x - h) <= scale * 0.5000001
