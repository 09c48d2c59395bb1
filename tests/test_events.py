"""Event-analytics operators (funnel / cohort / transitions / resample)
and the Misra-Gries heavy-hitters pass, cross-checked against pandas
and exact recomputation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql.functions import col as F_col

from spark_bestfit_spark.operators.events import (
    cohort_retention,
    event_transitions,
    funnel,
    resample_events,
)
from spark_bestfit_spark.operators.frequency import heavy_hitters


def _events_pdf(n=2000, n_users=40, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.integers(0, n_users, n),
            "ts": rng.integers(0, 10_000, n).astype("int64"),
            "event_type": rng.choice(
                ["view", "click", "signup", "purchase", "error"], n
            ),
            "value": rng.normal(5.0, 2.0, n).round(3),
        }
    )


class TestFunnel:
    def test_hand_case_with_window(self, spark):
        rows = [
            # u1 completes view -> click -> purchase inside the window
            (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
            # u2: purchase BEFORE click (order violated at level 3)
            (2, 10, "view"), (2, 30, "click"), (2, 20, "purchase"),
            # u3: click only after the window deadline (entry at 10)
            (3, 10, "view"), (3, 200, "click"),
            # u4: never enters
            (4, 5, "click"), (4, 6, "purchase"),
            # u5: same-ts click cannot satisfy the next step (strict >)
            (5, 10, "view"), (5, 10, "click"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        got = {
            r["user_id"]: r
            for r in funnel(
                df, ["view", "click", "purchase"], window=50
            ).collect()
        }
        assert got[1]["funnel_level"] == 3
        assert (got[1]["step1_ts"], got[1]["step2_ts"], got[1]["step3_ts"]) \
            == (10, 20, 30)
        assert got[2]["funnel_level"] == 2  # purchase precedes click
        assert got[3]["funnel_level"] == 1  # click outside window
        assert got[4]["funnel_level"] == 0
        assert got[4]["step1_ts"] is None
        assert got[5]["funnel_level"] == 1  # same-ts: strict progression

    def test_matches_pandas_greedy(self, spark):
        pdf = _events_pdf()
        df = spark.createDataFrame(pdf)
        steps, window = ["view", "click", "purchase"], 3000
        got = {
            r["user_id"]: r
            for r in funnel(df, steps, window=window).collect()
        }
        for uid, grp in pdf.sort_values(["ts", "event_id"]).groupby(
            "user_id"
        ):
            t_prev, t0, exp = None, None, []
            for step in steps:
                sel = grp[grp["event_type"] == step]
                if t_prev is not None:
                    sel = sel[sel["ts"] > t_prev]
                    sel = sel[sel["ts"] <= t0 + window]
                t = int(sel["ts"].min()) if len(sel) else None
                exp.append(t)
                if t is None:
                    break
                t_prev = t
                if t0 is None:
                    t0 = t
            r = got[uid]
            lvl = len([t for t in exp if t is not None])
            assert r["funnel_level"] == lvl, (uid, exp)
            for i, t in enumerate(exp):
                assert r[f"step{i + 1}_ts"] == t, (uid, i)

    def test_validation_and_plan(self, spark):
        df = spark.createDataFrame(
            _events_pdf(200)[["user_id", "ts", "event_type"]]
        )
        with pytest.raises(ValueError, match="steps"):
            funnel(df, ["view"])
        with pytest.raises(ValueError, match="window"):
            funnel(df, ["view", "click"], window=0)
        plan = (
            funnel(df, ["view", "click", "purchase"], window=100)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # one entity-hash exchange feeds the window chain AND the final
        # groupBy (partitioning already satisfied — no re-exchange)
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "SinglePartition" not in plan


class TestCohortRetention:
    def test_matches_pandas(self, spark):
        pdf = _events_pdf(3000, n_users=60, seed=11)
        df = spark.createDataFrame(pdf)
        period = 1000
        got = {
            (r["cohort_period"], r["period_offset"]): r
            for r in cohort_retention(df, period=period).collect()
        }
        p = pdf.assign(pid=pdf["ts"] // period)
        first = p.groupby("user_id")["pid"].min().rename("cohort")
        j = p.join(first, on="user_id")
        j["off"] = j["pid"] - j["cohort"]
        exp = (
            j.groupby(["cohort", "off"])["user_id"].nunique().reset_index()
        )
        sizes = {
            c: int(n)
            for (c, o), n in exp.set_index(["cohort", "off"])[
                "user_id"
            ].items()
            if o == 0
        }
        assert len(got) == len(exp)
        for _, row in exp.iterrows():
            r = got[(row["cohort"], row["off"])]
            assert r["n_active"] == row["user_id"]
            assert r["cohort_size"] == sizes[row["cohort"]]
            assert r["retention"] == pytest.approx(
                round(row["user_id"] / sizes[row["cohort"]], 6)
            )

    def test_offset_zero_full_retention_and_validation(self, spark):
        df = spark.createDataFrame(_events_pdf(500))
        with pytest.raises(ValueError, match="period"):
            cohort_retention(df, period=0)
        out = cohort_retention(df, period=2000, max_offset=2)
        rows = out.collect()
        assert all(r["period_offset"] <= 2 for r in rows)
        for r in rows:
            if r["period_offset"] == 0:
                assert r["retention"] == 1.0


class TestEventTransitions:
    def test_matches_pandas(self, spark):
        pdf = _events_pdf(2500, seed=3)
        df = spark.createDataFrame(pdf)
        got = {
            (r["prev_event"], r["event"]): r
            for r in event_transitions(
                df, tiebreak_col="event_id"
            ).collect()
        }
        s = pdf.sort_values(["user_id", "ts", "event_id"])
        s["prev"] = s.groupby("user_id")["event_type"].shift(1)
        exp = (
            s.dropna(subset=["prev"])
            .groupby(["prev", "event_type"])
            .size()
        )
        assert len(got) == len(exp)
        totals = exp.groupby(level=0).sum()
        for (prev, ev), n in exp.items():
            r = got[(prev, ev)]
            assert r["n_transitions"] == n
            assert r["p_transition"] == pytest.approx(
                round(n / totals[prev], 6)
            )

    def test_probabilities_sum_to_one(self, spark):
        df = spark.createDataFrame(_events_pdf(1000))
        out = event_transitions(df, tiebreak_col="event_id").toPandas()
        for _, grp in out.groupby("prev_event"):
            assert grp["p_transition"].sum() == pytest.approx(1.0, abs=1e-4)


class TestResampleEvents:
    def test_matches_pandas_ffill(self, spark):
        pdf = _events_pdf(800, n_users=12, seed=19)
        df = spark.createDataFrame(pdf)
        bucket = 700
        got = {
            (r["user_id"], r["bucket_id"]): r
            for r in resample_events(
                df, bucket=bucket, fill="ffill"
            ).collect()
        }
        p = pdf.assign(bid=pdf["ts"] // bucket)
        agg = p.groupby(["user_id", "bid"])["value"].agg(["count", "mean"])
        n_expected = 0
        for uid in p["user_id"].unique():
            sub = agg.loc[uid]
            full = sub.reindex(
                range(int(sub.index.min()), int(sub.index.max()) + 1)
            )
            filled = full["mean"].round(6).ffill()
            n_expected += len(full)
            for bid in full.index:
                r = got[(uid, bid)]
                cnt = full.loc[bid, "count"]
                if np.isnan(cnt):
                    assert r["n_events"] == 0 and r["is_gap"]
                else:
                    assert r["n_events"] == int(cnt) and not r["is_gap"]
                assert r["bucket_value"] == pytest.approx(
                    filled.loc[bid], abs=1e-6
                )
        assert len(got) == n_expected

    def test_zero_and_none_fill(self, spark):
        rows = [(1, 0, 2.0), (1, 2500, 4.0)]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        zero = {
            r["bucket_id"]: r
            for r in resample_events(
                df, bucket=1000, fill="zero"
            ).collect()
        }
        assert zero[1]["bucket_value"] == 0.0 and zero[1]["is_gap"]
        none = {
            r["bucket_id"]: r
            for r in resample_events(df, bucket=1000, fill=None).collect()
        }
        assert none[1]["bucket_value"] is None
        assert none[0]["bucket_value"] == 2.0
        assert none[2]["bucket_value"] == 4.0

    def test_bucketing_exact_at_epoch_nanos(self, spark):
        """floor(ts / bucket) through DOUBLE division misbuckets
        epoch-nano timestamps (>2^53); the integer floor-div must put
        week_end = m*p - 1 in bucket m-1, not m, and handle negatives."""
        p = 604_800_000_000_000  # one week of nanoseconds
        m = 2812  # ~2024 epoch-nanos territory, above 2^53
        rows = [
            (1, m * p - 1, 1.0),  # last nanosecond of week m-1
            (1, m * p, 2.0),  # first nanosecond of week m
            (2, -1, 3.0),  # floor(-1/p) = -1, not 0
            (2, 0, 4.0),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        got = {
            (r["user_id"], r["bucket_id"]): r["bucket_value"]
            for r in resample_events(df, bucket=p, fill=None).collect()
        }
        assert got[(1, m - 1)] == 1.0
        assert got[(1, m)] == 2.0
        assert got[(2, -1)] == 3.0
        assert got[(2, 0)] == 4.0
        coh = {
            (r["cohort_period"], r["period_offset"])
            for r in cohort_retention(
                df.filter(F_col("user_id") == 1), period=p
            ).collect()
        }
        assert coh == {(m - 1, 0), (m - 1, 1)}

    def test_span_guard_and_validation(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 1.0), (1, 10**9, 1.0)], ["user_id", "ts", "value"]
        )
        with pytest.raises(ValueError, match="bucket"):
            resample_events(df, bucket=0)
        with pytest.raises(ValueError, match="fill"):
            resample_events(df, fill="bfill")
        with pytest.raises(Exception, match="more than 100 buckets"):
            resample_events(df, bucket=1, max_buckets=100).collect()


class TestSessionPaths:
    def test_matches_pandas_sessionization(self, spark):
        from spark_bestfit_spark.operators.events import session_paths

        pdf = _events_pdf(1500, n_users=25, seed=61)
        df = spark.createDataFrame(pdf)
        gap = 150
        got = {
            r["path"]: r["n_sessions"]
            for r in session_paths(
                df, gap=gap, tiebreak_col="event_id", max_len=8
            ).collect()
        }
        exp: dict = {}
        for uid, grp in pdf.sort_values(["ts", "event_id"]).groupby(
            "user_id"
        ):
            cur, prev = [], None
            sessions = []
            for ts, ev in zip(grp["ts"], grp["event_type"]):
                if prev is not None and ts - prev > gap:
                    sessions.append(cur)
                    cur = []
                cur.append(ev)
                prev = ts
            sessions.append(cur)
            for s in sessions:
                p = ">".join(s[:8])
                exp[p] = exp.get(p, 0) + 1
        assert got == exp

    def test_gap_splits_and_truncation(self, spark):
        from spark_bestfit_spark.operators.events import session_paths

        rows = [
            (1, 0, "a", 0), (1, 10, "b", 1),  # session 1: a>b
            (1, 500, "c", 2),  # session 2: c
            (2, 0, "a", 3), (2, 5, "b", 4), (2, 9, "c", 5),  # a>b (cap 2)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts long, event_type string, event_id long"
        )
        got = {
            r["path"]: r["n_sessions"]
            for r in session_paths(
                df, gap=100, tiebreak_col="event_id", max_len=2
            ).collect()
        }
        assert got == {"a>b": 2, "c": 1}
        with pytest.raises(ValueError, match="gap"):
            session_paths(df, gap=0)


class TestSessionize:
    def test_session_ids_match_sql_cumsum(self, spark):
        from spark_bestfit_spark.operators.events import sessionize

        pdf = _events_pdf(800, n_users=15, seed=73)
        df = spark.createDataFrame(pdf)
        got = sessionize(
            df, gap=200, tiebreak_col="event_id"
        ).toPandas()
        assert len(got) == len(pdf)
        s = got.sort_values(["user_id", "ts", "event_id"])
        for uid, grp in s.groupby("user_id"):
            sid, prev = 0, None
            for ts, g_sid in zip(grp["ts"], grp["session_id"]):
                if prev is None or ts - prev > 200:
                    sid += 1
                assert g_sid == sid, (uid, ts)
                prev = ts
        with pytest.raises(ValueError, match="gap"):
            sessionize(df, gap=0)


class TestPivotCounts:
    def test_count_pivot_matches_pandas(self, spark):
        from spark_bestfit_spark.operators.events import pivot_counts

        pdf = _events_pdf(1200, seed=67)
        pdf["day"] = pdf["ts"] // 1000
        df = spark.createDataFrame(pdf)
        vals = ["view", "click", "signup", "purchase", "error"]
        got = pivot_counts(df, "day", "event_type", vals).toPandas()
        exp = pd.crosstab(pdf["day"], pdf["event_type"])
        for _, r in got.iterrows():
            for v in vals:
                e = (
                    exp.loc[r["day"], v]
                    if v in exp.columns and r["day"] in exp.index
                    else 0
                )
                assert r[v] == e, (r["day"], v)

    def test_sum_avg_and_validation(self, spark):
        from spark_bestfit_spark.operators.events import pivot_counts

        rows = [
            ("d1", "a", 2.0), ("d1", "a", 4.0), ("d2", "b", 10.0),
        ]
        df = spark.createDataFrame(rows, "day string, k string, v double")
        s = {
            r["day"]: r
            for r in pivot_counts(
                df, "day", "k", ["a", "b"], "v", agg="sum"
            ).collect()
        }
        assert s["d1"]["a"] == 6.0 and s["d1"]["b"] == 0.0
        assert s["d2"]["b"] == 10.0
        a = {
            r["day"]: r
            for r in pivot_counts(
                df, "day", "k", ["a", "b"], "v", agg="avg"
            ).collect()
        }
        assert a["d1"]["a"] == 3.0
        assert a["d1"]["b"] is None  # avg of nothing is unknown, not 0
        with pytest.raises(ValueError, match="values"):
            pivot_counts(df, "day", "k", [])
        with pytest.raises(ValueError, match="value_col"):
            pivot_counts(df, "day", "k", ["a"], agg="sum")


class TestEventsAnsi:
    def test_events_wave_survives_ansi(self, spark):
        """funnel / cohort / transitions / resample / heavy_hitters
        must produce identical outputs under ansi=true — extreme
        timestamps included (no overflowing arithmetic, no double-
        division bucketing, no invalid casts)."""
        rows = [
            (1, 10, "view", 1.0, 1),
            (1, 20, "click", 2.0, 2),
            (1, 30, "purchase", 3.0, 3),
            (2, 2**62, "view", 4.0, 4),
            (2, 2**62 + 5, "click", 5.0, 5),
            (3, 2**63 - 10, "view", 6.0, 6),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts long, event_type string, "
            "value double, event_id long"
        )

        def run():
            fun = sorted(
                tuple(r) for r in funnel(
                    df, ["view", "click", "purchase"], window=100
                ).collect()
            )
            coh = sorted(
                tuple(r) for r in cohort_retention(
                    df, period=1000
                ).collect()
            )
            tra = sorted(
                tuple(r) for r in event_transitions(
                    df, tiebreak_col="event_id"
                ).collect()
            )
            res = sorted(
                tuple(r) for r in resample_events(
                    df, bucket=10**15, fill="ffill"
                ).collect()
            )
            hh = sorted(
                tuple(r)
                for r in heavy_hitters(df, "event_type", 0.3).collect()
            )
            from spark_bestfit_spark.operators.asof import rolling_stats
            from spark_bestfit_spark.operators.frequency import (
                heavy_hitters_by_group,
            )

            rt = sorted(
                tuple(r)
                for r in rolling_stats(
                    df, "value", "ts", "user_id",
                    time_window=10**15, min_periods=1,
                ).collect()
            )
            hg = sorted(
                tuple(r)
                for r in heavy_hitters_by_group(
                    df, "event_type", "user_id", 0.3
                ).collect()
            )
            return fun, coh, tra, res, hh, rt, hg

        before = run()
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            after = run()
        finally:
            spark.conf.set("spark.sql.ansi.enabled", "false")
        assert before == after
        # u1 converts, u2 stalls at click, u3 never clicks
        levels = {r[0]: r[1] for r in before[0]}
        assert levels == {1: 3, 2: 2, 3: 1}


class TestHeavyHitters:
    @staticmethod
    def _skewed_pdf(seed=23):
        rng = np.random.default_rng(seed)
        # Zipf-ish: a few hot tokens over a long tail
        vocab = [f"tok{i}" for i in range(500)]
        weights = 1.0 / np.arange(1, 501) ** 1.3
        weights /= weights.sum()
        return pd.DataFrame(
            {"tok": rng.choice(vocab, 20_000, p=weights)}
        )

    def test_exact_and_partitioning_invariant(self, spark):
        import math

        pdf = self._skewed_pdf()
        phi = 0.01
        n = len(pdf)
        thresh = math.ceil(phi * n)
        exp = pdf["tok"].value_counts()
        exp = exp[exp >= thresh]
        assert 3 <= len(exp) <= 60  # the test corpus really is skewed
        for parts in (1, 7, 32):
            df = spark.createDataFrame(pdf).repartition(parts)
            got = {
                r["item"]: r for r in heavy_hitters(df, "tok", phi).collect()
            }
            assert set(got) == set(exp.index), parts
            for tok, cnt in exp.items():
                assert got[tok]["n"] == cnt
                assert got[tok]["frac"] == pytest.approx(
                    round(cnt / n, 6)
                )

    def test_small_k_still_exact_when_guarantee_holds(self, spark):
        pdf = self._skewed_pdf(seed=5)
        df = spark.createDataFrame(pdf).repartition(16)
        phi = 0.02
        # minimal admissible width: k + 1 > 1/phi
        got = heavy_hitters(df, "tok", phi, k=51).toPandas()
        exp = pdf["tok"].value_counts()
        import math

        exp = exp[exp >= math.ceil(phi * len(pdf))]
        assert set(got["item"]) == set(exp.index)

    def test_validation(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"tok": ["a", "b"]}))
        with pytest.raises(ValueError, match="phi"):
            heavy_hitters(df, "tok", 0.0)
        with pytest.raises(ValueError, match="k=10"):
            heavy_hitters(df, "tok", 0.05, k=10)

    def test_grouped_exact_and_partitioning_invariant(self, spark):
        import math

        from spark_bestfit_spark.operators.frequency import (
            heavy_hitters_by_group,
        )

        rng = np.random.default_rng(41)
        vocab = [f"t{i}" for i in range(300)]
        w1 = 1.0 / np.arange(1, 301) ** 1.4
        w1 /= w1.sum()
        w2 = w1[::-1].copy()  # the OTHER group's hot items differ
        pdf = pd.DataFrame({
            "g": np.repeat(["ga", "gb"], 8000),
            "tok": np.concatenate([
                rng.choice(vocab, 8000, p=w1),
                rng.choice(vocab, 8000, p=w2),
            ]),
        })
        phi = 0.02
        exp = {}
        for g, grp in pdf.groupby("g"):
            t = math.ceil(phi * len(grp))
            vc = grp["tok"].value_counts()
            for tok, c in vc[vc >= t].items():
                exp[(g, tok)] = (int(c), round(c / len(grp), 6))
        assert len(exp) > 6
        for parts in (1, 16):
            df = spark.createDataFrame(pdf).repartition(parts)
            got = {
                (r["g"], r["item"]): (r["n"], r["frac"])
                for r in heavy_hitters_by_group(
                    df, "tok", "g", phi
                ).collect()
            }
            assert got.keys() == exp.keys(), parts
            for key, (n, frac) in exp.items():
                assert got[key][0] == n
                assert got[key][1] == pytest.approx(frac)

    def test_nulls_ignored_and_numeric_items(self, spark):
        pdf = pd.DataFrame(
            {"v": [1, 1, 1, 1, 2, 2, 3, None, None]}, dtype="Int64"
        )
        df = spark.createDataFrame(pdf)
        got = {r["item"]: r for r in heavy_hitters(df, "v", 0.3).collect()}
        # N = 7 non-null; ceil(0.3*7) = 3 -> only the value 1 qualifies
        assert set(got) == {1}
        assert got[1]["n"] == 4
        assert got[1]["frac"] == pytest.approx(round(4 / 7, 6))


class TestAttributeConversions:
    def _df(self, spark):
        rows = [
            # entity, ts, type, value, id
            ("u1", 10, "click", None, 1),
            ("u1", 20, "view", None, 2),
            ("u1", 30, "purchase", 100.0, 3),
            ("u1", 40, "click", None, 4),
            ("u1", 50, "purchase", 50.0, 5),
            ("u2", 5, "purchase", 9.0, 6),     # no touch at all
            ("u3", 7, "view", None, 7),
            ("u3", 7, "purchase", 1.0, 8),     # touch at SAME ts counts
        ]
        return spark.createDataFrame(
            rows, "e string, ts long, t string, v double, id long"
        )

    def test_last_and_first_touch(self, spark):
        from spark_bestfit_spark.operators.events import attribute_conversions

        df = self._df(spark)
        last = {
            (r.e, r.conv_ts): (r.channel, r.touch_ts)
            for r in attribute_conversions(
                df, "e", "ts", "t", "v", "purchase", ["click", "view"],
                model="last", tiebreak_col="id",
            ).collect()
        }
        assert last[("u1", 30)] == ("view", 20)
        assert last[("u1", 50)] == ("click", 40)
        assert last[("u2", 5)] == (None, None)
        assert last[("u3", 7)] == ("view", 7)

        first = {
            (r.e, r.conv_ts): (r.channel, r.touch_ts)
            for r in attribute_conversions(
                df, "e", "ts", "t", "v", "purchase", ["click", "view"],
                model="first", tiebreak_col="id",
            ).collect()
        }
        assert first[("u1", 30)] == ("click", 10)
        assert first[("u1", 50)] == ("click", 10)   # journey start
        assert first[("u3", 7)] == ("view", 7)

    def test_lookback_window_excludes_stale_touches(self, spark):
        from spark_bestfit_spark.operators.events import attribute_conversions

        df = self._df(spark)
        out = {
            (r.e, r.conv_ts): r.channel
            for r in attribute_conversions(
                df, "e", "ts", "t", "v", "purchase", ["click", "view"],
                model="last", lookback=5, tiebreak_col="id",
            ).collect()
        }
        assert out[("u1", 30)] is None      # nearest touch is 10 back
        assert out[("u3", 7)] == "view"     # same-ts inside any window
        first = {
            (r.e, r.conv_ts): (r.channel, r.touch_ts)
            for r in attribute_conversions(
                df, "e", "ts", "t", "v", "purchase", ["click", "view"],
                model="first", lookback=15, tiebreak_col="id",
            ).collect()
        }
        assert first[("u1", 30)] == ("view", 20)  # click@10 outside 15

    def test_single_exchange_and_validation(self, spark):
        import pytest

        from spark_bestfit_spark.operators.events import attribute_conversions

        df = self._df(spark)
        out = attribute_conversions(
            df, "e", "ts", "t", "v", "purchase", ["click"]
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Join" not in plan
        with pytest.raises(ValueError, match="model"):
            attribute_conversions(
                df, "e", "ts", "t", "v", "purchase", ["click"], model="x"
            )
        with pytest.raises(ValueError, match="touch_types"):
            attribute_conversions(df, "e", "ts", "t", "v", "purchase", [])


class TestFunnelTiming:
    def test_hand_computed_report(self, spark):
        from spark_bestfit_spark.operators.events import funnel_timing

        rows = [
            # u1 completes: view@0 -> click@10 -> purchase@30
            ("u1", 0, "view"), ("u1", 10, "click"), ("u1", 30, "purchase"),
            # u2 stops at click: view@5 -> click@25
            ("u2", 5, "view"), ("u2", 25, "click"),
            # u3 only views
            ("u3", 1, "view"),
            # u4 never enters
            ("u4", 2, "error"),
        ]
        df = spark.createDataFrame(rows, "user_id string, ts long, event_type string")
        got = {
            r.step_index: r
            for r in funnel_timing(
                df, ["view", "click", "purchase"]
            ).collect()
        }
        assert got[1].n_reached == 3 and got[1].rate_from_prev is None
        assert got[2].n_reached == 2
        assert got[2].rate_from_prev == round(2 / 3, 6)
        # latencies: u1 10, u2 20 -> exact p50 = 15
        assert got[2].p50_latency == 15.0
        assert got[3].n_reached == 1
        assert got[3].rate_from_prev == 0.5
        assert got[3].p50_latency == 20.0  # u1: 30 - 10
        assert got[1].p50_latency is None

    def test_empty_step_yields_nulls(self, spark):
        from spark_bestfit_spark.operators.events import funnel_timing

        df = spark.createDataFrame(
            [("u", 0, "view")], "user_id string, ts long, event_type string"
        )
        got = {
            r.step_index: r
            for r in funnel_timing(df, ["view", "click"]).collect()
        }
        assert got[2].n_reached == 0
        assert got[2].rate_from_prev == 0.0
        assert got[2].p50_latency is None


class TestAssociationRules:
    def test_matches_brute_force(self, spark):
        import collections
        import itertools

        rng = __import__("numpy").random.default_rng(47)
        baskets = {
            b: sorted(set(rng.choice(20, rng.integers(2, 7)).tolist()))
            for b in range(120)
        }
        rows = [(b, int(i)) for b, items in baskets.items() for i in items]
        df = spark.createDataFrame(rows, "basket bigint, item int")
        from spark_bestfit_spark.operators.frequency import association_rules

        got = {
            (r.item_a, r.item_b): r
            for r in association_rules(
                df, "basket", "item", min_support=3, top_k=1000
            ).collect()
        }
        pc = collections.Counter()
        ic = collections.Counter()
        for items in baskets.values():
            ic.update(items)
            pc.update(itertools.combinations(items, 2))
        nb = len(baskets)
        want = {p: c for p, c in pc.items() if c >= 3}
        assert set(got) == set(want)
        for (a, b), c in want.items():
            r = got[(a, b)]
            assert r.n_pair == c and r.n_a == ic[a] and r.n_b == ic[b]
            assert r.support == round(c / nb, 6)
            assert r.conf_a_to_b == round(c / ic[a], 6)
            assert r.lift == round(c * nb / (ic[a] * ic[b]), 6)

    def test_guards(self, spark):
        from spark_bestfit_spark.operators.frequency import association_rules

        rows = [(1, i) for i in range(50)] + [(2, 1), (2, 2), (3, 1), (3, 2)]
        df = spark.createDataFrame(rows, "basket bigint, item int")
        out = association_rules(
            df, "basket", "item", min_support=2, max_basket_size=10
        ).collect()
        # the 50-item basket is dropped; (1, 2) co-occurs in baskets 2, 3
        assert [(r.item_a, r.item_b, r.n_pair) for r in out] == [(1, 2, 2)]
        import pytest

        with pytest.raises(ValueError, match="min_support"):
            association_rules(df, "basket", "item", min_support=0)


class TestSeasonalNaiveBacktest:
    def test_perfectly_seasonal_series_scores_zero_mae(self, spark):
        from spark_bestfit_spark.operators.events import (
            seasonal_naive_backtest,
        )

        # period-3 exact repetition: seasonal MAE 0, naive-1 MAE > 0
        vals = [10.0, 20.0, 30.0] * 4
        rows = [("e", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "e string, ts long, v double")
        r = seasonal_naive_backtest(df, "e", "ts", "v", 1, 3).first()
        assert r.mae == 0.0 and r.n_evals == 9
        # naive-1 errors repeat (|10-30|, |20-10|, |30-20|) = (20,10,10)
        assert r.mae_naive1 == round(40 / 3, 6)
        assert r.skill == 1.0

    def test_matches_pandas_reference(self, spark):
        import numpy as np
        import pandas as pd

        from spark_bestfit_spark.operators.events import (
            seasonal_naive_backtest,
        )

        rng = np.random.default_rng(61)
        rows = []
        ref = {}
        for e in ("a", "b"):
            v = rng.normal(10, 3, 40).round(2)
            # two raw points per bucket -> exercises the resample
            for i, x in enumerate(v):
                rows.append((e, i * 5, float(x)))
                rows.append((e, i * 5 + 2, float(x) + 1.0))
            s = pd.Series(v) + 0.5  # bucket mean
            err = (s - s.shift(7)).dropna()
            err1 = (s - s.shift(1)).dropna()
            ref[e] = (
                len(err),
                round(float(err.abs().mean()), 6),
                round(float(err.mean()), 6),
                round(float(err1.abs()[err.index].mean()), 6),
            )
        df = spark.createDataFrame(rows, "e string, ts long, v double")
        got = {
            r.e: r
            for r in seasonal_naive_backtest(
                df, "e", "ts", "v", 5, 7
            ).collect()
        }
        for e, (n, mae, bias, mae1) in ref.items():
            assert got[e].n_evals == n
            assert got[e].mae == pytest.approx(mae, abs=1e-6)
            assert got[e].bias == pytest.approx(bias, abs=1e-6)
            assert got[e].mae_naive1 == pytest.approx(mae1, abs=1e-6)

    def test_validation(self, spark):
        from spark_bestfit_spark.operators.events import (
            seasonal_naive_backtest,
        )

        df = spark.createDataFrame([("e", 0, 1.0)], "e string, ts long, v double")
        import pytest as _pt

        with _pt.raises(ValueError, match="agg"):
            seasonal_naive_backtest(df, "e", "ts", "v", 1, 1, agg="max")
        with _pt.raises(ValueError, match="period"):
            seasonal_naive_backtest(df, "e", "ts", "v", 0, 1)


class TestCohortValues:
    def test_hand_computed_ltv(self, spark):
        from spark_bestfit_spark.operators.events import cohort_values

        rows = [
            # cohort 0: u1, u2 (first activity in bucket 0)
            ("u1", 0, 10), ("u2", 1, 20),     # u2 first at bucket 0? no:
        ]
        rows = [
            ("u1", 0, 10), ("u1", 5, 30),     # ages 0, 1 (width 5)
            ("u2", 1, 20),                     # cohort 0, age 0
            ("u3", 6, 40), ("u3", 11, 50),    # cohort 1, ages 0, 1
        ]
        df = spark.createDataFrame(rows, "e string, ts long, v long")
        got = {
            (r.cohort, r.age): r
            for r in cohort_values(df, "e", "ts", "v", 5).collect()
        }
        # cohort 0 (buckets 0): u1, u2 -> size 2
        assert got[(0, 0)].n_active == 2
        assert got[(0, 0)].revenue == 30
        assert got[(0, 0)].ltv == 15.0
        assert got[(0, 1)].revenue == 30 and got[(0, 1)].cum_revenue == 60
        assert got[(0, 1)].ltv == 30.0
        # cohort 1: u3 alone
        assert got[(1, 0)].ltv == 40.0 and got[(1, 1)].ltv == 90.0

    def test_validation(self, spark):
        import pytest as _pt

        from spark_bestfit_spark.operators.events import cohort_values

        df = spark.createDataFrame([("e", 0, 1)], "e string, ts long, v long")
        with _pt.raises(ValueError, match="bucket_width"):
            cohort_values(df, "e", "ts", "v", 0)


class TestSeasonalDecompose:
    def test_recovers_planted_components(self, spark):
        from spark_bestfit_spark.operators.events import (
            seasonal_decompose,
        )

        # planted series: linear trend + period-4 seasonality, one
        # event per bucket so sum == the value itself
        period = 4
        n = 80
        seas = [5.0, -2.0, -4.0, 1.0]  # sums to 0
        rows = []
        for t in range(n):
            y = 10.0 + 0.5 * t + seas[t % period]
            rows.append((t * 100, y))
        df = spark.createDataFrame(rows, "ts long, value double")
        out = seasonal_decompose(
            df, "ts", "value", bucket=100, period=period, agg="sum"
        ).collect()
        by_b = {r.bucket_id: r for r in out}
        assert len(out) == n
        half = period // 2
        # edges have null trend/resid
        assert by_b[0].trend is None and by_b[n - 1].trend is None
        assert by_b[half].trend is not None
        # reference decomposition (same construction in numpy)
        ys = np.array([10.0 + 0.5 * t + seas[t % period]
                       for t in range(n)])
        trend = np.full(n, np.nan)
        for i in range(half, n - half):
            w = ys[i - half:i + half + 1]
            # even period: classical 2 x MA with half-weight endpoints
            trend[i] = (w.sum() - (w[0] + w[-1]) / 2.0) / period
        det = ys - trend
        pm = np.array([
            np.nanmean(det[p::period]) for p in range(period)
        ])
        pm_c = pm - pm.mean()
        for t in range(n):
            r = by_b[t]
            assert r.phase == t % period
            assert r.seasonal == pytest.approx(
                round(float(pm_c[t % period]), 6), abs=2e-6
            )
            if not np.isnan(trend[t]):
                assert r.trend == pytest.approx(
                    round(float(trend[t]), 6), abs=2e-6
                )
                assert r.resid == pytest.approx(
                    round(float(ys[t] - trend[t] - pm_c[t % period]), 6),
                    abs=5e-6,
                )
        # planted seasonality recovered (up to centering)
        want = np.array(seas) - np.mean(seas)
        assert np.allclose(pm_c, want, atol=1e-9)

    def test_multiple_events_per_bucket_and_validation(self, spark):
        from spark_bestfit_spark.operators.events import (
            seasonal_decompose,
        )

        rows = [(0, 1.0), (50, 2.0), (100, 10.0), (250, 4.0)]
        df = spark.createDataFrame(rows, "ts long, value double")
        out = {
            r.bucket_id: r
            for r in seasonal_decompose(
                df, "ts", "value", bucket=100, period=2
            ).collect()
        }
        assert out[0].y == 3.0 and out[0].n_events == 2
        assert out[1].y == 10.0 and out[2].y == 4.0
        with pytest.raises(ValueError, match="period"):
            seasonal_decompose(df, "ts", "value", bucket=100, period=1)
        with pytest.raises(ValueError, match="agg"):
            seasonal_decompose(
                df, "ts", "value", bucket=100, period=2, agg="max"
            )


class TestNewEntitiesCurve:
    def test_hand_computed_growth(self, spark):
        from spark_bestfit_spark.operators.events import (
            new_entities_curve,
        )

        ev = [
            ("a", 0), ("a", 5), ("b", 5),          # bucket 0: a,b new
            ("c", 12), ("a", 12), ("d", 12),        # bucket 1: c,d new, a returns
            ("b", 22),                              # bucket 2: b returns
        ]
        df = spark.createDataFrame(ev, "u string, ts long")
        out = {
            r.bucket_id: r
            for r in new_entities_curve(df, "u", "ts", bucket=10)
            .collect()
        }
        assert out[0].active == 2 and out[0].new_entities == 2
        assert out[0].returning == 0 and out[0].cum_entities == 2
        assert out[1].active == 3 and out[1].new_entities == 2
        assert out[1].returning == 1 and out[1].cum_entities == 4
        assert out[2].active == 1 and out[2].new_entities == 0
        assert out[2].returning == 1 and out[2].cum_entities == 4

    def test_cumulative_counts_each_entity_once(self, spark):
        import numpy as np

        from spark_bestfit_spark.operators.events import (
            new_entities_curve,
        )

        rng = np.random.default_rng(81)
        rows = [
            (f"u{int(rng.integers(0, 40))}", int(t))
            for t in rng.integers(0, 100, 400)
        ]
        df = spark.createDataFrame(rows, "u string, ts long")
        out = new_entities_curve(df, "u", "ts", bucket=10).collect()
        total_entities = len({u for u, _ in rows})
        assert out[-1].cum_entities == total_entities
        assert sum(r.new_entities for r in out) == total_entities
        for r in out:
            assert r.returning == r.active - r.new_entities
        with pytest.raises(ValueError, match="bucket"):
            new_entities_curve(df, "u", "ts", bucket=0)


class TestEwmaBacktest:
    def test_matches_hand_computation(self, spark):
        from spark_bestfit_spark.operators.events import ewma_backtest

        vals = [1, 2, 3, 4, 5, 6]
        rows = [("u", i, float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "e string, t long, v double")
        out = ewma_backtest(
            df, "e", "t", "v", 1, alpha=0.5, max_lags=3
        ).first()
        ws = [1.0, 0.5, 0.25]
        errs, errs1 = [], []
        for t in range(1, len(vals)):
            lags = [vals[t - k] for k in range(1, min(3, t) + 1)]
            w = ws[: len(lags)]
            f = sum(a * b for a, b in zip(lags, w)) / sum(w)
            errs.append(abs(vals[t] - f))
            errs1.append(abs(vals[t] - vals[t - 1]))
        assert out.n_evals == 5
        assert out.mae == pytest.approx(
            round(sum(errs) / len(errs), 6), abs=1e-6
        )
        assert out.mae_naive1 == pytest.approx(
            round(sum(errs1) / len(errs1), 6), abs=1e-6
        )
        assert out.skill == pytest.approx(
            round(1 - (sum(errs) / len(errs)) / (sum(errs1) / len(errs1)), 6),
            abs=1e-6,
        )

    def test_smoothing_beats_naive_on_noise(self, spark):
        import numpy as np

        from spark_bestfit_spark.operators.events import ewma_backtest

        rng = np.random.default_rng(191)
        # white noise around a level: EWMA beats "yesterday again"
        vals = 100 + rng.normal(0, 10, 400)
        rows = [("u", i, float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "e string, t long, v double")
        out = ewma_backtest(
            df, "e", "t", "v", 1, alpha=0.3, max_lags=8
        ).first()
        assert out.skill > 0.1

    def test_validation(self, spark):
        from spark_bestfit_spark.operators.events import ewma_backtest

        df = spark.createDataFrame([("u", 0, 1.0)], "e string, t long, v double")
        with pytest.raises(ValueError, match="alpha"):
            ewma_backtest(df, "e", "t", "v", 1, alpha=0.0)
        with pytest.raises(ValueError, match="max_lags"):
            ewma_backtest(df, "e", "t", "v", 1, max_lags=0)
        with pytest.raises(ValueError, match="agg"):
            ewma_backtest(df, "e", "t", "v", 1, agg="max")
