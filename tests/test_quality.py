"""Data-quality audits: validate_rules / referential_integrity /
calendar_gaps.

Load-bearing properties: all rules evaluate in one scan with nulls
counted as violations; orphan counting matches an anti-join; gap
detection finds exactly the missing buckets inside each entity's own
span (never before its first or after its last activity).
"""

import datetime

import pyspark.sql.functions as F
import pytest

from spark_bestfit_spark.operators.quality import (
    calendar_gaps,
    referential_integrity,
    validate_rules,
)


class TestValidateRules:
    def test_counts_and_flags(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0), (2, -5.0), (3, None), (4, 99.0)],
            "id long, v double",
        )
        out = {
            r.rule: r
            for r in validate_rules(
                df,
                {
                    "v_positive": "v > 0",
                    "v_small": "v IS NULL OR v < 50",
                    "id_known": "id IN (1, 2, 3, 4)",
                },
            ).collect()
        }
        # null v fails v_positive (quarantine convention)
        assert out["v_positive"].n_violations == 2
        assert out["v_positive"].passed is False
        assert out["v_positive"].violation_rate == 0.5
        # explicit null admission passes the null row
        assert out["v_small"].n_violations == 1  # only 99.0
        assert out["id_known"].n_violations == 0
        assert out["id_known"].passed is True
        assert all(r.n_rows == 4 for r in out.values())

    def test_single_scan(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        plan = validate_rules(
            df, {"a": "id > 0", "b": "id < 5", "c": "id != 3"}
        )._jdf.queryExecution().executedPlan().toString()
        # one aggregate over one scan — rules never re-scan
        assert plan.count("Scan ") == 1

    def test_empty_rules_rejected(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError):
            validate_rules(df, {})

    def test_empty_table(self, spark):
        df = spark.createDataFrame([], "id long")
        (r,) = validate_rules(df, {"a": "id > 0"}).collect()
        assert r.n_rows == 0 and r.n_violations == 0
        assert r.passed is True and r.violation_rate == 0.0


class TestReferentialIntegrity:
    def test_orphans_and_nulls(self, spark):
        child = spark.createDataFrame(
            [(1,), (1,), (2,), (99,), (None,)], "fk long"
        )
        parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
        (r,) = referential_integrity(child, parent, "fk", "pk").collect()
        assert r.n_child == 5
        assert r.n_null_keys == 1
        assert r.n_orphans == 1  # the 99
        assert r.orphan_rate == 0.2
        assert r.passed is False
        assert r.relationship == "fk->pk"

    def test_clean_relationship_passes(self, spark):
        child = spark.createDataFrame([(1,), (2,)], "fk long")
        parent = spark.createDataFrame([(1,), (2,)], "pk long")
        (r,) = referential_integrity(
            child, parent, "fk", "pk", relationship="c->p"
        ).collect()
        assert r.passed is True and r.n_orphans == 0
        assert r.relationship == "c->p"


class TestCalendarGaps:
    def _df(self, spark, day_lists):
        base = datetime.datetime(2024, 5, 1)
        rows = []
        for ent, days in day_lists.items():
            for d in days:
                rows.append((ent, base + datetime.timedelta(days=d)))
        return spark.createDataFrame(rows, "k string, ts timestamp")

    def test_finds_exact_holes(self, spark):
        df = self._df(spark, {"a": [0, 1, 4, 5], "b": [2, 3]})
        got = sorted(
            (r.k, r.gap_bucket)
            for r in calendar_gaps(df, "ts", "k").collect()
        )
        assert got == [("a", "2024-05-03"), ("a", "2024-05-04")]

    def test_span_is_per_entity(self, spark):
        # b's span is days 10..11: day 0-9 absence is NOT a gap for b
        df = self._df(spark, {"a": [0, 1], "b": [10, 11]})
        assert calendar_gaps(df, "ts", "k").count() == 0

    def test_global_mode_and_validation(self, spark):
        df = self._df(spark, {"a": [0], "b": [2]})
        got = [r.gap_bucket for r in calendar_gaps(df, "ts").collect()]
        assert got == ["2024-05-02"]
        with pytest.raises(ValueError):
            calendar_gaps(df, "ts", bucket="week")

    def test_intraday_rows_collapse(self, spark):
        base = datetime.datetime(2024, 5, 1)
        rows = [
            ("a", base + datetime.timedelta(days=d, hours=h))
            for d in (0, 2)
            for h in (1, 13)
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        got = [r.gap_bucket for r in calendar_gaps(df, "ts", "k").collect()]
        assert got == ["2024-05-02"]


import random  # noqa: E402

from spark_bestfit_spark.operators.sampling import (  # noqa: E402
    neyman_allocation,
    neyman_sample,
)
from spark_bestfit_spark.operators.stats import (  # noqa: E402
    mantel_haenszel,
    regression_metrics,
)


class TestMantelHaenszel:
    def test_hand_computed_single_stratum(self, spark):
        # 2x2: a=30, b=20, c=10, d=40 -> OR = (30*40)/(20*10) = 6
        rows = (
            [("s", 1, 1)] * 30 + [("s", 1, 0)] * 20
            + [("s", 0, 1)] * 10 + [("s", 0, 0)] * 40
        )
        df = spark.createDataFrame(rows, "s string, e int, y int")
        (r,) = mantel_haenszel(df, "s", "e", "y").collect()
        assert r.or_mh == 6.0
        assert r.k_strata == 1 and r.n == 100

    def test_simpsons_structure_adjusted(self, spark):
        import math

        # within every stratum the exposure has NO effect (OR = 1),
        # but strata differ in both exposure and outcome rates — the
        # crude pooled OR is confounded; MH must stay at ~1
        rows = []
        rows += [("a", 1, 1)] * 40 + [("a", 1, 0)] * 40
        rows += [("a", 0, 1)] * 10 + [("a", 0, 0)] * 10
        rows += [("b", 1, 1)] * 5 + [("b", 1, 0)] * 45
        rows += [("b", 0, 1)] * 20 + [("b", 0, 0)] * 180
        df = spark.createDataFrame(rows, "s string, e int, y int")
        (r,) = mantel_haenszel(df, "s", "e", "y").collect()
        assert abs(math.log(r.or_mh)) < 1e-6  # exactly 1 by design
        # crude pooled OR is NOT 1 (the confounding this adjusts away)
        crude = (45 * 190) / (85 * 30)
        assert abs(crude - 1) > 0.5

    def test_degenerate_null(self, spark):
        rows = [("s", 1, 1), ("s", 1, 1)]
        df = spark.createDataFrame(rows, "s string, e int, y int")
        (r,) = mantel_haenszel(df, "s", "e", "y").collect()
        assert r.or_mh is None


class TestRegressionMetrics:
    def test_numpy_replica(self, spark):
        import numpy as np

        rng = np.random.default_rng(2)
        y = rng.uniform(0.5, 10, 1000)
        p = y + rng.normal(0, 1, 1000)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(y, p)],
            "y double, p double",
        )
        (r,) = regression_metrics(df, "y", "p").collect()
        err = p - y
        assert r.mae == pytest.approx(np.abs(err).mean(), abs=2e-6)
        assert r.rmse == pytest.approx(
            np.sqrt((err**2).mean()), abs=2e-6
        )
        assert r.bias == pytest.approx(err.mean(), abs=2e-6)
        assert r.r2 == pytest.approx(
            1 - (err**2).mean() / y.var(), abs=2e-5
        )
        assert r.mape == pytest.approx(
            (np.abs(err) / np.abs(y)).mean(), abs=2e-6
        )
        ok = (y > -1) & (p > -1)  # the operator's rmsle domain
        assert r.n_rmsle == int(ok.sum())
        assert r.rmsle == pytest.approx(
            np.sqrt(
                ((np.log1p(p[ok]) - np.log1p(y[ok])) ** 2).mean()
            ),
            abs=2e-6,
        )

    def test_perfect_predictor(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(i)) for i in range(1, 50)],
            "y double, p double",
        )
        (r,) = regression_metrics(df, "y", "p").collect()
        assert (r.mae, r.rmse, r.bias, r.r2) == (0.0, 0.0, 0.0, 1.0)
        assert r.smape == 0.0 and r.rmsle == 0.0

    def test_metric_domains_tracked(self, spark):
        rows = [(0.0, 1.0), (2.0, 2.0), (-1.5, 1.0)]
        df = spark.createDataFrame(rows, "y double, p double")
        (r,) = regression_metrics(df, "y", "p").collect()
        assert r.n == 3
        assert r.n_mape == 2  # y = 0 excluded
        assert r.n_rmsle == 2  # y = -1.5 excluded


class TestNeyman:
    def _df(self, spark, spec, seed=7):
        # spec: {stratum: (n, spread)}
        rng = random.Random(seed)
        rows = []
        i = 0
        for s, (n, spread) in spec.items():
            for _ in range(n):
                rows.append((i, s, rng.uniform(0, spread)))
                i += 1
        return spark.createDataFrame(rows, "id long, s string, v double")

    def test_budget_follows_spread(self, spark):
        df = self._df(spark, {"wide": (500, 100.0), "tight": (500, 1.0)})
        out = {r.stratum: r for r in neyman_allocation(df, "s", "v", 100).collect()}
        # equal sizes, ~100x the spread -> nearly the whole budget
        assert out["wide"].allocated > 90
        assert out["wide"].allocated + out["tight"].allocated == 100

    def test_allocation_exact_total_and_caps(self, spark):
        df = self._df(spark, {"a": (10, 5.0), "b": (500, 5.0), "c": (490, 5.0)})
        rows = neyman_allocation(df, "s", "v", 300).collect()
        total = sum(r.allocated for r in rows)
        assert total == 300
        assert all(r.allocated <= r.n_rows for r in rows)

    def test_sample_matches_allocation_and_is_deterministic(self, spark):
        df = self._df(spark, {"a": (300, 10.0), "b": (300, 2.0)})
        alloc = {
            r.stratum: r.allocated
            for r in neyman_allocation(df, "s", "v", 80).collect()
        }
        got = neyman_sample(df, "s", "v", 80, "id")
        counts = {
            r["s"]: r["count"]
            for r in got.groupBy("s").count().collect()
        }
        assert counts == alloc
        a = sorted(r.id for r in got.collect())
        b = sorted(
            r.id
            for r in neyman_sample(
                df.repartition(13), "s", "v", 80, "id"
            ).collect()
        )
        assert a == b

    def test_validation(self, spark):
        df = self._df(spark, {"a": (5, 1.0)})
        with pytest.raises(ValueError):
            neyman_allocation(df, "s", "v", 0)
