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
