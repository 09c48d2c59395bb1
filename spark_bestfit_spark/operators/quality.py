"""Data-quality audit operators: declarative rule validation,
referential-integrity checks, and calendar-gap detection.

The contract tier of a production pipeline — before fitting, deduping
or training on a table you assert what must hold (ranges, null
budgets, key relationships, time-series completeness) and route
violations to quarantine instead of silently training on them. The
reference engine has no quality surface (SURVEY.md §2 extensions);
these are the standard shapes of every expectation framework,
expressed as single-pass Spark column algebra.

Scale design (100 TB): ``validate_rules`` folds EVERY rule into ONE
conditional-aggregate scan (no per-rule pass); referential integrity
is one left-anti-shaped aggregate join per relationship, and calendar
gaps ride a per-entity span relation joined to a generated calendar —
work proportional to entities x days, never to raw rows, after one
map-combinable groupBy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "validate_rules",
    "referential_integrity",
    "calendar_gaps",
]


def validate_rules(df: DataFrame, rules: dict) -> DataFrame:
    """Declarative expectation checks — ``rules`` maps a rule name to
    a BOOLEAN SQL expression that every row should satisfy
    (``"l_quantity BETWEEN 1 AND 50"``, ``"l_comment IS NOT NULL"``).
    Returns one row per rule: ``(rule, n_rows, n_violations,
    violation_rate, passed)``, ordered for humans by rule name.

    A null rule result counts as a VIOLATION (the row failed to prove
    the expectation — the quarantine-side convention; write
    ``x IS NULL OR x > 0`` to admit nulls explicitly).

    All rules evaluate in ONE scan: each becomes a conditional sum in
    the same aggregate, so auditing 50 expectations costs the same
    I/O as auditing one. Map-side combinable; output is rules-sized.
    """
    if not rules:
        raise ValueError("rules must be a non-empty {name: sql_bool} dict")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name in rules:
        cond = F.coalesce(
            F.expr(rules[name]).cast("boolean"), F.lit(False)
        )
        aggs.append(
            F.coalesce(F.sum((~cond).cast("long")), F.lit(0)).alias(
                f"_v_{name}"
            )
        )
    row = df.agg(*aggs)
    per = [
        F.struct(
            F.lit(str(name)).alias("rule"),
            F.col("_n").cast("long").alias("n_rows"),
            F.col(f"_v_{name}").cast("long").alias("n_violations"),
            F.round(
                F.when(
                    F.col("_n") > 0, F.col(f"_v_{name}") / F.col("_n")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("violation_rate"),
            (F.col(f"_v_{name}") == 0).alias("passed"),
        )
        for name in rules
    ]
    return (
        row.select(F.explode(F.array(*per)).alias("_r"))
        .select("_r.*")
        .orderBy("rule")
    )


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    relationship: str | None = None,
) -> DataFrame:
    """Foreign-key audit: how many child rows reference a parent key
    that does not exist (orphans), plus null-key counts and the
    orphan rate — the join-safety precondition every star-schema
    pipeline should assert before fanning out.

    ONE aggregate over a left join against the DISTINCT parent keys
    (parent side pre-shrunk to its key relation — broadcastable for
    dimension tables; Catalyst/AQE picks the strategy). Returns one
    row: ``(relationship, n_child, n_null_keys, n_orphans,
    orphan_rate, passed)``.
    """
    rel = relationship or f"{child_key}->{parent_key}"
    pk = parent.select(
        F.col(parent_key).alias("_pk")
    ).distinct().withColumn("_hit", F.lit(1))
    joined = child.select(
        F.col(child_key).alias("_ck")
    ).join(pk, F.col("_ck") == F.col("_pk"), "left")
    return joined.agg(
        F.lit(str(rel)).alias("relationship"),
        F.count(F.lit(1)).cast("long").alias("n_child"),
        F.sum(F.col("_ck").isNull().cast("long"))
        .cast("long")
        .alias("n_null_keys"),
        F.sum(
            (F.col("_ck").isNotNull() & F.col("_hit").isNull())
            .cast("long")
        )
        .cast("long")
        .alias("n_orphans"),
        F.round(
            F.sum(
                (F.col("_ck").isNotNull() & F.col("_hit").isNull())
                .cast("long")
            )
            / F.count(F.lit(1)),
            6,
        ).alias("orphan_rate"),
        (
            F.sum(
                (F.col("_ck").isNotNull() & F.col("_hit").isNull())
                .cast("long")
            )
            == 0
        ).alias("passed"),
    )


def calendar_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    entity_col: str | None = None,
    bucket: str = "day",
) -> DataFrame:
    """Time-series completeness audit: for each entity (or globally),
    which calendar buckets between its OWN first and last activity
    have ZERO rows — silent feed outages, partial backfills and
    ingestion holes that averages and models silently absorb.

    One (entity, bucket) groupBy collapses the data; each entity's
    expected calendar comes from a map-side ``sequence(first, last)``
    explode over the entity-sized span relation, anti-joined to the
    observed buckets. Work after the first exchange is entities x
    buckets — calendar-bounded, independent of row count.

    Returns ``(entity?, gap_bucket)`` rows (one per missing bucket,
    as yyyy-MM-dd strings for day buckets) — empty result = complete.
    """
    keys = [entity_col] if entity_col else []
    b = F.date_trunc(bucket, F.col(ts_col))
    seen = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(*keys, b.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    step = {"day": "interval 1 day", "hour": "interval 1 hour"}.get(
        bucket
    )
    if step is None:
        raise ValueError("bucket must be 'day' or 'hour'")
    spans = seen.groupBy(*keys).agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    expected = spans.select(
        *keys,
        F.explode(
            F.expr(f"sequence(_lo, _hi, {step})")
        ).alias("_b"),
    )
    fmt = "yyyy-MM-dd" if bucket == "day" else "yyyy-MM-dd HH:00"
    return (
        expected.join(seen, [*keys, "_b"], "left_anti")
        .select(
            *keys,
            F.date_format("_b", fmt).alias("gap_bucket"),
        )
    )
