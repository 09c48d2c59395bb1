"""Local replica of the driver's correctness gate: every oracle-checked
query in __spark_entry__ must match DuckDB row-for-row at sf0.01
(order-insensitive, floats compared after 6-decimal rounding)."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        # Coerce numerically: DuckDB surfaces DECIMAL-typed expressions
        # (e.g. a 0.5 literal propagating into a sum) as Decimal while
        # Spark's double stays float — mapping Decimal -> str made this
        # twin WEAKER than check_oracle.py (the r7 mann_whitney escape).
        f = round(float(v), 6)
        return 0.0 if f == 0 else f
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, 6)
        return 0.0 if r == 0 else r  # fold -0.0
    if isinstance(v, int):
        return v
    return v


def _rows_to_set(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    # null-safe sort: None sorts before any value, values by type name
    return sorted(
        normed,
        key=lambda t: tuple(
            (0, "", "") if v is None else (1, type(v).__name__, str(v))
            for v in t
        ),
    )


ORACLE_QUERIES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    # Driver convention: flat scalar outputs only — the driver's
    # canonicalizer cannot sort array/map/struct cells (r7 gate ERRs).
    complex_cols = [
        f.name for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not complex_cols, (
        f"complex-typed output columns {complex_cols}: flatten with "
        "posexplode/array_join before returning from queries()"
    )
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    s = _rows_to_set(spark_rows, spark_cols)
    d = _rows_to_set(duck_rows, duck_cols)
    assert len(s) == len(d), f"{name}: row count {len(s)} vs {len(d)}"
    mismatches = [
        (a, b) for a, b in zip(s, d) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "distribution" in df.columns


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() > 0
