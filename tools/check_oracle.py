"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry that has an ``oracle_sql()`` twin at
sf0.01: Spark result vs DuckDB result, columns sorted by name, rows
sorted by all columns, values compared under THREE normalizations —
(a) stringified cells, (b) numeric cells coerced to float and rounded
to 6 decimals, (c) verbatim ``str(cell)`` with NO numeric coercion.
(c) is what catches serialization-type artifacts the driver hash
rejects — e.g. Spark surfacing ``Decimal('4771.00')`` where DuckDB
surfaces ``4771.0``: identical values, different strings. A query only
counts as green here if ALL THREE agree, which is strictly harsher
than any plausible driver hash.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import decimal
import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _norm_str(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return repr(round(f, 6))
    if isinstance(v, decimal.Decimal):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return repr(round(f, 6))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_norm_str(x) for x in v) + "]"
    return str(v)


def _norm_float(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, (float, np.floating, int, np.integer, decimal.Decimal)):
        return round(float(v), 6)
    if isinstance(v, (list, np.ndarray)):
        return tuple(_norm_float(x) for x in v)
    return str(v)


def _norm_verbatim(v):
    """No numeric coercion at all: the cell exactly as the engine
    surfaced it. Decimal('4771.00') != '4771.0' here by design."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_norm_verbatim(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame, norm) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm(df.iloc[i][c]) for c in cols) for i in range(len(df))]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def raw_dtype_report(df: pd.DataFrame) -> dict:
    out = {}
    for c in sorted(df.columns):
        sample = df[c].iloc[0] if len(df) else None
        out[c] = f"{df[c].dtype}/{type(sample).__name__}"
    return out


def _duplicate_literal_keys(path: str) -> list[str]:
    """String keys appearing more than once in any single dict literal
    inside ``queries``/``oracle_sql`` of the module at ``path``."""
    import ast
    from collections import Counter

    with open(path, encoding="utf-8") as fh:
        tree = ast.parse(fh.read())
    dupes: list[str] = []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.FunctionDef)
                and node.name in ("queries", "oracle_sql")):
            continue
        for d in ast.walk(node):
            if not isinstance(d, ast.Dict):
                continue
            keys = [k.value for k in d.keys
                    if isinstance(k, ast.Constant) and isinstance(k.value, str)]
            dupes.extend(k for k, n in Counter(keys).items() if n > 1)
    return sorted(set(dupes))


def main() -> int:
    import __spark_entry__ as e
    from spark_bestfit_spark.session import get_spark

    only = set(sys.argv[1:])
    # a mistyped query name must be a hard error, not a vacuous
    # ALL GREEN over zero executed queries
    unknown = sorted(only - set(e.queries()))
    if unknown:
        print(f"FAIL harness: unknown query name(s): {unknown}")
        return 1
    spark = get_spark(app_name="check_oracle")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    # Duplicate-key guard: a dict literal with a repeated key keeps
    # only one entry at runtime, silently — scan the source AST of
    # queries() / oracle_sql() and hard-fail on any repeated string
    # key so a rotation edit can never alias two entries.
    dupes = _duplicate_literal_keys(e.__file__)
    if dupes:
        print(f"FAIL harness: duplicate dict-literal keys in "
              f"__spark_entry__.py: {dupes}")
        return 1
    # Coverage guarantee: a full run (no query args) must execute and
    # compare EVERY oracle_sql() entry — tail demotion in queries() can
    # never silently drop a query from the strict harness. Orphan
    # oracles (an oracle key with no queries() entry) are a hard error.
    orphans = sorted(set(oracles) - set(qs))
    if orphans:
        print(f"FAIL harness: oracle_sql keys with no queries() entry: {orphans}")
        return 1
    executed: set = set()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        executed.add(name)
        try:
            sdf_spark = fn(spark, SF_DIR)
            # Flat-scalar output lint: the driver's canonicalizer
            # (pandas sort_values) cannot sort array/map/struct cells
            # — it died with "unhashable type: 'list'" on exactly this
            # in round 7. Fail locally before the driver ever sees it.
            complex_cols = [
                f.name for f in sdf_spark.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                print(f"FAIL {name}: complex-typed output columns "
                      f"{complex_cols} — driver convention is flat "
                      "scalars only (posexplode / array_join them)")
                n_fail += 1
                continue
            sdf = sdf_spark.toPandas()
            orel = con.sql(oracles[name])
            # DECIMAL-typed oracle columns reach pandas as float64 via
            # .df(), hiding Decimal-vs-float surface mismatches from
            # all three normalizations (the r7 mann_whitney escape) —
            # hard-fail so the oracle SQL casts ::DOUBLE instead.
            dec_cols = [
                c for c, t in zip(orel.columns, orel.types)
                if "DECIMAL" in str(t).upper()
            ]
            if dec_cols:
                print(f"FAIL {name}: DECIMAL-typed oracle output "
                      f"columns {dec_cols} — cast ::DOUBLE (or use "
                      "float literals like 0.5e0) in the oracle SQL")
                n_fail += 1
                continue
            odf = orel.df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: exception {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            for label, norm in (
                ("str", _norm_str),
                ("float", _norm_float),
                ("verbatim", _norm_verbatim),
            ):
                a, b = canon(sdf, norm), canon(odf, norm)
                if a != b:
                    bad = next(
                        (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y
                    )
                    problems.append(f"{label}-mismatch at sorted row {bad[0]}: "
                                    f"spark={bad[1]} oracle={bad[2]}")
        if problems:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
            print(f"  spark dtypes:  {raw_dtype_report(sdf)}")
            print(f"  oracle dtypes: {raw_dtype_report(odf)}")
        else:
            print(f"ok   {name} ({len(sdf)} rows)  "
                  f"[s:{raw_dtype_report(sdf)} | o:{raw_dtype_report(odf)}]"
                  if only else f"ok   {name} ({len(sdf)} rows)")
    if not only:
        missing = sorted(set(oracles) - executed)
        if missing:
            n_fail += 1
            print(f"FAIL harness: oracle_sql keys never executed: {missing}")
        else:
            print(f"coverage: all {len(executed)} oracle_sql entries "
                  "executed and compared")
    print(f"\n{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
