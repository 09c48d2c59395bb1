#!/usr/bin/env python
"""Driver-hash ledger: which registered queries have ever carried the
driver's own value-hash, and whether the current head-50 of ``queries()``
retires outstanding debt.

The per-round driver gate hashes only the first ~50 entries of
``queries()`` (``CORRECTNESS_r{N}.json``).  A query is *ever-hashed* when
some round's file records ``hash_match: true`` for it; queries whose rows
were only count-compared (rows-only, no ``oracle_sql`` entry) do NOT
count as hashed unless ``hash_match`` is true.  The round-8 verdict found
the hand-maintained count drifted (claimed 37 never-hashed, actual 68),
so this tool is the single mechanical source of truth: run it before
rotating the head and quote its output in the closing note.

Usage::

    python tools/ledger.py [--repo DIR] [--head N] [--json]

Exit status is 0 always (it is a report, not a gate); pair it with
``tools/check_oracle.py`` in the closing-gates protocol.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re


def load_hash_green(repo: str) -> tuple[dict[str, list[int]], list[str]]:
    """Union of hash-green query keys across all CORRECTNESS_r*.json.

    Returns ({key: [rounds where hash_match was true]}, sorted round files).
    """
    green: dict[str, list[int]] = {}
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    for path in files:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else -1
        with open(path) as f:
            data = json.load(f)
        for key, rec in data.items():
            if isinstance(rec, dict) and rec.get("hash_match") is True:
                green.setdefault(key, []).append(rnd)
    return green, files


def registered_keys(repo: str) -> list[str]:
    """Ordered query keys from __spark_entry__.queries().

    Parses the source statically so this tool needs no SparkSession and
    runs in <1s.  queries() builds a ``base = {...}`` literal and then
    reorders it by the module-level ``_HEAD_50`` list, so the effective
    order is _HEAD_50 first, then base order minus the head — this
    parser reproduces exactly that.  (The pre-r12 shape was a direct
    ``return {...}``; a regex against that shape would now match
    oracle_sql()'s dict instead, which is how the r12 ledger briefly
    misreported the new registrations as tail entries.)  Falls back to
    importing the module if the static parse looks wrong.
    """
    path = os.path.join(repo, "__spark_entry__.py")
    with open(path) as f:
        src = f.read()
    keys: list[str] = []
    m = re.search(r"def queries\(\).*?\n    base = \{(.*?)\n    \}", src, re.S)
    if m:
        base_keys = re.findall(r'^\s*"([a-z0-9_]+)":', m.group(1), re.M)
        h = re.search(r"^_HEAD_50 = \[(.*?)\n\]", src, re.S | re.M)
        head_keys = re.findall(r'"([a-z0-9_]+)"', h.group(1)) if h else []
        if set(head_keys) <= set(base_keys):
            keys = head_keys + [k for k in base_keys if k not in set(head_keys)]
    if not keys:  # pre-r12 direct-return shape
        m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S)
        if m:
            keys = re.findall(r'^\s*"([a-z0-9_]+)":', m.group(1), re.M)
    if not keys:  # static parse failed; load by path (no sys.modules pollution)
        import importlib.util  # noqa: PLC0415

        spec = importlib.util.spec_from_file_location("_ledger_entry", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        keys = list(mod.queries().keys())
    return keys


def compute(repo: str, head_n: int = 50) -> dict:
    green, files = load_hash_green(repo)
    keys = registered_keys(repo)
    keyset = set(keys)
    ever = [k for k in keys if k in green]
    never = [k for k in keys if k not in green]
    head = keys[:head_n]
    head_never = [k for k in head if k not in green]
    stale_green = sorted(set(green) - keyset)  # hashed once, since renamed/removed
    return {
        "correctness_files": [os.path.basename(f) for f in files],
        "registered": len(keys),
        "ever_hashed": len(ever),
        "never_hashed": len(never),
        "never_hashed_keys": never,
        "head_n": head_n,
        "head_never_hashed": len(head_never),
        "head_never_hashed_keys": head_never,
        "debt_after_next_round": max(0, len(never) - len(head_never)),
        "stale_hashed_keys_not_registered": stale_green,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--head", type=int, default=50)
    ap.add_argument("--json", action="store_true", help="emit machine-readable JSON")
    args = ap.parse_args(argv)
    report = compute(args.repo, args.head)
    if args.json:
        print(json.dumps(report, indent=2))
        return 0
    print(f"correctness files : {len(report['correctness_files'])} ({', '.join(report['correctness_files'])})")
    print(f"registered queries: {report['registered']}")
    print(f"ever hashed       : {report['ever_hashed']}")
    print(f"never hashed      : {report['never_hashed']}")
    print(f"head-{report['head_n']} never-hashed overlap: {report['head_never_hashed']}"
          f" (debt after next round: {report['debt_after_next_round']})")
    if report["never_hashed_keys"]:
        print("never-hashed keys:")
        for k in report["never_hashed_keys"]:
            mark = "HEAD" if k in report["head_never_hashed_keys"] else "tail"
            print(f"  [{mark}] {k}")
    if report["stale_hashed_keys_not_registered"]:
        print("WARNING hashed-but-unregistered keys (renamed/removed?):")
        for k in report["stale_hashed_keys_not_registered"]:
            print(f"  {k}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
