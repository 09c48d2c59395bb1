#!/usr/bin/env python
"""Compare two bench JSON payloads line-by-line.

Usage::

    python tools/compare_bench.py BENCH_r08.json BENCH_SUMMARY.json
    python tools/compare_bench.py BENCH_r08.json -   # new run on stdin

Reads the ``queries`` map from each payload (either the compact
headline line or the full sidecar), prints shared lines sorted by
ratio (new/old, worst first), plus lines only in one side. The r8
closing audit compared sidecars by hand; this makes the per-round
"which lines regressed >X%" question mechanical.
"""
from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    data = sys.stdin.read() if path == "-" else open(path).read()
    obj = None
    try:
        obj = json.loads(data)
    except json.JSONDecodeError:
        # bench stdout carries two lines (full + compact headline) —
        # take the last parseable object
        for line in data.strip().splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
    if obj is None:
        raise SystemExit(f"no JSON object found in {path}")
    if "queries" not in obj and "tail" in obj:
        # driver wrapper: {n, rc, cpus, sf, tail} with the compact
        # headline as the LAST {"metric": ...} object inside tail
        # (tail may be truncated at the start, never at the end)
        tail = obj["tail"]
        i = tail.rfind('{"metric"')
        if i < 0:
            raise SystemExit(f"{path}: tail carries no headline object")
        obj, _ = json.JSONDecoder().raw_decode(tail[i:])
    return {k: float(v) for k, v in obj.get("queries", {}).items()}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--flag", type=float, default=1.25,
        help="flag shared lines with new/old above this ratio (default 1.25)",
    )
    args = ap.parse_args(argv)
    old, new = load_queries(args.old), load_queries(args.new)
    shared = sorted(
        (k for k in old if k in new),
        key=lambda k: new[k] / old[k] if old[k] else float("inf"),
        reverse=True,
    )
    flagged = 0
    print(f"{'query':38} {'old':>8} {'new':>8} {'ratio':>7}")
    for k in shared:
        r = new[k] / old[k] if old[k] else float("inf")
        mark = " <-- " if r > args.flag else ""
        flagged += r > args.flag
        print(f"{k:38} {old[k]:8.3f} {new[k]:8.3f} {r:7.2f}{mark}")
    so, sn = sum(old[k] for k in shared), sum(new[k] for k in shared)
    if shared and so > 0:
        print(
            f"\nshared {len(shared)} lines: {so:.1f} -> {sn:.1f} s "
            f"({(sn - so) / so * 100:+.1f}%); {flagged} above {args.flag}x"
        )
    else:
        print("\nno shared lines")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"only in old ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"only in new ({len(only_new)}): {', '.join(only_new)}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # piped into head — not an error
        raise SystemExit(0)
