#!/usr/bin/env python
"""Partition-layout invariance sweep.

Runs ``tools/check_oracle.py`` in a FRESH subprocess under a
deliberately alien layout — ``SPARK_GRAFT_CPUS=7`` → local[7] with
spark.sql.shuffle.partitions=7 — and requires every requested query to
come back green. Passing on both 32 and 7 cores is the value-level
proof that no registered result depends on partition count, shuffle
layout, or merge order.

``REQUIRED_ALWAYS`` lists the pinned-seed generation queries whose
determinism rests on per-partition seeding (seed ⊕ partition id inside
mapInPandas): they are appended to ANY explicit query selection, so a
targeted sweep can never silently skip re-proving generator
determinism after generator code changes (r9 verdict task 7).

Usage:
    python tools/invariance_sweep.py              # full registry
    python tools/invariance_sweep.py q1 q2 ...    # those + REQUIRED_ALWAYS
    python tools/invariance_sweep.py --list q1    # print resolved list only
"""
from __future__ import annotations

import os
import subprocess
import sys

# Pinned-seed generation queries: determinism depends on the
# per-partition seed plan, the exact surface a generator refactor can
# silently break. Never sweep without them.
REQUIRED_ALWAYS = [
    "generate_univariate",
    "copula_sample",
    "gmm_fit",
]

ALIEN_CPUS = "7"


def resolved_queries(argv: list) -> list:
    """Explicit selection + REQUIRED_ALWAYS (dedup, stable order).
    Empty selection means the full registry (returns [])."""
    explicit = [a for a in argv if not a.startswith("-")]
    if not explicit:
        return []
    out = list(explicit)
    for q in REQUIRED_ALWAYS:
        if q not in out:
            out.append(q)
    return out


def main() -> int:
    args = sys.argv[1:]
    list_only = "--list" in args
    queries = resolved_queries([a for a in args if a != "--list"])
    if list_only:
        for q in queries or ["<full registry>"]:
            print(q)
        return 0
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, SPARK_GRAFT_CPUS=ALIEN_CPUS)
    cmd = [sys.executable, os.path.join(here, "check_oracle.py"), *queries]
    print(
        f"sweep: local[{ALIEN_CPUS}]/shuffle={ALIEN_CPUS} over "
        f"{'full registry' if not queries else ', '.join(queries)}",
        flush=True,
    )
    rc = subprocess.call(cmd, env=env)
    if rc != 0:
        print("SWEEP RED: at least one oracle failed under the alien "
              "partition layout", file=sys.stderr)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
