"""Smoke tests for the shipped examples.

Each example is a user-facing entry point (README points at them), so
the suite runs every one as a real subprocess — import rot, API drift,
or a renamed operator breaks the build here instead of on a user's
first copy-paste. Examples print to stdout and exit 0; that contract
(not their output values, which their own operators' tests pin) is
what this module asserts.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = sorted(p.name for p in (REPO / "examples").glob("*.py"))


def test_every_example_is_covered():
    """A new example file is automatically picked up by the glob —
    this pin only guards against the directory going missing."""
    assert EXAMPLES, "examples/ directory is empty"


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs_clean(name):
    env = dict(os.environ)
    # keep the example subprocesses small: they default to
    # local[os.cpu_count()], which on the 32-core test machine forks
    # 32 Python workers per example for sf0.001 inputs
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / name)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        f"examples/{name} exited {proc.returncode}\n"
        f"--- stdout tail ---\n{proc.stdout[-2000:]}\n"
        f"--- stderr tail ---\n{proc.stderr[-2000:]}"
    )
