"""Leak-hygiene gate: the tree must contain zero harness-tooling or
internal-reference strings (round-8 verdict item 1 — one `.claude`
comment slipped past the external LEAKCHECK; this test makes the sweep
part of the ordinary suite so it can't recur silently)."""

import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tree_is_leak_clean():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "leak_sweep.py")],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, f"leak sweep hits:\n{proc.stdout}"
