"""Standing per-query bench-regression gate (VERDICT r4 item 1).

Pure-file test — no Spark session. It re-runs scripts/bench_diff.py's
comparison over the artifacts in the working tree, so the end-of-round
pytest run fails if BENCH_FULL.json carries a >1.5x per-query
regression vs scripts/bench_baseline.json that SCALE.md's
``## Bench waivers`` section doesn't name a cause for.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.bench_diff import (  # noqa: E402
    BASELINE,
    FRESH,
    diff,
    load_queries,
    waivers,
)


def test_no_unwaived_bench_regressions():
    base = json.loads(BASELINE.read_text())["queries"]
    fresh = json.loads(FRESH.read_text())["queries"]
    regs, _, _ = diff(base, fresh)
    waived = waivers()
    unwaived = [
        f"{name}: {b:.2f}s -> {f:.2f}s ({ratio:.2f}x)"
        for name, b, f, ratio in regs
        if name not in waived
    ]
    assert not unwaived, (
        "per-query bench regressions >1.5x without a SCALE.md "
        "'## Bench waivers' entry:\n" + "\n".join(unwaived)
    )


def test_no_unwaived_regressions_since_last_driver_round():
    """The --since gate, made NON-OPTIONAL (VERDICT r9 item 5): a
    mid-round ``--accept`` refreshes scripts/bench_baseline.json and
    bakes the round's own regressions into the pinned gate, so that
    gate alone proves little. This test additionally diffs the fresh
    BENCH_FULL.json against the LATEST driver round artifact
    (BENCH_r{N}.json — numbers frozen BEFORE this round started,
    drift-normalized); any >1.5x mover must carry a SCALE.md
    '## Bench waivers' entry naming the cause. pytest always runs, so
    an --accept can never again be the only evidence."""
    rounds = sorted(REPO.glob("BENCH_r[0-9][0-9].json"))
    assert rounds, "no driver round artifacts found"
    base = load_queries(rounds[-1])
    fresh = json.loads(FRESH.read_text())["queries"]
    regs, _, _ = diff(base, fresh)
    waived = waivers()
    unwaived = [
        f"{name}: {b:.2f}s -> {f:.2f}s ({ratio:.2f}x norm)"
        for name, b, f, ratio in regs
        if name not in waived
    ]
    assert not unwaived, (
        f"regressions >1.5x vs {rounds[-1].name} (pre-round frozen "
        "numbers) without a SCALE.md '## Bench waivers' entry:\n"
        + "\n".join(unwaived)
    )


def test_baseline_artifact_is_valid():
    """The baseline snapshot must stay a parseable full bench map —
    an accidental truncation would make the gate silently vacuous."""
    base = json.loads(BASELINE.read_text())
    assert base.get("queries") and len(base["queries"]) >= 50
    assert base.get("materializer") == "xxhash64-all-columns"
