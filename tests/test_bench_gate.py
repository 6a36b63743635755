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


def test_calibration_deferral_protocol():
    """r11 (VERDICT r10 item 5): bench artifacts carry a fixed-
    workload host-calibration score, and bench_diff defers
    adjudication (exit 3) instead of failing when the fresh run's
    host was >1.3x slower than the baseline window — the automated
    replacement for r10's hand-written contended-window ledger."""
    import subprocess

    from scripts.bench_diff import load_artifact

    # the probe itself: fast, deterministic-workload, returns seconds
    from scripts.calibrate import score

    s = score(repeats=2)
    assert 0 < s < 5.0

    # artifact plumbing: load_artifact surfaces calibration when
    # present (plain and driver-tail forms), None when absent
    q, cal = load_artifact(FRESH)
    assert q
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        plain = Path(td) / "plain.json"
        plain.write_text(json.dumps({
            "queries": {"a": 1.0},
            "calibration_sec": {"start": 0.02, "end": 0.04},
        }))
        qq, cc = load_artifact(plain)
        assert qq == {"a": 1.0} and abs(cc - 0.03) < 1e-9
        tail = Path(td) / "tail.json"
        tail.write_text(json.dumps({
            "tail": 'noise {"metric": "t", "queries": {"a": 1.0}, '
                    '"calibration_sec": {"start": 0.05, "end": 0.05}} after'
        }))
        qq, cc = load_artifact(tail)
        assert qq == {"a": 1.0} and abs(cc - 0.05) < 1e-9

        # end-to-end deferral: a 2x-slower host with a huge "regression"
        # exits 3 (deferred), NOT 1 (gate fail); same regression with
        # matching calibration exits 1
        base_doc = {"queries": {"q_slow": 2.0, "q_a": 1.0, "q_b": 1.0,
                                "q_c": 1.0},
                    "calibration_sec": {"start": 0.02, "end": 0.02}}
        for fresh_cal, expected in (({"start": 0.05, "end": 0.05}, 3),
                                    ({"start": 0.02, "end": 0.02}, 1)):
            fresh_doc = {"queries": {"q_slow": 8.0, "q_a": 1.0,
                                     "q_b": 1.0, "q_c": 1.0},
                         "calibration_sec": fresh_cal}
            bdir = Path(td) / f"case{expected}"
            bdir.mkdir()
            (bdir / "scripts").mkdir()
            (bdir / "scripts" / "bench_baseline.json").write_text(
                json.dumps(base_doc))
            (bdir / "BENCH_FULL.json").write_text(json.dumps(fresh_doc))
            # run the real CLI against a scratch repo layout by copying
            # the script (REPO paths are derived from __file__)
            script = (bdir / "scripts" / "bench_diff.py")
            script.write_text(
                (REPO / "scripts" / "bench_diff.py").read_text())
            r = subprocess.run([sys.executable, str(script)],
                               capture_output=True, text=True)
            assert r.returncode == expected, (
                f"expected exit {expected}, got {r.returncode}:\n"
                f"{r.stdout}\n{r.stderr}")
            if expected == 3:
                assert "DEFERRED" in r.stdout


def test_faster_host_cannot_mask_uniform_regression():
    """r11 review finding: a fresh run on a much-FASTER host shrinks
    every raw time, and the median-drift divisor absorbs a UNIFORM
    plan regression — raw ratios ~1x, median ~1x, gate silently
    green. With calibration present, diff() floors the divisor at
    the host-speed ratio, so the masked regression fails (exit 1).
    A faster host with genuinely-unchanged plans must stay green."""
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # host got 2.5x faster (cal 0.05 -> 0.02) but every query's
        # wall time is UNCHANGED => plans uniformly ~2.5x worse
        base_doc = {"queries": {"q_a": 2.0, "q_b": 3.0, "q_c": 4.0,
                                "q_d": 5.0},
                    "calibration_sec": {"start": 0.05, "end": 0.05}}
        masked = {"queries": {"q_a": 2.0, "q_b": 3.0, "q_c": 4.0,
                              "q_d": 5.0},
                  "calibration_sec": {"start": 0.02, "end": 0.02}}
        # and the healthy case: same 2.5x-faster host, times dropped
        # in proportion => no regression, exit 0
        healthy = {"queries": {"q_a": 0.8, "q_b": 1.2, "q_c": 1.6,
                               "q_d": 2.0},
                   "calibration_sec": {"start": 0.02, "end": 0.02}}
        for tag, fresh_doc, expected in (("masked", masked, 1),
                                         ("healthy", healthy, 0)):
            bdir = Path(td) / tag
            (bdir / "scripts").mkdir(parents=True)
            (bdir / "scripts" / "bench_baseline.json").write_text(
                json.dumps(base_doc))
            (bdir / "BENCH_FULL.json").write_text(json.dumps(fresh_doc))
            script = bdir / "scripts" / "bench_diff.py"
            script.write_text(
                (REPO / "scripts" / "bench_diff.py").read_text())
            r = subprocess.run([sys.executable, str(script)],
                               capture_output=True, text=True)
            assert r.returncode == expected, (
                f"{tag}: expected exit {expected}, got {r.returncode}:"
                f"\n{r.stdout}\n{r.stderr}")
