"""Per-query bench-regression gate.

Round 4 shipped five queries 1.3-2.5x slower than round 3 with no
committed explanation; the only thing that caught the worst prior
regression (x25, 0.4 -> 9.5 s) was a manual eyeball of BENCH_FULL.
This script institutionalizes that check: it compares the fresh
``BENCH_FULL.json`` against the committed ``scripts/bench_baseline.json``
(a deliberate snapshot of the previous round's numbers) and FAILS on
any query regressing more than ``THRESHOLD`` x unless the query is
named in SCALE.md's ``## Bench waivers`` section with a cause.

Usage:
    python scripts/bench_diff.py              # gate (exit 1 on unwaived)
    python scripts/bench_diff.py --report     # table only, never fails
    python scripts/bench_diff.py --since BENCH_r08.json
                                              # gate vs a PRIOR ROUND's
                                              # driver artifact

End-of-round ritual: run bench.py, run this gate, fix or waive, then
refresh the baseline with ``--accept`` (which copies BENCH_FULL.json
over bench_baseline.json) as part of the snapshot commit.

``--since`` exists because a mid-round ``--accept`` bakes the round's
own regressions into the baseline, so the default gate can no longer
see them (this is how the r8 de-hint/cap trade on x75/x77 reached the
judge as archaeology instead of a waived gate). Pointing ``--since``
at the previous round's ``BENCH_r{N}.json`` diffs the fresh run
against numbers frozen BEFORE the round started, drift-normalized;
deliberate trades then surface as failing entries that must be waived
in SCALE.md's ``## Bench waivers`` with a cause. Driver artifacts that
wrap the bench JSON line inside a ``tail`` string are parsed
transparently; the driver's truncated per-query map (top-N slowest)
still covers exactly the queries where a regression matters.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BASELINE = REPO / "scripts" / "bench_baseline.json"
FRESH = REPO / "BENCH_FULL.json"
SCALE_MD = REPO / "SCALE.md"

THRESHOLD = 1.5
# Short queries are dominated by fixed per-query overhead whose
# run-to-run jitter in this sandbox is ~±0.5 s (measured r5:
# p4_positive_buyout 0.88 s baseline, 1.50 s in-bench even after a
# re-measure retry, 1.03 s isolated median with an unchanged plan;
# earlier: x1_exact_dedup 0.27/0.67/0.51 s) — a ratio there is noise,
# not a plan change. Only adjudicate when the base is ≥ NOISE_FLOOR_SEC
# or the fresh time has grown past 2×NOISE_FLOOR_SEC, i.e. beyond what
# jitter can produce.
NOISE_FLOOR_SEC = 1.0

# Host-speed drift (calibration probe ratio) beyond which per-query
# timings stop being evidence about the plans: slower → defer
# adjudication; faster → floor diff()'s normalization divisor so a
# masked uniform regression still fails.
CAL_DRIFT_MAX = 1.3


def waivers() -> dict[str, str]:
    """Parse ``- <query>: <reason>`` bullets under ``## Bench waivers``
    in SCALE.md. A waiver names a known, documented cause."""
    if not SCALE_MD.exists():
        return {}
    text = SCALE_MD.read_text()
    m = re.search(r"^## Bench waivers\n(.*?)(?=^## |\Z)", text, re.S | re.M)
    if not m:
        return {}
    out: dict[str, str] = {}
    for line in m.group(1).splitlines():
        bm = re.match(r"-\s*([A-Za-z0-9_]+)\s*:\s*(.+)", line.strip())
        if bm:
            out[bm.group(1)] = bm.group(2)
    return out


def median_drift(base: dict[str, float], fresh: dict[str, float]) -> float:
    """Environment drift between the two runs: the median per-query
    ratio over non-trivial queries. Bench runs happen on a shared
    sandbox whose effective speed moves between rounds (observed: a
    uniform 1.23x inflation r4->r5 across unrelated queries); a real
    plan regression moves ONE query, drift moves ALL of them. The
    median is robust to the handful of genuine regressions.

    Absolute floor: queries under 0.3 s (either side) are excluded —
    their ratios are dominated by fixed per-query overhead, and as the
    registry grows with sub-second queries they would otherwise swamp
    the median and dilute the drift estimate."""
    import statistics

    ratios = [
        fresh[n] / b
        for n, b in base.items()
        if n in fresh and b >= 0.3 and fresh[n] >= 0.3
    ]
    return statistics.median(ratios) if ratios else 1.0


def diff(
    base: dict[str, float],
    fresh: dict[str, float],
    cal_ratio: float | None = None,
) -> tuple[list[tuple[str, float, float, float]], list[str], list[str]]:
    """Return (regressions, added, removed); regressions sorted worst
    first as (name, base_sec, fresh_sec, drift_normalized_ratio).

    Normalization divisor: the median per-query drift — FLOORED at the
    host-calibration ratio WHENEVER the probe says the host did not
    get slower (cal_ratio < 1.0; VERDICT r11 item 2 widened this from
    the original < 1/1.3 band). The median absorbs any uniform shift,
    so on a 2x-faster host a uniform 2x plan regression yields raw
    ratios ~1.0 and a median of ~1.0 — masked. Calibration is plan-
    independent evidence of host speed: if the host got faster (or
    stayed flat) but the queries got uniformly slower, normalizing by
    min(median, cal_ratio) makes the whole-set regression visible.

    Detection boundary (documented per VERDICT r11 item 2): with the
    floor at cal_ratio, a uniform plan regression of magnitude M in a
    window with calibration ratio C fails the gate iff M/C > THRESHOLD
    — e.g. the r11 artifact pair (C=0.91, observed median 1.13) leaves
    uniform regressions up to ~1.37x (=1.5*0.91) undetectable, and a
    genuinely flat host (C=1.0) leaves exactly THRESHOLD. Uniform
    regressions BELOW that, and any regression in a window where the
    probe itself ran slower (C>=1.0 → median divisor, by design: a
    slow window inflates ratios and failing on them is noise), remain
    the re-baseline ritual's job. The probe is CPU-only; a JVM/IO-only
    contention episode moves queries without moving C, which is why
    the floor uses min() rather than replacing the median outright."""
    drift = median_drift(base, fresh)
    if cal_ratio is not None and cal_ratio < 1.0:
        drift = min(drift, cal_ratio)
    regs = []
    for name, b in base.items():
        f = fresh.get(name)
        if f is None:
            continue
        if b < NOISE_FLOOR_SEC and f < 2 * NOISE_FLOOR_SEC:
            continue
        if b > 0 and (f / drift) / b > THRESHOLD:
            regs.append((name, b, f, (f / drift) / b))
    regs.sort(key=lambda r: -r[3])
    added = sorted(set(fresh) - set(base))
    removed = sorted(set(base) - set(fresh))
    return regs, added, removed


class BenchArtifactError(RuntimeError):
    """A bench artifact with no recoverable per-query map. Raised (not
    SystemExit — VERDICT r11 item 1b) so the pytest gate can skip with
    a named warning instead of hard-erroring the whole suite when one
    malformed driver artifact lands in the tree."""


def _same_round_full_map(path: Path) -> dict | None:
    """Recover a driver round artifact's numbers from the committed
    BENCH_FULL.json of the SAME round. The driver's per-round commit
    writes BENCH_r{N}.json and the BENCH_FULL.json produced by the
    same bench run side by side (verified: commit 29d9675 for r11), so
    ``git show <commit-that-added-BENCH_rN>:BENCH_FULL.json`` is the
    identical numbers with none of the stdout-tail truncation risk.
    Returns the parsed full doc, or None when git/the blob is
    unavailable (not a round artifact, uncommitted, no git)."""
    if not re.fullmatch(r"BENCH_r\d+\.json", path.name):
        return None
    import subprocess

    try:
        # --diff-filter=A: the commit that ADDED the round artifact
        # (the driver writes BENCH_r{N}.json and that run's
        # BENCH_FULL.json in one commit). A bare -n1 would return the
        # LAST commit touching the file — a later reformat/amend sweep
        # would silently pair it with a DIFFERENT round's full map,
        # and wrong-but-parseable numbers defeat the gate this
        # recovery protects (r12 review finding).
        commit = subprocess.run(
            ["git", "-C", str(REPO), "log", "--diff-filter=A", "-n1",
             "--format=%H", "--", path.name],
            capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        if not commit:
            return None
        # The pairing assumption itself must hold: the commit that
        # added BENCH_r{N}.json has to be the one that wrote that
        # run's BENCH_FULL.json. If the driver ever commits them
        # separately, `git show <commit>:BENCH_FULL.json` would
        # silently return a PREVIOUS round's full map — wrong-but-
        # parseable numbers, the exact failure the --diff-filter=A
        # fix closed (r12 advisor finding). Verify the adding commit
        # actually touched BENCH_FULL.json before trusting its blob.
        touched = subprocess.run(
            ["git", "-C", str(REPO), "show", "--name-only",
             "--format=", commit],
            capture_output=True, text=True, timeout=30,
        ).stdout.split()
        if "BENCH_FULL.json" not in touched:
            return None
        blob = subprocess.run(
            ["git", "-C", str(REPO), "show", f"{commit}:BENCH_FULL.json"],
            capture_output=True, text=True, timeout=30,
        )
        if blob.returncode != 0:
            return None
        doc = json.loads(blob.stdout)
    except (OSError, subprocess.SubprocessError, json.JSONDecodeError):
        return None
    if "queries" not in doc:
        return None
    print(f"note: {path.name}'s query map was absent or bounded; "
          f"recovered the same round's committed BENCH_FULL.json "
          f"({commit[:9]})")
    return doc


def load_artifact(path: Path) -> tuple[dict[str, float], float | None]:
    """(per-query seconds, calibration score or None) from a bench
    artifact: a plain bench JSON (``{"queries": {...}}``) or a driver
    round artifact whose bench line is embedded in a ``tail`` log
    string. Calibration is the MIN of the artifact's start/end
    host-speed probes (scripts/calibrate.py) when recorded — see
    _cal_mean for why a contaminated leg must not shift the score.

    A round artifact whose embedded line is unparseable (head cut by
    the driver's ~2 KB stdout-tail capture — the r11 failure) falls
    back to the committed BENCH_FULL.json of the same round; only when
    that too is unavailable does it raise BenchArtifactError."""
    doc = load_doc(path)
    return doc["queries"], _cal_mean(doc, "calibration_sec")


def load_doc(path: Path) -> dict:
    """The parsed artifact document (plain, tail-embedded, or
    same-round-recovered — see load_artifact)."""
    doc = json.loads(path.read_text())
    if "queries" not in doc and "tail" in doc:
        # decode from the FIRST '{"metric"' with a raw_decode so any
        # trailing log framing after the JSON object can't break it
        start = doc["tail"].find('{"metric"')
        if start >= 0:
            try:
                doc, _end = json.JSONDecoder().raw_decode(
                    doc["tail"][start:]
                )
            except json.JSONDecodeError:
                pass
    if "queries" not in doc:
        recovered = _same_round_full_map(path)
        if recovered is not None:
            doc = recovered
        else:
            raise BenchArtifactError(f"{path}: no per-query map found")
    elif "queries_note" in doc:
        # r13: a PARSEABLE round artifact now carries only a BOUNDED
        # query map by design (headline + 12 slowest — the r12 stdout
        # fix). Left as-is, the --since gate silently shrinks to ~19
        # comparable queries and 270 regressions-in-waiting go
        # unchecked. The full per-query map lives in the same round
        # commit's BENCH_FULL.json; prefer it, keep the compact doc's
        # calibration legs (same run, and the full map predates the
        # final probe leg only in write order, not in numbers).
        recovered = _same_round_full_map(path)
        if recovered is not None:
            recovered = dict(recovered)
            for key in ("calibration_sec", "calibration_jvm_sec"):
                if key in doc:
                    recovered[key] = doc[key]
            doc = recovered
    return doc


def _cal_mean(doc: dict, key: str) -> float | None:
    """Host score from an artifact's start/end probe legs: the MIN
    (r12 review finding — formerly the mean). The probe measures host
    CAPABILITY, and a contaminated leg can only overestimate time:
    observed twice this round, the START leg sampling the previous
    Spark JVM's multi-second shutdown (0.21 s vs the 0.017 s clean
    end leg — a 6x phantom 'slow host' that would poison every future
    faster-host floor against that baseline). min-of-legs is the same
    logic calibrate.score applies across its own repeats."""
    cal = doc.get(key)
    if isinstance(cal, dict) and cal:
        vals = [v for v in cal.values() if isinstance(v, (int, float))]
        return min(vals) if vals else None
    return None


# Measured single-leg repeatability of the CPU probe (r12: clean-idle
# window scores ranged 0.0168–0.023 s around the r11 baseline's
# 0.0198 — ±17%). A lone CPU-leg "speedup" inside this band is below
# the probe's own resolution and must not arm the faster-host floor:
# doing so normalized three untouched sub-2 s queries into phantom
# 1.5x+ regressions this round (isolated re-times matched their r11
# numbers exactly). Dual-leg readings don't take the guard — two
# independent probes agreeing is real evidence.
PROBE_NOISE_BAND = 1 / 1.2


def combined_cal_ratio(base_doc: dict, fresh_doc: dict) -> float | None:
    """fresh/base host-speed ratio from the probe legs both artifacts
    carry: the CPU leg (calibration_sec) and, when present on BOTH
    sides, the JVM/shuffle leg (calibration_jvm_sec, r12). Combined
    as the MAX (most pessimistic): the host is as slow as its slowest
    relevant subsystem, so the faster-host floor only engages when
    EVERY leg agrees the host sped up, and deferral engages when ANY
    leg saw a >CAL_DRIFT_MAX slowdown — closing the r11 split where
    the CPU probe ran faster while JVM/IO contention slowed queries.

    Single-leg pairs (a pre-r12 baseline with no JVM leg) additionally
    take the PROBE_NOISE_BAND guard: a sub-1.0 reading inside the
    lone probe's repeatability band is clamped to 1.0 (the floor
    stays inert; deferral, which triggers above 1.3, is unaffected).
    Documented residual: against a CPU-only baseline, uniform plan
    regressions up to THRESHOLD/(that band) remain undetectable —
    the JVM leg now recorded on every new artifact retires this case
    one baseline refresh later."""
    ratios = []
    for key in ("calibration_sec", "calibration_jvm_sec"):
        b, f = _cal_mean(base_doc, key), _cal_mean(fresh_doc, key)
        if b and f:
            ratios.append(f / b)
    if not ratios:
        return None
    r = max(ratios)
    if len(ratios) == 1 and PROBE_NOISE_BAND <= r < 1.0:
        return 1.0
    return r


def _cal_worst(doc: dict, key: str) -> float | None:
    """MAX of an artifact's probe legs — the WORST window the run saw
    (contrast _cal_mean's min, the host's capability)."""
    cal = doc.get(key)
    if isinstance(cal, dict) and cal:
        vals = [v for v in cal.values() if isinstance(v, (int, float))]
        return max(vals) if vals else None
    return None


def deferral_cal_ratio(base_doc: dict, fresh_doc: dict) -> float | None:
    """The ratio that decides CONTENDED-WINDOW DEFERRAL: the fresh
    run's WORST probe leg against the baseline's capability (min
    leg). min-of-legs alone (r12 review finding) silently disabled
    deferral for a run whose contention subsided before the end leg —
    first half of the queries 2x slow, end probe clean, gate fails
    them as plan regressions instead of deferring. Using the worst
    fresh leg restores that protection; a contaminated START leg
    (previous JVM's shutdown) then defers a run that might have been
    fine, which is the safe direction — deferral just says re-run.

    Noise guard (r13, advisor finding): max-vs-min pairs an extreme
    pick on BOTH sides, so the probe's own measured ±17% single-leg
    repeatability (a 1.37x clean-window spread, r12 data) can alone
    exceed CAL_DRIFT_MAX=1.3 — letting ordinary jitter convert any
    real unwaived regression into a repeatable defer. The ratio is
    therefore deflated by one PROBE_NOISE_BAND (x1/1.2) before it is
    compared: a clean window's worst/min spread reads ~1.14 (< 1.3,
    no false defer) while a genuinely contended window (the r12
    driver run's 1.85x → 1.54 adjusted) still defers."""
    ratios = []
    for key in ("calibration_sec", "calibration_jvm_sec"):
        b, f = _cal_mean(base_doc, key), _cal_worst(fresh_doc, key)
        if b and f:
            ratios.append((f / b) * PROBE_NOISE_BAND)
    return max(ratios) if ratios else None


def cpus_mismatch(base_doc: dict, fresh_doc: dict) -> tuple[int, int] | None:
    """(base_cpus, fresh_cpus) when BOTH artifacts record a core count
    and they differ, else None. r15: the r14 driver commit overwrote
    BENCH_FULL.json with its 8-CORE scaling run's full map; against the
    32-core baseline the gate then flagged the core-scaling mapInPandas
    queries (x135 1.29→2.45 s, x136 1.28→3.08 s) as plan regressions.
    Per-query ratios across different core counts measure SCALING, not
    plans — adjudication must defer, same contract as a contended
    window. Artifacts predating the "cpus" field (≤r14) return None
    (no evidence either way)."""
    b, f = base_doc.get("cpus"), fresh_doc.get("cpus")
    if isinstance(b, int) and isinstance(f, int) and b != f:
        return (b, f)
    return None


def load_queries(path: Path) -> dict[str, float]:
    return load_artifact(path)[0]


def _robust_accept_queries(fresh_doc: dict) -> tuple[dict, int]:
    """Per-query numbers for an --accept: the MEDIAN of (fresh run,
    previous pinned baseline, latest driver round artifact) when all
    three carry the query, else the fresh number.

    Root cause this closes (r13, VERDICT r12 items 1+3): --accept
    snapshotted ONE window, so a single lucky sample became an
    unachievable pinned number for a noisy query (t49 pinned at a
    good-window 1.06 s against a 1.6–1.9 s honest band → flagged on
    every later run) and a single unlucky sample would mask real
    future regressions. Median-of-three-INDEPENDENT-windows kills
    single-window outliers in both directions. Semantics: a genuine
    optimization reaches the baseline one accept later (fresh fast,
    both priors slow → median stays slow for one round); a regression
    the fresh run carries does NOT get baked in (fresh slow, priors
    fast → median stays fast and the gate keeps flagging it), which
    is exactly the job the --since gate already assigns to --accept.
    ``--accept-raw`` keeps the old copy-verbatim behavior for
    intentional resets (e.g. after a materializer change renames the
    whole comparable set)."""
    sources: list[dict] = []
    try:
        sources.append(load_doc(BASELINE)["queries"])
    except (OSError, ValueError, BenchArtifactError):
        pass
    rounds = sorted(REPO.glob("BENCH_r[0-9][0-9].json"))
    if rounds:
        try:
            rq = load_doc(rounds[-1])["queries"]
            # INDEPENDENT windows only (r13 advisor finding): when the
            # end-of-round ritual accepts the very bench run that
            # produced the round artifact, the round source and FRESH
            # share one window and median-of-three silently becomes
            # the fresh value for every query the artifact carries —
            # the outlier damping this function exists for turns into
            # a no-op. Same-run detection: identical timings on every
            # common query (float equality survives the JSON
            # round-trip of one run; two independent 32-thread bench
            # windows never reproduce hundreds of wall-clock timings
            # bit-for-bit). A duplicate source is dropped so the
            # median degrades to the fresh number EXPLICITLY.
            common = set(rq) & set(fresh_doc["queries"])
            same_run = bool(common) and all(
                rq[k] == fresh_doc["queries"][k] for k in common
            )
            if same_run:
                print(f"--accept: {rounds[-1].name} is the same bench "
                      "window as BENCH_FULL.json — dropped as a median "
                      "source (independent windows only)")
            else:
                sources.append(rq)
        except (OSError, ValueError, BenchArtifactError):
            # same degradation as the BASELINE source above (r13
            # review: a truncated/non-JSON round artifact raises
            # JSONDecodeError before BenchArtifactError is reachable,
            # and the end-of-round --accept must fall back to fewer
            # sources, not traceback)
            pass
    damped = 0
    out: dict[str, float] = {}
    for name, f in fresh_doc["queries"].items():
        vals = [f] + [s[name] for s in sources if name in s]
        if len(vals) == 3:
            m = sorted(vals)[1]
            if m != f:
                damped += 1
            out[name] = m
        else:
            out[name] = f
    return out, damped


def main(argv: list[str]) -> int:
    report_only = "--report" in argv
    if "--accept" in argv or "--accept-raw" in argv:
        fresh_doc = load_doc(FRESH)
        if "--accept-raw" not in argv:
            q, damped = _robust_accept_queries(fresh_doc)
            fresh_doc = dict(fresh_doc)
            fresh_doc["queries"] = q
            fresh_doc["value"] = round(sum(q.values()), 3)
            fresh_doc["accept_policy"] = (
                "median(fresh, prev_baseline, latest_round) per query"
            )
            print(f"baseline refreshed from {FRESH} "
                  f"({damped} outlier entr{'y' if damped == 1 else 'ies'} "
                  f"damped to a cross-window median)")
        else:
            print(f"baseline refreshed VERBATIM from {FRESH}")
        BASELINE.write_text(json.dumps(fresh_doc, indent=1) + "\n")
        return 0
    if "--since" in argv:
        idx = argv.index("--since")
        if idx + 1 >= len(argv) or argv[idx + 1].startswith("--"):
            raise SystemExit(
                "usage: bench_diff.py --since <BENCH_rN.json>"
            )
        since_path = Path(argv[idx + 1])
        if not since_path.is_absolute():
            since_path = REPO / since_path
        try:
            base_doc = load_doc(since_path)
        except BenchArtifactError as e:
            # one malformed driver artifact must not wedge the gate
            # (VERDICT r11 item 1b) — name the problem, exit distinct
            # from both pass (0) and gate-fail (1)
            print(f"SINCE-GATE SKIPPED: {e}")
            return 2
        print(f"comparing against {since_path.name} "
              f"({len(base_doc['queries'])} queries)")
    else:
        try:
            base_doc = load_doc(BASELINE)
        except BenchArtifactError as e:
            # a corrupt pinned baseline is an artifact problem, not a
            # plan regression — exit 2 (distinct from gate-fail 1),
            # same contract as the --since branch (r12 review finding)
            print(f"GATE SKIPPED: {e}")
            return 2
    try:
        fresh_doc = load_doc(FRESH)
    except BenchArtifactError as e:
        print(f"GATE SKIPPED: {e}")
        return 2
    mm = cpus_mismatch(base_doc, fresh_doc)
    if mm is not None:
        print(
            f"ADJUDICATION DEFERRED: core-count mismatch — baseline ran "
            f"at {mm[0]} cpus, fresh at {mm[1]}; per-query ratios across "
            "core counts measure scaling, not plans. Re-run bench.py at "
            "the baseline's core count."
        )
        return 3
    base, base_cal = base_doc["queries"], _cal_mean(base_doc, "calibration_sec")
    fresh, fresh_cal = fresh_doc["queries"], _cal_mean(fresh_doc, "calibration_sec")

    # Contended-window auto-deferral (VERDICT r10 item 5): when both
    # artifacts carry a host-calibration score and the fresh run's
    # host was >CAL_DRIFT_MAX slower, per-query ratios are evidence of
    # the environment, not the plans — adjudication is deferred (exit
    # 3, distinct from gate-fail 1) instead of hand-written ledger
    # notes. A much FASTER host is the opposite hazard: host speedup
    # absorbed into the median divisor can mask a uniform plan
    # regression — diff() floors the divisor at cal_ratio for that
    # case (see its docstring), so masked regressions FAIL the gate.
    cal_ratio = combined_cal_ratio(base_doc, fresh_doc)
    if base_cal and fresh_cal:
        jvm_note = ""
        bj = _cal_mean(base_doc, "calibration_jvm_sec")
        fj = _cal_mean(fresh_doc, "calibration_jvm_sec")
        if bj and fj:
            jvm_note = f" jvm={fj / bj:.2f}x"
        print(f"host calibration: base={base_cal:.4f}s "
              f"fresh={fresh_cal:.4f}s cpu={fresh_cal / base_cal:.2f}x"
              f"{jvm_note} -> effective={cal_ratio:.2f}x")
    regs, added, removed = diff(base, fresh, cal_ratio)
    waived = waivers()

    print(f"environment drift (median ratio): {median_drift(base, fresh):.2f}x")
    unwaived = [r for r in regs if r[0] not in waived]
    for name, b, f, ratio in regs:
        tag = f"WAIVED ({waived[name]})" if name in waived else "FAIL"
        print(
            f"{ratio:5.2f}x(norm)  {name}: {b:.2f}s -> {f:.2f}s  [{tag}]"
        )
    if added:
        if "--since" in argv:
            # driver artifacts keep only the top-N slowest queries, so
            # most of the registry is "new" vs them — just count it
            print(f"queries without a prior-round number: {len(added)}")
        else:
            print(f"new queries (no baseline): {', '.join(added)}")
    if removed:
        print(f"dropped queries: {', '.join(removed)}")
    total_b = sum(base.values())
    total_f = sum(fresh[n] for n in fresh if n in base)
    print(
        f"comparable-set total: {total_b:.1f}s -> {total_f:.1f}s "
        f"({total_f / total_b:.2f}x), {len(regs)} regression(s) "
        f">{THRESHOLD}x, {len(unwaived)} unwaived"
    )
    if unwaived and not report_only:
        # deferral keys off the fresh run's WORST probe window (see
        # deferral_cal_ratio) — distinct from cal_ratio, which is the
        # capability comparison the faster-host floor uses
        defer_ratio = deferral_cal_ratio(base_doc, fresh_doc)
        if defer_ratio is not None and defer_ratio > CAL_DRIFT_MAX:
            print(
                f"\nADJUDICATION DEFERRED: the fresh run's worst probe "
                f"window ran {defer_ratio:.2f}x slower than the "
                f"baseline host (> {CAL_DRIFT_MAX}x) — re-run bench.py "
                "in a clean window before judging these as regressions."
            )
            return 3
        print(
            "\nGATE FAILED: fix the regression or add a "
            "'## Bench waivers' bullet to SCALE.md naming the cause."
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
