"""Local replica of the driver's t2 correctness gate, importable from
both the CLI (scripts/check_parity.py) and the test suite
(tests/test_parity.py) so every oracle-backed query is value-verified
on every change — not only the 50 inside the driver's window.

For each query: run the Spark callable and its DuckDB oracle over the
same parquet dir, compare row count, column names, and an
order-insensitive canonical value comparison (sorted rows, floats
rounded to 4 decimals — matching the dialect-parity rounding the
registry applies on both sides).
"""

from __future__ import annotations

import math
import time

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 4)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    return v


def _canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon_cell(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def _as_decimal(v):
    from decimal import Decimal

    # repr = shortest round-trip, so binary noise below the declared
    # scale can't leak into the quantize
    return Decimal(repr(v)) if isinstance(v, float) else Decimal(v)


def _cells_agree_at_scale(a, b, scale: int) -> bool:
    """The declared-scale VALUE contract (r14, VERDICT r13 item 4):
    numerics agree when their HALF_UP quantizations at ``scale``
    digits are equal OR one quantum (10^-scale) apart with the raw
    values themselves within one quantum. The adjacency allowance is
    NOT slack on the money amounts — it is the cross-engine
    double-rounding residual: Spark's exact decimal and DuckDB's
    binary double legitimately live on different grids, so a value
    sitting on a half-boundary of the declared grid (…94675) rounds
    to adjacent cells while the underlying amounts agree to 1e-8; a
    real error of two grid steps (or a sub-quantum raw difference
    CLAIMED as a different cell) still fails. Non-numerics compare
    exactly via the default canon."""
    from decimal import ROUND_HALF_UP, Decimal

    num = (int, float, Decimal)
    a_num = isinstance(a, num) and not isinstance(a, bool)
    b_num = isinstance(b, num) and not isinstance(b, bool)
    if not (a_num and b_num):
        return _canon_cell(a) == _canon_cell(b)
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    if isinstance(b, float) and math.isnan(b):
        return False
    da, db = _as_decimal(a), _as_decimal(b)
    quantum = Decimal(1).scaleb(-scale)
    qa = da.quantize(quantum, rounding=ROUND_HALF_UP)
    qb = db.quantize(quantum, rounding=ROUND_HALF_UP)
    if qa == qb:
        return True
    return abs(qa - qb) <= quantum and abs(da - db) <= quantum


def _compare_keyed_scaled(
    s_cols, s_rows, d_cols, d_rows, keys: tuple[str, ...], scale: int
) -> list[str]:
    """Row-aligned declared-scale compare: rows pair up on the
    declared key columns (exact match), every other cell goes through
    :func:`_cells_agree_at_scale`. Returns problem strings (empty =
    green). Key alignment exists because a one-quantum difference in
    a sort-leading value column would misalign a sorted-tuple pairing
    and produce spurious diffs on every later row."""
    # key tuples built in the DECLARED key order on BOTH sides (r14
    # review: each side's own column order would misalign a multi-key
    # compare whose engines emit the key columns in different orders)
    key_order = [k.lower() for k in keys]
    key_set = set(key_order)
    s_pos = {c: i for i, c in enumerate(s_cols)}
    d_pos = {c: i for i, c in enumerate(d_cols)}
    problems: list[str] = []
    missing = [k for k in key_order if k not in s_pos or k not in d_pos]
    if missing:
        return [f"declared value_keys absent from result: {missing}"]

    def index(rows, pos):
        idx = [pos[k] for k in key_order]
        out = {}
        for r in rows:
            k = tuple(_canon_cell(r[i]) for i in idx)
            if k in out:
                problems.append(f"duplicate key {k}")
            out[k] = r
        return out

    s_map = index(s_rows, s_pos)
    d_map = index(d_rows, d_pos)
    if set(s_map) != set(d_map):
        extra_s = list(set(s_map) - set(d_map))[:3]
        extra_d = list(set(d_map) - set(s_map))[:3]
        problems.append(
            f"key sets differ: spark-only={extra_s} duck-only={extra_d}"
        )
        return problems
    for k, sr in s_map.items():
        dr = d_map[k]
        for i, c in enumerate(s_cols):
            if c in key_set:
                continue
            if not _cells_agree_at_scale(sr[i], dr[d_pos[c]], scale):
                problems.append(
                    f"key {k} col {c}: spark={sr[i]} duck={dr[d_pos[c]]} "
                    f"(beyond one quantum at scale {scale})"
                )
                if len(problems) >= 5:
                    return problems
    return problems


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the harness's table views.

    The driver's dirs hold one parquet FILE per table; Spark-written
    datasets (scripts/gen_scale_data.py) are DIRECTORIES of part
    files — glob those so the same gate runs on generated scales."""
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def run_parity(
    spark,
    sf_dir: str,
    only: set[str] | None = None,
    verbose: bool = True,
) -> tuple[list[str], list[str], list[tuple[str, str]]]:
    """Returns (passed, rows_only, failed[(name, why)])."""
    from server_spark import registry

    con = duckdb_connection(sf_dir)
    qs, oracles = registry.queries(), registry.oracle_sql()
    v_oracles = registry.value_oracles()
    failed: list[tuple[str, str]] = []
    passed: list[str] = []
    rows_only: list[str] = []

    def say(msg: str) -> None:
        if verbose:
            print(msg)

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            failed.append((name, f"SPARK ERROR: {ex}"))
            say(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            continue
        sql = oracles.get(name)
        scale = v_keys = None
        if not sql and name in v_oracles:
            # declared-scale VALUE oracle (r14): full rows+schema+value
            # compare, rows key-aligned, values quantized at the
            # declared scale with a one-quantum cross-engine rounding
            # allowance — the verification for queries whose only
            # raw-hash blocker is serialization (a2d's decimal-vs-
            # double money grid). The driver still sees these as
            # rows-only; THIS gate does not.
            sql, scale, v_keys = v_oracles[name]
        if not sql:
            rows_only.append(name)
            say(f"rows  {name}: {len(s_rows)} rows (no oracle) "
                f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(sql)
            d_cols = [c.lower() for c in [d[0] for d in res.description]]
            d_rows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            failed.append((name, f"DUCKDB ERROR: {ex}"))
            say(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems and scale is not None:
            problems.extend(
                _compare_keyed_scaled(
                    s_cols, s_rows, d_cols, d_rows, v_keys, scale
                )
            )
        elif not problems:
            cs = _canon_rows(s_cols, s_rows)
            cd = _canon_rows(d_cols, d_rows)
            if cs != cd:
                diff = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(cs, cd)) if a != b
                )
                problems.append(f"values differ at sorted row {diff[0]}: "
                                f"spark={diff[1]} duck={diff[2]}")
        if problems:
            failed.append((name, "; ".join(problems)))
            say(f"FAIL  {name}: {'; '.join(problems)[:400]}")
        else:
            passed.append(name)
            mark = f"ok@{scale}" if scale is not None else "ok   "
            say(f"{mark} {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")

    say(f"\n{len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} failed")
    for name, why in failed:
        say(f"  FAILED {name}: {why[:300]}")
    return passed, rows_only, failed
