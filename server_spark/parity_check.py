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
        if not problems:
            cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
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
            say(f"ok    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")

    say(f"\n{len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} failed")
    for name, why in failed:
        say(f"  FAILED {name}: {why[:300]}")
    return passed, rows_only, failed
