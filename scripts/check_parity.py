"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()[name]`` on Spark and its ``oracle_sql()[name]``
on DuckDB over the same parquet dir, then compares row count, column
names, and an order-insensitive value comparison (sorted rows, floats
rounded). Run:  python scripts/check_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from server_spark.session import get_spark

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed, passed, rows_only = [], [], []
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
            print(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            continue
        sql = oracles.get(name)
        if not sql:
            rows_only.append(name)
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(sql)
            d_cols = [c.lower() for c in [d[0] for d in res.description]]
            d_rows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            failed.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
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
            print(f"FAIL  {name}: {'; '.join(problems)[:400]}")
        else:
            passed.append(name)
            print(f"ok    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} failed")
    for name, why in failed:
        print(f"  FAILED {name}: {why[:300]}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
