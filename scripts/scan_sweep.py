"""Static duplicated-subtree sweep: for every registry query, count
`Scan parquet` nodes per input file in the formatted final plan and
flag queries whose plan scans the same file more than once — the
multi-consumer-without-a-cut signature (r15 duplicated-scan batch,
guide §1.2/§2.4).

Usage: python scripts/scan_sweep.py [--sf DIR] [name ...]
Writes a TSV to stdout: query  n_scans  n_exchanges  files...
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf = "/root/testdata/sf0.01"
    names = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf = args.pop(0)
        else:
            names.append(a)

    from server_spark import registry
    from server_spark.session import get_spark

    spark = get_spark("scan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    todo = names or sorted(qs)

    for name in todo:
        try:
            df = qs[name](spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # keep sweeping
            print(f"{name}\tERROR\t{type(exc).__name__}: {exc}")
            continue
        locs = Counter(
            m.group(1).rsplit("/", 1)[-1]
            for m in re.finditer(r"InMemoryFileIndex \[file:([^\]]+)\]", plan)
        )
        n_scan = sum(locs.values())
        n_exch = len(re.findall(r"\bExchange\b", plan))
        dup = {f: c for f, c in locs.items() if c > 1}
        flag = "DUP" if dup else "-"
        print(
            f"{name}\t{flag}\tscans={n_scan}\texch={n_exch}\t"
            + ",".join(f"{f}x{c}" for f, c in sorted(locs.items()))
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
