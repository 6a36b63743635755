"""Self-determinism sweep: every registered query run twice in one
session must produce identical canonical rows.

Complements the oracle parity (which compares ONE draw per engine)
and the config-metamorphic tests (which vary the physical plan): this
catches same-plan nondeterminism — unordered collect_list reaching an
output, first()/any_value() without a defining order, float reductions
whose partition order wobbles between runs — the class where Spark
and the oracle could even agree per-run yet the answer isn't stable.

Usage: python scripts/selfdet.py [sf_dir]   (default sf0.001)
Exits 1 listing any nondeterministic query.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from server_spark import registry  # noqa: E402
from server_spark.session import get_spark  # noqa: E402


def canon(df) -> list[tuple]:
    rows = []
    for r in df.collect():
        rows.append(
            tuple(
                round(v, 9) if isinstance(v, float) and math.isfinite(v)
                else v
                for v in r
            )
        )
    return sorted(rows, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("selfdet", shuffle_partitions=8)
    qs = registry.queries()
    bad: list[str] = []
    for name, fn in qs.items():
        try:
            if canon(fn(spark, sf_dir)) != canon(fn(spark, sf_dir)):
                bad.append(name)
                print(f"NONDET {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            bad.append(f"{name} (error)")
            print(f"ERR    {name}: {str(e)[:120]}", flush=True)
    print(f"{len(qs)} queries, {len(bad)} nondeterministic/errored")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
