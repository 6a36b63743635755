"""Local replica of the driver's t2 correctness gate (CLI).

Run:  python scripts/check_parity.py [sf_dir] [name ...]

The comparison logic lives in server_spark.parity_check so the test
suite (tests/test_parity.py) runs the same gate on every change.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    from server_spark.parity_check import run_parity
    from server_spark.session import get_spark

    if only:
        # a typo'd name must be a loud error, not a silently-empty
        # run that exits 0 and reads as green (r11 review finding)
        from __spark_entry__ import queries

        unknown = only - set(queries())
        if unknown:
            raise SystemExit(
                f"unknown query name(s): {sorted(unknown)} — "
                "not in the __spark_entry__ registry"
            )

    spark = get_spark("parity-check")
    _passed, _rows_only, failed = run_parity(spark, sf_dir, only=only)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
