#!/usr/bin/env python
"""Empirical Z-order file-skipping probe (the probe_hot_bucket
pattern): the sf0.1 auctions relation written three ways — item-sorted,
realm... (owner)-sorted, and Morton(item, owner) z-ordered — then 2D
box predicates measure how many files each layout actually touches.

    python scripts/probe_zorder.py [n_files]

Emits one JSON line. Expected shape: the single-key layouts touch
~ALL files for predicates on the OTHER key; z-order touches a small
fraction for both keys and their conjunction.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    from pyspark.sql import functions as F

    from server_spark.plans.layout import (
        files_touched,
        write_keysorted,
        write_zordered,
    )
    from server_spark.session import get_spark
    from server_spark.sources.synthetic import auctions

    spark = get_spark("probe-zorder")
    spark.sparkContext.setLogLevel("ERROR")
    au = auctions(spark, "/root/testdata/sf0.1").select(
        "auc", "item", "owner", "buyout", "quantity"
    )
    lo_i, hi_i, lo_o, hi_o = au.agg(
        F.min("item"), F.max("item"), F.min("owner"), F.max("owner")
    ).collect()[0]
    # a ~10%-per-dimension box in the middle of each key range
    i0 = lo_i + (hi_i - lo_i) * 45 // 100
    i1 = lo_i + (hi_i - lo_i) * 55 // 100
    o0 = lo_o + (hi_o - lo_o) * 45 // 100
    o1 = lo_o + (hi_o - lo_o) * 55 // 100
    preds = {
        "item_box": F.col("item").between(i0, i1),
        "owner_box": F.col("owner").between(o0, o1),
        "both_box": F.col("item").between(i0, i1)
        & F.col("owner").between(o0, o1),
    }

    base = tempfile.mkdtemp(prefix="zorder_probe_")
    out = {"n_files": n_files}
    try:
        layouts = {
            "item_sorted": lambda p: write_keysorted(au, p, "item", n_files),
            "owner_sorted": lambda p: write_keysorted(au, p, "owner", n_files),
            "zorder_item_owner": lambda p: write_zordered(
                au, p, "item", "owner", n_files
            ),
        }
        for name, writer in layouts.items():
            path = f"{base}/{name}"
            writer(path)
            for pname, pred in preds.items():
                touched, total = files_touched(spark, path, pred)
                out[f"{name}.{pname}"] = f"{touched}/{total}"
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
