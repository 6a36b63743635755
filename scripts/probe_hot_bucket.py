"""Hot-bucket stress probe for the capped dedup candidate paths (r8).

The r7 salted-replication probe measured SCAN scaling but, by
construction, not hot-bucket behavior (the salt removes cross-copy
similarity). This probe measures the other axis: every document gets
the SAME boilerplate paragraph appended, so its ~38 shingles acquire
posting lists the size of the whole corpus — the exact pathology the
x75/x77 hot-bucket caps exist for (one viral disclaimer → k² pair
rows).

Two measurements:
1. x75 (capped, shipped plan) on the stressed full corpus — must stay
   near its unstressed time: hot shingles generate no pairs, and the
   exact hot add-back is candidate-gated.
2. UNCAPPED inverted-index self-join (the pre-r8 shape, reconstructed
   inline) vs the capped plan on a SLICE (default 1500 docs — the
   uncapped form is quadratic: 1500²/2 pairs × 38 hot shingles ≈ 4e7
   join rows already; the full corpus would be ≈5e8).

Usage: python scripts/probe_hot_bucket.py [sf_dir] [slice_docs]
Prints a small JSON summary; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from server_spark.registry import queries
    from server_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    slice_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1500

    spark = get_spark("hot-bucket-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    boiler = " ".join(f"boilerplate{i}" for i in range(40))
    stressed = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" " + boiler))
    )

    tmp = tempfile.mkdtemp(prefix="x75hot_")
    out = {"sf_dir": sf_dir, "n_docs": docs.count(), "slice": slice_docs}
    try:
        stressed.write.mode("overwrite").parquet(f"{tmp}/full/documents.parquet")
        stressed.filter(F.col("doc_id") % 997 < 997 * slice_docs // out["n_docs"]) \
            .write.mode("overwrite").parquet(f"{tmp}/slice/documents.parquet")

        x75 = queries()["x75_containment_pairs"]

        def timed(fn):
            t0 = time.perf_counter()
            n = fn().count()
            return round(time.perf_counter() - t0, 2), n

        # warm the session
        x75(spark, f"{tmp}/slice").count()

        out["capped_full_sec"], out["capped_full_rows"] = timed(
            lambda: x75(spark, f"{tmp}/full")
        )
        out["capped_slice_sec"], _ = timed(lambda: x75(spark, f"{tmp}/slice"))

        # pre-r8 shape: full inverted-index self-join, no cap
        def uncapped():
            from server_spark.dedup import ngram as ng

            d = spark.read.parquet(f"{tmp}/slice/documents.parquet")
            sh = ng.word_shingles(d, n=3)
            a = sh.select(F.col("doc_id").alias("doc_sub"), "shingle")
            b = sh.select(F.col("doc_id").alias("doc_super"), "shingle")
            return (
                a.join(b, "shingle")
                .filter(F.col("doc_sub") < F.col("doc_super"))
                .groupBy("doc_sub", "doc_super")
                .agg(F.count("*").alias("n_common"))
            )

        out["uncapped_slice_sec"], out["uncapped_slice_pairs"] = timed(
            uncapped
        )
        out["slice_speedup"] = round(
            out["uncapped_slice_sec"] / max(out["capped_slice_sec"], 1e-9), 1
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
