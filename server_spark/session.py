"""SparkSession factory.

The reference runs a single Go process with a goroutine worker pool
(SURVEY.md §3.2); our unit of parallelism is the Spark task. Local
testing uses ``local[N]`` but every setting below is chosen to also be
the right default on a 1000-executor cluster reading 100 TB:

- AQE on: runtime coalescing of shuffle partitions, dynamic
  broadcast-join conversion, skew-join splitting — replaces every
  hand-rolled sizing decision the reference made.
- ``spark.sql.session.timeZone=UTC``: the reference keys everything by
  unix seconds (UTC); keeping the session in UTC makes timestamp
  semantics identical between Spark and the DuckDB oracle.
- Arrow enabled: all pandas_udf paths (fuzzy rank, cosine top-k,
  multimodal decode) move data in Arrow batches, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "server_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    On a real cluster ``master`` comes from the environment; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    # Single-threaded BLAS in Python workers (r13, VERDICT r12 item 3,
    # measured): Spark owns the parallelism — N tasks per host already
    # saturate the cores, and OpenBLAS spawning its own threads per
    # worker oversubscribes the box (32 workers x 2 BLAS threads on 32
    # cores here). That oversubscription was THE source of the
    # 1.3-1.9x clean-window wander on every numpy-heavy mapInPandas
    # query: pinning 1 BLAS thread moved x14_ivf_topk's isolated
    # median 2.24 s -> 1.58 s (back to its r9-r12 band) and cut
    # x129's run spread from 1.37x to 1.15x. Must be set BEFORE the
    # JVM GATEWAY launches (workers inherit the JVM's env, frozen at
    # launch) — gated on the gateway like the driver-memory block
    # below, NOT on getActiveSession(): after spark.stop() the active
    # session is None but the gateway JVM persists with its
    # launch-time env, so a setdefault there would APPEAR to apply
    # while new workers stayed unpinned (r13 review).
    # setdefault so a deployment that wants threaded BLAS (one task
    # per host, giant matmuls) can still override at launch.
    from pyspark import SparkContext

    if SparkContext._gateway is None:
        for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                    "MKL_NUM_THREADS"):
            os.environ.setdefault(var, "1")

    # Driver memory must be fixed BEFORE the JVM gateway launches —
    # setting spark.driver.memory through the builder is a silent
    # no-op once pyspark has spawned the JVM. If we're first (no
    # gateway yet), inject it into PYSPARK_SUBMIT_ARGS, the only
    # channel the gateway launcher reads in local mode.
    if SparkContext._gateway is None:
        mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        submit = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
        if "--driver-memory" not in submit:
            os.environ["PYSPARK_SUBMIT_ARGS"] = (
                f"--driver-memory {mem} " + submit
            )

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime row-level bloom filters: when a shuffle join's
        # creation side carries a selective filter but is too big to
        # broadcast (the 100 TB dim-slice case, j10), inject a bloom
        # filter on the application side's join key so non-matching
        # fact rows are dropped before the shuffle. Local runs rarely
        # trigger it (the filtered dim broadcasts instead, strictly
        # better); the injection itself is plan-tested with
        # cluster-shaped thresholds in tests/test_plans.py.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER_URL"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()

    # Honor SPARK_GRAFT_CHECKPOINT_DIR: when set, every barrier() in
    # the operator layer becomes a reliable checkpoint into that dir
    # (survives executor loss) instead of a localCheckpoint.
    from server_spark.barrier import _maybe_enable_from_env

    _maybe_enable_from_env(spark)
    return spark
