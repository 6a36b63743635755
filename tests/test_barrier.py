"""Reliable-checkpoint barrier (server_spark/barrier.py).

The operator layer cuts lineage through ``barrier(df)`` instead of
calling ``localCheckpoint`` directly, so one session-level switch
(:func:`enable_reliable_barriers`) turns every barrier into a reliable
``checkpoint()`` that survives executor loss on a real cluster.
"""

from __future__ import annotations

import os

import pytest

from server_spark.barrier import (
    barrier,
    disable_reliable_barriers,
    enable_reliable_barriers,
    reliable_enabled,
)

from tests.conftest import SF_SMOKE


@pytest.fixture
def reliable(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    enable_reliable_barriers(spark, ckdir)
    yield ckdir
    disable_reliable_barriers(spark)


def test_barrier_default_is_local(spark):
    assert not reliable_enabled(spark)
    df = barrier(spark.range(100))
    # localCheckpoint truncates lineage: the plan bottoms out at the
    # materialized RDD instead of the original Range scan
    assert df.count() == 100
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan and "Range" not in plan


def test_barrier_reliable_writes_checkpoint_dir(spark, reliable):
    assert reliable_enabled(spark)
    df = barrier(spark.range(100))
    assert df.count() == 100
    # reliable checkpoint materializes RDD blocks under the configured dir
    found = [
        os.path.join(root, f)
        for root, _, fs in os.walk(reliable)
        for f in fs
        if f.startswith("part-")
    ]
    assert found, "reliable barrier wrote no checkpoint files"


def test_barrier_chains_with_transform(spark):
    # operator code uses df.transform(barrier) inside chains
    df = spark.range(10).transform(barrier).filter("id >= 5")
    assert df.count() == 5


def test_operator_pipeline_under_reliable_barriers(spark, reliable):
    """An actual multi-barrier operator (dedup corpus build routes
    through barrier several times) produces identical results in
    reliable mode."""
    from server_spark.queries.ext_dedup import x21_corpus_build

    rel = x21_corpus_build(spark, SF_SMOKE).count()
    disable_reliable_barriers(spark)
    loc = x21_corpus_build(spark, SF_SMOKE).count()
    assert rel == loc and rel > 0


def test_reliable_enabled_answers_false_without_jvm_context():
    """r12 advisor finding: the context-level fallback reaches through
    spark.sparkContext._jsc — a private JVM handle that a Spark
    Connect session does not expose (sparkContext access raises
    there). The probe must answer False, not throw: no reachable
    context means no checkpoint dir to use anyway."""

    class _NoFlagConf:
        def get(self, key, default=None):
            return default

    from pyspark.errors import PySparkNotImplementedError

    class _ConnectishSession:
        conf = _NoFlagConf()

        @property
        def sparkContext(self):
            # the error type a real Connect session raises here
            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "sparkContext"},
            )

    assert reliable_enabled(_ConnectishSession()) is False

    # a session object with NO sparkContext attribute at all
    class _Contextless:
        conf = _NoFlagConf()

    assert reliable_enabled(_Contextless()) is False


def test_reliable_enabled_propagates_transient_jvm_errors():
    """r12 review finding: the Connect-safety net must catch ONLY the
    no-such-surface errors. A transient py4j failure during the JVM
    call has to propagate — swallowing it would silently downgrade
    barrier() to a non-fault-tolerant localCheckpoint on a session
    where reliable checkpoints were enabled via the context."""

    class _NoFlagConf:
        def get(self, key, default=None):
            return default

    class _Py4JHiccup(RuntimeError):
        pass

    class _FlakyJsc:
        def sc(self):
            raise _Py4JHiccup("gateway connection reset")

    class _FlakyContext:
        _jsc = _FlakyJsc()

    class _FlakySession:
        conf = _NoFlagConf()
        sparkContext = _FlakyContext()

    with pytest.raises(_Py4JHiccup):
        reliable_enabled(_FlakySession())
