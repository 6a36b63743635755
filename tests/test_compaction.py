"""maintenance: compaction verify flag + schema-drift audit."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from server_spark.plans.maintenance import (
    compact_partitions,
    schema_drift,
)


@pytest.fixture()
def fragmented_table(spark, tmp_path):
    """A (region)-partitioned table where one partition is written in
    8 tiny fragments and the other in 1."""
    root = str(tmp_path / "tbl")
    big = spark.range(0, 800).selectExpr(
        "id", "id % 7 AS v", "'eu' AS region"
    )
    for i in range(8):
        big.filter((big.id % 8) == i).coalesce(1).write.mode(
            "append"
        ).partitionBy("region").parquet(root)
    spark.range(1000, 1100).selectExpr(
        "id", "id % 7 AS v", "'us' AS region"
    ).coalesce(1).write.mode("append").partitionBy("region").parquet(root)
    return root


def _n_files(d: str) -> int:
    return len([f for f in os.listdir(d) if f.endswith(".parquet")])


def test_verified_compaction_preserves_content(spark, fragmented_table):
    root = fragmented_table
    assert _n_files(os.path.join(root, "region=eu")) == 8
    before = {
        tuple(r)
        for r in spark.read.parquet(root).select(
            "id", "v", "region"
        ).collect()
    }
    n = compact_partitions(spark, root, min_files=4, verify=True)
    assert n == 1  # only the fragmented partition is rewritten
    assert _n_files(os.path.join(root, "region=eu")) == 1
    assert _n_files(os.path.join(root, "region=us")) == 1
    after = {
        tuple(r)
        for r in spark.read.parquet(root).select(
            "id", "v", "region"
        ).collect()
    }
    assert after == before
    # idempotent second pass
    assert compact_partitions(spark, root, min_files=4, verify=True) == 0


def test_schema_drift_reports_added_and_retyped_columns(
    spark, tmp_path
):
    root = str(tmp_path / "drift")
    os.makedirs(root)
    pd.DataFrame({"a": [1, 2], "b": [1.0, 2.0]}).to_parquet(
        os.path.join(root, "f1.parquet")
    )
    # b retyped, c added
    pd.DataFrame(
        {"a": [3], "b": pd.array([3], dtype="int64"), "c": ["x"]}
    ).to_parquet(os.path.join(root, "f2.parquet"))
    drift = {d["column"]: d for d in schema_drift(spark, root)}
    assert set(drift) == {"b", "c"}
    assert drift["c"]["n_files_present"] == 1
    assert drift["c"]["n_files_total"] == 2
    assert len(drift["b"]["types"]) == 2
    assert "a" not in drift  # stable column is silent


def test_schema_drift_clean_table_is_silent(spark, fragmented_table):
    assert schema_drift(spark, fragmented_table) == []
