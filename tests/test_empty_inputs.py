"""Degenerate-input robustness: EVERY registered query must compose
to an empty (or constant-shaped) result over empty tables instead of
crashing — the first thing a fresh deployment or an over-aggressive
partition filter produces is an empty slice. Caught real bugs when
introduced: six ANN paths died on empty-corpus KMeans/PQ training
(numpy axis errors, head()[0] on no rows) before the empty-index
guards in similarity/ivf.py + pq.py."""

from __future__ import annotations

import pytest

from server_spark import registry
from server_spark.schemas import TABLE_SCHEMAS


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    import duckdb

    d = str(tmp_path_factory.mktemp("sf_empty"))
    con = duckdb.connect()
    for t in TABLE_SCHEMAS:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        con.execute(
            f"COPY (SELECT * FROM '{src}' LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return d


@pytest.mark.slow
def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in registry.queries().items():
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:160]}")
    assert not failures, "\n".join(failures)
