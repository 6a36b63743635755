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


@pytest.fixture(scope="module")
def nulls_sf_dir(tmp_path_factory):
    """sf0.001 with ~20% NULL payload cells (text, embedding, value) —
    the malformed-row slice every real ingest produces."""
    import duckdb

    d = str(tmp_path_factory.mktemp("sf_nulls"))
    con = duckdb.connect()
    sel = {
        "documents": "doc_id, CASE WHEN doc_id % 5 = 0 THEN NULL ELSE text "
        "END AS text, lang, source, n_chars",
        "embeddings": "vec_id, CASE WHEN vec_id % 5 = 0 THEN NULL ELSE "
        "embedding END AS embedding, label",
        "events": "event_id, ts, user_id, event_type, CASE WHEN "
        "event_id % 5 = 0 THEN NULL ELSE value END AS value, props",
    }
    for t in TABLE_SCHEMAS:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        con.execute(
            f"COPY (SELECT {sel.get(t, '*')} FROM '{src}') "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return d


@pytest.mark.slow
def test_every_query_survives_null_cells(spark, nulls_sf_dir):
    """NULL text/embedding/value cells must not crash any query: text
    paths null-propagate in the JVM, vector paths drop nulls at the
    _emb loader (ingest-hygiene contract), binary paths quarantine
    (format='missing'). Caught real bugs when introduced: 11 Arrow/
    numpy paths died on None payloads before those guards."""
    failures = []
    for name, fn in registry.queries().items():
        try:
            fn(spark, nulls_sf_dir).collect()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:160]}")
    assert not failures, "\n".join(failures)
