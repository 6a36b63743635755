"""S4 — binaryFile ingest: real media-directory reading feeding the
multimodal metadata extractor (SURVEY.md §2.1 S4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from server_spark.multimodal.binary import extract_media_meta


def test_binaryfile_roundtrip(spark, tmp_path):
    blobs = {"icon_1.bin": b"\x89PNG-ish-payload-1", "icon_2.bin": b"RIFF-ish-2"}
    for name, payload in blobs.items():
        (tmp_path / name).write_bytes(payload)

    raw = (
        spark.read.format("binaryFile")
        .load(str(tmp_path))
        .select(
            F.monotonically_increasing_id().alias("media_id"),
            F.col("path"),
            F.col("content").alias("payload"),
            F.col("length"),
        )
    )
    rows = raw.collect()
    assert {len(r["payload"]) for r in rows} == {len(b) for b in blobs.values()}

    meta = extract_media_meta(raw.select("media_id", "payload")).collect()
    assert len(meta) == 2
    assert {r["n_bytes"] for r in meta} == {len(b) for b in blobs.values()}
    assert all(r["format"] == "stub" for r in meta)
