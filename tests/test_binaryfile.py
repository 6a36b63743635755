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
    assert all(r["format"] == "unknown" for r in meta)  # not real containers


def _png(w, h):
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00" + b"\x00" * 8
    )


def _jpeg(w, h):
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", h, w
    ) + b"\x01\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _bmp(w, h):
    import struct

    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 8


def test_header_sniff_real_dimensions(spark):
    """Container headers carry the dimensions — parsed with the pure
    stdlib, no codec library (the decode stub only stubs PIXELS)."""
    payloads = [
        (1, _png(640, 480)),
        (2, _jpeg(320, 240)),
        (3, _gif(99, 44)),
        (4, _bmp(12, 34)),
        (5, b"RIFF\x00\x00\x00\x00WAVEfmt "),
        (6, b"\x89PNG\r\n\x1a"),  # truncated magic → unknown
        (7, None),                # missing → quarantined
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    meta = {
        r["media_id"]: r for r in extract_media_meta(df).collect()
    }
    assert (meta[1]["format"], meta[1]["width"], meta[1]["height"]) == (
        "png", 640, 480,
    )
    assert (meta[2]["format"], meta[2]["width"], meta[2]["height"]) == (
        "jpeg", 320, 240,
    )
    assert (meta[3]["format"], meta[3]["width"], meta[3]["height"]) == (
        "gif", 99, 44,
    )
    assert (meta[4]["format"], meta[4]["width"], meta[4]["height"]) == (
        "bmp", 12, 34,
    )
    assert meta[5]["format"] == "wav" and meta[5]["width"] is None
    assert meta[6]["format"] == "unknown"
    assert meta[7]["format"] == "missing" and meta[7]["n_bytes"] is None


def test_sniff_source_roundtrip_matches_direct():
    """The executor closure materializes the sniffer by exec'ing
    `_SNIFF_SRC` (captured from the one module-level implementation) —
    assert the exec round-trip agrees with the direct function on a
    fixture corpus covering every container branch, so any breakage of
    the source-capture machinery fails CI (r6 ADVICE: the old
    hand-duplicated closure copy could silently drift)."""
    from server_spark.multimodal.binary import (
        _SNIFF_SRC,
        _sniff_from_source,
        _sniff_header,
    )

    execd = _sniff_from_source(_SNIFF_SRC)
    corpus = [
        _png(640, 480), _png(1, 1),
        _jpeg(320, 240), b"\xff\xd8\xff\xe0\x00\x04ab",  # JPEG, no SOF
        _gif(99, 44), _bmp(12, 34),
        b"RIFF\x00\x00\x00\x00WAVEfmt ",
        b"\x89PNG\r\n\x1a",  # truncated magic
        b"", b"\x00" * 32,
    ]
    for payload in corpus:
        assert execd(payload) == _sniff_header(payload), payload[:12]


def test_resize_and_frame_sample_plumbing(spark):
    """Resize: fixed-size deterministic thumbnails, nulls dropped.
    Frame sampling: every Nth fixed-size chunk, one-to-many inside
    the Arrow batch."""
    from server_spark.multimodal.binary import resize_media, sample_frames

    df = spark.createDataFrame(
        [(1, bytes(range(256)) * 40), (2, b"xy"), (3, None)],
        "media_id long, payload binary",
    )
    thumbs = {r["media_id"]: r for r in resize_media(df, 8, 8).collect()}
    assert set(thumbs) == {1, 2}
    assert all(len(r["thumb"]) == 64 for r in thumbs.values())
    again = {r["media_id"]: r for r in resize_media(df, 8, 8).collect()}
    assert thumbs[1]["thumb"] == again[1]["thumb"]  # deterministic

    frames = sample_frames(df, frame_size=1024, every_n=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # 10240 bytes → chunks at stride 2048 → 5 frames of 1024 bytes
    assert len(by_id[1]) == 5
    assert all(len(r["frame"]) == 1024 for r in by_id[1])
    assert [r["frame_no"] for r in sorted(by_id[1], key=lambda r: r["frame_no"])] == [0, 1, 2, 3, 4]
    assert len(by_id[2]) == 1 and by_id[2][0]["frame"] == b"xy"
    assert 3 not in by_id
