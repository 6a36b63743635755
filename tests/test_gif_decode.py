"""REAL GIF decode (multimodal/image.py): GIF-variant LZW + container
parse + compositing. Anchored three ways: (1) an EXTERNAL artifact —
the canonical 43-byte transparent tracking pixel (public knowledge,
produced by a real encoder) — so the bit-level LZW rules aren't just
self-consistent with our encoder; (2) encoder↔decoder round-trips
including width growth and the 4096 dictionary reset; (3) hypothesis
round-trips on arbitrary index frames."""

from __future__ import annotations

import base64

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays as np_arrays

from server_spark.multimodal.image import (
    decode_gif,
    decode_image,
    encode_gif,
    lzw_decode,
    lzw_encode,
)

# The ubiquitous 1x1 transparent GIF (a 43-byte public constant).
PIXEL_B64 = "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"


def test_canonical_tracking_pixel_decodes():
    w, h, frames = decode_gif(base64.b64decode(PIXEL_B64))
    assert (w, h) == (1, 1) and len(frames) == 1
    # palette entry 0 is black; the GCE marks it transparent, which
    # renders as the (black-initialized) canvas — still [0, 0, 0]
    assert (frames[0][0, 0] == [0, 0, 0]).all()


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_roundtrip_repetitive_and_random(mcs):
    rng = np.random.RandomState(7)
    cases = [
        bytes([1, 0, 1, 1, 0] * 200),       # KwKwK-heavy
        rng.randint(0, 256, 20000).astype(np.uint8).tobytes(),  # 4096 reset
        bytes(300),                           # constant run
    ]
    for data in cases:
        src = bytes(b % (1 << mcs) for b in data)
        assert lzw_decode(lzw_encode(src, mcs), mcs) == src


def test_animated_gif_roundtrip_and_first_frame_leg():
    rng = np.random.RandomState(1)
    pal = np.array(
        [[i, 255 - i, (i * 37) % 256] for i in range(256)], np.uint8
    )
    frames = [
        rng.randint(0, 256, (9, 14)).astype(np.uint8) for _ in range(4)
    ]
    gif = encode_gif(frames, pal)
    w, h, dec = decode_gif(gif)
    assert (w, h) == (14, 9) and len(dec) == 4
    for fi, df in zip(frames, dec):
        assert (df == pal[fi]).all()
    fmt, first = decode_image(gif)
    assert fmt == "gif" and (first == pal[frames[0]]).all()


def test_interlaced_image():
    """Hand-built interlaced single-frame GIF: rows stored in 4-pass
    order must come back in display order."""
    h, w = 9, 4
    img = np.arange(h * w, dtype=np.uint8).reshape(h, w) % 16
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    stored = img[order]  # pass-ordered rows
    pal = np.array([[i * 16, 0, 0] for i in range(16)], np.uint8)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 3, 0, 0])  # 16-entry GCT
    out += pal.tobytes()
    out += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40])  # interlaced, no LCT
    out += bytes([4])
    data = lzw_encode(stored.tobytes(), 4)
    out += bytes([len(data)]) + data + bytes([0]) + b"\x3b"
    got = decode_gif(bytes(out))
    assert got is not None
    assert (got[2][0] == pal[img]).all()


def test_transparency_composites_over_prior_frame():
    """Frame 2 marks index 0 transparent: those pixels must keep
    frame 1's content, not repaint."""
    pal = np.array([[9, 9, 9], [200, 10, 10], [10, 200, 10]], np.uint8)
    f1 = np.full((4, 4), 1, np.uint8)
    f2 = np.zeros((4, 4), np.uint8)
    f2[0, 0] = 2
    gif = bytearray(encode_gif([f1], pal))
    assert gif[-1] == 0x3B
    gif = gif[:-1]  # drop trailer, append a transparent frame
    gif += bytes([0x21, 0xF9, 4, 0x05, 0, 0, 0, 0])  # transp flag, idx 0
    gif += b"\x2c" + bytes(4) + (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
    gif += bytes([0, 2])
    data = lzw_encode(f2.tobytes(), 2)
    gif += bytes([len(data)]) + data + bytes([0]) + b"\x3b"
    w, h, frames = decode_gif(bytes(gif))
    assert len(frames) == 2
    assert (frames[1][0, 0] == pal[2]).all()       # painted pixel
    assert (frames[1][1, 1] == pal[1]).all()       # transparent → frame 1


def test_quarantine_inputs():
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    good = encode_gif([np.zeros((3, 3), np.uint8)], pal)
    for b in (
        b"GIF89a" + bytes(5),            # truncated LSD
        good[: len(good) - 6],           # truncated image data
        good.replace(b"\x2c", b"\x7f", 1),  # bad block tag
        b"",
        b"not a gif",
    ):
        assert decode_gif(b) is None


@settings(max_examples=20, deadline=None)
@given(
    frames=st.lists(
        np_arrays(
            np.uint8,
            st.shared(st.tuples(st.integers(1, 8), st.integers(1, 8)), key="gwh"),
            elements=st.integers(0, 15),
        ),
        min_size=1,
        max_size=3,
    )
)
def test_gif_roundtrip_property(frames):
    pal = np.array([[i * 16, 255 - i * 16, i] for i in range(16)], np.uint8)
    w, h, dec = decode_gif(encode_gif(frames, pal, min_code_size=4))
    assert len(dec) == len(frames)
    for fi, df in zip(frames, dec):
        assert (df == pal[fi]).all()


def test_gif_disposal_restore_to_previous_quarantines():
    """r11 review finding: disposal=3 (restore-to-previous) needs a
    prior-canvas buffer this decoder doesn't keep; treating it as
    'leave' rendered later frames on a stale canvas. It must
    quarantine (None), and the common disposal=1 path still decodes."""
    import numpy as np

    from server_spark.multimodal.image import decode_gif, encode_gif

    frames = [np.zeros((4, 4), np.uint8), np.ones((4, 4), np.uint8)]
    pal = [(0, 0, 0), (255, 255, 255)]
    good = encode_gif(frames, pal)
    assert decode_gif(good) is not None
    # flip the encoder's GCE disposal bits (byte after 0x21 0xF9 0x04
    # block start) from 1 to 3 on every GCE
    b = bytearray(good)
    i = 0
    patched = 0
    while True:
        j = b.find(b"\x21\xf9\x04", i)
        if j < 0:
            break
        packed = b[j + 3]
        b[j + 3] = (packed & ~0x1C) | (3 << 2)
        patched += 1
        i = j + 4
    assert patched >= 1
    assert decode_gif(bytes(b)) is None


def test_bmp_sniff_rejects_negative_width():
    """r11 review finding: a corrupt BMP header with negative width
    must sniff as unknown (decode_bmp rejects the same payload), not
    emit a negative width into MEDIA_META."""
    from server_spark.multimodal.binary import _sniff_header
    from server_spark.multimodal.image import encode_bmp

    import numpy as np

    good = encode_bmp(np.zeros((2, 2, 3), np.uint8))
    meta = _sniff_header(good)
    assert meta["format"] == "bmp" and meta["width"] == 2
    bad = bytearray(good)
    bad[18:22] = (-100).to_bytes(4, "little", signed=True)
    assert _sniff_header(bytes(bad))["format"] == "unknown"
