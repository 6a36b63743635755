"""REAL Y4M video demux (multimodal/video.py) + x130 scene detection.

Same proof pattern as the audio (r9) and image (r10) legs: synthesize
real container bytes, demux them back, assert exact frame recovery
and that PLANTED scene cuts are found at the exact frame.
"""

from __future__ import annotations

import numpy as np
import pytest

from server_spark.multimodal.video import (
    VIDEO_SRC,
    encode_y4m_mono,
    parse_y4m,
    scene_cuts,
)
from server_spark.registry import queries

SF = "/root/testdata/sf0.001"


def _frames(n=4, h=6, w=8, seed=3):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(n)]


def test_y4m_roundtrip_exact():
    frames = _frames()
    parsed = parse_y4m(encode_y4m_mono(frames))
    assert parsed is not None
    w, h, got = parsed
    assert (w, h) == (8, 6) and len(got) == 4
    for a, b in zip(frames, got):
        assert (a == b).all()


def test_y4m_chroma_specs_and_quarantine():
    # a C444 stream: luma recovered, chroma skipped by size
    h, w, n = 4, 6, 3
    frames = _frames(n, h, w, seed=7)
    body = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 C444\n".encode())
    for fr in frames:
        body += b"FRAME\n" + fr.tobytes() + bytes(2 * h * w)  # U+V
    parsed = parse_y4m(bytes(body))
    assert parsed is not None and len(parsed[2]) == n
    assert (parsed[2][1] == frames[1]).all()

    # C420: chroma planes are quarter-size each
    body420 = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode())
    body420 += b"FRAME\n" + frames[0].tobytes() + bytes(2 * (h // 2) * (w // 2))
    assert parse_y4m(bytes(body420))[2][0].shape == (h, w)

    # quarantine: wrong magic, truncated frame, bad chroma spec
    assert parse_y4m(b"not a video") is None
    good = encode_y4m_mono(frames)
    assert parse_y4m(good[: len(good) - 5]) is None
    assert parse_y4m(b"YUV4MPEG2 W4 H4 C422\nFRAME\n" + bytes(16)) is None


def test_scene_cuts_math():
    flat = np.zeros((4, 4), np.uint8)
    bright = np.full((4, 4), 200, np.uint8)
    feats = scene_cuts([flat, flat, bright, bright], threshold=20.0)
    assert [f[3] for f in feats] == [False, False, True, False]
    assert feats[2][2] == pytest.approx(200.0)  # mean |delta| at the cut
    assert feats[1][2] == 0.0


def test_exec_source_roundtrip():
    ns: dict = {}
    exec(VIDEO_SRC, ns)
    frames = _frames(seed=11)
    enc = ns["encode_y4m_mono"](frames)
    assert enc == encode_y4m_mono(frames)
    assert (ns["parse_y4m"](enc)[2][0] == frames[0]).all()


def test_x135_gif_path_matches_y4m_path_exactly(spark):
    """Format independence of the temporal features: the SAME clips
    routed through real LZW-compressed GIF (x135) and uncompressed
    Y4M (x130) must yield IDENTICAL feature rows — any disagreement
    means the GIF decode stack altered pixels."""
    y4m = {
        r["media_id"]: tuple(r)
        for r in queries()["x130_scene_detect"](spark, SF).collect()
    }
    gif = {
        r["media_id"]: tuple(r)
        for r in queries()["x135_gif_motion"](spark, SF).collect()
    }
    assert set(y4m) == set(gif) and len(y4m) == 500
    assert y4m == gif


def test_x131_keyframe_thumbs_match_recompute(spark):
    """Keyframes = frame 0 + planted cut frame; thumbnail bytes must
    equal a driver-side recompute through the same video→image path
    (pixel-exact cross-modality composition)."""
    from server_spark.multimodal.image import encode_bmp, nn_resize

    rows = queries()["x131_keyframe_thumbs"](spark, SF).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id) == 500
    for mid, rs in by_id.items():
        frames = sorted(r["frame_no"] for r in rs)
        if mid % 2 == 0:
            assert frames == [0, 1 + (mid % 6)], mid
        else:
            assert frames == [0], mid

    # pixel-exact: recompute one even doc's cut-frame thumbnail
    mid = 2
    cut = 1 + (mid % 6)
    yy, xx = np.mgrid[0:16, 0:24]
    base = ((xx * 8 + yy * 4 + cut * 2 + mid) % 256).astype(np.uint8)
    luma = (255 - base)[:, :, None]
    expect = encode_bmp(nn_resize(np.repeat(luma, 3, axis=2), 8, 8))
    got = next(
        r for r in by_id[mid] if r["frame_no"] == cut
    )
    assert bytes(got["thumb"]) == expect and got["is_cut"]


def test_x130_finds_planted_cuts_exactly(spark):
    got = {
        r["media_id"]: r
        for r in queries()["x130_scene_detect"](spark, SF).collect()
    }
    assert len(got) == 500
    for mid, r in got.items():
        if mid % 5 == 4:
            assert not r["ok"]  # quarantine leg
            continue
        assert r["ok"] and r["n_frames"] == 8
        if mid % 2 == 0:
            # hard cut planted at frame 1 + (mid % 6)
            assert r["n_cuts"] == 1, mid
            assert r["first_cut"] == 1 + (mid % 6), mid
            assert r["max_energy"] > 20.0
        else:
            assert r["n_cuts"] == 0 and r["first_cut"] == -1
            assert r["max_energy"] <= 20.0
