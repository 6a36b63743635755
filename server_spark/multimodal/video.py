"""REAL video demux for multimodal columns — no codec library needed.

YUV4MPEG2 (.y4m) is the uncompressed interchange format of the ffmpeg
toolchain: an ASCII stream header (``YUV4MPEG2 W<w> H<h> F<n>:<d>
... C<spec>``), then per frame an ASCII ``FRAME`` marker + raw plane
bytes. Like PCM WAV (audio, r9) and PNG/BMP (images, r10), it is
fully parseable with stdlib + numpy — so the video leg of the
multimodal story gets a REAL demux + per-frame decode path: bytes in,
frames out, temporal features computed on true luma planes. Only
entropy-coded video (H.264 etc.) remains out of scope (needs a codec
library, same status as JPEG).

Supported subset: C420/C420jpeg/C420paldv (4:2:0), C444, and Cmono
color specs, 8-bit. Luma-plane extraction is exact for all of these
(chroma subsampling only changes the chroma plane sizes to skip).
Malformed/truncated streams return None — the quarantine signal.

Executor-side use ships these functions BY SOURCE (``VIDEO_SRC``) —
the binary.py/image.py/audio.py pattern: one module-level
implementation, workers never import server_spark.
"""

from __future__ import annotations

import numpy as np


def parse_y4m(b: bytes):
    """Y4M bytes → (width, height, list of uint8 luma planes (h, w)),
    or None (quarantine). Chroma planes are validated for size and
    skipped — temporal features (scene cuts, motion energy) are
    luma-plane math in every practical pipeline."""
    import numpy as np

    if b is None or not bytes(b).startswith(b"YUV4MPEG2"):
        return None
    bb = bytes(b)
    nl = bb.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    cspec = "420"
    try:
        for tok in bb[9:nl].split(b" "):
            if not tok:
                continue
            tag, val = tok[:1], tok[1:]
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"C":
                cspec = val.decode("ascii", "replace")
    except ValueError:
        return None  # malformed header token (e.g. 'Wabc') → quarantine
    if not w or not h or w <= 0 or h <= 0 or w * h > (1 << 26):
        return None
    if cspec.startswith("420"):
        chroma = 2 * ((h // 2) * (w // 2))
    elif cspec.startswith("444"):
        chroma = 2 * (h * w)
    elif cspec.startswith("mono"):
        chroma = 0
    else:
        return None  # 422/interlaced variants out of scope
    luma = h * w
    frames = []
    pos = nl + 1
    while pos < len(bb):
        fnl = bb.find(b"\n", pos)
        if fnl < 0 or not bb[pos:fnl].startswith(b"FRAME"):
            return None  # malformed frame marker
        pos = fnl + 1
        if pos + luma + chroma > len(bb):
            return None  # truncated frame payload
        frames.append(
            np.frombuffer(bb[pos:pos + luma], dtype=np.uint8).reshape(h, w)
        )
        pos += luma + chroma
    if not frames:
        return None
    return w, h, frames


def encode_y4m_mono(frames) -> bytes:
    """list of uint8 (h, w) luma planes → Cmono Y4M bytes (the
    fixture/mint generator; deterministic byte layout)."""
    h, w = frames[0].shape
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode("ascii")
    )
    for fr in frames:
        out += b"FRAME\n"
        out += fr.astype("uint8").tobytes()
    return bytes(out)


def scene_cuts(frames, threshold: float = 20.0):
    """Per-frame temporal features over decoded luma planes:
    (mean_luma, diff_energy vs previous frame, is_cut). diff_energy
    is mean |Δluma|; a cut is a jump above ``threshold`` (gradual
    motion stays well below, a hard scene change far above)."""
    import numpy as np

    out = []
    prev = None
    for i, fr in enumerate(frames):
        f = fr.astype(np.float64)
        energy = 0.0 if prev is None else float(np.abs(f - prev).mean())
        out.append(
            (i, float(f.mean()), energy, prev is not None and energy > threshold)
        )
        prev = f
    return out


def synthetic_clip_frames(mid: int, n_frames: int = 8, h: int = 16, w: int = 24):
    """Deterministic per-id test clip: a drifting gradient with a hard
    scene cut planted at frame 1 + (mid % 6) for even ids (odd ids cut
    nowhere). SINGLE SOURCE for the mint rule shared by x130 (scene
    detection) and x131 (keyframe thumbnails) — the packing_ctes
    lesson: two inlined copies of a planted-structure rule drift."""
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    cut_at = 1 + (mid % 6) if mid % 2 == 0 else None
    frames = []
    for i in range(n_frames):
        base = ((xx * 8 + yy * 4 + i * 2 + mid) % 256).astype(np.uint8)
        if cut_at is not None and i >= cut_at:
            base = 255 - base  # hard scene change
        frames.append(base)
    return frames


def clip_features(frames, threshold: float = 20.0) -> dict:
    """Per-clip temporal feature rollup over decoded luma planes:
    frame count, scene-cut count, first cut frame (-1 if none), and
    motion-energy stats. SINGLE SOURCE for the rollup shared by x130
    (Y4M path) and x135 (GIF path) — their bit-identical outputs are
    the cross-format proof, so the math must exist exactly once."""
    import numpy as np

    feats = scene_cuts(frames, threshold=threshold)
    cuts = [i for i, _m, _e, is_cut in feats if is_cut]
    energies = [e for _i, _m, e, _c in feats[1:]]
    return {
        "n_frames": len(frames),
        "n_cuts": len(cuts),
        "first_cut": cuts[0] if cuts else -1,
        "max_energy": float(max(energies)) if energies else 0.0,
        "mean_energy": float(np.mean(energies)) if energies else 0.0,
    }


import inspect as _inspect  # noqa: E402

VIDEO_SRC = "\n".join(
    _inspect.getsource(f)
    for f in (parse_y4m, encode_y4m_mono, scene_cuts,
              synthetic_clip_frames, clip_features)
)
