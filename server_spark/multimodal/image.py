"""REAL image pixel decode for multimodal columns — no PIL needed.

None of the mainstream image formats require a codec library: PNG is
stdlib-zlib inflate + per-scanline filter reconstruction (None/Sub/
Up/Average/Paeth, RFC 2083 §6), BMP is an uncompressed BGR row walk,
GIF is LZW + palette compositing (in this module), and JPEG —
baseline AND progressive — is Huffman + zigzag/dequant + an 8x8
inverse DCT (multimodal/jpeg.py). Following the audio leg's pattern (multimodal/audio.py —
stdlib+numpy decode with physics-asserted tests), the image leg is
END-TO-END real: bytes in, pixels out, real nearest-neighbor
thumbnails re-encoded as deterministic 24-bit BMPs. The quarantine
path now holds only genuinely exotic inputs (arithmetic-coded JPEG,
12-bit, CMYK, corrupt containers).

Supported PNG subset (everything our encoder mints, and the common
web case): bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), no interlace, any mix of the five scanline
filters, multi-IDAT streams. Alpha is dropped on RGB conversion (no
compositing — a thumbnail pipeline composites against a known
background if it cares). Unsupported inputs return None — the
quarantine signal; one poison blob must not fail a 100 TB scan task.

Executor-side use ships these functions BY SOURCE (`IMAGE_SRC`,
exec'd per task), the binary.py sniffer pattern: one module-level
implementation, cloudpickle ships plain strings, workers never need
``server_spark`` importable.
"""

from __future__ import annotations

import numpy as np


def paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(b: bytes):
    """PNG bytes → uint8 RGB array (h, w, 3), or None (quarantine).

    Real decode: chunk walk, concatenated-IDAT zlib inflate, then
    per-scanline filter RECONSTRUCTION — each filter type inverts the
    encoder's delta against left/up/up-left neighbors, so a single
    wrong branch corrupts every later row (the round-trip tests pin
    all five filter types against the encoder)."""
    import zlib

    import numpy as np

    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos:pos + 4], "big")
        typ = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + payload + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, interlace = ihdr[8], ihdr[9], ihdr[12]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if depth != 8 or interlace != 0 or channels is None or w <= 0 or h <= 0:
        return None
    if w * h > (1 << 26):
        return None  # header-dims bound
    stride = w * channels
    need = h * (stride + 1)
    try:
        # cap the inflate at exactly the pixel budget: a deflate bomb
        # in a small-dims container cannot balloon memory
        raw = zlib.decompressobj().decompress(b"".join(idat), need)
    except Exception:
        return None
    if len(raw) < need:
        return None
    out = np.zeros((h, stride), dtype=np.int32)
    zero = np.zeros(stride, dtype=np.int32)
    bpp = channels
    p = 0
    # Average/Paeth reconstruction is inherently left-sequential →
    # Python loop. Worst-case CPU is LINEAR in declared pixels and
    # both inputs to that product are already capped above: pixels by
    # the 2^26 header bound, bytes by the `need`-capped inflate — so a
    # Paeth-everywhere image at the full pixel bound decodes in tens
    # of seconds, never hours, and a small poison blob cannot demand
    # more work than a legitimate image of the same declared size.
    # (An earlier fixed 16 MiB loop budget quarantined legitimate
    # multi-megapixel photographic PNGs inside the advertised support
    # bound — r11 review finding; the pixel cap is the honest bound.)
    for y in range(h):
        f = raw[p]
        line = np.frombuffer(
            raw[p + 1:p + 1 + stride], dtype=np.uint8
        ).astype(np.int32)
        p += 1 + stride
        prev = out[y - 1] if y > 0 else zero
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up (vectorized — no left dependency)
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub: cur[x] = line[x] + cur[x-bpp], i.e. a
            # per-channel-lane prefix sum mod 256 — exact, vectorized
            cur = (
                np.cumsum(
                    line.reshape(-1, bpp), axis=0, dtype=np.int64
                ) & 0xFF
            ).reshape(stride).astype(np.int32)
        elif f == 3:  # Average (plain-list loop: numpy scalar
            # indexing is ~10x slower per element than list access)
            cl = line.tolist()
            pl = prev.tolist()
            for x in range(stride):
                left = cl[x - bpp] if x >= bpp else 0
                cl[x] = (cl[x] + ((left + pl[x]) >> 1)) & 0xFF
            cur = np.array(cl, np.int32)
        elif f == 4:  # Paeth (plain-list loop, same reason)
            cl = line.tolist()
            pl = prev.tolist()
            for x in range(stride):
                a = cl[x - bpp] if x >= bpp else 0
                c = pl[x - bpp] if x >= bpp else 0
                up = pl[x]
                pp = a + up - c
                pa, pb, pc = abs(pp - a), abs(pp - up), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else c
                )
                cl[x] = (cl[x] + pred) & 0xFF
            cur = np.array(cl, np.int32)
        else:
            return None
        out[y] = cur
    img = out.astype(np.uint8).reshape(h, w, channels)
    if color == 0:  # gray → RGB
        return np.repeat(img, 3, axis=2)
    if color == 2:  # RGB
        return img
    if color == 3:  # palette
        if plte is None or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if idx.max(initial=0) >= len(pal):
            return None
        return pal[idx]
    if color == 4:  # gray+alpha → RGB (alpha dropped)
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]  # RGBA → RGB (alpha dropped)


def decode_bmp(b: bytes):
    """BMP bytes → uint8 RGB array (h, w, 3), or None (quarantine).
    Uncompressed (BI_RGB) 24/32-bit only; rows are 4-byte padded and
    bottom-up unless height is negative (top-down)."""
    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        return None
    data_off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    hraw = int.from_bytes(b[22:26], "little", signed=True)
    bits = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if compression != 0 or bits not in (24, 32) or w <= 0 or hraw == 0:
        return None
    h, topdown = abs(hraw), hraw < 0
    nb = bits // 8
    stride = ((w * nb + 3) // 4) * 4
    if data_off < 0 or len(b) < data_off + stride * h:
        return None
    rows = np.frombuffer(
        b[data_off:data_off + stride * h], dtype=np.uint8
    ).reshape(h, stride)
    px = rows[:, :w * nb].reshape(h, w, nb)
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) → RGB, alpha dropped
    if not topdown:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def _injected_jpeg_codec():
    """Resolve an EXTERNAL JPEG codec from ``SPARK_GRAFT_JPEG_CODEC``
    ("module:function"), or None when unset — THE codec-swap point
    (r12, VERDICT r11 item 5): a deployment with libjpeg-class
    bindings sets the env at launch (spark-submit env reaches Python
    workers) and arithmetic-coded/12-bit/CMYK inputs decode for real
    behind the exact quarantine contract the built-in decoder honors
    (bytes → uint8 RGB (h, w, 3) or None; MemoryError propagates).
    A CONFIGURED-but-broken spec raises loudly — silently falling
    back would silently re-quarantine the formats the deployment
    paid a codec to handle. Resolution is cached per spec value."""
    import importlib
    import os

    spec = os.environ.get("SPARK_GRAFT_JPEG_CODEC")
    if not spec:
        return None
    cache = getattr(_injected_jpeg_codec, "_cache", None)
    if cache is not None and cache[0] == spec:
        return cache[1]
    mod, _, fn = spec.partition(":")
    try:
        f = getattr(importlib.import_module(mod), fn)
    except Exception as exc:
        raise ImportError(
            f"SPARK_GRAFT_JPEG_CODEC={spec!r} failed to load: {exc}"
        ) from exc
    _injected_jpeg_codec._cache = (spec, f)
    return f


def decode_image(b: bytes, jpeg_codec=None):
    """(format, rgb array) for PNG/BMP/GIF/baseline-JPEG payloads
    (GIF: first frame), else None — "jpeg" covers baseline and
    progressive alike. The quarantine path now holds only genuinely
    exotic inputs (arithmetic-coded JPEG, 12-bit, CMYK, truncated/
    corrupt containers) — every mainstream format decodes for real
    with stdlib+numpy.

    ``jpeg_codec`` (or the ``SPARK_GRAFT_JPEG_CODEC`` env hook —
    see _injected_jpeg_codec) REPLACES the built-in JPEG decoder
    wholesale: same signature, same quarantine semantics, wider
    format support. Explicit argument wins over the env hook — the
    executor-side path for a per-query codec is passing it through
    the closure, since env changes after JVM launch do not reach
    already-running Python workers.

    THE quarantine dispatch: every decoder is additionally wrapped in
    a blanket except → None, because the hand-rolled parsers cannot
    prove every raise path absent on adversarial bytes, and the
    contract here is 'one poison blob must not fail a 100 TB scan
    task' — a wrong quarantine is recoverable, a killed task is not."""
    if b is None:
        return None
    bb = bytes(b)
    jpeg_dec = jpeg_codec or _injected_jpeg_codec() or decode_jpeg
    for fmt, dec in (
        ("png", decode_png),
        ("bmp", decode_bmp),
        ("gif", lambda x: (decode_gif(x) or [None, None, [None]])[2][0]),
        ("jpeg", jpeg_dec),
    ):
        try:
            img = dec(bb)
        except MemoryError:
            # NOT a format quarantine: the header bounds passed but
            # decode allocations exhausted executor memory — surface
            # as a task failure so operators see resource exhaustion
            raise
        except Exception:
            img = None
        if img is not None:
            return (fmt, img)
    return None


def nn_resize(img, out_w: int, out_h: int):
    """Deterministic nearest-neighbor resample: source index =
    floor(i * in / out) — pure integer math, no rounding mode or
    float kernel for engines/platforms to disagree on."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[np.ix_(ys, xs)]


def encode_bmp(img) -> bytes:
    """uint8 RGB (h, w, 3) → 24-bit bottom-up BI_RGB BMP bytes.
    Fully deterministic layout (no compressor state), which is why
    thumbnails re-encode as BMP: checksum-pinnable output."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = img[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    body = rows.tobytes()
    header = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")       # pixel data offset
        + (40).to_bytes(4, "little")       # BITMAPINFOHEADER
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")        # planes
        + (24).to_bytes(2, "little")       # bpp
        + (0).to_bytes(4, "little")        # BI_RGB
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 dpi
        + (0).to_bytes(4, "little") * 2
    )
    return header + body


def encode_png(img, row_filters=None) -> bytes:
    """uint8 RGB (h, w, 3) → PNG bytes (color type 2, depth 8).
    ``row_filters``: per-row filter types (default all 0) — the
    fixture generator plants every filter type so the decoder's
    reconstruction branches are each round-trip-tested."""
    import zlib

    import numpy as np

    h, w = img.shape[0], img.shape[1]
    bpp = 3
    flat = img.reshape(h, w * bpp).astype(np.int32)
    if row_filters is None:
        row_filters = [0] * h
    out = bytearray()
    for y in range(h):
        f = row_filters[y]
        raw = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(w * bpp, np.int32)
        if f == 0:
            filt = raw
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), raw[:-bpp]])
            filt = (raw - left) & 0xFF
        elif f == 2:  # Up
            filt = (raw - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int32), raw[:-bpp]])
            filt = (raw - ((left + prev) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int32), raw[:-bpp]])
            upleft = np.concatenate(
                [np.zeros(bpp, np.int32), prev[:-bpp]]
            )
            pred = np.array(
                [
                    paeth(int(a), int(b2), int(c))
                    for a, b2, c in zip(left, prev, upleft)
                ],
                dtype=np.int32,
            )
            filt = (raw - pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        out.append(f)
        out += filt.astype(np.uint8).tobytes()

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, RGB, no interlace
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + chunk(b"IEND", b"")
    )


def synthetic_image(media_id: int) -> "np.ndarray":
    """Deterministic per-id RGB test pattern (gradient + id-keyed
    phase), 24×16 — the image twin of audio.synthetic_wav."""
    import numpy as np

    h, w = 16, 24
    y = np.arange(h, dtype=np.int32)[:, None]
    x = np.arange(w, dtype=np.int32)[None, :]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    bch = ((x * y + media_id * 37) % 256).astype(np.uint8)
    return np.stack(
        [np.broadcast_to(r, (h, w)), np.broadcast_to(g, (h, w)), bch],
        axis=2,
    ).astype(np.uint8)


def lzw_decode(data: bytes, min_code_size: int, max_out: int = None):
    """GIF-variant LZW decode: LSB-first bit packing, CLEAR/END
    control codes, code width grows when the string table fills the
    current code space (cap 12 bits, deferred-clear tolerated).
    Returns the decoded index bytes, or None on a corrupt stream.

    ``max_out`` bounds the decoded size (callers pass the frame's
    pixel count): an LZW bomb in a small frame stops at the budget
    instead of ballooning memory. Codes are read with an index-based
    O(1) extractor — width<=12 plus a 7-bit offset spans at most 3
    bytes — never a whole-stream bigint (which made every read
    O(stream-size), quadratic on adversarial payloads)."""
    clear = 1 << min_code_size
    end = clear + 1
    width0 = min_code_size + 1
    nbits = 8 * len(data)
    literals = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(literals)
    width, pos, prev = width0, 0, None
    out = bytearray()
    while pos + width <= nbits:
        bi = pos >> 3
        chunk = data[bi]
        if bi + 1 < len(data):
            chunk |= data[bi + 1] << 8
        if bi + 2 < len(data):
            chunk |= data[bi + 2] << 16
        code = (chunk >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = list(literals)
            width, prev = width0, None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if max_out is not None and len(out) >= max_out:
            return bytes(out[:max_out])
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encode (real string-table compressor with
    width growth and 4096-reset) — the fixture generator whose output
    the decoder round-trips; width timing mirrors lzw_decode."""
    clear = 1 << min_code_size
    end = clear + 1
    width0 = min_code_size + 1
    out = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal out, nbits
        out |= code << nbits
        nbits += w

    table = {bytes([i]): i for i in range(clear)}
    width, next_code = width0, end + 1
    emit(clear, width)
    buf = b""
    for k in bytes(indices):
        cand = buf + bytes([k])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width, next_code = width0, end + 1
        buf = bytes([k])
    if buf:
        emit(table[buf], width)
    emit(end, width)
    return out.to_bytes((nbits + 7) // 8, "little")


def decode_gif(b: bytes):
    """GIF87a/89a → (w, h, [uint8 RGB frames (h, w, 3)]), or None.

    REAL decode: logical-screen parse, global/local color tables,
    sub-block reassembly, LZW decompression (lzw_decode), Adam-style
    4-pass de-interlace, and frame compositing onto the logical
    screen honoring disposal methods 0/1 (leave) and 2 (restore
    background; 3 = restore-to-previous quarantines, since no
    prior-canvas buffer is kept) plus GCE transparency masks
    (transparent pixels keep
    the underlying canvas — alpha itself is dropped, the PNG/BMP
    convention). Malformed streams return None (quarantine)."""
    import numpy as np

    bb = bytes(b)
    if len(bb) < 13 or bb[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w = int.from_bytes(bb[6:8], "little")
    h = int.from_bytes(bb[8:10], "little")
    packed, bg = bb[10], bb[11]
    if w <= 0 or h <= 0 or w * h > (1 << 26):
        return None  # dims bound BEFORE the canvas allocation
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 7) + 1)
        if pos + 3 * n > len(bb):
            return None
        gct = np.frombuffer(bb[pos:pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    frames = []
    disposal, transp = 0, None
    while pos < len(bb):
        blk = bb[pos]
        pos += 1
        if blk == 0x3B:  # trailer
            break
        if blk == 0x21:  # extension: capture GCE, skip the rest
            if pos >= len(bb):
                return None
            label = bb[pos]
            pos += 1
            first = True
            while pos < len(bb):
                sz = bb[pos]
                pos += 1
                if sz == 0:
                    break
                if label == 0xF9 and first and sz >= 4:
                    gpacked = bb[pos]
                    disposal = (gpacked >> 2) & 7
                    if disposal >= 3:
                        # restore-to-previous (3) needs a saved prior
                        # canvas this decoder doesn't keep; treating
                        # it as "leave" rendered later frames on a
                        # stale canvas — silently wrong pixels (r11
                        # review finding). 4..7 are undefined by the
                        # spec. Both quarantine.
                        return None
                    transp = bb[pos + 3] if gpacked & 1 else None
                first = False
                pos += sz
            continue
        if blk != 0x2C:  # not an image descriptor → corrupt
            return None
        if pos + 9 > len(bb):
            return None
        left = int.from_bytes(bb[pos:pos + 2], "little")
        top = int.from_bytes(bb[pos + 2:pos + 4], "little")
        fw = int.from_bytes(bb[pos + 4:pos + 6], "little")
        fh = int.from_bytes(bb[pos + 6:pos + 8], "little")
        ipacked = bb[pos + 8]
        pos += 9
        lct = gct
        if ipacked & 0x80:
            n = 2 ** ((ipacked & 7) + 1)
            if pos + 3 * n > len(bb):
                return None
            lct = np.frombuffer(
                bb[pos:pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * n
        if lct is None or fw <= 0 or fh <= 0:
            return None
        if left + fw > w or top + fh > h:
            return None
        if pos >= len(bb):
            return None
        mcs = bb[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            return None
        data = bytearray()
        while pos < len(bb):
            sz = bb[pos]
            pos += 1
            if sz == 0:
                break
            data += bb[pos:pos + sz]
            pos += sz
        idx = lzw_decode(bytes(data), mcs, max_out=fw * fh)
        if idx is None or len(idx) < fw * fh:
            return None
        arr = np.frombuffer(idx[:fw * fh], dtype=np.uint8).reshape(fh, fw)
        if ipacked & 0x40:  # de-interlace (4 passes)
            order = (
                list(range(0, fh, 8))
                + list(range(4, fh, 8))
                + list(range(2, fh, 4))
                + list(range(1, fh, 2))
            )
            out_rows = np.empty_like(arr)
            out_rows[order] = arr
            arr = out_rows
        if int(arr.max(initial=0)) >= len(lct):
            return None
        region = canvas[top:top + fh, left:left + fw]
        rgb = lct[arr]
        if transp is not None:
            mask = arr != transp
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            bgcol = (
                gct[bg]
                if gct is not None and bg < len(gct)
                else np.zeros(3, np.uint8)
            )
            canvas[top:top + fh, left:left + fw] = bgcol
        disposal, transp = 0, None
    if not frames:
        return None
    return w, h, frames


def encode_gif(frames_idx, palette, min_code_size: int = 8) -> bytes:
    """Index-array frames + RGB palette → animated GIF89a bytes
    (real LZW compression via lzw_encode, 255-byte sub-blocks,
    disposal=1). Fixture generator for the decode tests and the
    synthetic media mints."""
    import numpy as np

    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    bits = max(1, (len(pal) - 1).bit_length())
    size = 1 << bits
    table = np.zeros((size, 3), np.uint8)
    table[: len(pal)] = pal
    h, w = frames_idx[0].shape
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag+size, bg, aspect
    out += table.tobytes()
    for fr in frames_idx:
        out += bytes([0x21, 0xF9, 4, 0x04, 0, 0, 0, 0])  # GCE disposal=1
        out += b"\x2c" + bytes(4)  # left=top=0
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0])  # no LCT, not interlaced
        out += bytes([min_code_size])
        data = lzw_encode(fr.astype(np.uint8).tobytes(), min_code_size)
        for off in range(0, len(data), 255):
            chunk = data[off:off + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += b"\x3b"
    return bytes(out)


# Source text of everything the executor closures need, captured once
# at import time (binary.py's _SNIFF_SRC pattern): ONE implementation,
# shipped by value, workers never import server_spark.
import inspect as _inspect  # noqa: E402

from server_spark.multimodal.jpeg import (  # noqa: E402
    JPEG_SRC,
    decode_jpeg,
    encode_jpeg,
)

IMAGE_SRC = JPEG_SRC + "\n" + "\n".join(
    _inspect.getsource(f)
    for f in (
        paeth,
        decode_png,
        decode_bmp,
        lzw_decode,
        lzw_encode,
        decode_gif,
        encode_gif,
        _injected_jpeg_codec,
        decode_image,
        nn_resize,
        encode_bmp,
        encode_png,
        synthetic_image,
    )
)


def image_fns_from_source(src: str = None) -> dict:
    """Materialize the decoder set from source text (the executor-side
    path; module-level so tests can assert the exec round-trip)."""
    ns: dict = {}
    exec(src if src is not None else IMAGE_SRC, ns)
    return ns
