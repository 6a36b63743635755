"""JPEG decode — baseline AND progressive — in pure stdlib+numpy,
plus fixture encoders for both.

The r5-r9 rounds treated JPEG as env-blocked ("needs libjpeg"). That
is true of a FAST decoder; a CORRECT one needs no library: JFIF is
marker parsing + canonical Huffman + run-length/zigzag +
dequantization + an 8x8 inverse DCT (one orthonormal matrix multiply)
+ chroma upsampling + YCbCr→RGB — all expressible in numpy. This
module implements the baseline sequential subset (SOF0/SOF1, 8-bit,
Huffman, 1 or 3 components, restart intervals, any integer sampling
factors) and, as of r11, the full Huffman progressive subset (SOF2:
spectral selection, successive approximation, EOB-run coding,
per-scan table redefinition, restart intervals — T.81 Annex G),
closing the largest quarantine residue (progressive is a
double-digit share of real web images). Only genuinely exotic
variants return None — arithmetic coding, lossless/hierarchical,
12-bit, CMYK — the quarantine signal.

Correctness anchors (tests): real-world files produced by real
encoders (grayscale 2x2 and a 16x16 4:2:0 photo icon from the Python
distribution's own test data — shapes and channel statistics), plus
encoder↔decoder round-trips with tolerance bounds (DCT quantization
is lossy; the loop must reproduce smooth images within a few code
values) and exactness on DC-only (constant) blocks.

Python-loop Huffman decode is slow-path by design — decode of a
thumbnail-sized fixture is microseconds-to-milliseconds and runs
inside Arrow-batched executors; a production deployment swaps in a
codec library behind the same quarantine contract.
"""

from __future__ import annotations

import numpy as np


def jpeg_zigzag():
    """The 8x8 zigzag scan as flat natural-order indices (generated,
    not transcribed — diagonal walk with alternating direction)."""
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag = diag[::-1]
        out += [r * 8 + c for r, c in diag]
    return out


def jpeg_dct_matrix():
    """Orthonormal DCT-II basis M (M @ X @ M.T = JPEG forward DCT;
    M.T @ C @ M = inverse): M[u,x] = k(u) cos((2x+1)u*pi/16) with
    k(0)=sqrt(1/8), k(u)=1/2 — algebraically identical to the
    standard's 1/4*C(u)C(v) normalization."""
    import numpy as np

    x = np.arange(8)
    M = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
    M[0] *= np.sqrt(1.0 / 8.0)
    M[1:] *= 0.5
    return M


def jpeg_huffman_table(counts, symbols):
    """BITS/HUFFVAL → {(length, code): symbol} canonical table."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def jpeg_parse_dqt(seg: bytes, qt: dict) -> bool:
    """DQT segment → quant tables (kept in zigzag order) into ``qt``;
    False on malformed. Shared by the baseline and progressive
    decoders so a hardening fix lands in both paths at once."""
    import numpy as np

    p = 0
    while p + 1 <= len(seg):
        pq, tq = seg[p] >> 4, seg[p] & 15
        p += 1
        if pq == 0:
            if p + 64 > len(seg):
                return False
            qt[tq] = np.frombuffer(seg[p:p + 64], np.uint8).astype(
                np.int32
            )
            p += 64
        else:
            if p + 128 > len(seg):
                return False
            qt[tq] = np.frombuffer(seg[p:p + 128], ">u2").astype(
                np.int32
            )
            p += 128
    return True


def jpeg_parse_dht(seg: bytes, huff: dict) -> bool:
    """DHT segment → canonical Huffman tables into ``huff`` keyed
    (class, slot); False on malformed."""
    p = 0
    while p < len(seg):
        tc, th = seg[p] >> 4, seg[p] & 15
        p += 1
        if p + 16 > len(seg):
            return False
        counts = list(seg[p:p + 16])
        p += 16
        nsym = sum(counts)
        if p + nsym > len(seg):
            return False
        huff[(tc, th)] = jpeg_huffman_table(
            counts, list(seg[p:p + nsym])
        )
        p += nsym
    return True


def jpeg_parse_sof(seg: bytes):
    """SOF segment → (w, h, [(cid, hi, vi, tq), ...]) or None.
    Validates the supported subset (8-bit, 1 or 3 components,
    sampling factors >= 1) and the header-declared dims bound
    (anti-DoS): a 13-byte blob must not demand a 100 GB plane."""
    if len(seg) < 6 or seg[0] != 8:
        return None
    h = int.from_bytes(seg[1:3], "big")
    w = int.from_bytes(seg[3:5], "big")
    nc = seg[5]
    if nc not in (1, 3) or len(seg) < 6 + 3 * nc or not w or not h:
        return None
    if w * h > (1 << 26):
        return None
    comps = []
    for k in range(nc):
        cid = seg[6 + 3 * k]
        hv = seg[7 + 3 * k]
        comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * k]))
    if any(ci[1] < 1 or ci[2] < 1 for ci in comps):
        return None
    return (w, h, comps)


def jpeg_destuff(bb: bytes, start: int, max_bytes: int):
    """De-stuff entropy-coded data at ``bb[start:]``, splitting on
    RSTn markers; stops at any other marker (or EOF). Returns
    (segments, end_index), or None once accumulated entropy bytes
    exceed ``max_bytes`` — the abort happens WHILE scanning, before
    an adversarial multi-MB tail is ever copied or bit-read."""
    segs, cur, j, total = [], bytearray(), start, 0
    n = len(bb)
    while j < n:
        byte = bb[j]
        if byte == 0xFF:
            nxt = bb[j + 1] if j + 1 < n else None
            if nxt == 0x00:
                total += 1
                if total > max_bytes:
                    return None
                cur.append(0xFF)
                j += 2
                continue
            if nxt is not None and 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
            break  # EOI or any other marker ends the scan
        total += 1
        if total > max_bytes:
            return None
        cur.append(byte)
        j += 1
    segs.append(bytes(cur))
    return segs, j


def jpeg_entropy_budget(w: int, h: int) -> int:
    """Anti-DoS entropy-size cap: bytes proportional to the declared
    pixel budget. Worst-case legal baseline entropy is ~12 bytes/px
    (64 coefs x ~31 bits per block per component at 4:4:4); 24
    bytes/px is a 2x margin, plus slack for tiny images."""
    return 24 * w * h + (1 << 16)


def jpeg_make_reader(segbytes: bytes):
    """(read_bits, huff_decode) over one entropy segment — index-based
    MSB-first reads, O(bits-read) total; never materializes the
    stream as a bigint (a whole-stream int made every read
    O(stream-size): quadratic on adversarial tails). Shared by both
    decode paths."""
    nbits = len(segbytes) * 8
    state = [0]

    def read_bits(n):
        pos = state[0]
        if n == 0:
            return 0
        if pos + n > nbits:
            return None
        v = 0
        rem = n
        while rem:
            byte = segbytes[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < rem else rem
            v = (v << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            pos += take
            rem -= take
        state[0] = pos
        return v

    def huff_decode(table):
        code = 0
        for ln2 in range(1, 17):
            bit = read_bits(1)
            if bit is None:
                return None
            code = (code << 1) | bit
            if (ln2, code) in table:
                return table[(ln2, code)]
        return None

    return read_bits, huff_decode


def jpeg_extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: s-bit magnitude → signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_color_tail(out_planes):
    """Full-res cropped planes → uint8 RGB: grayscale broadcast or
    the BT.601 YCbCr→RGB used by JFIF. Shared render tail."""
    import numpy as np

    if len(out_planes) == 1:
        g = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, bl], axis=2), 0, 255).astype(
        np.uint8
    )


def decode_jpeg(b: bytes):
    """Baseline JPEG bytes → uint8 RGB array (h, w, 3), or None."""
    import numpy as np

    bb = bytes(b)
    if len(bb) < 4 or bb[:2] != b"\xff\xd8":
        return None
    qt: dict = {}
    huff: dict = {}
    sof = None
    scomp = None
    restart_interval = 0
    scan = None
    i = 2
    while i + 2 <= len(bb):
        if bb[i] != 0xFF:
            return None
        m = bb[i + 1]
        if m == 0xD8 or m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > len(bb):
            return None
        ln = int.from_bytes(bb[i + 2:i + 4], "big")
        seg = bb[i + 4:i + 2 + ln]
        if m == 0xDB:  # DQT
            if not jpeg_parse_dqt(seg, qt):
                return None
        elif m in (0xC0, 0xC1):  # baseline / extended sequential
            sof = jpeg_parse_sof(seg)
            if sof is None:
                return None
        elif m == 0xC2:  # progressive: full multi-scan decode path
            return decode_jpeg_progressive(bb)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # arithmetic / lossless / 12-bit variants
        elif m == 0xC4:  # DHT
            if not jpeg_parse_dht(seg, huff):
                return None
        elif m == 0xDD:
            if len(seg) < 2:
                return None
            restart_interval = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:  # SOS → entropy-coded data follows
            if not seg or sof is None:  # spec: SOF precedes SOS
                return None
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                return None
            scomp = {
                seg[1 + 2 * k]: (seg[2 + 2 * k] >> 4, seg[2 + 2 * k] & 15)
                for k in range(ns)
            }
            # de-stuff with the pixel-proportional entropy budget —
            # a multi-MB adversarial tail glued to small declared
            # dims quarantines during the scan, before any copy
            scan = jpeg_destuff(
                bb, i + 2 + ln, jpeg_entropy_budget(sof[0], sof[1])
            )
            break
        i += 2 + ln
    if sof is None or scan is None or scomp is None:
        return None
    segs, _scan_end = scan

    w, h, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # every component's sampling factor must divide the max (the
    # integer-ratio upsample below assumes it); spec-legal exotic
    # ratios like 3:2 quarantine rather than mis-broadcast
    if any(hmax % c[1] or vmax % c[2] for c in comps):
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    planes = {
        cid: np.zeros((mcuy * vi * 8, mcux * hi * 8), np.float64)
        for cid, hi, vi, _tq in comps
    }
    M = jpeg_dct_matrix()
    zz = np.array(jpeg_zigzag())
    for cid, *_rest in comps:
        if cid not in scomp:
            return None
    ri = restart_interval or n_mcu
    mcu_index = 0
    for segbytes in segs:
        read_bits, huff_decode = jpeg_make_reader(segbytes)
        preds = {cid: 0 for cid, *_ in comps}
        done_in_seg = 0
        while mcu_index < n_mcu and done_in_seg < ri:
            my, mx = divmod(mcu_index, mcux)
            for cid, hi, vi, tq in comps:
                if tq not in qt:
                    return None
                qtab = qt[tq]
                dsel, asel = scomp[cid]
                dctab = huff.get((0, dsel))
                actab = huff.get((1, asel))
                if dctab is None or actab is None:
                    return None
                for by in range(vi):
                    for bx in range(hi):
                        coef = np.zeros(64, np.int64)
                        s = huff_decode(dctab)
                        if s is None or s > 15:
                            return None
                        if s:
                            v = read_bits(s)
                            if v is None:
                                return None
                            diff = jpeg_extend(v, s)
                        else:
                            diff = 0
                        preds[cid] += diff
                        coef[0] = preds[cid]
                        k = 1
                        while k < 64:
                            sym = huff_decode(actab)
                            if sym is None:
                                return None
                            if sym == 0:
                                break  # EOB
                            run, size = sym >> 4, sym & 15
                            if size == 0:
                                if run != 15:
                                    return None
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                return None
                            v = read_bits(size)
                            if v is None:
                                return None
                            coef[k] = jpeg_extend(v, size)
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[zz] = coef * qtab
                        spatial = M.T @ block.reshape(8, 8) @ M
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = spatial
            mcu_index += 1
            done_in_seg += 1
    if mcu_index < n_mcu:
        return None  # truncated scan

    out_planes = []
    for cid, hi, vi, _tq in comps:
        pl = planes[cid] + 128.0
        pl = np.repeat(np.repeat(pl, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(pl[:h, :w])
    return jpeg_color_tail(out_planes)


def decode_jpeg_progressive(b: bytes):
    """Progressive (SOF2) JPEG bytes → uint8 RGB array (h, w, 3), or
    None — closing the largest quarantine residue (VERDICT r10 item
    3: progressive is a double-digit share of real web images).

    Implements ITU T.81 Annex G Huffman progressive decoding:
    multi-scan parsing with per-scan table snapshots (DHT/DRI may be
    redefined between scans), spectral selection (per-band AC scans,
    non-interleaved block grids), successive approximation (DC point
    transform + one-bit refinement; AC first/refinement passes with
    EOB-run coding and correction bits), restart intervals. All
    scans accumulate into per-component coefficient arrays; one
    vectorized dequant+IDCT renders at the end. Same anti-DoS
    contract as baseline: declared-dims bound, entropy-size cap,
    index-based O(1) bit reads."""
    import numpy as np

    bb = bytes(b)
    if len(bb) < 4 or bb[:2] != b"\xff\xd8":
        return None
    qt: dict = {}
    huff: dict = {}
    sof = None
    restart_interval = 0
    scans: list = []
    total_entropy = 0
    i = 2
    while i + 2 <= len(bb):
        if bb[i] != 0xFF:
            return None
        m = bb[i + 1]
        if m == 0xD8 or m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            break
        if i + 4 > len(bb):
            return None
        ln = int.from_bytes(bb[i + 2:i + 4], "big")
        seg = bb[i + 4:i + 2 + ln]
        if m == 0xDB:
            if not jpeg_parse_dqt(seg, qt):
                return None
        elif m == 0xC2:
            sof = jpeg_parse_sof(seg)
            if sof is None:
                return None
        elif m in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # second frame / non-progressive in this path
        elif m == 0xC4:
            if not jpeg_parse_dht(seg, huff):
                return None
        elif m == 0xDD:
            if len(seg) < 2:
                return None
            restart_interval = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:
            if not seg or sof is None:  # spec: SOF precedes SOS
                return None
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                return None
            sc = [
                (seg[1 + 2 * k], seg[2 + 2 * k] >> 4, seg[2 + 2 * k] & 15)
                for k in range(ns)
            ]
            Ss = seg[1 + 2 * ns]
            Se = seg[2 + 2 * ns]
            A = seg[3 + 2 * ns]
            Ah, Al = A >> 4, A & 15
            if Se > 63 or Ss > Se or Al > 13:
                return None
            # de-stuff this scan's entropy data (split on RSTn) under
            # the REMAINING pixel-proportional budget — progressive
            # files carry many scans, and the abort must land while
            # scanning the offending one, not after copying it all
            budget = jpeg_entropy_budget(sof[0], sof[1])
            got = jpeg_destuff(bb, i + 2 + ln, budget - total_entropy)
            if got is None:
                return None
            segs, j = got
            total_entropy += sum(len(s) for s in segs)
            # snapshot the tables this scan binds (tables are LIVE
            # state: a later DHT may redefine a slot)
            tabs = {}
            for cid, dsel, asel in sc:
                tabs[(0, dsel)] = huff.get((0, dsel))
                tabs[(1, asel)] = huff.get((1, asel))
            scans.append(
                (sc, Ss, Se, Ah, Al, restart_interval, tabs, segs)
            )
            i = j
            continue
        i += 2 + ln
    if sof is None or not scans:
        return None
    w, h, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if any(hmax % c[1] or vmax % c[2] for c in comps):
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    # per-component coefficient planes in ZIGZAG order (scans address
    # coefficients by zigzag index k)
    coef = {
        cid: np.zeros((mcuy * vi * mcux * hi, 64), np.int64)
        for cid, hi, vi, _tq in comps
    }

    for sc, Ss, Se, Ah, Al, ri, tabs, segs in scans:
        for cid, _d, _a in sc:
            if cid not in comp_by_id:
                return None
        interleaved = len(sc) > 1
        if interleaved:
            if Ss != 0 or Se != 0:
                return None  # interleaved scans are DC-only
            units = mcux * mcuy
        else:
            cid0 = sc[0][0]
            hi, vi, _tq = comp_by_id[cid0]
            # non-interleaved grid: the component's OWN block extent
            # (ceil of scaled dims), not the MCU-padded grid
            bw1 = -(-(-(-(w * hi) // hmax)) // 8)
            bh1 = -(-(-(-(h * vi) // vmax)) // 8)
            units = bw1 * bh1
        ri_eff = ri or units
        unit = 0
        for segbytes in segs:
            if unit >= units:
                break
            read_bits, huffd = jpeg_make_reader(segbytes)
            preds = {cid: 0 for cid, _d, _a in sc}
            eobrun = 0
            done = 0
            while unit < units and done < ri_eff:
                if interleaved:
                    my, mx = divmod(unit, mcux)
                    for cid, dsel, _a in sc:
                        hi, vi, _tq = comp_by_id[cid]
                        dctab = tabs.get((0, dsel))
                        if Ah == 0 and dctab is None:
                            return None
                        for by in range(vi):
                            for bx in range(hi):
                                row = (my * vi + by) * (mcux * hi) + (
                                    mx * hi + bx
                                )
                                c = coef[cid][row]
                                if Ah == 0:
                                    s = huffd(dctab)
                                    if s is None or s > 15:
                                        return None
                                    if s:
                                        v = read_bits(s)
                                        if v is None:
                                            return None
                                        diff = jpeg_extend(v, s)
                                    else:
                                        diff = 0
                                    preds[cid] += diff
                                    c[0] = preds[cid] << Al
                                else:
                                    bit = read_bits(1)
                                    if bit is None:
                                        return None
                                    if bit:
                                        c[0] |= 1 << Al
                else:
                    cid, dsel, asel = sc[0]
                    hi, vi, _tq = comp_by_id[cid]
                    by, bx = divmod(unit, bw1)
                    c = coef[cid][by * (mcux * hi) + bx]
                    if Ss == 0:  # non-interleaved DC
                        if Ah == 0:
                            dctab = tabs.get((0, dsel))
                            if dctab is None:
                                return None
                            s = huffd(dctab)
                            if s is None or s > 15:
                                return None
                            if s:
                                v = read_bits(s)
                                if v is None:
                                    return None
                                diff = jpeg_extend(v, s)
                            else:
                                diff = 0
                            preds[cid] += diff
                            c[0] = preds[cid] << Al
                        else:
                            bit = read_bits(1)
                            if bit is None:
                                return None
                            if bit:
                                c[0] |= 1 << Al
                    elif Ah == 0:  # AC first pass (EOB-run coded)
                        actab = tabs.get((1, asel))
                        if actab is None:
                            return None
                        if eobrun > 0:
                            eobrun -= 1
                        else:
                            k = Ss
                            while k <= Se:
                                sym = huffd(actab)
                                if sym is None:
                                    return None
                                r, s = sym >> 4, sym & 15
                                if s == 0:
                                    if r == 15:  # ZRL: 16 zeros
                                        k += 16
                                        continue
                                    extra = read_bits(r) if r else 0
                                    if extra is None:
                                        return None
                                    eobrun = (1 << r) - 1 + extra
                                    break
                                k += r
                                if k > Se:
                                    return None
                                v = read_bits(s)
                                if v is None:
                                    return None
                                c[k] = jpeg_extend(v, s) << Al
                                k += 1
                    else:  # AC refinement pass
                        actab = tabs.get((1, asel))
                        if actab is None:
                            return None
                        p1 = 1 << Al
                        mm1 = -(1 << Al)
                        k = Ss
                        if eobrun == 0:
                            while k <= Se:
                                sym = huffd(actab)
                                if sym is None:
                                    return None
                                r, s = sym >> 4, sym & 15
                                if s == 0:
                                    if r < 15:
                                        extra = read_bits(r) if r else 0
                                        if extra is None:
                                            return None
                                        eobrun = (1 << r) + extra
                                        break
                                    val = 0  # ZRL
                                else:
                                    if s != 1:
                                        return None
                                    bit = read_bits(1)
                                    if bit is None:
                                        return None
                                    val = p1 if bit else mm1
                                # advance over r zero-HISTORY coeffs,
                                # reading a correction bit at every
                                # nonzero-history coeff passed over
                                while k <= Se:
                                    if c[k] != 0:
                                        bit = read_bits(1)
                                        if bit is None:
                                            return None
                                        if bit and not (c[k] & p1):
                                            c[k] += (
                                                p1 if c[k] >= 0 else mm1
                                            )
                                        k += 1
                                    else:
                                        if r == 0:
                                            break
                                        r -= 1
                                        k += 1
                                if val != 0:
                                    if k > Se:
                                        return None
                                    c[k] = val
                                k += 1  # past the assigned coef, or
                                # past the ZRL's 16th zero (libjpeg's
                                # outer-loop increment)
                        if eobrun > 0:
                            # EOB-covered block: correction bits only
                            while k <= Se:
                                if c[k] != 0:
                                    bit = read_bits(1)
                                    if bit is None:
                                        return None
                                    if bit and not (c[k] & p1):
                                        c[k] += p1 if c[k] >= 0 else mm1
                                k += 1
                            eobrun -= 1
                unit += 1
                done += 1
        if unit < units:
            return None  # truncated scan

    # render: dequant + vectorized IDCT per component, then the same
    # upsample/crop/colorspace tail as baseline
    M = jpeg_dct_matrix()
    zz = np.array(jpeg_zigzag())
    out_planes = []
    for cid, hi, vi, tq in comps:
        if tq not in qt:
            return None
        bh, bw = mcuy * vi, mcux * hi
        deq = (coef[cid] * qt[tq]).astype(np.float64)  # zigzag order
        nat = np.zeros_like(deq)
        nat[:, zz] = deq
        blocks = nat.reshape(bh, bw, 8, 8)
        spatial = np.einsum("ab,ijbc,cd->ijad", M.T, blocks, M)
        pl = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        pl = np.repeat(
            np.repeat(pl, vmax // vi, axis=0), hmax // hi, axis=1
        )
        out_planes.append(pl[:h, :w])
    return jpeg_color_tail(out_planes)


def encode_jpeg(
    img, quant: int = 8, subsample: bool = False, restart: int = 0
) -> bytes:
    """uint8 RGB (h, w, 3) → baseline JFIF bytes. Fixture encoder:
    flat quantization tables (value ``quant``), simple canonical
    Huffman tables (12 DC symbols at 4 bits, 162 AC symbols at 8
    bits — valid per the spec, exercised generically by the
    decoder's DHT builder), optional 4:2:0 chroma subsampling,
    optional DRI/RSTn restart markers every ``restart`` MCUs."""
    import numpy as np

    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[0], img.shape[1]
    y = (
        0.299 * img[:, :, 0]
        + 0.587 * img[:, :, 1]
        + 0.114 * img[:, :, 2]
    )
    cb = (
        -0.168736 * img[:, :, 0]
        - 0.331264 * img[:, :, 1]
        + 0.5 * img[:, :, 2]
        + 128.0
    )
    cr = (
        0.5 * img[:, :, 0]
        - 0.418688 * img[:, :, 1]
        - 0.081312 * img[:, :, 2]
        + 128.0
    )
    hy, vy = (2, 2) if subsample else (1, 1)
    hmax, vmax = hy, vy
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def pad(plane, ph, pw):
        out = np.zeros((ph, pw), np.float64)
        out[: plane.shape[0], : plane.shape[1]] = plane
        if plane.shape[0] < ph:
            out[plane.shape[0]:, : plane.shape[1]] = plane[-1:]
        if plane.shape[1] < pw:
            out[:, plane.shape[1]:] = out[:, plane.shape[1] - 1:plane.shape[1]]
        return out

    if subsample:
        # box-mean 2x2 downsample (pad odd dims by edge replication)
        cbp = pad(cb, h + h % 2, w + w % 2)
        crp = pad(cr, h + h % 2, w + w % 2)
        cb = (
            cbp[0::2, 0::2] + cbp[1::2, 0::2]
            + cbp[0::2, 1::2] + cbp[1::2, 1::2]
        ) / 4.0
        cr = (
            crp[0::2, 0::2] + crp[1::2, 0::2]
            + crp[0::2, 1::2] + crp[1::2, 1::2]
        ) / 4.0
    plane_specs = [
        (1, hy, vy, 0, pad(y, mcuy * vy * 8, mcux * hy * 8)),
        (2, 1, 1, 1, pad(cb, mcuy * 8, mcux * 8)),
        (3, 1, 1, 1, pad(cr, mcuy * 8, mcux * 8)),
    ]

    M = jpeg_dct_matrix()
    zz = np.array(jpeg_zigzag())
    qtab = np.full(64, int(quant), np.int32)
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = list(range(12))
    ac_counts = [0] * 7 + [162] + [0] * 8
    ac_syms = [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ] + [0x00, 0xF0]
    enc_dc = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(dc_counts[ln - 1]):
            enc_dc[dc_syms[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1
    enc_ac = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(ac_counts[ln - 1]):
            enc_ac[ac_syms[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1

    bits = bytearray()
    acc = 0
    nacc = 0

    def emit(code_val, nb):
        nonlocal acc, nacc
        acc = (acc << nb) | code_val
        nacc += nb
        while nacc >= 8:
            nacc -= 8
            bits.append((acc >> nacc) & 0xFF)

    def emit_value(v):
        if v == 0:
            return 0, 0
        size = int(abs(v)).bit_length()
        val = v if v > 0 else v + (1 << size) - 1
        return size, val

    rst_points = []  # byte offsets (into `bits`) where RSTn go
    preds = {1: 0, 2: 0, 3: 0}
    for mcu_index in range(mcux * mcuy):
        if restart and mcu_index and mcu_index % restart == 0:
            # byte-align (pad 1s), remember the split, reset predictors
            if nacc:
                emit((1 << (8 - nacc)) - 1, 8 - nacc)
            rst_points.append(len(bits))
            preds = {1: 0, 2: 0, 3: 0}
        my, mx = divmod(mcu_index, mcux)
        for cid, hi, vi, _tq, plane in plane_specs:
            for by in range(vi):
                for bx in range(hi):
                    y0 = (my * vi + by) * 8
                    x0 = (mx * hi + bx) * 8
                    block = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
                    coefs = M @ block @ M.T
                    q = np.round(coefs.flatten()[zz] / qtab).astype(int)
                    diff = int(q[0]) - preds[cid]
                    preds[cid] = int(q[0])
                    size, val = emit_value(diff)
                    ln, c = enc_dc[size]
                    emit(c, ln)
                    if size:
                        emit(val, size)
                    run = 0
                    for kk in range(1, 64):
                        v = int(q[kk])
                        if v == 0:
                            run += 1
                            continue
                        while run >= 16:
                            ln, c = enc_ac[0xF0]
                            emit(c, ln)
                            run -= 16
                        size, val = emit_value(v)
                        ln, c = enc_ac[(run << 4) | size]
                        emit(c, ln)
                        emit(val, size)
                        run = 0
                    if run:
                        ln, c = enc_ac[0x00]
                        emit(c, ln)
    if nacc:
        emit((1 << (8 - nacc)) - 1, 8 - nacc)  # pad with 1s
    stuffed = bytearray()
    rst_set = set(rst_points)
    rst_n = 0
    for off, byte in enumerate(bits):
        if off in rst_set:
            stuffed += bytes([0xFF, 0xD0 + (rst_n % 8)])
            rst_n += 1
        stuffed.append(byte)
        if byte == 0xFF:
            stuffed.append(0x00)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    zz_q = bytes(int(v) for v in qtab)
    out += seg(0xDB, bytes([0x00]) + zz_q)
    out += seg(0xDB, bytes([0x01]) + zz_q)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    sof += bytes([1, (hy << 4) | vy, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00] + dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10] + ac_counts) + bytes(ac_syms))
    out += seg(0xC4, bytes([0x01] + dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x11] + ac_counts) + bytes(ac_syms))
    if restart:
        out += seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += stuffed
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(
    img, quant: int = 8, subsample: bool = False, restart: int = 0
) -> bytes:
    """uint8 RGB (h, w, 3) → progressive (SOF2) JFIF bytes.

    Fixture encoder emitting the full T.81 Annex G feature set the
    decoder must handle — the libjpeg-default scan-script SHAPE:
    interleaved DC first pass with point transform (Al=1), per-band
    per-component AC first passes at Al=1 (spectral selection +
    successive approximation, EOB-run coded), per-component AC
    refinement passes (correction bits, buffered-bit flush order),
    and a DC refinement scan. ``restart`` (DRI/RSTn every N units —
    MCUs in interleaved scans, blocks in non-interleaved ones, the
    T.81 rule) exercises the decoder's per-segment predictor/EOB-run
    resets. Quantized coefficients are IDENTICAL
    to encode_jpeg's for the same (img, quant, subsample), so
    decode(baseline) == decode(progressive) EXACTLY — the round-trip
    equality the tests pin."""
    import numpy as np

    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[0], img.shape[1]
    y = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    cb = (
        -0.168736 * img[:, :, 0]
        - 0.331264 * img[:, :, 1]
        + 0.5 * img[:, :, 2]
        + 128.0
    )
    cr = (
        0.5 * img[:, :, 0]
        - 0.418688 * img[:, :, 1]
        - 0.081312 * img[:, :, 2]
        + 128.0
    )
    hy, vy = (2, 2) if subsample else (1, 1)
    hmax, vmax = hy, vy
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def pad(plane, ph, pw):
        out = np.zeros((ph, pw), np.float64)
        out[: plane.shape[0], : plane.shape[1]] = plane
        if plane.shape[0] < ph:
            out[plane.shape[0]:, : plane.shape[1]] = plane[-1:]
        if plane.shape[1] < pw:
            out[:, plane.shape[1]:] = out[
                :, plane.shape[1] - 1:plane.shape[1]
            ]
        return out

    if subsample:
        cbp = pad(cb, h + h % 2, w + w % 2)
        crp = pad(cr, h + h % 2, w + w % 2)
        cb = (
            cbp[0::2, 0::2] + cbp[1::2, 0::2]
            + cbp[0::2, 1::2] + cbp[1::2, 1::2]
        ) / 4.0
        cr = (
            crp[0::2, 0::2] + crp[1::2, 0::2]
            + crp[0::2, 1::2] + crp[1::2, 1::2]
        ) / 4.0
    plane_specs = [
        (1, hy, vy, pad(y, mcuy * vy * 8, mcux * hy * 8)),
        (2, 1, 1, pad(cb, mcuy * 8, mcux * 8)),
        (3, 1, 1, pad(cr, mcuy * 8, mcux * 8)),
    ]

    M = jpeg_dct_matrix()
    zz = np.array(jpeg_zigzag())
    qtab = np.full(64, int(quant), np.int32)
    # quantized coefficient planes, zigzag order (== encode_jpeg's)
    coefs = {}
    grids = {}
    for cid, hi, vi, plane in plane_specs:
        bh, bw = mcuy * vi, mcux * hi
        arr = np.zeros((bh * bw, 64), np.int64)
        for by in range(bh):
            for bx in range(bw):
                block = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                q = np.round((M @ block @ M.T).flatten()[zz] / qtab)
                arr[by * bw + bx] = q.astype(np.int64)
        coefs[cid] = arr
        grids[cid] = (hi, vi, bh, bw)

    # canonical tables (same fixed sets as encode_jpeg)
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = list(range(12))
    ac_counts = [0] * 7 + [162] + [0] * 8
    ac_syms = [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ] + [0x00, 0xF0]

    def build(counts, syms):
        enc = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                enc[syms[k]] = (ln, code)
                k += 1
                code += 1
            code <<= 1
        return enc

    enc_dc = build(dc_counts, dc_syms)
    enc_ac = build(ac_counts, ac_syms)

    def emit_value(v):
        if v == 0:
            return 0, 0
        size = int(abs(v)).bit_length()
        val = v if v > 0 else v + (1 << size) - 1
        return size, val

    def scan_bytes(gen):
        """Collect (code, nbits) pairs from gen — a ``None`` element
        marks a UNIT boundary (MCU / block) — pad each restart
        segment with 1s, byte-stuff 0xFF, and join segments with
        RST0..7 markers (unstuffed, cycling) every ``restart``
        units."""
        segments = []
        bits = bytearray()
        acc = 0
        nacc = 0
        units = 0
        pending_rst = False

        def close_segment():
            nonlocal acc, nacc, bits
            if nacc:
                bits.append(
                    ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1))
                    & 0xFF
                )
                acc = nacc = 0
            stuffed = bytearray()
            for byte in bits:
                stuffed.append(byte)
                if byte == 0xFF:
                    stuffed.append(0x00)
            segments.append(bytes(stuffed))
            bits = bytearray()

        for item in gen:
            if item is None:  # unit boundary
                units += 1
                if restart and units % restart == 0:
                    pending_rst = True
                continue
            if pending_rst:
                close_segment()
                pending_rst = False
            code_val, nb = item
            acc = (acc << nb) | code_val
            nacc += nb
            while nacc >= 8:
                nacc -= 8
                bits.append((acc >> nacc) & 0xFF)
        close_segment()
        out = bytearray(segments[0])
        for i, seg_bytes in enumerate(segments[1:]):
            out += bytes([0xFF, 0xD0 + (i % 8)])
            out += seg_bytes
        return bytes(out)

    def dc_first(al):
        preds = {1: 0, 2: 0, 3: 0}
        for mcu in range(mcux * mcuy):
            if restart and mcu and mcu % restart == 0:
                preds = {1: 0, 2: 0, 3: 0}  # per-segment reset
            my, mx = divmod(mcu, mcux)
            for cid, hi, vi, _pl in plane_specs:
                bw = grids[cid][3]
                for by in range(vi):
                    for bx in range(hi):
                        c = coefs[cid][(my * vi + by) * bw + mx * hi + bx]
                        t = int(c[0]) >> al  # arithmetic point transform
                        diff = t - preds[cid]
                        preds[cid] = t
                        size, val = emit_value(diff)
                        ln2, code = enc_dc[size]
                        yield (code, ln2)
                        if size:
                            yield (val, size)
            yield None  # MCU boundary

    def dc_refine(al):
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for cid, hi, vi, _pl in plane_specs:
                bw = grids[cid][3]
                for by in range(vi):
                    for bx in range(hi):
                        c = coefs[cid][(my * vi + by) * bw + mx * hi + bx]
                        yield ((int(c[0]) >> al) & 1, 1)
            yield None  # MCU boundary

    def comp_units(cid):
        hi, vi, _bh, bw = grids[cid]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        bw1, bh1 = -(-cw // 8), -(-ch // 8)
        for by in range(bh1):
            for bx in range(bw1):
                yield coefs[cid][by * bw + bx]

    def ac_first(cid, ss, se, al):
        for c in comp_units(cid):
            run = 0
            for k in range(ss, se + 1):
                v = int(c[k])
                t = (abs(v) >> al) * (1 if v >= 0 else -1)
                if t == 0:
                    run += 1
                    continue
                while run > 15:
                    ln2, code = enc_ac[0xF0]
                    yield (code, ln2)
                    run -= 16
                size, val = emit_value(t)
                ln2, code = enc_ac[(run << 4) | size]
                yield (code, ln2)
                yield (val, size)
                run = 0
            if run:
                ln2, code = enc_ac[0x00]  # EOB (run length 1)
                yield (code, ln2)
            yield None  # block boundary

    def ac_refine(cid, ss, se, al):
        for c in comp_units(cid):
            vals = [int(c[k]) for k in range(ss, se + 1)]
            # band index of the LAST newly-significant coef: pending
            # ZRLs are only emitted while one remains ahead (beyond
            # it, zeros fold into the EOB — the libjpeg k<=EOB rule)
            eob = -1
            for idx, v in enumerate(vals):
                if (abs(v) >> (al + 1)) == 0 and (abs(v) >> al) == 1:
                    eob = idx
            run = 0
            buffered = []
            for idx, v in enumerate(vals):
                hist = abs(v) >> (al + 1)
                now = abs(v) >> al
                if now == 0:
                    run += 1
                    continue
                # drain pending ZRLs BEFORE buffering this coef's
                # correction bit: each ZRL's flushed bits must cover
                # only positions inside the zeros it spans
                while run > 15 and idx <= eob:
                    ln2, code = enc_ac[0xF0]
                    yield (code, ln2)
                    run -= 16
                    yield from buffered
                    buffered = []
                if hist != 0:
                    buffered.append((now & 1, 1))
                    continue
                # newly significant (now == 1 by construction)
                ln2, code = enc_ac[(run << 4) | 1]
                yield (code, ln2)
                yield (1 if v > 0 else 0, 1)
                yield from buffered
                buffered = []
                run = 0
            if run or buffered:
                ln2, code = enc_ac[0x00]
                yield (code, ln2)
                yield from buffered
            yield None  # block boundary

    def seg(marker, payload):
        return (
            bytes([0xFF, marker])
            + (len(payload) + 2).to_bytes(2, "big")
            + payload
        )

    def sos(comps_sel, ss, se, ah, al):
        p = bytes([len(comps_sel)])
        for cid in comps_sel:
            p += bytes([cid, 0x00 if ss == 0 else 0x11])
        # DC scans use table 0/0; AC scans table class 1 slot 1
        p += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, p)

    out = bytearray(b"\xff\xd8")
    zz_q = bytes(int(v) for v in qtab)
    out += seg(0xDB, bytes([0x00]) + zz_q)
    out += seg(0xDB, bytes([0x01]) + zz_q)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    sof += bytes([1, (hy << 4) | vy, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00] + dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x11] + ac_counts) + bytes(ac_syms))
    if restart:
        out += seg(0xDD, restart.to_bytes(2, "big"))

    # scan script: DC first (all comps, Al=1) → per-comp banded AC
    # first passes (Al=1) → per-comp AC refinements (Ah=1→Al=0) →
    # DC refinement — the libjpeg-default shape
    out += sos([1, 2, 3], 0, 0, 0, 1) + scan_bytes(dc_first(1))
    out += sos([1], 1, 5, 0, 1) + scan_bytes(ac_first(1, 1, 5, 1))
    out += sos([2], 1, 63, 0, 1) + scan_bytes(ac_first(2, 1, 63, 1))
    out += sos([3], 1, 63, 0, 1) + scan_bytes(ac_first(3, 1, 63, 1))
    out += sos([1], 6, 63, 0, 1) + scan_bytes(ac_first(1, 6, 63, 1))
    out += sos([1], 1, 63, 1, 0) + scan_bytes(ac_refine(1, 1, 63, 0))
    out += sos([2], 1, 63, 1, 0) + scan_bytes(ac_refine(2, 1, 63, 0))
    out += sos([3], 1, 63, 1, 0) + scan_bytes(ac_refine(3, 1, 63, 0))
    out += sos([1, 2, 3], 0, 0, 1, 0) + scan_bytes(dc_refine(0))
    out += b"\xff\xd9"
    return bytes(out)


import inspect as _inspect  # noqa: E402

JPEG_SRC = "\n".join(
    _inspect.getsource(f)
    for f in (
        jpeg_zigzag,
        jpeg_dct_matrix,
        jpeg_huffman_table,
        jpeg_parse_dqt,
        jpeg_parse_dht,
        jpeg_parse_sof,
        jpeg_destuff,
        jpeg_entropy_budget,
        jpeg_make_reader,
        jpeg_extend,
        jpeg_color_tail,
        decode_jpeg_progressive,
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
)
