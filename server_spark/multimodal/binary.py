"""Multimodal (binary) column handling (EXT; reference analog: S4
item-icon blobs, `app/pkg/resolver/resolver_itemicons.go` [L]).

Images/audio/video are opaque ``BinaryType`` columns plus typed
metadata. The Spark-side plumbing — schema, Arrow batching, partition
sizing, one-to-many frame explosion — is real and tested. Container
HEADER parsing (format sniff + pixel dimensions for PNG/JPEG/GIF/BMP,
RIFF/WAVE detection) is real in pure stdlib, and as of r10 the pixel
DECODE + resample is ALSO real for PNG, BMP, GIF and JPEG
(multimodal/image.py: zlib inflate + scanline-filter reconstruction,
BGR row walk, GIF-variant LZW + frame compositing, nearest-neighbor
thumbnails — no PIL required; multimodal/jpeg.py: native Huffman +
IDCT decode of baseline AND progressive, no libjpeg required),
joining the r9 real audio leg (multimodal/audio.py) and the r10 Y4M
video demux (multimodal/video.py). Only genuinely exotic JPEG
variants (arithmetic coding, 12-bit, CMYK) take the quarantine
fallback
inside the same mapInPandas contract (batch in → batch out, bounded
memory per batch).

Scale notes: binary payloads make rows wide — keep
``spark.sql.files.maxPartitionBytes`` low enough that a task's Arrow
batches fit executor memory, and never collect binary columns to the
driver. `spark.read.format("binaryFile")` is the ingest path for real
media directories.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata emitted per media blob.
MEDIA_META = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _sniff_header(b: bytes) -> dict:
    """Pure-stdlib container sniff: format + dimensions from the
    HEADER bytes (every mainstream image container stores dims in its
    first chunk — parsing them needs no codec). Unknown/truncated
    containers come back as format='unknown' with null dims, the
    quarantine signal. Defined at module level for unit tests; the
    Spark closure carries its own copy by value (worker cwd may not
    import server_spark)."""
    n = len(b)
    if n >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        return {
            "format": "png",
            "width": int.from_bytes(b[16:20], "big"),
            "height": int.from_bytes(b[20:24], "big"),
        }
    if n >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return {
            "format": "gif",
            "width": int.from_bytes(b[6:8], "little"),
            "height": int.from_bytes(b[8:10], "little"),
        }
    if n >= 26 and b[:2] == b"BM":
        # width is unsigned per the format; height's sign only encodes
        # row order (negative = top-down). A non-positive width means
        # a corrupt header — report unknown, matching decode_bmp's
        # rejection, instead of emitting a negative width into
        # MEDIA_META (r11 review finding).
        bw = int.from_bytes(b[18:22], "little", signed=True)
        bh = abs(int.from_bytes(b[22:26], "little", signed=True))
        if bw > 0 and bh > 0:
            return {"format": "bmp", "width": bw, "height": bh}
        return {"format": "unknown", "width": None, "height": None}
    if n >= 4 and b[:2] == b"\xff\xd8":
        # JPEG: walk the marker stream to the first SOF frame header
        sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
               0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
        i = 2
        while i + 9 <= n:
            if b[i] != 0xFF:
                break  # corrupt marker stream
            marker = b[i + 1]
            if marker in sof:
                return {
                    "format": "jpeg",
                    "height": int.from_bytes(b[i + 5:i + 7], "big"),
                    "width": int.from_bytes(b[i + 7:i + 9], "big"),
                }
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length field
            else:
                i += 2 + int.from_bytes(b[i + 2:i + 4], "big")
        return {"format": "jpeg", "width": None, "height": None}
    if n >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return {"format": "wav", "width": None, "height": None}
    return {"format": "unknown", "width": None, "height": None}


# Source text of the sniffer, captured at import time on the driver.
# Executor closures exec THIS string to materialize their copy, so
# there is exactly ONE implementation — the r6 hand-maintained closure
# duplicate (which could silently drift) is gone. The string is plain
# data, so cloudpickle ships it by value and workers never need
# ``server_spark`` importable.
import inspect as _inspect  # noqa: E402

_SNIFF_SRC = _inspect.getsource(_sniff_header)


def _sniff_from_source(src: str):
    """Materialize the sniffer from its source text (the executor-side
    path). Module-level so tests can assert the exec round-trip agrees
    with the direct function on a fixture corpus."""
    ns: dict = {}
    exec(src, ns)
    return ns["_sniff_header"]


def extract_media_meta(
    df: DataFrame, id_col: str = "media_id", bin_col: str = "payload"
) -> DataFrame:
    """Metadata extraction over a binary column via mapInPandas:
    Arrow-batched, bounded-memory, schema-typed output. Format and
    pixel dimensions are REAL (header parse, `_sniff_header`); only
    pixel decode would need a codec library.

    NB: the closure carries the sniffer as SOURCE TEXT (`_SNIFF_SRC`,
    exec'd per task) so cloudpickle ships everything by value — Spark's
    Python workers must not need ``server_spark`` importable (the
    driver contract allows arbitrary launch cwd, so the package may be
    absent from worker sys.path) — while the logic exists exactly once
    at module level (no hand-maintained duplicate to drift).
    """
    sniff_src = _SNIFF_SRC  # local: captured by value in the closure

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        ns: dict = {}
        exec(sniff_src, ns)
        sniff = ns["_sniff_header"]

        for pdf in it:
            # Missing payloads are QUARANTINED, not crashed on: they
            # surface as format='missing' rows with null metadata so a
            # downstream filter can route them — same for corrupt
            # containers ('unknown'), the behavior a real decoder
            # needs for truncated files.
            metas, shas, nbytes = [], [], []
            for b in pdf[bin_col]:
                if b is None:
                    metas.append(
                        {"format": "missing", "width": None, "height": None}
                    )
                    shas.append(None)
                    nbytes.append(None)
                else:
                    bb = bytes(b)
                    metas.append(sniff(bb))
                    shas.append(_hashlib.sha256(bb).hexdigest())
                    nbytes.append(len(bb))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.array(nbytes, dtype="Int64"),
                    "content_sha": shas,
                    "format": [m["format"] for m in metas],
                    "width": pd.array(
                        [m["width"] for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m["height"] for m in metas], dtype="Int32"
                    ),
                }
            )

    return df.mapInPandas(batches, schema=MEDIA_META)


RESIZED = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("thumb_format", T.StringType()),
    ]
)


def resize_media(
    df: DataFrame,
    out_width: int = 64,
    out_height: int = 64,
    id_col: str = "media_id",
    bin_col: str = "payload",
    jpeg_codec=None,
) -> DataFrame:
    """Thumbnail/resize pass over Arrow batches (batch in → batch of
    fixed-size thumbnails out, memory bounded by batch × thumb size).

    The resample is REAL for PNG, BMP, GIF (first frame) and JPEG
    payloads, baseline and progressive alike (multimodal/image +
    multimodal/jpeg: no codec library anywhere; nearest-neighbor
    resample, deterministic 24-bit BMP re-encode →
    ``thumb_format='bmp'``). Payloads no decoder
    handles (arithmetic-coded JPEG, unknown/corrupt containers)
    take the quarantine-preserving fallback: a deterministic byte
    fold to out_width×out_height bytes, ``thumb_format='fold'``, so
    every surviving row still yields a fixed-size deterministic
    thumbnail and a downstream filter can route on thumb_format.

    ``jpeg_codec`` (r13): a per-query drop-in JPEG decoder threaded
    into the executor-side ``decode_image`` call — the CLOSURE path
    for deployments whose codec can't ride the env hook (env changes
    after JVM launch never reach running Python workers). Must be
    self-contained/picklable (e.g. import a ``sc.addPyFile``-shipped
    module inside the function body); same contract as
    ``SPARK_GRAFT_JPEG_CODEC``: bytes → uint8 RGB (h, w, 3) or None,
    replacing the built-in JPEG decoder wholesale."""
    target = out_width * out_height
    from server_spark.multimodal.image import IMAGE_SRC

    img_src = IMAGE_SRC  # captured by value; exec'd executor-side

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ns: dict = {}
        exec(img_src, ns)
        decode_image, nn_resize, encode_bmp = (
            ns["decode_image"],
            ns["nn_resize"],
            ns["encode_bmp"],
        )

        def fold(b: bytes, n: int) -> bytes:
            # deterministic stand-in: cycle + XOR-fold payload to n bytes
            if not b:
                return bytes(n)
            out = bytearray(n)
            for i, byte in enumerate(b):
                out[i % n] ^= byte
            return bytes(out)

        for pdf in it:
            keep = pdf[pdf[bin_col].notna()]
            thumbs, fmts = [], []
            for b in keep[bin_col]:
                decoded = decode_image(bytes(b), jpeg_codec=jpeg_codec)
                if decoded is not None:
                    _fmt, img = decoded
                    thumbs.append(
                        encode_bmp(nn_resize(img, out_width, out_height))
                    )
                    fmts.append("bmp")
                else:
                    thumbs.append(fold(bytes(b), target))
                    fmts.append("fold")
            yield pd.DataFrame(
                {
                    "media_id": keep[id_col].astype("int64"),
                    "thumb": thumbs,
                    "out_width": out_width,
                    "out_height": out_height,
                    "thumb_format": fmts,
                }
            )

    return df.mapInPandas(batches, schema=RESIZED)


FRAMES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_size: int = 1024,
    every_n: int = 10,
    id_col: str = "media_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Frame sampling: one-to-many explosion of a video-ish payload
    into every Nth fixed-size frame — the real Spark shape of a video
    pipeline (row explodes into frames INSIDE the Arrow batch, output
    rows ≈ input_bytes / (frame_size × every_n), memory bounded by
    one payload). The 'container parse' is stubbed as fixed-size
    chunking; a real demuxer replaces the chunker, the explosion
    plumbing stays."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for mid, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                bb = bytes(b)
                for k, off in enumerate(
                    range(0, len(bb), frame_size * every_n)
                ):
                    ids.append(int(mid))
                    nos.append(k)
                    frames.append(bb[off:off + frame_size])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame": frames}
            )

    return df.mapInPandas(batches, schema=FRAMES)


def synthetic_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: document text bytes as payloads
    (stands in for binaryFile ingest so the plumbing is exercised)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
