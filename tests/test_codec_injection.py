"""JPEG codec-swap injection contract (r12, VERDICT r11 item 5).

The remaining multimodal quarantine residue (arithmetic-coded, 12-bit,
CMYK JPEG) is rare enough that the production answer is a codec
library, not more hand-rolled entropy coding. These tests prove the
swap point is REAL: a drop-in ``decode_fn`` with wider format support
slots into ``decode_image`` — explicitly (closure path, reaches
executors) or via the ``SPARK_GRAFT_JPEG_CODEC`` env hook (deployment
path, reaches workers when set at launch) — and every quarantine and
feature contract the built-in decoder honors keeps holding:

  bytes → uint8 RGB (h, w, 3), or None (quarantine);
  unknown garbage still quarantines; a codec CRASH quarantines the
  blob (blanket except), but MemoryError still propagates as a task
  failure; downstream feature ops (resize, BMP re-encode) consume the
  codec's output unchanged; and the Arrow-batched mapInPandas
  plumbing behaves identically with the injected codec.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from server_spark.multimodal.image import (  # noqa: E402
    _injected_jpeg_codec,
    decode_image,
    encode_bmp,
    nn_resize,
    synthetic_image,
)
from server_spark.multimodal.jpeg import encode_jpeg  # noqa: E402


def _arithmetic_fixture() -> bytes:
    """A structurally-valid JPEG whose frame marker is SOF9
    (arithmetic-coded sequential, 0xC9) — exactly what the built-in
    decoder quarantines and a libjpeg-class codec handles."""
    b = bytearray(encode_jpeg(synthetic_image(7)[:16, :16]))
    i = b.find(b"\xff\xc0")
    assert i > 0
    b[i + 1] = 0xC9
    return bytes(b)


def _twelve_bit_fixture() -> bytes:
    """Baseline frame with precision patched to 12 bits."""
    b = bytearray(encode_jpeg(synthetic_image(9)[:16, :16]))
    i = b.find(b"\xff\xc0")
    # SOF payload: len(2) precision(1) h(2) w(2) ncomp(1) ...
    b[i + 4] = 12
    return bytes(b)


def _fake_codec(known: dict):
    """A deterministic stand-in for a real codec library: recognizes
    the fixture payloads by value, honors the contract shape."""
    def codec(bb: bytes):
        for payload, img in known.items():
            if bytes(bb) == payload:
                return img
        return None
    return codec


def test_builtin_quarantines_the_exotic_fixtures():
    for fix in (_arithmetic_fixture(), _twelve_bit_fixture()):
        assert decode_image(fix) is None


def test_injected_codec_decodes_what_builtin_quarantines():
    img = synthetic_image(7)[:16, :16]
    arith = _arithmetic_fixture()
    codec = _fake_codec({arith: img})
    got = decode_image(arith, jpeg_codec=codec)
    assert got is not None
    fmt, px = got
    assert fmt == "jpeg"
    assert px.shape == (16, 16, 3) and px.dtype == np.uint8
    # downstream feature contract: the codec's output flows through
    # resize and deterministic re-encode exactly like built-in output
    small = nn_resize(px, 8, 8)
    assert small.shape == (8, 8, 3)
    assert encode_bmp(small)[:2] == b"BM"


def test_injected_codec_preserves_quarantine_semantics():
    codec_calls = []

    def recording_codec(bb: bytes):
        codec_calls.append(bytes(bb))
        return None  # codec also can't decode it -> quarantine

    garbage = b"\xff\xd8 not really a jpeg at all"
    assert decode_image(garbage, jpeg_codec=recording_codec) is None
    # the codec received EXACTLY the payload bytes (no re-framing)
    assert codec_calls == [garbage]

    # a codec CRASH is a poison-blob quarantine, not a task failure
    def crashing_codec(bb: bytes):
        raise ValueError("codec exploded")

    assert decode_image(garbage, jpeg_codec=crashing_codec) is None

    # ...but resource exhaustion must stay a task failure
    def oom_codec(bb: bytes):
        raise MemoryError

    with pytest.raises(MemoryError):
        decode_image(garbage, jpeg_codec=oom_codec)


def test_injected_codec_does_not_shadow_native_formats():
    """PNG/BMP/GIF payloads never reach the JPEG slot — an injected
    codec must not change their decode path."""
    img = synthetic_image(3)[:8, :8]
    bmp = encode_bmp(img)

    def poisoned_codec(bb: bytes):
        raise AssertionError("JPEG codec consulted for a BMP payload")

    fmt, px = decode_image(bmp, jpeg_codec=poisoned_codec)
    assert fmt == "bmp"
    np.testing.assert_array_equal(px, img)


def test_env_hook_resolves_caches_and_fails_loudly(tmp_path, monkeypatch):
    mod = tmp_path / "fake_jpeg_codec_r12.py"
    mod.write_text(
        "import numpy as np\n"
        "CALLS = []\n"
        "def decode(bb):\n"
        "    CALLS.append(bytes(bb))\n"
        "    if bytes(bb)[:2] == b'\\xff\\xd8' and b'\\xff\\xc9' in bytes(bb):\n"
        "        return np.zeros((4, 4, 3), dtype=np.uint8)\n"
        "    return None\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setattr(_injected_jpeg_codec, "_cache", None, raising=False)

    # unset -> None (built-in path)
    monkeypatch.delenv("SPARK_GRAFT_JPEG_CODEC", raising=False)
    assert _injected_jpeg_codec() is None

    # set -> resolves, and decode_image routes the quarantined fixture
    # through it without an explicit argument
    monkeypatch.setenv(
        "SPARK_GRAFT_JPEG_CODEC", "fake_jpeg_codec_r12:decode"
    )
    fix = _arithmetic_fixture()
    got = decode_image(fix)
    assert got is not None and got[0] == "jpeg"
    assert got[1].shape == (4, 4, 3)

    # cached per spec value: same function object on re-resolution
    f1 = _injected_jpeg_codec()
    f2 = _injected_jpeg_codec()
    assert f1 is f2

    # a CONFIGURED-but-broken spec raises loudly — never a silent
    # fallback that re-quarantines what the deployment configured a
    # codec to handle
    monkeypatch.setenv("SPARK_GRAFT_JPEG_CODEC", "no_such_module:fn")
    monkeypatch.setattr(_injected_jpeg_codec, "_cache", None, raising=False)
    with pytest.raises(ImportError, match="no_such_module"):
        decode_image(fix)


@pytest.mark.slow
def test_injected_codec_end_to_end_at_corpus_scale(spark, tmp_path,
                                                   monkeypatch):
    """VERDICT r12 item 5: the contract tests inject a toy codec into
    single-batch calls; this drives the CLOSURE path through the real
    resize pipeline over the sf0.01 documents corpus at real partition
    counts (one payload per doc, hash-repartitioned to
    defaultParallelism like x60) — proving the injection survives
    Arrow batching, worker reuse, and multi-partition scheduling. It
    then pins the env-hook boundary the docstrings claim: a
    MID-SESSION env change does NOT reach already-running Python
    workers (worker env is fixed at JVM launch), so the same query
    re-run with a poisoned SPARK_GRAFT_JPEG_CODEC still succeeds on
    the built-in path."""
    from pyspark.sql import functions as F

    from server_spark.multimodal.binary import resize_media
    from server_spark.multimodal.image import IMAGE_SRC

    # a real module shipped to executors (import caches the exec'd
    # decoder once per worker, unlike a per-call exec closure)
    mod = tmp_path / "fake_jpeg_codec_r13.py"
    mod.write_text(
        "SRC = " + repr(IMAGE_SRC) + "\n"
        "ns = {}\n"
        "exec(SRC, ns)\n"
        "def decode(bb):\n"
        "    bb = bytes(bb)\n"
        "    i = bb.find(b'\\xff\\xc9')\n"
        "    if i < 0:\n"
        "        return None  # not arithmetic-coded: quarantine\n"
        "    return ns['decode_jpeg'](bb[:i + 1] + b'\\xc0' + bb[i + 2:])\n"
    )
    spark.sparkContext.addPyFile(str(mod))

    def codec(bb):
        import fake_jpeg_codec_r13

        return fake_jpeg_codec_r13.decode(bb)

    img_src = IMAGE_SRC  # by value — workers may not import server_spark

    def mint(it):
        import pandas as pd

        ns: dict = {}
        exec(img_src, ns)
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                mid = int(did)
                if mid % 3 == 2:  # corrupt leg: stays quarantined
                    payloads.append(b"garbage-%d" % mid)
                else:  # arithmetic-coded on the wire (SOF9)
                    raw = bytearray(
                        ns["encode_jpeg"](
                            ns["synthetic_image"](mid)[:16, :16]
                        )
                    )
                    j = raw.find(b"\xff\xc0")
                    raw[j + 1] = 0xC9
                    payloads.append(bytes(raw))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"),
                 "payload": payloads}
            )

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("doc_id")
    media = docs.repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    ).mapInPandas(mint, "media_id long, payload binary")

    n_docs = docs.count()
    n_exotic = docs.filter(F.col("doc_id") % 3 != 2).count()

    counts = {
        r["thumb_format"]: r["count"]
        for r in resize_media(media, jpeg_codec=codec)
        .groupBy("thumb_format").count().collect()
    }
    # every arithmetic-coded payload decoded through the shipped
    # codec; every garbage payload kept quarantine semantics
    assert counts == {"bmp": n_exotic, "fold": n_docs - n_exotic}

    # without the codec the built-in decoder quarantines everything —
    # same pipeline, same partitions
    base = {
        r["thumb_format"]: r["count"]
        for r in resize_media(media)
        .groupBy("thumb_format").count().collect()
    }
    assert base == {"fold": n_docs}

    # env-hook boundary: poison the hook MID-SESSION; running workers
    # never see it (their env froze at JVM launch), so the query still
    # succeeds on the built-in path instead of dying in resolution
    monkeypatch.setenv("SPARK_GRAFT_JPEG_CODEC", "no_such_module:fn")
    poisoned = {
        r["thumb_format"]: r["count"]
        for r in resize_media(media)
        .groupBy("thumb_format").count().collect()
    }
    assert poisoned == {"fold": n_docs}


def test_mapinpandas_plumbing_with_injected_codec(spark):
    """Executor-side contract: the same Arrow-batched mapInPandas
    shape every media query uses, with the codec injected through the
    closure (the per-query path — env changes after JVM launch don't
    reach running workers). Rows the built-in decoder quarantines
    decode with the codec; garbage rows stay quarantined; schema and
    batching are unchanged."""
    from server_spark.multimodal.image import IMAGE_SRC
    from server_spark.multimodal.jpeg import JPEG_SRC  # noqa: F401

    img_src = IMAGE_SRC  # by value — workers may not import server_spark

    SCHEMA = "media_id long, ok boolean, width int, height int"

    def mint_decode(it):
        import numpy as np
        import pandas as pd

        ns: dict = {}
        exec(img_src, ns)
        encode_jpeg, synthetic_image, decode_image = (
            ns["encode_jpeg"], ns["synthetic_image"], ns["decode_image"],
        )

        def codec(bb):
            bb = bytes(bb)
            # "libjpeg": handles the arithmetic-coded frames the
            # built-in quarantines (recognize SOF9, decode the body
            # by flipping the marker back and reusing the baseline
            # path — a deterministic stand-in for real wider support)
            i = bb.find(b"\xff\xc9")
            if i < 0:
                return None
            fixed = bb[:i + 1] + b"\xc0" + bb[i + 2:]
            got = ns["decode_jpeg"](fixed)
            return got

        def one(mid: int) -> dict:
            if mid % 3 == 2:
                payload = b"garbage-blob-%d" % mid
            else:
                raw = bytearray(
                    encode_jpeg(synthetic_image(mid)[:16, :16])
                )
                j = raw.find(b"\xff\xc0")
                raw[j + 1] = 0xC9  # arithmetic-coded on the wire
                payload = bytes(raw)
            got = decode_image(payload, jpeg_codec=codec)
            if got is None:
                return {"media_id": mid, "ok": False,
                        "width": None, "height": None}
            _fmt, px = got
            return {"media_id": mid, "ok": True,
                    "width": int(px.shape[1]), "height": int(px.shape[0])}

        for pdf in it:
            yield pd.DataFrame(
                [one(int(i)) for i in pdf["id"]],
                columns=["media_id", "ok", "width", "height"],
            )

    rows = (
        spark.range(12).repartition(4)
        .mapInPandas(mint_decode, SCHEMA)
        .collect()
    )
    assert len(rows) == 12
    by_id = {r["media_id"]: r for r in rows}
    for mid, r in by_id.items():
        if mid % 3 == 2:
            assert not r["ok"]  # quarantine preserved under injection
        else:
            assert r["ok"] and (r["width"], r["height"]) == (16, 16)
