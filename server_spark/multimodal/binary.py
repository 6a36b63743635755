"""Multimodal (binary) column handling (EXT; reference analog: S4
item-icon blobs, `app/pkg/resolver/resolver_itemicons.go` [L]).

Images/audio/video are opaque ``BinaryType`` columns plus typed
metadata. The Spark-side plumbing — schema, Arrow batching, partition
sizing — is real and tested; the actual media decode is STUBBED
(``decode_stub``) because no media libraries exist in this container.
Swap ``_decode_one`` for PIL/torchaudio/etc. in production; the
mapInPandas contract (batch in → batch out, bounded memory per batch)
is exactly what a real decoder needs.

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


def extract_media_meta(
    df: DataFrame, id_col: str = "media_id", bin_col: str = "payload"
) -> DataFrame:
    """Decode/feature-extract over a binary column via mapInPandas:
    Arrow-batched, bounded-memory, schema-typed output.

    NB: every helper is DEFINED INSIDE the closure so cloudpickle ships
    the whole thing by value — Spark's Python workers must not need
    ``server_spark`` importable (the driver contract allows arbitrary
    launch cwd, so the package may be absent from worker sys.path).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        def decode_one(payload: bytes) -> dict:
            # STUB decoder: a real implementation parses the container
            # header (PNG/JPEG/WAV/...) and decodes; this deterministic
            # fake derives pseudo-dimensions from the content hash so
            # tests have stable expectations without media libs.
            sha = _hashlib.sha256(payload).hexdigest()
            return {
                "format": "stub",
                "width": int(sha[:4], 16) % 1920,
                "height": int(sha[4:8], 16) % 1080,
            }

        for pdf in it:
            # Missing/corrupt payloads are QUARANTINED, not crashed on:
            # they surface as format='missing' rows with null metadata
            # so a downstream filter can route them — the behavior a
            # real decoder needs for truncated files.
            metas, shas, nbytes = [], [], []
            for b in pdf[bin_col]:
                if b is None:
                    metas.append(
                        {"format": "missing", "width": None, "height": None}
                    )
                    shas.append(None)
                    nbytes.append(None)
                else:
                    metas.append(decode_one(bytes(b)))
                    shas.append(_hashlib.sha256(bytes(b)).hexdigest())
                    nbytes.append(len(b))
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


def synthetic_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: document text bytes as payloads
    (stands in for binaryFile ingest so the plumbing is exercised)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
