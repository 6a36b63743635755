"""Structural properties of the tokenizer-encode and sliding-chunker
operators (x36/x37) — the invariants a downstream training loader
relies on, beyond the value-level oracle parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from server_spark.queries.ext_pipeline import CHUNK_S, CHUNK_W, x37_sliding_chunks
from server_spark.queries.ext_text import ENCODE_VOCAB, x36_tokenizer_encode


def test_sliding_chunks_reassemble(spark, sf_dir):
    """Stride-aligned chunks (every W/S-th) are non-overlapping and
    concatenate back to the document's word sequence; consecutive
    chunks share exactly W−S words while both are full."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    chunks = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_words"])
        for r in x37_sliding_chunks(spark, sf_dir).join(
            docs.select("doc_id"), "doc_id", "left_semi"
        ).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    step = CHUNK_W // CHUNK_S
    for doc_id, text in texts.items():
        if not text.strip():
            continue  # split('\\s+') of '' is [''], not [] — skip
        words = text.strip().lower().split()
        idxs = sorted(i for d, i in chunks if d == doc_id)
        # reassembly from non-overlapping stride-aligned chunks
        rebuilt = []
        for i in idxs:
            if i % step == 0:
                rebuilt.extend(chunks[(doc_id, i)][0].split())
        assert rebuilt == words, doc_id
        # overlap: chunk i's tail == chunk i+1's head while both full
        for i in idxs[:-1]:
            a, na = chunks[(doc_id, i)]
            b, _ = chunks[(doc_id, i + 1)]
            if na == CHUNK_W:
                assert a.split()[CHUNK_S:] == b.split()[: CHUNK_W - CHUNK_S]


def test_tokenizer_encode_invariants(spark, sf_dir):
    """Sequence length matches the token count, every id is in
    [0, ENCODE_VOCAB], and UNK count equals the zeros in the ids."""
    rows = x36_tokenizer_encode(spark, sf_dir).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r["ids_csv"].split(",")]
        assert len(ids) == r["n_tokens"]
        assert all(0 <= i <= ENCODE_VOCAB for i in ids)
        assert sum(1 for i in ids if i == 0) == r["n_unk"]


def test_tokenizer_encode_roundtrip_in_vocab(spark, sf_dir):
    """Decoding through the same frequency-rank vocabulary reproduces
    the original token wherever the id is in-vocab."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("pos", "token"),
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n_occ"))
    vocab = [
        r["token"]
        for r in counts.orderBy(
            F.col("n_occ").desc(), F.col("token")
        ).limit(ENCODE_VOCAB).collect()
    ]
    id_to_token = {i + 1: t for i, t in enumerate(vocab)}
    encoded = {r["doc_id"]: r["ids_csv"] for r in
               x36_tokenizer_encode(spark, sf_dir).collect()}
    originals = {
        r["doc_id"]: r["text"].strip().lower().split()
        for r in docs.limit(30).collect()
    }
    for doc_id, words in originals.items():
        ids = [int(x) for x in encoded[doc_id].split(",")]
        for word, tok_id in zip(words, ids):
            if tok_id != 0:
                assert id_to_token[tok_id] == word
