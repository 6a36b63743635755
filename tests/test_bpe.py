"""Distributed BPE trainer vs an in-test reference implementation
(Sennrich et al. 2016 semantics: greedy left-to-right merge of the
globally most frequent adjacent pair, lexicographic tiebreak)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from server_spark.textstats import bpe


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference single-machine BPE over a word-frequency dict."""
    vocab = {
        tuple(list(w) + [bpe.END_MARK]): f for w, f in word_freqs.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < 2:
            break
        merges.append((l, r, n))
        new_vocab = {}
        for syms, f in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + f
        vocab = new_vocab
    return merges


CORPUS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _corpus_df(spark):
    rows = []
    doc_id = 0
    for w, f in CORPUS.items():
        for _ in range(f):
            rows.append((doc_id, w))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_matches_reference(spark):
    docs = _corpus_df(spark)
    got = bpe.train_bpe(docs, n_merges=10)
    want = _ref_bpe(CORPUS, 10)
    assert got == want
    # sanity on the classic example: 'es' then 'est' merge first
    assert got[0][:2] == ("e", "s") and got[1][:2] == ("es", "t")


def test_bpe_encode_roundtrip(spark):
    docs = _corpus_df(spark)
    merges = bpe.train_bpe(docs, n_merges=10)
    enc = bpe.encode_with_merges(docs, merges)
    rows = {r["doc_id"]: r for r in enc.collect()}
    # every 'newest' doc encodes identically, tokens rebuild the word
    newest = [r for r in rows.values() if "est" in "".join(r["tokens"])]
    assert newest
    for r in rows.values():
        joined = "".join(r["tokens"]).replace(bpe.END_MARK, "")
        assert joined in CORPUS
        assert r["n_tokens"] == len(r["tokens"])


def test_bpe_word_freqs_is_single_agg(spark):
    """The corpus-sized pass is one explode + one hash-agg."""
    docs = _corpus_df(spark)
    plan = bpe.word_freqs(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1


def test_bpe_fast_equals_distributed(spark):
    docs = _corpus_df(spark)
    assert bpe.train_bpe_fast(docs, n_merges=10) == bpe.train_bpe(
        docs, n_merges=10
    )


def test_bpe_nonbmp_codepoints(spark):
    """Regression (r5 advice): the distributed trainer must split
    words into CODE POINTS, not UTF-16 code units. With emoji (non-BMP)
    input, a code-unit split learns merges over surrogate halves and
    diverges from the Python-side paths."""
    corpus = {"😀😀cat": 5, "😀cat": 3, "naïve": 4, "日本語テスト": 2}
    rows = []
    doc_id = 0
    for w, f in corpus.items():
        for _ in range(f):
            rows.append((doc_id, w))
            doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    dist = bpe.train_bpe(docs, n_merges=8)
    fast = bpe.train_bpe_fast(docs, n_merges=8)
    assert dist == fast
    # no merge symbol may contain a lone surrogate half
    for l, r, _ in dist:
        for sym in (l, r):
            assert not any(0xD800 <= ord(c) <= 0xDFFF for c in sym), sym
    # encode round-trips the non-BMP words exactly
    enc = bpe.encode_with_merges(docs, dist)
    for row in enc.collect():
        joined = "".join(row["tokens"]).replace(bpe.END_MARK, "")
        assert joined in corpus


def test_per_merge_job_trainer_is_demoted_to_cross_check():
    """r11 (VERDICT r10 item 6): no operator path may issue O(vocab)
    Spark jobs. train_bpe (one job per merge) refuses vocab-scale
    merge counts, and no registered query references it — the
    production trainer is train_bpe_fast."""
    import inspect

    import pytest as _pytest

    from server_spark import queries as qpkg
    from server_spark.textstats import bpe as bpe_mod

    with _pytest.raises(ValueError, match="train_bpe_fast"):
        bpe_mod.train_bpe(None, n_merges=bpe_mod.MAX_JOB_LOOP_MERGES + 1)

    import pkgutil

    for info in pkgutil.iter_modules(qpkg.__path__):
        mod = __import__(
            f"server_spark.queries.{info.name}", fromlist=["_"]
        )
        src = inspect.getsource(mod)
        assert "train_bpe(" not in src.replace("train_bpe_fast(", ""), (
            f"operator module {info.name} calls the per-merge-job "
            "trainer"
        )


def test_encode_tolerates_null_and_empty_text(spark):
    """r11 review finding: NULL text reached the Arrow batch as None
    and text.split() crashed the task — the same rows word_freqs
    tolerates must encode to zero tokens, not kill the job."""
    from server_spark.textstats.bpe import encode_with_merges, train_bpe_fast

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "low lower lowest")],
        "doc_id long, text string",
    )
    rules = train_bpe_fast(docs, n_merges=4)
    got = {r["doc_id"]: r["n_tokens"]
           for r in encode_with_merges(docs, rules).collect()}
    assert got[1] == 0 and got[2] == 0 and got[3] > 0


def test_quality_metrics_tolerates_empty_docs(spark):
    """r11 review finding: under Spark 4's default ANSI mode an
    empty-string document made every ratio 0/0 and the whole scan
    threw DIVIDE_BY_ZERO; try_divide yields NULL ratios instead."""
    from server_spark.textstats.analysis import quality_metrics

    docs = spark.createDataFrame(
        [(1, ""), (2, "some real text"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_metrics(docs).collect()}
    assert rows[1]["alpha_ratio"] is None
    assert rows[3]["alpha_ratio"] is None
    assert rows[2]["alpha_ratio"] is not None and rows[2]["n_tokens"] == 3
