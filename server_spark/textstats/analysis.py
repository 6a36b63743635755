"""Text analysis for training-data pipelines (EXT): token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure JVM built-ins (split / regexp / md5) — whole-stage codegen,
no Python UDFs — so every function here is a narrow map over the
corpus: at 100 TB these run at scan speed with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language function-word lists for the n-gram/stopword
# heuristic language-ID (real pipelines use fastText; same plumbing).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "los", "de", "que"],
    "fr": ["le", "la", "les", "et", "une"],
    "de": ["der", "die", "das", "und", "nicht"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
TOKEN_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def words(text_col: str = "text") -> Column:
    """Lowercased whitespace word array — THE one word-split rule,
    delegated to dedup.ngram.split_words so the tokenization contract
    cannot drift between the text-stats and dedup families (r11
    review finding)."""
    from server_spark.dedup.ngram import split_words

    return split_words(text_col)


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(words(text_col))


def bpe_token_count(text_col: str = "text") -> Column:
    """BPE-ish token count via the pre-tokenizer regex."""
    return F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), F.lit(0))
    )


def quality_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, token stats, symbol /
    digit / whitespace ratios — the standard pre-filters (C4/Gopher
    style) before model training."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(F.lower(t), r"[^a-z]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_space = F.length(F.regexp_replace(t, r"[^\s]", ""))
    n_tokens = token_count(text_col)
    # try_divide, not `/`: under Spark 4's default ANSI mode a single
    # empty document (0 chars / 0 tokens) would throw DIVIDE_BY_ZERO
    # and abort the whole scan (r11 review finding) — empty docs get
    # NULL ratios and flow on to the filters, which drop them anyway
    return docs.withColumns(
        {
            "n_chars_m": n_chars.cast("long"),
            "n_tokens": n_tokens.cast("long"),
            "avg_token_len": F.try_divide(n_chars - n_space, n_tokens),
            "alpha_ratio": F.try_divide(n_alpha, n_chars),
            "digit_ratio": F.try_divide(n_digit, n_chars),
            "space_ratio": F.try_divide(n_space, n_chars),
        }
    )


def langid_heuristic(text_col: str = "text") -> Column:
    """Stopword-vote language guess: the language with the most
    function-word hits; 'und' (undetermined) when nothing matches.

    Expressed as a CASE over per-language match counts so the exact
    same logic is writable in ANSI SQL for the oracle.
    """
    w = words(text_col)
    counts = {
        lang: F.size(
            F.filter(w, lambda x: x.isin(markers))  # noqa: B023
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    expr = F.when(best <= 0, F.lit("und"))
    # deterministic tie-break: alphabetical language order
    for lang in sorted(counts):
        expr = expr.when(counts[lang] == best, F.lit(lang))
    return expr


def fingerprint(text_col: str = "text") -> Column:
    """Content fingerprint: md5 of the canonical normalized text (the
    cheap stand-in for a rolling hash; same value computable in the
    oracle). Normalization is dedup.exact.normalized_text — the ONE
    canonical-normalization contract; an inline copy here could drift
    from x1's sha2 grouping (r11 review finding)."""
    from server_spark.dedup.exact import normalized_text

    return F.md5(normalized_text(text_col))
