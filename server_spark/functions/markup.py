"""HTML/markup → clean-text extraction (EXT; the first text
transform of a real pretraining pipeline — trafilatura/jusText shape:
tag strip + script/style drop + line-level link-density boilerplate
removal).

Everything is BUILTINS-ONLY narrow map — ``regexp_replace`` /
``split`` / HOF ``transform``/``filter``/``aggregate`` — so the whole
extraction stays inside whole-stage codegen on the JVM: no Python
workers, no shuffle, scales as a map over the scan at any corpus
size. The same rules are mirrored in a DuckDB SQL twin
(``extract_sql_ctes``) so the registered query (x124) is
oracle-hash-checked end to end, including the exact output STRING.

Extraction rules (the jusText core, reduced to integer arithmetic so
both engines agree bit-for-bit):

1. drop ``<script>…</script>`` and ``<style>…</style>`` blocks;
2. break the page at BLOCK-LEVEL closing tags (``</p>``, ``</div>``,
   ``</h1>``, ``</nav>``, ``</footer>``, …) — each block is one
   candidate line;
3. per line: count ``<a `` anchors (pre-strip), strip remaining tags,
   decode the common entities, collapse whitespace;
4. keep a line iff it has ≥ ``min_words`` words AND its link density
   is below 1/``links_per_word`` (``links * links_per_word < words``
   — integer compare, no float threshold to disagree on): nav bars,
   share buttons and footers are short and link-dense, body prose is
   long and link-free;
5. the document's clean text is the kept lines joined by newlines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from server_spark.parity import r4, r4sql

# Block-level closing tags that terminate a candidate text line.
_BLOCK_CLOSERS = (
    r"</(p|div|h[1-6]|li|ul|ol|nav|footer|header|section|article"
    r"|blockquote|table|tr|td)>"
)

# Entity decode order: named entities first, ``&amp;`` LAST so
# "&amp;lt;" decodes to "&lt;" (one level), never to "<".
_ENTITIES = (
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
)

MIN_WORDS = 5          # jusText "too short" cut
LINKS_PER_WORD = 5     # keep iff links * 5 < words (density < 0.2)


def _decode_entities(c: Column) -> Column:
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def page_lines(html: Column) -> Column:
    """html string → array of candidate lines (tags still present;
    block closers became newlines). Steps 1-2 of the rules.

    NULL html is treated as the empty page (coalesce) — without it
    the whole expression chain goes NULL and Spark's size(NULL) = -1
    poisons the counts, while DuckDB's UNNEST(NULL) silently DROPS
    the document: a cross-engine divergence on exactly the malformed
    rows a real ingest produces."""
    html = F.coalesce(html, F.lit(""))
    no_script = F.regexp_replace(html, r"(?s)<script.*?</script>", " ")
    no_style = F.regexp_replace(no_script, r"(?s)<style.*?</style>", " ")
    return F.split(F.regexp_replace(no_style, _BLOCK_CLOSERS, "\n"), "\n")


def _scored(html: Column) -> Column:
    """array<struct<txt,w,k>>: per candidate line, the normalized
    text, its word count and its anchor count. Step 3."""

    def score(line: Column) -> Column:
        txt = F.trim(
            F.regexp_replace(
                _decode_entities(
                    F.regexp_replace(line, r"<[^>]+>", " ")
                ),
                r"\s+",
                " ",
            )
        )
        words = F.when(txt == "", F.lit(0)).otherwise(
            F.size(F.split(txt, " "))
        )
        links = F.size(F.split(line, "<a ")) - 1
        return F.struct(
            txt.alias("txt"), words.alias("w"), links.alias("k")
        )

    return F.transform(page_lines(html), score)


def extract_clean_text(
    df: DataFrame,
    html_col: str = "html",
    min_words: int = MIN_WORDS,
    links_per_word: int = LINKS_PER_WORD,
) -> DataFrame:
    """Append extraction columns to ``df``: ``clean_text`` (kept lines
    joined by newline), line/word counts and the boilerplate word
    share. Pure narrow map — one pass over the html column."""
    scored = _scored(F.col(html_col))

    def keep(s: Column) -> Column:
        return (s["w"] >= min_words) & (s["k"] * links_per_word < s["w"])

    kept = F.filter(scored, keep)
    total_words = F.aggregate(
        scored, F.lit(0), lambda acc, s: acc + s["w"]
    ).cast("long")
    kept_words = F.aggregate(
        kept, F.lit(0), lambda acc, s: acc + s["w"]
    ).cast("long")
    return df.select(
        "*",
        F.array_join(
            F.transform(kept, lambda s: s["txt"]), "\n"
        ).alias("clean_text"),
        F.size(F.filter(scored, lambda s: s["txt"] != "")).alias(
            "n_lines"
        ),
        F.size(kept).alias("n_kept"),
        total_words.alias("total_words"),
        kept_words.alias("kept_words"),
        r4(
            F.when(
                total_words > 0,
                (total_words - kept_words).cast("double") / total_words,
            ).otherwise(0.0)
        ).alias("boilerplate_word_share"),
    )


def extract_sql_ctes(
    pages: str = "pages",
    min_words: int = MIN_WORDS,
    links_per_word: int = LINKS_PER_WORD,
    carry: str = "",
) -> str:
    """DuckDB twin of extract_clean_text over a relation ``pages``
    with (doc_id, html): CTE chain ending in ``extracted`` with the
    same columns and identical values (single source of truth for the
    rules' constants — regex/entity tables are spliced from the SAME
    module constants the Spark side uses). ``carry`` propagates extra
    grouping columns (e.g. ``source``) through to ``extracted``."""
    cy = f", {carry}" if carry else ""
    ent = "raw_txt"
    for e, ch in _ENTITIES:
        ch_sql = ch.replace("'", "''")
        ent = f"replace({ent}, '{e}', '{ch_sql}')"
    kept_pred = f"w >= {min_words} AND k * {links_per_word} < w"
    share = r4sql(
        f"CASE WHEN SUM(w) > 0 THEN "
        f"CAST(SUM(w) - COALESCE(SUM(w) FILTER (WHERE {kept_pred}), 0) "
        f"AS DOUBLE) / SUM(w) ELSE 0.0 END"
    )
    return rf"""blocks AS (
        SELECT doc_id{cy},
               string_split(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(COALESCE(html, ''),
                               '(?s)<script.*?</script>', ' ', 'g'),
                           '(?s)<style.*?</style>', ' ', 'g'),
                       '{_BLOCK_CLOSERS}', chr(10), 'g'),
                   chr(10)) AS lines
        FROM {pages}
    ),
    lin AS (
        SELECT doc_id{cy},
               generate_subscripts(lines, 1) AS pos,
               UNNEST(lines) AS raw
        FROM blocks
    ),
    sc0 AS (
        SELECT doc_id{cy}, pos,
               TRIM(regexp_replace({ent}, '\s+', ' ', 'g')) AS txt,
               len(string_split(raw, '<a ')) - 1 AS k
        FROM (SELECT doc_id{cy}, pos, raw,
                     regexp_replace(raw, '<[^>]+>', ' ', 'g') AS raw_txt
              FROM lin)
    ),
    sc AS (
        SELECT doc_id{cy}, pos, txt, k,
               CASE WHEN txt = '' THEN 0
                    ELSE len(string_split(txt, ' ')) END AS w
        FROM sc0
    ),
    extracted AS (
        SELECT doc_id{cy},
               COALESCE(string_agg(txt, chr(10) ORDER BY pos)
                            FILTER (WHERE {kept_pred}),
                        '') AS clean_text,
               CAST(COUNT(*) FILTER (WHERE txt <> '') AS INT) AS n_lines,
               CAST(COUNT(*) FILTER (WHERE {kept_pred}) AS INT) AS n_kept,
               CAST(SUM(w) AS BIGINT) AS total_words,
               CAST(COALESCE(SUM(w) FILTER (WHERE {kept_pred}), 0)
                    AS BIGINT) AS kept_words,
               {share} AS boilerplate_word_share
        FROM sc
        GROUP BY doc_id{cy}
    )"""


# Outlink extraction — ONE pattern shared by the degree stats (x126)
# and the policy screen (x132): tightening the href rule in one query
# but not the other would make the screen count a different link
# universe than the graph it claims to build on.
HREF_PATTERN = r'href="([^"]+)"'


def outlinks(html: Column) -> Column:
    """Spark: array of href targets extracted from raw markup."""
    return F.regexp_extract_all(html, F.lit(HREF_PATTERN), 1)


def links_sql(pages: str = "pages") -> str:
    """DuckDB twin: CTE ``links`` = (doc_id, href) exploded over a
    relation ``pages`` with (doc_id, html)."""
    return f"""links AS (
        SELECT doc_id,
               UNNEST(regexp_extract_all(html, '{HREF_PATTERN}', 1))
                   AS href
        FROM {pages}
    )"""


# ---------------------------------------------------------------------------
# Synthetic page: deterministic HTML wrapping of documents.text, built
# from ONE parts table so the Spark column and the SQL twin cannot
# drift. The page plants every boilerplate class the rules target:
# link-dense nav, short h1, share bar, link-dense footer, script/style
# blocks, plus an ``&amp;`` in the body to exercise entity decode.
# ---------------------------------------------------------------------------

_PAGE_PARTS: tuple[tuple[str, str], ...] = (
    ("lit", "<html><head><title>Doc "),
    ("doc_id", ""),
    (
        "lit",
        "</title><style>body{margin:0;font:14px sans-serif}</style>"
        '<script>track("pv", ',
    ),
    ("doc_id", ""),
    (
        "lit",
        ');</script></head><body><nav><a href="/">Home</a> '
        '<a href="/tags">Tags</a> <a href="/login">Log in</a></nav>'
        "<h1>Entry ",
    ),
    ("doc_id", ""),
    ("lit", '</h1><div class="content"><p>Research &amp; analysis: '),
    ("text", ""),
    (
        "lit",
        '</p></div><p class="share"><a href="#t">Tweet</a> '
        '<a href="#f">Share</a> <a href="#l">Post</a> '
        '<a href="/doc/',
    ),
    ("rel_id", ""),
    (
        "lit",
        '">Related</a></p>'
        "<footer>(c) 2024 Example Corp - All rights reserved. "
        '<a href="/privacy">Privacy</a> <a href="/terms">Terms</a> '
        '<a href="/contact">Contact</a></footer></body></html>',
    ),
)


# The share bar carries a per-doc outlink (/doc/<doc_id % REL_MOD>) so
# link-graph queries over the synthetic corpus see non-uniform targets.
REL_MOD = 50


def synthetic_page(doc_id: Column, text: Column) -> Column:
    """Spark column: the synthetic HTML page for one document."""
    parts = []
    for kind, lit in _PAGE_PARTS:
        if kind == "lit":
            parts.append(F.lit(lit))
        elif kind == "doc_id":
            parts.append(doc_id.cast("string"))
        elif kind == "rel_id":
            parts.append((doc_id % REL_MOD).cast("string"))
        else:
            # NULL text → empty body (concat would otherwise NULL the
            # whole page; see page_lines' null note)
            parts.append(F.coalesce(text, F.lit("")))
    return F.concat(*parts)


def synthetic_page_sql(doc_id: str = "doc_id", text: str = "text") -> str:
    """DuckDB twin of synthetic_page (identical byte output)."""
    parts = []
    for kind, lit in _PAGE_PARTS:
        if kind == "lit":
            parts.append("'" + lit.replace("'", "''") + "'")
        elif kind == "doc_id":
            parts.append(f"CAST({doc_id} AS VARCHAR)")
        elif kind == "rel_id":
            parts.append(f"CAST({doc_id} % {REL_MOD} AS VARCHAR)")
        else:
            parts.append(f"COALESCE({text}, '')")
    return " || ".join(parts)
