"""Shared recursive-CTE oracle kernels (DuckDB dialect).

The r12 oracle promotions re-express sequential algorithms as
recursive CTEs; three of those kernels are ALSO exercised by
randomized property tests (tests/test_oracle_techniques.py) against
independent Python references. Each kernel lives here ONCE and is
token-substituted into both the registered oracle SQL and the tests
(r12 review finding: verbatim copies in the tests would silently
decouple from what ships the first time an oracle is edited).

Substitution is plain token replacement (``{SRC}``-style markers via
str.replace), not str.format — the SQL bodies are full of braces-free
text but future edits must not have to think about escaping.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# PAVA (pool-adjacent-violators, nonincreasing) as a state machine:
# each recursive step performs EITHER one adjacent-violator merge (top
# two stack blocks pool to their weighted mean — fp ops in the Python
# stack algorithm's exact order) OR one push of the next point, so the
# fitted doubles match the applyInPandas operator BIT-FOR-BIT.
#
# Expects a CTE/table named by {SRC} with columns {GRP}, {X} (unique
# per group), {Y} (double), {W} (weight). Produces CTEs seq, rec, fin,
# blocks, spans; the caller SELECTs fitted values by joining
# ``seq s JOIN spans sp ON sp.{GRP} = s.{GRP} AND s.i BETWEEN sp.lo
# AND sp.hi`` (sp.v is the fitted value).
# ---------------------------------------------------------------------------

_PAVA_KERNEL = """
    seq AS (
        SELECT {GRP}, {X}, {Y}, {W},
               ROW_NUMBER() OVER (PARTITION BY {GRP} ORDER BY {X}) AS i,
               COUNT(*)    OVER (PARTITION BY {GRP}) AS np
        FROM {SRC}
    ),
    rec({GRP}, i, stack) AS (
        SELECT DISTINCT {GRP}, CAST(0 AS BIGINT),
               CAST([] AS STRUCT(v DOUBLE, w DOUBLE, c BIGINT)[])
        FROM seq
        UNION ALL
        SELECT r.{GRP},
               CASE WHEN len(r.stack) > 1
                         AND r.stack[len(r.stack)].v
                             >= r.stack[len(r.stack) - 1].v
                    THEN r.i ELSE r.i + 1 END,
               CASE WHEN len(r.stack) > 1
                         AND r.stack[len(r.stack)].v
                             >= r.stack[len(r.stack) - 1].v
                    THEN r.stack[1:len(r.stack) - 2]
                         || [struct_pack(
                                v := (r.stack[len(r.stack) - 1].v
                                        * r.stack[len(r.stack) - 1].w
                                      + r.stack[len(r.stack)].v
                                        * r.stack[len(r.stack)].w)
                                     / (r.stack[len(r.stack) - 1].w
                                        + r.stack[len(r.stack)].w),
                                w := r.stack[len(r.stack) - 1].w
                                     + r.stack[len(r.stack)].w,
                                c := r.stack[len(r.stack) - 1].c
                                     + r.stack[len(r.stack)].c)]
                    ELSE r.stack
                         || [struct_pack(v := s.{Y},
                                         w := CAST(s.{W} AS DOUBLE),
                                         c := CAST(1 AS BIGINT))] END
        FROM rec r
        LEFT JOIN seq s ON s.{GRP} = r.{GRP} AND s.i = r.i + 1
        WHERE (len(r.stack) > 1
               AND r.stack[len(r.stack)].v >= r.stack[len(r.stack) - 1].v)
              OR s.i IS NOT NULL
    ),
    fin AS (
        SELECT r.{GRP}, r.stack
        FROM rec r
        JOIN (SELECT DISTINCT {GRP}, np FROM seq) q
          ON q.{GRP} = r.{GRP} AND r.i = q.np
        WHERE NOT (len(r.stack) > 1
                   AND r.stack[len(r.stack)].v
                       >= r.stack[len(r.stack) - 1].v)
    ),
    blocks AS (
        SELECT {GRP},
               unnest(stack) AS blk,
               unnest(range(1, len(stack) + 1)) AS bi
        FROM fin
    ),
    spans AS (
        SELECT {GRP}, blk.v AS v,
               SUM(blk.c) OVER (PARTITION BY {GRP} ORDER BY bi) AS hi,
               SUM(blk.c) OVER (PARTITION BY {GRP} ORDER BY bi)
                 - blk.c + 1 AS lo
        FROM blocks
    )"""


def pava_kernel(src: str, grp: str, x: str, y: str, w: str) -> str:
    return (
        _PAVA_KERNEL.replace("{SRC}", src).replace("{GRP}", grp)
        .replace("{X}", x).replace("{Y}", y).replace("{W}", w)
    )


# ---------------------------------------------------------------------------
# Coreness via iterated h-index propagation, fixed 50 rounds (the
# iteration is monotone nonincreasing on an integer lattice, so extra
# rounds past convergence are no-ops — fixed-count equals any
# early-exit loop). Expects an undirected deduplicated (s < t) edge
# CTE/table named by {EDGES}; produces CTEs adj and rec; the caller
# SELECTs ``u, c FROM rec WHERE it = 50``.
# ---------------------------------------------------------------------------

_HINDEX_KERNEL = """
    adj AS (
        SELECT s AS u, t AS v FROM {EDGES}
        UNION ALL
        SELECT t AS u, s AS v FROM {EDGES}
    ),
    rec(it, u, c) AS (
        SELECT CAST(0 AS BIGINT), u, COUNT(*) FROM adj GROUP BY u
        UNION ALL
        SELECT z.it + 1, z.u, z.c FROM (
            SELECT nb.it, nb.u, MAX(LEAST(nb.rn, nb.cv)) AS c
            FROM (
                SELECT r.it, a.u, r.c AS cv,
                       ROW_NUMBER() OVER (
                           PARTITION BY r.it, a.u ORDER BY r.c DESC
                       ) AS rn
                FROM adj a JOIN rec r ON r.u = a.v
                WHERE r.it < 50
            ) nb
            GROUP BY nb.it, nb.u
        ) z
    )"""


def hindex_kernel(edges: str) -> str:
    return _HINDEX_KERNEL.replace("{EDGES}", edges)


# ---------------------------------------------------------------------------
# Holt double exponential smoothing (alpha=0.5, beta=0.3; init
# l1=x1, b1=x2-x1; the loop reprocesses from x2): one state row per
# (group, i); every fp expression in the Python loop's exact shape
# (constants unfolded — IEEE 1-0.3 != literal 0.7 in the last ulp),
# so the final (level, trend) doubles are BIT-exact. Expects a
# CTE/table named by {SRC} with columns {GRP}, x (double), i (1-based
# position). Produces the CTE rec({GRP}, i, level, trend); the caller
# SELECTs the row at i = the series length.
# ---------------------------------------------------------------------------

_HOLT_KERNEL = """
    rec({GRP}, i, level, trend) AS (
        SELECT a.{GRP}, CAST(1 AS BIGINT), a.x, b.x - a.x
        FROM {SRC} a JOIN {SRC} b
          ON b.{GRP} = a.{GRP} AND a.i = 1 AND b.i = 2
        UNION ALL
        SELECT r.{GRP}, r.i + 1,
               0.5 * s.x + (1 - 0.5) * (r.level + r.trend),
               0.3 * ((0.5 * s.x + (1 - 0.5) * (r.level + r.trend))
                      - r.level)
                 + (1 - 0.3) * r.trend
        FROM rec r JOIN {SRC} s
          ON s.{GRP} = r.{GRP} AND s.i = r.i + 1
    )"""


def holt_kernel(src: str, grp: str) -> str:
    return _HOLT_KERNEL.replace("{SRC}", src).replace("{GRP}", grp)


# ---------------------------------------------------------------------------
# BPE training (Sennrich 2016) as ONE recursive CTE (r13, x54's
# oracle). Working-table row = one word type's evolving symbol LIST;
# per iteration the single recursive reference is unnested to
# positions, the global argmax pair (count DESC, left, right — the
# trainer's exact tiebreak) reaches every row via a whole-partition
# window (no second recursive reference), and greedy left-to-right
# merging is run-parity arithmetic: a match at i can only chain into
# a match at i+1 when left == right, so runs of matches merge at even
# offsets (aaaa + (a,a) -> aa aa) and non-chaining matches merge
# wherever the previous position did not.
#
# Expects a CTE named ``wf(word, freq)`` (BIGINT freq) defined before
# it inside a WITH RECURSIVE; emits ``rec`` and the final SELECT of
# the merge table (merge_rank, left, right, merged, pair_count) in
# rank order. Stops early when the best pair's count < 2, matching
# train_bpe_fast.
_BPE_KERNEL = """
rec(it, word, freq, syms, l, r, n) AS (
    SELECT 0, word, freq,
           list_append(regexp_split_to_array(word, ''), '</w>'),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT)
    FROM wf
    UNION ALL
    SELECT it + 1, word, freq,
           list(CASE WHEN mstart THEN s || br ELSE s END ORDER BY i),
           bl, br, bn
    FROM (
        SELECT *,
               LAG(mstart) OVER (PARTITION BY it, word ORDER BY i)
                   AS pstart
        FROM (
            SELECT *,
                   (ismatch AND (ROW_NUMBER() OVER
                       (PARTITION BY it, word, runid, ismatch
                        ORDER BY i) - 1) % 2 = 0) AS mstart
            FROM (
                SELECT *,
                       (s = bl AND coalesce(nxt = br, FALSE)) AS ismatch,
                       SUM(CASE WHEN s = bl
                                 AND coalesce(nxt = br, FALSE)
                                THEN 0 ELSE 1 END)
                         OVER (PARTITION BY it, word ORDER BY i) AS runid
                FROM (
                    SELECT *,
                           FIRST_VALUE(pl) OVER wbest AS bl,
                           FIRST_VALUE(pr) OVER wbest AS br,
                           FIRST_VALUE(cnt) OVER wbest AS bn
                    FROM (
                        SELECT it, word, freq, i,
                               syms[i] AS s, syms[i + 1] AS nxt,
                               CASE WHEN i < len(syms)
                                    THEN syms[i] END AS pl,
                               CASE WHEN i < len(syms)
                                    THEN syms[i + 1] END AS pr,
                               CASE WHEN i < len(syms) THEN
                                   SUM(CASE WHEN i < len(syms)
                                            THEN freq END)
                                     OVER (PARTITION BY it, syms[i],
                                           syms[i + 1])
                               END AS cnt
                        FROM rec,
                             LATERAL (SELECT unnest(
                                 range(1, len(syms) + 1)) AS i)
                        WHERE it < {N_MERGES}
                    )
                    WINDOW wbest AS (
                        PARTITION BY it
                        ORDER BY (cnt IS NULL), cnt DESC, pl, pr
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING
                    )
                )
            )
        )
    )
    WHERE NOT coalesce(pstart, FALSE) AND bn >= 2
    GROUP BY it, word, freq, bl, br, bn
)
SELECT CAST(it AS INTEGER) AS merge_rank,
       l AS left, r AS right, l || r AS merged,
       n AS pair_count
FROM (SELECT DISTINCT it, l, r, n FROM rec WHERE it >= 1)
ORDER BY merge_rank"""


def bpe_kernel(n_merges: int) -> str:
    return _BPE_KERNEL.replace("{N_MERGES}", str(int(n_merges)))
