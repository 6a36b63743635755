"""Property tests for the r12 recursive-CTE oracle techniques.

The promoted oracles (t38/t43 recurrences, a36 PAVA state machine,
a33 h-index descent, a20 propagation, x65 greedy argmax) are verified
by the parity gate — but only against the one sf0.01 dataset. These
tests pin the TECHNIQUES themselves on randomized inputs: each runs
the same SQL shape in pure DuckDB against an independent Python
reference (and, for coreness, against the textbook peeling definition
too). No Spark session — pure DuckDB + hypothesis, milliseconds per
case.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _con():
    return duckdb.connect()


# ---------------------------------------------------------------------------
# PAVA state machine (a36's oracle shape)
# ---------------------------------------------------------------------------


def _pava_reference(points, inc=False):
    """The operator's stack algorithm (operators/isotonic.py fit),
    re-stated independently."""
    blocks = []
    for y, w in points:
        blocks.append([float(y), float(w), 1])
        while len(blocks) > 1:
            v1, w1, c1 = blocks[-2]
            v2, w2, c2 = blocks[-1]
            if (v2 >= v1) == inc and v1 != v2:
                break
            blocks.pop()
            blocks.pop()
            tw = w1 + w2
            blocks.append([(v1 * w1 + v2 * w2) / tw, tw, c1 + c2])
    fitted = []
    for v, _, c in blocks:
        fitted.extend([v] * c)
    return fitted


from server_spark.oracles import (  # noqa: E402
    hindex_kernel,
    holt_kernel,
    pava_kernel,
)

# The SAME kernels the registered oracles ship (server_spark.oracles)
# — not copies: an edit to a kernel re-runs under these randomized
# references automatically (r12 review finding).
_PAVA_SQL = (
    "WITH RECURSIVE "
    + pava_kernel("pts", "grp", "x", "y", "w").lstrip()
    + """
SELECT s.grp, s.x, sp.v AS fitted
FROM seq s JOIN spans sp ON sp.grp = s.grp AND s.i BETWEEN sp.lo AND sp.hi
ORDER BY s.grp, s.x
"""
)


@settings(max_examples=40, deadline=None)
@given(
    ys=st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=20,
    ),
    ws=st.data(),
)
def test_pava_state_machine_matches_stack_reference(ys, ws):
    weights = [
        ws.draw(st.floats(min_value=0.5, max_value=100.0)) for _ in ys
    ]
    con = _con()
    con.execute("CREATE TABLE pts (grp INT, x INT, y DOUBLE, w DOUBLE)")
    for i, (y, w) in enumerate(zip(ys, weights)):
        con.execute("INSERT INTO pts VALUES (1, ?, ?, ?)", [i, y, w])
    got = [r[2] for r in con.execute(_PAVA_SQL).fetchall()]
    want = _pava_reference(list(zip(ys, weights)), inc=False)
    assert got == want  # bit-exact: identical fp-op order

    # invariants of any correct nonincreasing fit
    assert all(a >= b for a, b in zip(got, got[1:]))
    tot_w = sum(weights)
    assert abs(
        sum(v * w for v, w in zip(got, weights)) / tot_w
        - sum(y * w for y, w in zip(ys, weights)) / tot_w
    ) <= 1e-6 * max(1.0, max(abs(y) for y in ys))


# ---------------------------------------------------------------------------
# Sequential recurrence (t38's oracle shape: Holt level/trend)
# ---------------------------------------------------------------------------


_HOLT_SQL = (
    "WITH RECURSIVE seq AS (SELECT 1 AS grp, i, x FROM xs),"
    + holt_kernel("seq", "grp")
    + """
SELECT level, trend FROM rec
WHERE i = (SELECT MAX(i) FROM seq)
"""
)


@settings(max_examples=40, deadline=None)
@given(
    xs=st.lists(
        st.floats(min_value=0, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=2, max_size=40,
    )
)
def test_holt_recursion_matches_python_loop_bitexact(xs):
    level, trend = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        prev = level
        level = 0.5 * x + (1 - 0.5) * (level + trend)
        trend = 0.3 * (level - prev) + (1 - 0.3) * trend
    con = _con()
    con.execute("CREATE TABLE xs (i BIGINT, x DOUBLE)")
    for i, x in enumerate(xs, 1):
        con.execute("INSERT INTO xs VALUES (?, ?)", [i, x])
    got = con.execute(_HOLT_SQL).fetchall()
    assert len(got) == 1
    assert got[0][0] == level and got[0][1] == trend  # BIT-exact


# ---------------------------------------------------------------------------
# Integer fixpoint recursion (a33's oracle shape: h-index → coreness)
# ---------------------------------------------------------------------------


def _coreness_peeling(edges):
    """Textbook definition: repeatedly peel min-degree nodes; a node's
    coreness is the k at which it is removed."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    core = {}
    nodes = set(adj)
    k = 0
    while nodes:
        k_nodes = {n for n in nodes if len(adj[n] & nodes) <= k}
        if not k_nodes:
            k += 1
            continue
        for n in k_nodes:
            core[n] = k
        nodes -= k_nodes
    return core


_CORE_SQL = (
    "WITH RECURSIVE "
    + hindex_kernel("eset").lstrip()
    + """
SELECT u, c FROM rec WHERE it = 50 ORDER BY u
"""
)


@settings(max_examples=30, deadline=None)
@given(
    raw=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1, max_size=40,
    )
)
def test_hindex_recursion_equals_textbook_peeling(raw):
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    if not edges:
        return
    con = _con()
    con.execute("CREATE TABLE eset (s BIGINT, t BIGINT)")
    for s, t in edges:
        con.execute("INSERT INTO eset VALUES (?, ?)", [s, t])
    got = dict(con.execute(_CORE_SQL).fetchall())
    want = _coreness_peeling(edges)
    assert got == want


# ---------------------------------------------------------------------------
# BPE recursion (r13, x54's oracle kernel): global argmax via
# whole-partition window + greedy merge as run-parity arithmetic.
# ---------------------------------------------------------------------------

from server_spark.oracles import bpe_kernel  # noqa: E402


def _bpe_reference(wf: dict[str, int], n_merges: int):
    """Textbook greedy BPE over a word-frequency table — the exact
    semantics of textstats.bpe.train_bpe_fast (count-desc, (l, r)
    lexicographic tiebreak, greedy left-to-right merge, stop when the
    best pair's count < 2)."""
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in wf.items()}
    merges = []
    for it in range(n_merges):
        pairs: dict[tuple, int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (left, right), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((it + 1, left, right, left + right, n))
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            key = tuple(res)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


@settings(max_examples=30, deadline=None)
@given(
    words=st.lists(
        # tiny alphabet on purpose: forces count ties (the
        # lexicographic tiebreak), self-pairs ('aa' — the run-parity
        # overlap arithmetic), and merged-symbol reuse across rounds
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1, max_size=12,
    ),
    freqs=st.data(),
    n_merges=st.integers(min_value=1, max_value=6),
)
def test_bpe_recursion_matches_greedy_reference(words, freqs, n_merges):
    wf = {
        w: freqs.draw(st.integers(min_value=1, max_value=9))
        for w in set(words)
    }
    values = ", ".join(
        f"('{w}', CAST({f} AS BIGINT))" for w, f in sorted(wf.items())
    )
    sql = (
        f"WITH RECURSIVE wf(word, freq) AS (VALUES {values}),\n"
        + bpe_kernel(n_merges)
    )
    got = duckdb.sql(sql).fetchall()
    assert got == _bpe_reference(wf, n_merges)


def test_bpe_recursion_run_parity_edge_cases():
    """The adversarial shapes the run-parity arithmetic exists for:
    odd/even self-pair runs, a run broken by the end marker, and a
    tie decided lexicographically."""
    cases = [
        ({"aaaa": 3}, 3),          # even run: aa aa
        ({"aaaaa": 3}, 3),         # odd run: aa aa a
        ({"abab": 2, "aa": 2}, 4), # non-chaining matches + tie-break
        ({"a": 5}, 2),             # single symbol + end marker only
    ]
    for wf, n in cases:
        values = ", ".join(
            f"('{w}', CAST({f} AS BIGINT))" for w, f in sorted(wf.items())
        )
        sql = (
            f"WITH RECURSIVE wf(word, freq) AS (VALUES {values}),\n"
            + bpe_kernel(n)
        )
        assert duckdb.sql(sql).fetchall() == _bpe_reference(wf, n), wf
