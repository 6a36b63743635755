"""Independent verification for the round-9 query batch (x113, t50,
a52, x115, x116, x117) — reference implementations and planted-signal
tests beyond the DuckDB oracle parity they all also carry."""

from __future__ import annotations

import math
import os
from collections import Counter, defaultdict

import pandas as pd
import pytest

from server_spark.registry import queries
from tests.conftest import SF_SMOKE


def _docs_pd() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMOKE}/documents.parquet")


# ---------------------------------------------------------------------------
# x113 — Kneser-Ney vs an independent Python reference
# ---------------------------------------------------------------------------


def test_x113_kneser_ney_matches_python(spark):
    D = 0.75
    docs = _docs_pd()
    bigrams_by_doc = {}
    bc: Counter = Counter()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = [t for t in str(text).lower().strip().split() if t]
        bgs = list(zip(toks, toks[1:]))
        if bgs:
            bigrams_by_doc[doc_id] = bgs
            bc.update(bgs)
    c1: Counter = Counter()
    fanout: Counter = Counter()
    fanin: Counter = Counter()
    for (w1, w2), c in bc.items():
        c1[w1] += c
        fanout[w1] += 1
        fanin[w2] += 1
    n_types = len(bc)

    def p_kn(w1, w2):
        return (bc[(w1, w2)] - D) / c1[w1] + D * fanout[w1] / c1[w1] * (
            fanin[w2] / n_types
        )

    got = {
        r["doc_id"]: r
        for r in queries()["x113_kneser_ney_score"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(bigrams_by_doc)
    for doc_id, bgs in bigrams_by_doc.items():
        want = sum(math.log(p_kn(w1, w2)) for w1, w2 in bgs) / len(bgs)
        assert got[doc_id]["n_bigrams"] == len(bgs)
        assert got[doc_id]["avg_kn_logprob"] == pytest.approx(
            want, abs=2e-4
        )
        # probabilities, hence negative average log
        assert got[doc_id]["avg_kn_logprob"] < 0


def test_x113_kn_distributes_probability_mass(spark):
    """For any observed context w1, the KN conditional over OBSERVED
    continuations must not exceed 1 (the discount holds back exactly
    the backoff mass)."""
    docs = _docs_pd()
    D = 0.75
    bc: Counter = Counter()
    for text in docs["text"]:
        toks = [t for t in str(text).lower().strip().split() if t]
        bc.update(zip(toks, toks[1:]))
    c1: Counter = Counter()
    fanout: Counter = Counter()
    fanin: Counter = Counter()
    for (w1, w2), c in bc.items():
        c1[w1] += c
        fanout[w1] += 1
        fanin[w2] += 1
    n_types = len(bc)
    by_w1 = defaultdict(list)
    for (w1, w2), c in bc.items():
        by_w1[w1].append(w2)
    for w1 in list(by_w1)[:50]:
        mass = sum(
            (bc[(w1, w2)] - D) / c1[w1]
            + D * fanout[w1] / c1[w1] * fanin[w2] / n_types
            for w2 in by_w1[w1]
        )
        assert mass <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# t50 — forecast backtest on a planted perfectly-weekly series
# ---------------------------------------------------------------------------


def test_t50_seasonal_naive_wins_on_planted_cycle(spark, tmp_path):
    """On a weekly-periodic series the seasonal-naive predictor is
    perfect on the holdout: test MAE = 0 ⇒ MASE = 0 and sMAPE = 0.
    One small train-window anomaly keeps the in-sample MAE positive
    (a perfectly periodic series has denominator 0 and is correctly
    EXCLUDED — that exclusion is asserted too)."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    shape = [4, 4, 4, 4, 4, 20, 20]
    rows = []
    for d in range(49):
        # +1 anomaly on day 10 only (train region: test is days 40-48)
        for _ in range(shape[d % 7] + (1 if d == 10 else 0)):
            rows.append(("wk", base + pd.Timedelta(days=d)))
        for _ in range(shape[d % 7]):
            rows.append(("pure", base + pd.Timedelta(days=d)))
    # an aperiodic contrast series: strictly growing counts — the
    # lag-7 predictor is wrong on every day, so MASE ~ 1 (in-sample
    # errors are as bad as test errors for a linear trend)
    for d in range(49):
        for _ in range(d + 1):
            rows.append(("trend", base + pd.Timedelta(days=d)))
    ev = pd.DataFrame(rows, columns=["event_type", "ts"])
    ev["event_id"] = range(len(ev))
    ev["user_id"] = 1
    ev["value"] = 1.0
    ev["props"] = "{}"
    td = str(tmp_path / "sf")
    os.makedirs(td)
    ev[["event_id", "ts", "user_id", "event_type", "value", "props"]
       ].to_parquet(os.path.join(td, "events.parquet"), index=False)
    got = {
        r["event_type"]: r
        for r in queries()["t50_forecast_backtest"](spark, td).collect()
    }
    assert got["wk"]["mase"] == 0.0
    assert got["wk"]["smape_pct"] == 0.0
    # the EXACTLY periodic series has in-sample seasonal-naive MAE 0
    # (MASE undefined) and must be excluded, not emitted as inf/NaN
    assert "pure" not in got
    # constant +1/day trend: every lag-7 error is exactly 7, train
    # and test alike → MASE exactly 1
    assert got["trend"]["mase"] == pytest.approx(1.0, abs=1e-9)


def test_t50_matches_python_reference(spark):
    got = {
        r["event_type"]: r
        for r in queries()["t50_forecast_backtest"](
            spark, SF_SMOKE
        ).collect()
    }
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    anchor = pd.Timestamp("2024-01-01")
    for etype, grp in ev.groupby("event_type"):
        days = Counter((pd.Timestamp(d).normalize() - anchor).days
                       for d in grp["ts"])
        lo, hi = min(days), max(days)
        xs = [days.get(d, 0) for d in range(lo, hi + 1)]
        n = len(xs)
        if n < 21:
            assert etype not in got
            continue
        n_test = max(1, math.floor(0.2 * n))
        test_err, train_err, smape = [], [], []
        for t in range(7, n):
            e = abs(xs[t] - xs[t - 7])
            if t >= n - n_test:
                test_err.append(e)
                s = xs[t] + xs[t - 7]
                smape.append(0.0 if s == 0 else 2.0 * e / s)
            else:
                train_err.append(e)
        if not train_err or sum(train_err) == 0:
            assert etype not in got
            continue
        mase = (sum(test_err) / len(test_err)) / (
            sum(train_err) / len(train_err)
        )
        assert got[etype]["mase"] == pytest.approx(mase, abs=2e-4)
        assert got[etype]["smape_pct"] == pytest.approx(
            100.0 * sum(smape) / len(smape), abs=2e-4
        )


# ---------------------------------------------------------------------------
# a52 — BH procedure invariants
# ---------------------------------------------------------------------------


def test_a52_bh_invariants(spark):
    rows = queries()["a52_bh_fdr_screen"](spark, SF_SMOKE).collect()
    assert rows, "no items passed the n >= 30 gate at smoke scale"
    m = rows[0]["n_tested"]
    assert all(r["n_tested"] == m for r in rows)
    assert sorted(r["p_rank"] for r in rows) == list(range(1, m + 1))
    # p is non-decreasing in rank; thresholds are alpha*k/m
    by_rank = sorted(rows, key=lambda r: r["p_rank"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert a["p_bound"] <= b["p_bound"] + 1e-12
    for r in by_rank:
        assert r["bh_threshold"] == pytest.approx(
            0.05 * r["p_rank"] / m, abs=1e-4
        )
    # flagged = exactly ranks 1..k (step-up property)
    flagged = [r["p_rank"] for r in rows if r["flagged"]]
    if flagged:
        k = max(flagged)
        assert sorted(flagged) == list(range(1, k + 1))
        # the k-th passes its own threshold
        kth = next(r for r in by_rank if r["p_rank"] == k)
        assert kth["p_bound"] <= 0.05 * k / m + 1e-9
        # nothing past k passes a threshold that would extend k
        for r in by_rank[k:]:
            assert r["p_bound"] > 0.05 * r["p_rank"] / m - 1e-12


# ---------------------------------------------------------------------------
# x115 — packing-efficiency vs a pandas re-pack
# ---------------------------------------------------------------------------


def test_x115_matches_pandas_repack(spark):
    import hashlib

    BUDGET = 2048
    docs = _docs_pd()
    docs = docs.assign(
        shard=[
            hashlib.md5(str(i).encode()).hexdigest()[0]
            for i in docs["doc_id"]
        ],
        n_tokens=[
            len([t for t in str(x).lower().strip().split() if t])
            for x in docs["text"]
        ],
    )
    want = {}
    for shard, grp in docs.sort_values("doc_id").groupby("shard"):
        start = grp["n_tokens"].cumsum() - grp["n_tokens"]
        pack_id = (start // BUDGET).astype(int)
        offset = (start % BUDGET).astype(int)
        last = pack_id.max()
        sel = pack_id < last
        if not sel.any():
            continue
        nt = grp["n_tokens"][sel]
        off = offset[sel]
        crossing = (off + nt > BUDGET)
        over = (off + nt - BUDGET).clip(lower=0)
        want[shard] = {
            "n_packs": pack_id[sel].nunique(),
            "n_docs": int(sel.sum()),
            "n_crossing": int(crossing.sum()),
            "frag": float(over.sum() / nt.sum()),
        }
    got = {
        r["shard"]: r
        for r in queries()["x115_packing_efficiency"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(want)
    for shard, w in want.items():
        g = got[shard]
        assert g["n_packs"] == w["n_packs"]
        assert g["n_docs"] == w["n_docs"]
        assert g["n_crossing"] == w["n_crossing"]
        assert g["frag_token_share"] == pytest.approx(
            w["frag"], abs=2e-4
        )
        assert 0.0 <= g["crossing_share"] <= 1.0
        assert g["avg_docs_per_pack"] >= 1.0


# ---------------------------------------------------------------------------
# x116 — silhouette invariants + planted separable clusters
# ---------------------------------------------------------------------------


def test_x116_silhouette_bounds(spark):
    rows = queries()["x116_label_silhouette"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert 0.0 <= r["misplaced_share"] <= 1.0


def test_x116_separable_clusters_score_high(spark, tmp_path):
    """Three orthogonal point clouds → near-perfect silhouette and
    zero misplacement."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    vecs, labels = [], []
    for label, axis in [(0, 0), (1, 20), (2, 40)]:
        for _ in range(30):
            v = rng.normal(0, 0.05, 64)
            v[axis] += 10.0
            vecs.append(v.astype("float32"))
            labels.append(label)
    td = str(tmp_path / "sf")
    os.makedirs(td)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(td, "embeddings.parquet"))
    rows = queries()["x116_label_silhouette"](spark, td).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["mean_silhouette"] > 0.95
        assert r["misplaced_share"] == 0.0


# ---------------------------------------------------------------------------
# x117 — CDC shift-invariance (the property fixed-size chunking lacks)
# ---------------------------------------------------------------------------


def _cdc_chunks(tokens, w=4, divisor=16):
    import hashlib

    bounds = []
    for i in range(len(tokens)):
        if i >= w - 1:
            gram = " ".join(tokens[i - w + 1 : i + 1])
            h = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)
            bounds.append(h % divisor == 0)
        else:
            bounds.append(False)
    chunks, cur = [], []
    for tok, b in zip(tokens, bounds):
        cur.append(tok)
        if b:
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def test_x117_cdc_is_shift_invariant(spark, tmp_path):
    """Insert a sentence at the top of a mirrored document: CDC chunk
    hashes re-synchronize, so most chunks still dedup — and the query
    reports the duplication."""
    body = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
        "psi omega one two three four five six seven eight nine ten "
        "eleven twelve thirteen fourteen fifteen sixteen seventeen "
        "eighteen nineteen twenty alpha2 beta2 gamma2 delta2 "
        "epsilon2 zeta2 eta2 theta2 iota2 kappa2 lambda2 mu2 nu2 "
        "xi2 omicron2 pi2 rho2 sigma2 tau2 upsilon2"
    )
    shifted = "breaking news prefix inserted here " + body
    # python reference: shifted copy shares most chunk strings
    c1 = set(_cdc_chunks(body.split()))
    c2 = set(_cdc_chunks(shifted.split()))
    shared = len(c1 & c2)
    assert shared >= max(1, len(c1) - 2), (
        "CDC must re-synchronize after the insertion point"
    )
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [body, shifted, "unrelated totally different words"],
            "lang": ["en"] * 3,
            "source": ["a", "b", "c"],
            "n_chars": [len(body), len(shifted), 33],
        }
    )
    td = str(tmp_path / "sf")
    os.makedirs(td)
    docs.to_parquet(os.path.join(td, "documents.parquet"), index=False)
    rows = {
        r["source"]: r
        for r in queries()["x117_cdc_chunks"](spark, td).collect()
    }
    # source b (the shifted mirror) shares chunks with source a
    assert rows["a"]["cross_source_share"] > 0
    assert rows["b"]["cross_source_share"] > 0
    assert rows["c"]["cross_source_share"] == 0.0


def test_x117_matches_python_reference(spark):
    docs = _docs_pd()
    chunk_rows = []
    for doc_id, source, text in zip(
        docs["doc_id"], docs["source"], docs["text"]
    ):
        toks = [t for t in str(text).lower().strip().split() if t]
        for ch in _cdc_chunks(toks):
            chunk_rows.append((source, ch))
    by_source = defaultdict(list)
    for source, ch in chunk_rows:
        by_source[source].append(ch)
    spread = defaultdict(set)
    for source, ch in chunk_rows:
        spread[ch].add(source)
    got = {
        r["source"]: r
        for r in queries()["x117_cdc_chunks"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(by_source)
    for source, chunks in by_source.items():
        g = got[source]
        assert g["n_chunks"] == len(chunks)
        assert g["n_chunk_types"] == len(set(chunks))
        cross = sum(1 for ch in chunks if len(spread[ch]) > 1)
        assert g["cross_source_share"] == pytest.approx(
            cross / len(chunks), abs=2e-4
        )
        assert g["mean_chunk_tokens"] == pytest.approx(
            sum(len(c.split()) for c in chunks) / len(chunks), abs=2e-4
        )


# ---------------------------------------------------------------------------
# a53 — elasticity vs a pandas OLS reference
# ---------------------------------------------------------------------------


def test_a53_matches_pandas_ols(spark):
    import numpy as np

    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    li = li[li["l_extendedprice"].notna() & li["l_quantity"].notna()]
    li = li.assign(
        item=li["l_partkey"],
        mon=pd.to_datetime(li["l_shipdate"]).dt.to_period("M"),
        cents=(li["l_extendedprice"].round(2) * 100).round().astype("int64"),
        cq=(li["l_quantity"].round(2) * 100).round().astype("int64"),
    )
    got = {
        r["item"]: r
        for r in queries()["a53_price_elasticity"](
            spark, SF_SMOKE
        ).collect()
    }
    n_checked = 0
    for item, grp in li.groupby("item"):
        m = grp.groupby("mon").agg(
            sb=("cents", "sum"), sq=("cq", "sum"),
            rawq=("l_quantity", "sum"), rawb=("l_extendedprice", "sum"),
        )
        m = m[(m["rawq"] > 0) & (m["rawb"] > 0)]
        if len(m) < 12:
            assert item not in got
            continue
        lp = np.log(m["sb"].to_numpy(float) / m["sq"].to_numpy(float))
        lq = np.log(m["sq"].to_numpy(float) / 100.0)
        n = len(m)
        vx = n * (lp * lp).sum() - lp.sum() ** 2
        vy = n * (lq * lq).sum() - lq.sum() ** 2
        cov = n * (lp * lq).sum() - lp.sum() * lq.sum()
        if vx <= 0 or vy <= 0:
            assert item not in got
            continue
        assert got[item]["n_months"] == n
        assert got[item]["elasticity"] == pytest.approx(
            cov / vx, abs=2e-4
        )
        assert got[item]["r2"] == pytest.approx(
            cov * cov / (vx * vy), abs=2e-4
        )
        n_checked += 1
    assert n_checked > 0, "no item passed the 12-month gate at smoke"


# ---------------------------------------------------------------------------
# a54 — Lorenz invariants
# ---------------------------------------------------------------------------


def test_a54_lorenz_invariants(spark):
    rows = sorted(
        queries()["a54_lorenz_deciles"](spark, SF_SMOKE).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # shares sum to 1, cumulative shares monotone and end at 1,
    # and the Lorenz curve is convex: decile shares non-decreasing
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=5e-4)
    cums = [r["cum_share"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:]))
    assert cums[-1] == pytest.approx(1.0, abs=1e-4)
    shares = [r["share"] for r in rows]
    assert all(a <= b + 1e-4 for a, b in zip(shares, shares[1:]))


# ---------------------------------------------------------------------------
# t51 — ESS vs a python reference with the same truncation rule
# ---------------------------------------------------------------------------


def test_t51_matches_python_reference(spark):
    from tests.test_analytics import _r4 as r4py

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    got = {
        r["event_type"]: r
        for r in queries()["t51_effective_sample_size"](
            spark, SF_SMOKE
        ).collect()
    }
    for etype, grp in ev.groupby("event_type"):
        daily = (
            grp.assign(day=grp["ts"].dt.date)
            .groupby("day")["value"].mean()
            .sort_index()
            .to_numpy()
        )
        n = len(daily)
        dev = daily - daily.mean()
        ss0 = float((dev * dev).sum())
        if ss0 <= 0:
            assert etype not in got
            continue
        rhos = []
        for k in range(1, 15):
            if k >= n:
                break
            rhos.append(r4py(float((dev[:-k] * dev[k:]).sum()) / ss0))
        # all-positive default = max AVAILABLE lag + 1 (short series
        # must not claim 14 terms were summed)
        first_nonpos = next(
            (i + 1 for i, r in enumerate(rhos) if r <= 0),
            len(rhos) + 1,
        )
        sum_rho = sum(rhos[: first_nonpos - 1])
        g = got[etype]
        assert g["n_days"] == n
        assert g["k_used"] == first_nonpos - 1
        assert g["sum_rho"] == pytest.approx(sum_rho, abs=2e-4)
        assert g["ess"] == pytest.approx(
            n / (1 + 2 * sum_rho), abs=2e-3
        )
        assert 0 < g["ess"] <= n + 1e-6 or g["ess"] > n  # finite
        assert g["ess_ratio"] > 0


# ---------------------------------------------------------------------------
# x118 — isotropy vs numpy; planted cone collapse
# ---------------------------------------------------------------------------


def test_x118_matches_numpy(spark):
    import numpy as np

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.stack(
        [np.asarray(v, dtype=float) for v in emb["embedding"]]
    )
    mu = X.mean(axis=0)
    var_d = X.var(axis=0, ddof=1)
    mean_sqnorm = float((X * X).sum(axis=1).mean())
    row = queries()["x118_embedding_isotropy"](spark, SF_SMOKE).collect()[0]
    assert row["n_vecs"] == len(X) and row["n_dims"] == X.shape[1]
    assert row["centroid_norm"] == pytest.approx(
        float(np.linalg.norm(mu)), abs=2e-4
    )
    assert row["isotropy"] == pytest.approx(
        1.0 - float(mu @ mu) / mean_sqnorm, abs=2e-4
    )
    assert row["top_dim_var_share"] == pytest.approx(
        float(var_d.max() / var_d.sum()), abs=2e-4
    )
    assert row["participation_ratio"] == pytest.approx(
        float(var_d.sum() ** 2 / (var_d * var_d).sum()), abs=2e-3
    )


def test_x118_cone_collapse_reads_low(spark, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    base = np.ones(64) * 5.0
    vecs = [
        (base + rng.normal(0, 0.01, 64)).astype("float32")
        for _ in range(40)
    ]
    td = str(tmp_path / "sf")
    os.makedirs(td)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 40, pa.int32()),
            }
        ),
        os.path.join(td, "embeddings.parquet"),
    )
    row = queries()["x118_embedding_isotropy"](spark, td).collect()[0]
    # everything sits on one cone tip: the mean carries ~all the mass
    assert row["isotropy"] < 0.01


# ---------------------------------------------------------------------------
# x119 — Burrows' Delta vs python reference
# ---------------------------------------------------------------------------


def test_x119_matches_python_reference(spark):
    import itertools
    import math as _m

    docs = _docs_pd()
    tok_rows = []
    for source, text in zip(docs["source"], docs["text"]):
        for t in str(text).lower().strip().split():
            if t:
                tok_rows.append((source, t))
    corpus = Counter(t for _, t in tok_rows)
    top = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    markers = [t for t, _ in top]
    stot = Counter(s for s, _ in tok_rows)
    cnt = Counter(tok_rows)
    sources = sorted(stot)
    rel = {
        (s, t): cnt[(s, t)] / stot[s] for s in sources for t in markers
    }
    z = {}
    n_markers = 0
    for t in markers:
        vals = [rel[(s, t)] for s in sources]
        m = sum(vals) / len(vals)
        var = sum((v - m) ** 2 for v in vals) / (len(vals) - 1)
        sd = _m.sqrt(var)
        if sd > 0:
            n_markers += 1
            for s in sources:
                z[(s, t)] = (rel[(s, t)] - m) / sd
    got = {
        (r["source_a"], r["source_b"]): r
        for r in queries()["x119_stylometric_delta"](
            spark, SF_SMOKE
        ).collect()
    }
    assert len(got) == len(sources) * (len(sources) - 1) // 2
    for a, b in itertools.combinations(sources, 2):
        ts = [t for t in markers if (a, t) in z]
        want = sum(abs(z[(a, t)] - z[(b, t)]) for t in ts) / len(ts)
        g = got[(a, b)]
        assert g["n_markers"] == n_markers
        assert g["burrows_delta"] == pytest.approx(want, abs=2e-4)
        assert g["burrows_delta"] >= 0


# ---------------------------------------------------------------------------
# a55 — price index vs pandas reference
# ---------------------------------------------------------------------------


def test_a55_matches_pandas_reference(spark):
    import numpy as np

    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    li = li[li["l_extendedprice"].notna() & li["l_quantity"].notna()]
    li = li.assign(
        item=li["l_partkey"],
        mon=pd.to_datetime(li["l_shipdate"]).dt.to_period("M"),
        cents=(li["l_extendedprice"].round(2) * 100).round().astype("int64"),
        cq=(li["l_quantity"].round(2) * 100).round().astype("int64"),
    )
    m = li.groupby(["item", "mon"]).agg(
        sb=("cents", "sum"), sq=("cq", "sum"), rawq=("l_quantity", "sum")
    )
    m = m[m["rawq"] > 0].reset_index()
    mon0 = m["mon"].min()
    base = m[m["mon"] == mon0].set_index("item")
    p0 = base["sb"].astype(float) / base["sq"]
    q0 = base["sq"].astype(float) / 100.0
    got = {
        pd.Period(r["month"], freq="M"): r
        for r in queries()["a55_price_index"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(m["mon"].unique())
    for mon, grp in m.groupby("mon"):
        paired = grp[grp["item"].isin(base.index)]
        pt = paired["sb"].astype(float) / paired["sq"]
        qt = paired["sq"].astype(float) / 100.0
        pp0 = p0.loc[paired["item"]].to_numpy()
        qq0 = q0.loc[paired["item"]].to_numpy()
        lasp = float((pt.to_numpy() * qq0).sum() / (pp0 * qq0).sum())
        paas = float(
            (pt.to_numpy() * qt.to_numpy()).sum()
            / (pp0 * qt.to_numpy()).sum()
        )
        g = got[mon]
        assert g["n_items"] == len(paired)
        assert g["laspeyres"] == pytest.approx(lasp, abs=2e-4)
        assert g["paasche"] == pytest.approx(paas, abs=2e-4)
        assert g["fisher"] == pytest.approx(
            math.sqrt(lasp * paas), abs=2e-4
        )
    # base month indexes to exactly 1 by construction
    b = got[mon0]
    assert b["laspeyres"] == pytest.approx(1.0, abs=1e-9)
    assert b["paasche"] == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# t52 — SAX invariants + planted motif
# ---------------------------------------------------------------------------


def test_t52_sax_planted_spike_motif(spark, tmp_path):
    """A series that alternates quiet weeks and one huge spike week
    must produce 'd' letters exactly at the spike weeks — and the
    motif counts must reflect the planted period."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for d in range(70):  # 10 whole weeks
        week = d // 7
        lam = 100 if week % 5 == 2 else 3  # spike weeks 2 and 7
        for _ in range(lam):
            rows.append(("s", base + pd.Timedelta(days=d)))
    ev = pd.DataFrame(rows, columns=["event_type", "ts"])
    ev["event_id"] = range(len(ev))
    ev["user_id"] = 1
    ev["value"] = 1.0
    ev["props"] = "{}"
    td = str(tmp_path / "sf")
    os.makedirs(td)
    ev[["event_id", "ts", "user_id", "event_type", "value", "props"]
       ].to_parquet(os.path.join(td, "events.parquet"), index=False)
    rows_out = queries()["t52_sax_motifs"](spark, td).collect()
    motifs = {r["motif"]: r["n"] for r in rows_out}
    # 10 segments -> 8 motifs; letters: quiet='b' (slightly below
    # mean), spike='d' -> expected letter string bbdbbbbdbb
    assert sum(motifs.values()) == 8
    assert motifs.get("bbd", 0) == 2  # approaching each spike
    assert motifs.get("dbb", 0) == 2  # leaving each spike
    assert all(set(m) <= set("abcd") for m in motifs)


def test_t52_matches_python_reference(spark):
    import numpy as np

    got = defaultdict(dict)
    for r in queries()["t52_sax_motifs"](spark, SF_SMOKE).collect():
        got[r["event_type"]][r["motif"]] = r["n"]
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    anchor = pd.Timestamp("2024-01-01")
    for etype, grp in ev.groupby("event_type"):
        days = Counter(
            (pd.Timestamp(d).normalize() - anchor).days for d in grp["ts"]
        )
        lo, hi = min(days), max(days)
        xs = np.array(
            [days.get(d, 0) for d in range(lo, hi + 1)], dtype=float
        )
        n = len(xs)
        if n < 14:
            assert etype not in got
            continue
        s1, s2 = xs.sum(), (xs * xs).sum()
        var_num = n * s2 - s1 * s1
        if var_num <= 0:
            assert etype not in got
            continue
        sd = math.sqrt(var_num / (n * (n - 1.0)))
        z = (xs - s1 / n) / sd
        n_seg = n // 7
        letters = []
        for s in range(n_seg):
            zb = z[s * 7 : (s + 1) * 7].mean()
            letters.append(
                "a" if zb < -0.6745 else
                "b" if zb < 0.0 else
                "c" if zb < 0.6745 else "d"
            )
        want = Counter(
            "".join(letters[i : i + 3])
            for i in range(len(letters) - 2)
        )
        assert got[etype] == dict(want)


# ---------------------------------------------------------------------------
# t53 — sweep line vs python reference
# ---------------------------------------------------------------------------


def test_t53_matches_python_sweep(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    hours = {"A": 48, "N": 12, "R": 24}
    by_item = defaultdict(list)
    for r in li.itertuples():
        t0 = pd.Timestamp(r.l_shipdate)
        t1 = t0 + pd.Timedelta(hours=hours[r.l_returnflag])
        # auc tiebreak mirrors the query's md5 row id ordering
        import hashlib

        cents = int(round(round(float(r.l_extendedprice), 2) * 100))
        auc = hashlib.md5(
            f"{r.l_orderkey}|{r.l_linenumber}|{r.l_partkey}|"
            f"{r.l_suppkey}|{cents}".encode()
        ).hexdigest()
        by_item[r.l_partkey].append((t0, 1, auc))
        by_item[r.l_partkey].append((t1, -1, auc))
    want = {}
    for item, evs in by_item.items():
        evs.sort()
        live = peak = 0
        peak_ts = None
        for ts, delta, _ in evs:
            live += delta
            if live > peak:
                peak, peak_ts = live, ts
        want[item] = (peak, peak_ts)
    rows = queries()["t53_max_concurrent"](spark, SF_SMOKE).collect()
    assert len(rows) == 50
    # query returns the top-50 by (max_concurrent desc, item)
    expect_order = sorted(
        want.items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:50]
    for r, (item, (peak, peak_ts)) in zip(rows, expect_order):
        assert r["item"] == item
        assert r["max_concurrent"] == peak
        assert pd.Timestamp(r["first_peak_ts"]) == peak_ts
        assert r["n_items"] == len(want)


# ---------------------------------------------------------------------------
# x121 — planted contamination is caught across an insertion shift
# ---------------------------------------------------------------------------


def test_x121_catches_shifted_contamination(spark, tmp_path):
    import hashlib

    body = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
        "psi omega one two three four five six seven eight nine ten "
        "eleven twelve thirteen fourteen fifteen sixteen seventeen "
        "eighteen nineteen twenty alpha2 beta2 gamma2 delta2 "
        "epsilon2 zeta2 eta2 theta2 iota2 kappa2 lambda2 mu2 nu2 "
        "xi2 omicron2 pi2 rho2 sigma2 tau2 upsilon2"
    )

    def split_of(doc_id):
        hb = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        return "train" if hb < "cd" else ("val" if hb < "e6" else "test")

    # find ids landing in train and test deterministically
    train_id = next(i for i in range(1, 500) if split_of(i) == "train")
    test_id = next(i for i in range(1, 500) if split_of(i) == "test")
    clean_id = next(
        i for i in range(test_id + 1, 900) if split_of(i) == "test"
    )
    docs = pd.DataFrame(
        {
            "doc_id": [train_id, test_id, clean_id],
            "text": [
                body,
                "inserted preamble shifts everything " + body,
                "totally unrelated clean content with fresh words only",
            ],
            "lang": ["en"] * 3,
            "source": ["a", "b", "c"],
            "n_chars": [1, 1, 1],
        }
    )
    td = str(tmp_path / "sf")
    os.makedirs(td)
    docs.to_parquet(os.path.join(td, "documents.parquet"), index=False)
    rows = {
        r["doc_id"]: r
        for r in queries()["x121_chunk_decontaminate"](
            spark, td
        ).collect()
    }
    # the shifted mirror in the test split hits the train chunk set
    assert test_id in rows and rows[test_id]["flagged"]
    assert rows[test_id]["hit_share"] > 0.5
    # the clean test doc produces no row (n_hit = 0 filtered)
    assert clean_id not in rows


# ---------------------------------------------------------------------------
# t54 — inter-arrival stats vs python; planted regimes
# ---------------------------------------------------------------------------


def test_t54_matches_python_and_classifies_regimes(spark, tmp_path):
    import numpy as np

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # regular: exactly one event every 60s (CV = 0)
    for i in range(100):
        rows.append(("cron", base + pd.Timedelta(seconds=60 * i)))
    # bursty: 10 bursts of 10 events 1s apart, bursts 1h apart
    for b in range(10):
        for i in range(10):
            rows.append(
                ("burst", base + pd.Timedelta(hours=b, seconds=i))
            )
    ev = pd.DataFrame(rows, columns=["event_type", "ts"])
    ev["event_id"] = range(len(ev))
    ev["user_id"] = 1
    ev["value"] = 1.0
    ev["props"] = "{}"
    td = str(tmp_path / "sf")
    os.makedirs(td)
    ev[["event_id", "ts", "user_id", "event_type", "value", "props"]
       ].to_parquet(os.path.join(td, "events.parquet"), index=False)
    got = {
        r["event_type"]: r
        for r in queries()["t54_interarrival_stats"](spark, td).collect()
    }
    assert got["cron"]["regular"] and not got["cron"]["bursty"]
    assert got["cron"]["cv"] == 0.0
    assert got["cron"]["mean_gap_s"] == 60.0
    assert got["burst"]["bursty"] and not got["burst"]["regular"]
    # python reference on the bursty gaps
    ts = sorted(t for e, t in rows if e == "burst")
    gaps = np.diff([t.value // 10**9 for t in ts]).astype(float)
    cv = gaps.std(ddof=1) / gaps.mean()
    assert got["burst"]["cv"] == pytest.approx(cv, abs=2e-4)
    assert got["burst"]["n_gaps"] == len(gaps)


# ---------------------------------------------------------------------------
# x123 — planted word-reorder duplicate is caught; verbatim dup scores 1
# ---------------------------------------------------------------------------


def test_x123_catches_reordered_duplicate(spark, tmp_path):
    words = [f"w{i}" for i in range(60)]
    body = " ".join(words)
    # SPARSE adjacent swaps (every 10th position): each swap changes
    # all ~4 ordered windows covering it but only the ~2 windows
    # containing exactly one swapped word keep different CONTENT —
    # so the sorted-shingle Jaccard stays high while ordered drops
    sw = words[:]
    for i in (9, 19, 29, 39, 49):
        sw[i], sw[i + 1] = sw[i + 1], sw[i]
    swapped = " ".join(sw)

    def shingles(ws, ordered):
        out = set()
        for i in range(len(ws) - 2):
            win = ws[i : i + 3]
            out.add(" ".join(win if ordered else sorted(win)))
        return out

    def jac(a, b):
        return len(a & b) / len(a | b)

    js_ref = jac(shingles(words, False), shingles(sw, False))
    jo_ref = jac(shingles(words, True), shingles(sw, True))
    assert js_ref >= 0.5 > jo_ref, "test construction sanity"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [body, swapped, body, "totally different words here"],
            "lang": ["en"] * 4,
            "source": ["a"] * 4,
            "n_chars": [1] * 4,
        }
    )
    td = str(tmp_path / "sf")
    os.makedirs(td)
    docs.to_parquet(os.path.join(td, "documents.parquet"), index=False)
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in queries()["x123_reorder_robust_dedup"](
            spark, td
        ).collect()
    }
    # verbatim pair (1,3): both jaccards 1, NOT reordered_only
    assert rows[(1, 3)]["sorted_jaccard"] == 1.0
    assert rows[(1, 3)]["ordered_jaccard"] == 1.0
    assert not rows[(1, 3)]["reordered_only"]
    # swapped pair: high sorted, low ordered -> the ordered index
    # would have missed it
    for pair in ((1, 2), (2, 3)):
        assert pair in rows, "reordered duplicate not caught"
        assert rows[pair]["sorted_jaccard"] == pytest.approx(
            js_ref, abs=2e-4
        )
        assert rows[pair]["ordered_jaccard"] == pytest.approx(
            jo_ref, abs=2e-4
        )
        assert rows[pair]["reordered_only"]
    assert (1, 4) not in rows and (3, 4) not in rows


def test_t51_short_series_reports_available_lags(spark, tmp_path):
    """A 10-day series has only lags 1..9; if every rho is positive,
    k_used must report 9 (terms actually summed), not the global
    14-lag ceiling."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for d in range(10):  # strong trend -> all-positive ACF
        for i in range(d + 1):
            rows.append(("tr", base + pd.Timedelta(days=d), 10.0 * d))
    ev = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    ev["event_id"] = range(len(ev))
    ev["user_id"] = 1
    ev["props"] = "{}"
    td = str(tmp_path / "sf")
    os.makedirs(td)
    ev[["event_id", "ts", "user_id", "event_type", "value", "props"]
       ].to_parquet(os.path.join(td, "events.parquet"), index=False)
    got = {
        r["event_type"]: r
        for r in queries()["t51_effective_sample_size"](spark, td).collect()
    }
    r = got["tr"]
    assert r["n_days"] == 10
    assert r["k_used"] <= 9, "k_used exceeded the available lags"
