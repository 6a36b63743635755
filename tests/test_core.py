"""Golden-fixture tests for the sotah spine, mirroring the reference's
test style (SURVEY.md §5.1): tiny hand-built auction dumps with
hand-computed expected collapse/stats values."""

from __future__ import annotations

from pyspark.sql import functions as F

from server_spark.operators import auctions as ops
from server_spark.queries.core import flagship
from server_spark.schemas import AUCTION
from server_spark.sources.synthetic import auctions


def _dump(spark):
    """A hand-built auction dump: 5 raw auctions, two collapse groups
    for (item=1, owner=a) and singletons elsewhere; one zero-buyout."""
    rows = [
        # auc, item, owner, realm, bid, buyout, qty, time_left, region, slug, ts
        (101, 1, "a", "r1", 90, 100, 2, "LONG", "eu", "s1", None),
        (102, 1, "a", "r1", 80, 100, 2, "LONG", "eu", "s1", None),
        (103, 1, "b", "r1", 50, 300, 3, "LONG", "eu", "s1", None),
        (104, 2, "a", "r1", 10, 0, 1, "SHORT", "eu", "s1", None),
        (105, 2, "b", "r1", 10, 500, 5, "SHORT", "eu", "s1", None),
    ]
    return spark.createDataFrame(rows, AUCTION)


def test_a1_collapse_golden(spark):
    got = {
        (r["item"], r["owner"], r["buyout"]): (r["auc_list"], r["auc_count"])
        for r in ops.collapse_mini_auctions(_dump(spark)).collect()
    }
    assert got[(1, "a", 100)] == ([101, 102], 2)
    assert got[(1, "b", 300)] == ([103], 1)
    assert len(got) == 4


def test_a2_price_stats_golden(spark):
    stats = {r["item"]: r for r in ops.price_stats(_dump(spark)).collect()}
    # item 1: per-unit prices [50, 50, 100] → min 50, max 100, avg 66.6667,
    # median 50, volume 7. Zero-buyout auc 104 excluded from item 2.
    assert stats[1]["min_buyout_per"] == 50.0
    assert stats[1]["max_buyout_per"] == 100.0
    assert abs(stats[1]["average_buyout_per"] - 200 / 3) < 1e-9
    assert stats[1]["median_buyout_per"] == 50.0
    assert stats[1]["volume"] == 7.0
    assert stats[2]["volume"] == 5.0  # only auc 105
    assert stats[2]["median_buyout_per"] == 100.0


def test_pagination_deterministic(spark, sf_dir):
    df = auctions(spark, sf_dir).select("auc", "buyout")
    order = [F.col("buyout").desc(), F.col("auc").asc()]
    page0 = [r["auc"] for r in ops.paginate(df, order, 0, 10).collect()]
    page0_again = [r["auc"] for r in ops.paginate(df, order, 0, 10).collect()]
    page1 = [r["auc"] for r in ops.paginate(df, order, 1, 10).collect()]
    assert page0 == page0_again
    assert len(page0) == 10 and len(page1) == 10
    assert not set(page0) & set(page1)


def test_flagship_entry(spark, sf_dir):
    out = flagship(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 25
    assert "item_name" in out.columns and "median_buyout_per" in out.columns


def test_registry_contract():
    import __spark_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    assert len(qs) >= 10
    for name in sqls:
        assert name in qs


def test_a2_decimal_twin_no_drift(spark):
    """SURVEY §1.2 money-path promise: the DECIMAL(18,4) twin of a2
    must agree with the double path on every per-item stat at sf0.01 —
    i.e. the double pipeline's accumulated float error stays below the
    4-decimal money grid at this scale (at 100 TB the decimal path is
    the one whose partial aggregation is exactly associative)."""
    from decimal import Decimal

    from server_spark.queries.core import (
        a2_price_stats_median,
        a2d_price_stats_decimal,
    )
    from tests.conftest import SF_ORACLE

    sf = SF_ORACLE
    dbl = {r["item"]: r for r in a2_price_stats_median(spark, sf).collect()}
    dec = {r["item"]: r for r in a2d_price_stats_decimal(spark, sf).collect()}
    assert set(dbl) == set(dec)
    cols = [
        "min_buyout_per",
        "max_buyout_per",
        "average_buyout_per",
        "median_buyout_per",
        "volume",
    ]
    worst = Decimal(0)
    for item, dr in dbl.items():
        er = dec[item]
        for c in cols:
            d = abs(Decimal(repr(dr[c])) - er[c])
            worst = max(worst, d)
            assert d == 0, (
                f"item {item} {c}: double {dr[c]} != decimal {er[c]}"
            )
    assert worst == 0


def test_j9_scd2_invariants(spark, sf_dir):
    """SCD2 contract: per user exactly one open (is_current) row;
    validity intervals tile exactly (version k's effective_to equals
    version k+1's effective_from); consecutive versions never carry
    the same state (else they should have collapsed)."""
    from server_spark.queries.warehouse import j9_scd2_user_state

    rows = j9_scd2_user_state(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r.version)
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        assert sum(r.is_current for r in hist) == 1
        assert hist[-1].is_current and hist[-1].effective_to is None
        for a, b in zip(hist, hist[1:]):
            assert a.effective_to == b.effective_from, user
            assert a.state != b.state, user


def test_a2b_gk_exact_small_groups_matches_quantile_disc(spark):
    """The premise of a2b's r13 oracle promotion, pinned in-suite:
    Spark's approx_percentile (Greenwald-Khanna) is EXACT whenever a
    group holds fewer rows than its accuracy parameter, and in that
    regime it picks the same lower-middle element DuckDB's
    quantile_disc(0.5) does — across odd/even counts, duplicates,
    singletons, two-element groups and skew. If a Spark upgrade ever
    changes GK's small-n element choice, this fails before the
    parity gate does."""
    import duckdb
    from pyspark.sql import functions as F

    cases = {
        "odd": [1.0, 2.0, 3.0],
        "even": [1.0, 2.0, 3.0, 4.0],
        "dups": [1.0, 1.0, 2.0, 2.0],
        "two": [5.0, 7.0],
        "one": [42.0],
        "six": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        "skew": [1.0, 1.0, 1.0, 9.0],
        "neg": [-3.0, -1.0, -2.0, -2.0, 0.5],
    }
    rows = [(k, v) for k, vals in cases.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        r["g"]: r["p"]
        for r in df.groupBy("g")
        .agg(F.expr("approx_percentile(x, 0.5, 10000)").alias("p"))
        .collect()
    }
    for k, vals in cases.items():
        want = duckdb.sql(
            f"select quantile_disc(x, 0.5) from (select unnest({vals}) x)"
        ).fetchone()[0]
        assert got[k] == want, (k, got[k], want)
