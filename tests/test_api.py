"""Serving-façade tests: the parameterized request surface composes
the proven operators correctly — filters actually filter, pagination
partitions the stream deterministically, searches rank stably."""

from __future__ import annotations

from server_spark import api
from server_spark.operators import auctions as ops
from server_spark.sources.synthetic import auctions


def test_query_auctions_filters_and_paginates(spark, sf_dir):
    live = auctions(spark, sf_dir)
    some_owners = [
        r["owner"]
        for r in live.select("owner").distinct().orderBy("owner").head(3)
    ]
    req = api.AuctionsRequest(
        owner_filters=some_owners, sort_kind="buyout",
        sort_descending=True, page=0, count=10,
    )
    page0 = api.query_auctions(spark, sf_dir, req).collect()
    assert 0 < len(page0) <= 10
    assert {r["owner"] for r in page0} <= set(some_owners)
    buyouts = [r["buyout"] for r in page0]
    assert buyouts == sorted(buyouts, reverse=True)

    # page 1 is disjoint from page 0 and continues the order
    req1 = api.AuctionsRequest(
        owner_filters=some_owners, sort_kind="buyout",
        sort_descending=True, page=1, count=10,
    )
    page1 = api.query_auctions(spark, sf_dir, req1).collect()
    keys = lambda rows: {(r["item"], r["owner"], r["buyout"]) for r in rows}
    assert not (keys(page0) & keys(page1))
    if page1:
        assert max(r["buyout"] for r in page1) <= min(buyouts)


def test_price_list_matches_direct_composition(spark, sf_dir):
    live = auctions(spark, sf_dir)
    items = [r["item"] for r in live.select("item").distinct().head(5)]
    got = {
        r["item"]: r["volume"]
        for r in api.price_list(spark, sf_dir, items).collect()
    }
    want = {
        r["item"]: r["volume"]
        for r in ops.price_stats(
            ops.filter_by_items(live, items)
        ).collect()
    }
    assert got == want and set(got) <= set(items) and got


def test_price_list_history_window(spark, sf_dir):
    rows = api.price_list_history(
        spark, sf_dir, item_ids=[1, 2, 3],
        lower_ts="2024-01-05 00:00:00", upper_ts="2024-01-10 00:00:00",
    ).collect()
    assert rows
    import datetime as dt

    for r in rows:
        assert r["item"] in (1, 2, 3)
        assert dt.datetime(2024, 1, 5) <= r["day"] < dt.datetime(2024, 1, 10)
        assert r["min_value"] <= r["avg_value"] <= r["max_value"]


def test_owner_and_item_search(spark, sf_dir):
    live = auctions(spark, sf_dir)
    sample_owner = str(live.select("owner").head()[0])
    frag = sample_owner[:2]
    hits = api.owners_query(spark, sf_dir, frag).collect()
    assert hits and all(frag in str(r["owner"]) for r in hits)

    items = api.items_query(spark, sf_dir, "green", limit=5).collect()
    assert len(items) == 5
    dists = [r["distance"] for r in items]
    assert dists == sorted(dists)
