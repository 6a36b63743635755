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


def test_realm_status_lists_region_roster(spark, sf_dir):
    """status subject ≡ the hierarchy dim filtered to one region."""
    from pyspark.sql import functions as F

    from server_spark import tables

    rows = api.realm_status(spark, sf_dir, "EUROPE").collect()
    assert rows and all(r["region_name"] == "EUROPE" for r in rows)
    # equivalence to the direct join
    nation = tables.load(spark, sf_dir, "nation")
    region = tables.load(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    want = sorted(
        r["n_nationkey"]
        for r in nation.join(
            region, nation.n_regionkey == region.r_regionkey
        ).collect()
    )
    assert [r["realm_id"] for r in rows] == want


def test_realm_modification_dates_watermarks(spark, sf_dir):
    """mod-dates subject: per-realm max(ts) equals the direct
    group-by, and the region parameter restricts the roster."""
    from pyspark.sql import functions as F

    from server_spark import tables

    got = {
        r["realm_id"]: r["last_modified"]
        for r in api.realm_modification_dates(spark, sf_dir).collect()
    }
    ev = tables.load(spark, sf_dir, "events")
    cust = tables.load(spark, sf_dir, "customer")
    want = {
        r["c_nationkey"]: r["m"]
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.max("ts").alias("m"))
        .collect()
    }
    assert got == want and got
    eu = api.realm_modification_dates(spark, sf_dir, "EUROPE").collect()
    assert eu and {r["region_name"] for r in eu} == {"EUROPE"}
    assert set(r["realm_id"] for r in eu) < set(got)


def test_token_history_is_parameterized_w5(spark, sf_dir):
    """token-history subject ≡ the proven W5 operator sliced to the
    region, and the region predicate reaches below the aggregate."""
    import contextlib
    import io

    from server_spark.queries.timeseries import w5_token_history

    got = api.token_history(spark, sf_dir, "ASIA")
    rows = got.collect()
    assert rows and {r["region_name"] for r in rows} == {"ASIA"}
    want = [
        r
        for r in w5_token_history(spark, sf_dir).collect()
        if r["region_name"] == "ASIA"
    ]
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want))
    # the filter must be pushed below the aggregate (no post-agg Filter
    # over the full region set): the region dim scan happens under a
    # broadcast join, and the physical plan carries the literal into
    # the scan side, not only above the HashAggregate
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "ASIA" in plan.split("HashAggregate")[-1] or "PushedFilters" in plan


def test_unmet_demand_list_matches_j5(spark, sf_dir):
    """unmet-demand subject ≡ J5 with default params, bounded +
    deterministic."""
    from server_spark.queries.joins_sets import j5_unmet_demand

    rows = api.unmet_demand_list(spark, sf_dir, owner_cap=10, limit=50).collect()
    want = sorted(r["item"] for r in j5_unmet_demand(spark, sf_dir).collect())[
        :50
    ]
    assert [r["item"] for r in rows] == want and len(rows) <= 50
    # with no watched owners every catalog item is unmet: the list is
    # non-empty and bounded by the limit
    all_unmet = api.unmet_demand_list(
        spark, sf_dir, owner_cap=-1, limit=50
    ).collect()
    assert len(all_unmet) == 50
    assert [r["item"] for r in all_unmet] == sorted(
        r["item"] for r in all_unmet
    )


def test_keyset_pagination_matches_window_slices(spark, sf_dir):
    """Keyset pages reproduce the window-slice pages exactly at any
    depth, and the plan is a TakeOrderedAndProject with NO rank
    window — O(count) per page instead of O(page*count)."""
    import contextlib
    import io

    from server_spark.operators import auctions as ops
    from server_spark.sources.synthetic import auctions as load

    collapsed = ops.collapse_mini_auctions(load(spark, sf_dir)).cache()
    order = ops.sort_columns("buyout", True)

    after = None
    for page in range(3):
        want = ops.paginate(collapsed, order, page, 7).collect()
        got_df = ops.paginate_keyset(collapsed, "buyout", True, 7, after)
        got = got_df.collect()
        key = lambda r: tuple(r[k] for k in ("buyout", *ops.COLLAPSE_KEYS))
        assert [key(r) for r in got] == [key(r) for r in want], f"page {page}"
        last = got[-1]
        after = {k: last[k] for k in ("buyout", *ops.COLLAPSE_KEYS)}

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got_df.explain()
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "row_number" not in plan


# ---------------------------------------------------------------------------
# Property tests: arbitrary request-parameter combinations (r6 verdict 6)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_REQS = st.fixed_dictionaries(
    {
        "owners": st.lists(
            st.integers(min_value=1, max_value=10), max_size=4, unique=True
        ),
        "items": st.lists(
            st.integers(min_value=1, max_value=60), max_size=5, unique=True
        ),
        "sort_kind": st.sampled_from(sorted(ops.SORT_KINDS)),
        "descending": st.booleans(),
        "count": st.integers(min_value=1, max_value=9),
    }
)

_PROP_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
    ],
)


@given(req=_REQS)
@_PROP_SETTINGS
def test_query_auctions_params_agree_with_keyset(spark, sf_dir, req):
    """For ARBITRARY filter × sort × page-size combinations: the
    offset-window pages (api.query_auctions) and a keyset-cursor walk
    over the same request agree page-for-page; rows honor the filters;
    pages are disjoint, bounded, and ordered by the requested key."""
    owners, items = req["owners"], req["items"]
    kind, desc, count = req["sort_kind"], req["descending"], req["count"]

    # mirror the façade's composition to drive the keyset twin
    live = auctions(spark, sf_dir)
    if owners:
        live = ops.filter_by_owners(live, owners)
    if items:
        live = ops.filter_by_items(live, items)
    collapsed = ops.collapse_mini_auctions(live).cache()

    key_cols = (ops.SORT_KINDS[kind], *ops.COLLAPSE_KEYS)
    rowkey = lambda r: tuple(r[k] for k in key_cols)

    after, seen = None, []
    for page in range(3):
        want = api.query_auctions(
            spark, sf_dir,
            api.AuctionsRequest(
                owner_filters=owners, item_filters=items,
                sort_kind=kind, sort_descending=desc,
                page=page, count=count,
            ),
        ).collect()
        got = ops.paginate_keyset(collapsed, kind, desc, count, after).collect()
        assert [rowkey(r) for r in got] == [rowkey(r) for r in want], (
            f"page {page} of {req} diverged"
        )
        if not got:
            break
        # request-surface invariants on the offset page
        assert len(want) <= count
        if owners:
            assert {r["owner"] for r in want} <= set(owners)
        if items:
            assert {r["item"] for r in want} <= set(items)
        vals = [r[ops.SORT_KINDS[kind]] for r in want]
        assert vals == sorted(vals, reverse=desc)
        seen.extend(rowkey(r) for r in got)
        last = got[-1]
        after = {k: last[k] for k in key_cols}
    # pages never overlap (full collapse key is unique per row)
    assert len(set(seen)) == len(seen)
    collapsed.unpersist()


def test_query_auctions_cursor_mode_matches_offset_pages(spark, sf_dir):
    """The façade's keyset mode: walking with `after` cursors built by
    api.cursor_of reproduces the offset pages exactly — the O(count)
    deep-scroll serving path behind the same request shape."""
    base = dict(item_filters=(1, 2, 3, 5, 8), sort_kind="quantity",
                sort_descending=True, count=9)
    after = None
    for page in range(3):
        want = api.query_auctions(
            spark, sf_dir, api.AuctionsRequest(page=page, **base)
        ).collect()
        req = api.AuctionsRequest(after=after, **base)
        got = api.query_auctions(spark, sf_dir, req).collect()
        key = lambda r: tuple(
            r[k] for k in ("quantity", *ops.COLLAPSE_KEYS)
        )
        assert [key(r) for r in got] == [key(r) for r in want], f"page {page}"
        if not got:
            break
        after = api.cursor_of(req, got[-1])
