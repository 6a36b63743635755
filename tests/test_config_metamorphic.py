"""Metamorphic testing over the ENGINE CONFIG space.

The oracle pairs pin Spark against DuckDB under ONE physical
configuration. This file pins a complementary invariant: a registered
query's RESULT must not depend on how Catalyst chooses to execute it —
AQE on or off, dimensions broadcast or shuffled, 7 or 8 shuffle
partitions. A violation means order-, partition- or plan-dependent
semantics leaked into a query (the bug class behind non-deterministic
collect_list ordering, first()-without-order, or float reductions that
change with partitioning) — exactly what the canonicalization rules
(array_sort before join, r4 on doubles, total orders with unique
tiebreaks) exist to prevent. Rows-only sketch paths whose CANDIDATE
sets are legitimately partition-dependent (MG summaries, xxhash LSH
fast paths) are out of scope by design — every query here is
oracle-backed and deterministic by contract.

One representative query per major family, sf0.001 for speed.
"""

from __future__ import annotations

import math

import pytest

from server_spark import registry

# r15: each case re-runs a query basket in a FRESH SparkSession per
# alternate config (AQE off, shuffle-partition extremes …) — ~130 s
# of JVM/session churn, a multi-minute gate. Round-close full runs
# include it (`pytest -m ""`).
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"

QUERIES = (
    "a2_price_stats_median",      # agg + exact median
    "j4_owners_by_items",         # broadcast semi join + agg
    "j12_bloom_prejoin",          # hand-built bloom + shuffle semi join
    "o5_keyset_page",             # distributed top-k pagination
    "u7_bag_setops",              # EXCEPT ALL / INTERSECT ALL
    "w3_lag_moving_avg",          # window frames
    "t21_last_touch_attribution", # ignore-nulls window + agg
    "x15_neardup_components",     # iterative label propagation
    "x69_bm25_retrieval",         # lexical scoring pipeline
    "x74_pmi_cooccurrence",       # array surgery + broadcast unigrams
    "a21_triangle_count",         # three-way graph self-join
    "f14_array_hof",              # higher-order array lambdas
    "a22_bitmap_distinct",        # bitmap aggregate chain
    "j9_scd2_user_state",         # SCD2 build (windows + collapse)
    "u5_cdc_merge",               # MERGE semantics
    "t14_downsample_tiers",       # tiered retention rollup
    "x41_semantic_dedup",         # blocked matmul via mapInPandas
    "x46_maximal_removed_spans",  # gaps-and-islands span merge
    "x75_containment_pairs",      # capped inverted index + hot add-back (r8)
    "a27_gini_concentration",     # rank window + exact-cents agg (r8)
    "t27_changepoint_amoc",       # prefix-sum windows + canonical argmax (r8)
    "x85_heldout_perplexity",     # hash split + smoothed LM scoring (r8)
    "a41_bootstrap_ci",           # hash-draw resampling explode (r8 s2)
    "a42_skyline",                # two-level grid frontier (r8 s2)
    "x102_chunk_dedup",           # global keep-first via min-key (r8 s2)
    "w15_weighted_median",        # integer half-total weighted cut (r8 s2)
    "t40_periodogram",            # trig sums + canonical argmax (r8 s2)
    "t44_markov_stationary",      # six barriered matrix squarings (r8 s2)
    "a50_spearman",               # doubled-rank moments, 2 marginal joins
    "j13_asof_tolerance",         # struct-carrying asof window (r8 s2)
    "x31_length_batching",        # two-phase global rank (pid barrier, r9)
    "a52_bh_fdr_screen",          # global p-rank window + step-up (r9)
    "t53_max_concurrent",         # sweep-line running sum + tie rule (r9)
    "x117_cdc_chunks",            # CDC windows + ordered string_agg (r9)
    "x123_reorder_robust_dedup",  # banded candidates + dual verify (r9)
)

VARIANTS = (
    {"spark.sql.adaptive.enabled": "false"},
    {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    {"spark.sql.shuffle.partitions": "7"},
)


def _canon_rows(df) -> list[tuple]:
    rows = []
    for r in df.collect():
        rows.append(
            tuple(
                round(v, 9) if isinstance(v, float) and math.isfinite(v)
                else v
                for v in r
            )
        )
    return sorted(rows, key=repr)


@pytest.fixture(scope="module")
def baseline(spark):
    qs = registry.queries()
    return {name: _canon_rows(qs[name](spark, SF)) for name in QUERIES}


# ANN family (rows-only): determinism here is a CLAIMED contract —
# seeded k-means over a bounded hash-ordered training sample +
# index-identity caches — not an oracle-checked one, so it gets its
# own invariance axis (VERDICT r9 item 7). Top-k results (ids AND
# scores) must be identical under every config variant; a violation
# means the index fit or the candidate scan leaked partition order.
ANN_QUERIES = (
    "x41b_semantic_dedup_scaled",  # IVF-blocked near-dup pairs
    "x47_pq_adc_topk",             # PQ codebook + ADC scan
    "x52_ivfpq_refine_topk",       # IVF+PQ coarse scan + exact refine
)


@pytest.fixture(scope="module")
def ann_baseline(spark):
    qs = registry.queries()
    return {name: _canon_rows(qs[name](spark, SF)) for name in ANN_QUERIES}


@pytest.mark.parametrize("variant", range(len(VARIANTS)))
def test_ann_results_invariant_under_config(spark, ann_baseline, variant):
    overrides = VARIANTS[variant]
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        qs = registry.queries()
        for name in ANN_QUERIES:
            got = _canon_rows(qs[name](spark, SF))
            assert got == ann_baseline[name], (
                f"{name} changed results under {overrides}"
            )
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


@pytest.mark.parametrize("variant", range(len(VARIANTS)))
def test_results_invariant_under_config(spark, baseline, variant):
    overrides = VARIANTS[variant]
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        qs = registry.queries()
        for name in QUERIES:
            got = _canon_rows(qs[name](spark, SF))
            assert got == baseline[name], (
                f"{name} changed results under {overrides}"
            )
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
