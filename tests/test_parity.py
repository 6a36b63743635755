"""Registry-wide oracle parity as a pytest gate (slow).

The external driver hash-verifies only the first 50 registry entries;
this test runs the SAME comparison over EVERY registered query at
sf0.001, so late/post-window queries are value-verified on every
change too (scripts/check_parity.py runs the identical gate at
sf0.01 from the CLI).
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from server_spark.parity_check import (
    _cells_agree_at_scale,
    _compare_keyed_scaled,
    run_parity,
)


def test_declared_scale_cell_contract():
    """The r14 value-oracle rounding contract: HALF_UP quantize at
    the declared scale, adjacency allowed ONLY when the raw values
    themselves are within one quantum (the cross-engine
    double-rounding residual), real errors fail."""
    # the exact failure that motivated the mode: Spark decimal
    # 1730.9468 vs DuckDB double of the same half-boundary value
    assert _cells_agree_at_scale(
        Decimal("1730.9468"), 1730.9467499999999, 4
    )
    # plain equality after quantize
    assert _cells_agree_at_scale(Decimal("42.0000"), 42, 4)
    assert _cells_agree_at_scale(2.05, Decimal("2.0500"), 4)
    # a REAL money error of two grid steps fails
    assert not _cells_agree_at_scale(Decimal("10.0002"), 10.0000, 4)
    # adjacent cells but the RAW values differ by more than a quantum
    # -> not a double-rounding residual, fail
    assert not _cells_agree_at_scale(
        Decimal("10.00002"), Decimal("10.00013"), 4
    )
    assert not _cells_agree_at_scale(Decimal("10.2"), 10.4, 1)
    # NaN pairs with NaN only; non-numerics compare exactly
    assert _cells_agree_at_scale(float("nan"), float("nan"), 4)
    assert not _cells_agree_at_scale(float("nan"), 1.0, 4)
    assert _cells_agree_at_scale("eu", "eu", 4)
    assert not _cells_agree_at_scale("eu", "us", 4)
    assert _cells_agree_at_scale(None, None, 4)


def test_declared_scale_keyed_alignment():
    cols = ["item", "price"]
    s = [(1, Decimal("9.99995")), (2, Decimal("5.0000"))]
    d = [(2, 5.0), (1, 9.999949999)]  # order differs; boundary cell
    assert _compare_keyed_scaled(cols, s, cols, d, ("item",), 4) == []
    # a missing key is loud
    probs = _compare_keyed_scaled(
        cols, s, cols, [(1, 9.9999)], ("item",), 4
    )
    assert probs and "key sets differ" in probs[0]
    # a real per-key value error is loud
    probs = _compare_keyed_scaled(
        cols, s, cols, [(1, 9.97), (2, 5.0)], ("item",), 4
    )
    assert probs and "col price" in probs[0]


@pytest.mark.slow
def test_full_registry_parity_smoke_scale(spark, sf_dir):
    passed, rows_only, failed = run_parity(
        spark, sf_dir, verbose=False
    )
    assert not failed, "; ".join(f"{n}: {why[:200]}" for n, why in failed)
    # every oracle-backed query must actually have been compared, and
    # the rows-only set must be exactly the queries registered without
    # an oracle — a query silently falling out of hash comparison
    # (e.g. an oracle string dropped in a refactor) shows up here.
    from server_spark.registry import REGISTRY

    # value-oracle queries (declared-scale compare, r14) are VERIFIED
    # here even though the driver's raw-hash gate records them
    # rows-only — so they must land in `passed`, not `rows_only`
    no_oracle = {
        n for n, q in REGISTRY.items()
        if q.oracle is None and q.value_oracle is None
    }
    value_verified = {
        n for n, q in REGISTRY.items() if q.value_oracle is not None
    }
    assert value_verified <= set(passed)
    assert "a2d_price_stats_decimal" in value_verified
    assert len(passed) >= 80
    assert set(rows_only) == no_oracle
