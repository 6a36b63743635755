"""Registry-wide oracle parity as a pytest gate (slow).

The external driver hash-verifies only the first 50 registry entries;
this test runs the SAME comparison over EVERY registered query at
sf0.001, so late/post-window queries are value-verified on every
change too (scripts/check_parity.py runs the identical gate at
sf0.01 from the CLI).
"""

from __future__ import annotations

import pytest

from server_spark.parity_check import run_parity


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

    no_oracle = {n for n, q in REGISTRY.items() if q.oracle is None}
    assert len(passed) >= 80
    assert set(rows_only) == no_oracle
