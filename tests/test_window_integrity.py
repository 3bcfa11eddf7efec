"""The driver hard-checks the FIRST 50 entries of queries() — a typo in
DRIVER_WINDOW or DEFERRED_TO_NEXT_WINDOW would silently drop a slot (
window_ordered skips unknown names). Pin the invariants."""

from __future__ import annotations

from hiveberg_spark import registry

registry.load_all()


def test_driver_window_is_exactly_50_known_names():
    assert len(registry.DRIVER_WINDOW) == 50
    missing = [n for n in registry.DRIVER_WINDOW if n not in registry.QUERIES]
    assert not missing, missing
    assert len(set(registry.DRIVER_WINDOW)) == 50


def test_deferred_names_known_and_disjoint_from_window():
    missing = [
        n for n in registry.DEFERRED_TO_NEXT_WINDOW if n not in registry.QUERIES
    ]
    assert not missing, missing
    assert not set(registry.DRIVER_WINDOW) & set(
        registry.DEFERRED_TO_NEXT_WINDOW
    )
    assert len(set(registry.DEFERRED_TO_NEXT_WINDOW)) == len(
        registry.DEFERRED_TO_NEXT_WINDOW
    )


def test_every_query_is_oracle_backed():
    assert set(registry.QUERIES) == set(registry.ORACLES)


def test_window_ordered_puts_window_first():
    ordered = list(registry.window_ordered(dict(registry.QUERIES)))
    assert ordered[:50] == registry.DRIVER_WINDOW
