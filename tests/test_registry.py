"""Registry hygiene: the driver-facing walk order stays consistent.

The rotation ritual (fold CORRECTNESS greens into _DRIVER_GREEN, reorder
_MODULE_ORDER each round) edits hand-maintained name sets; these checks
catch the failure modes of that ritual -- a typo'd or stale name, a
module missing from the order list, or a rows-only query drifting
forward where it would burn a driver slot.
"""

from __future__ import annotations

from ushas_spark import registry

registry.load_all()


def test_driver_green_names_exist():
    stale = registry._DRIVER_GREEN - set(registry.QUERIES)
    assert not stale, f"_DRIVER_GREEN names not in registry: {sorted(stale)}"


def test_rows_only_tail_names_exist_and_lack_oracles():
    stale = registry._ROWS_ONLY_TAIL - set(registry.QUERIES)
    assert not stale, f"_ROWS_ONLY_TAIL names not in registry: {sorted(stale)}"
    oracled = registry._ROWS_ONLY_TAIL & set(registry.ORACLE)
    assert not oracled, (
        f"rows-only-tail queries now have oracles -- unpark them: {sorted(oracled)}"
    )


def test_every_oracle_has_a_query():
    orphans = set(registry.ORACLE) - set(registry.QUERIES)
    assert not orphans


def test_all_no_oracle_queries_are_parked():
    missing = set(registry.QUERIES) - set(registry.ORACLE)
    unparked = missing - registry._ROWS_ONLY_TAIL
    assert not unparked, (
        "queries without oracles must be in _ROWS_ONLY_TAIL (or gain an "
        f"oracle): {sorted(unparked)}"
    )


def test_rows_only_queries_sort_last():
    names = list(registry.QUERIES)
    tail = names[-len(registry._ROWS_ONLY_TAIL):]
    assert set(tail) == registry._ROWS_ONLY_TAIL


def test_never_checked_queries_sort_before_greens():
    names = list(registry.QUERIES)
    seen_green = False
    for n in names:
        if n in registry._ROWS_ONLY_TAIL:
            continue
        if n in registry._DRIVER_GREEN:
            seen_green = True
        else:
            assert not seen_green, (
                f"never-checked query {n!r} sorts behind a driver-green one; "
                "the gate's ~50-slot prefix would re-check proven queries"
            )


def test_all_registering_modules_have_an_order_entry():
    mods = {
        getattr(fn, "__module__", "") for fn in registry.QUERIES.values()
    }
    missing = mods - set(registry._MODULE_ORDER)
    assert not missing, (
        f"modules registering queries but absent from _MODULE_ORDER "
        f"(they fall to the back unordered): {sorted(missing)}"
    )


def test_defer_new_names_exist_and_are_not_green():
    stale = registry._DEFER_NEW - set(registry.QUERIES)
    assert not stale, f"_DEFER_NEW names not in registry: {sorted(stale)}"
    greened = registry._DEFER_NEW & registry._DRIVER_GREEN
    assert not greened, (
        f"_DEFER_NEW queries are driver-green -- drop them from the defer "
        f"set during rotation: {sorted(greened)}"
    )
