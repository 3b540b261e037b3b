"""Registry rotation: fold a round's CORRECTNESS evidence into the walk order.

Usage:  python tools/rotation.py [CORRECTNESS_rNN.json ...]

Since round 9 the walk order is DERIVED: this tool regenerates
``ushas_spark/rotation_state.py`` from every ``CORRECTNESS_r*.json`` in
the repo root (the file arguments are accepted for workflow compatibility
but the scan always covers all rounds), then reports:

- RED rows with no later green (fix before anything else -- would be the
  first ever),
- names still never driver-checked (they walk first automatically),
- the staleness profile of the green evidence (which rounds the next
  gate's ~50-slot prefix will re-certify).

Manual steps that remain: clear greened names out of _PRIORITY_NAMES /
_DEFER_NEW in ushas_spark/registry.py (the hygiene suite flags leftovers).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gen_rotation_state as gen  # noqa: E402


def main() -> int:
    rc = gen.main()  # regenerates rotation_state.py, prints RED rows

    # Reload the (possibly rewritten) state before importing the registry.
    import importlib

    import ushas_spark.rotation_state as state
    importlib.reload(state)
    from ushas_spark import registry
    importlib.reload(registry)
    registry.load_all()

    last = state.GREEN_LAST_ROUND
    never = [
        n for n in registry.QUERIES
        if n not in last and n not in registry._ROWS_ONLY_TAIL
    ]
    print(f"\nregistered: {len(registry.QUERIES)}  green: {len(last)}  "
          f"never-checked: {len(never)}")
    if never:
        for n in never:
            print(f"  never: {n}")
    profile = Counter(last[n] for n in last)
    print("evidence age profile (round -> names):",
          dict(sorted(profile.items())))
    head = [n for n in registry.QUERIES][:50]
    head_rounds = Counter(
        f"r{last[n]:02d}" if n in last else "never" for n in head
    )
    print("next gate's ~50-slot prefix re-certifies:",
          dict(sorted(head_rounds.items())))
    greened_priority = sorted(set(last) & set(registry._PRIORITY_NAMES))
    if greened_priority:
        print(f"\nDelete from _PRIORITY_NAMES (now green): {greened_priority}")
    greened_defer = sorted(set(last) & registry._DEFER_NEW)
    if greened_defer:
        print(f"Drop from _DEFER_NEW (now green): {greened_defer}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
