"""Registry rotation helper: fold a round's CORRECTNESS file into the
walk-order bookkeeping.

Usage:  python tools/rotation.py CORRECTNESS_r04.json [...]

Reads one or more driver CORRECTNESS files, reports which checked queries
went green (hash_match, or rows-only with no error) vs red, and prints
ready-to-paste updates for ushas_spark/registry.py:

- the new names to add to _DRIVER_GREEN,
- _DEFER_NEW names that are now green (drop them from the defer set),
- red rows needing investigation before anything else,
- the count of still-never-checked queries remaining.

The hygiene suite (tests/test_registry.py) then enforces that the edit
was applied consistently.
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ushas_spark import registry  # noqa: E402


def main(paths: list[str]) -> None:
    registry.load_all()
    green: set[str] = set()
    red: dict[str, str] = {}
    for path in paths:
        with open(path, encoding="utf-8") as fh:
            rows = json.load(fh)
        for name, r in rows.items():
            if r.get("err"):
                red[name] = f"err: {r['err'][:100]}"
            elif r.get("hash_match") or (
                r.get("rows_match") and "hash_match" not in r
            ):
                green.add(name)
            else:
                red[name] = (
                    f"rows={r.get('rows_match')} schema={r.get('schema_match')}"
                    f" hash={r.get('hash_match')}"
                )

    new_green = sorted(green - registry._DRIVER_GREEN)
    greened_defer = sorted(green & registry._DEFER_NEW)
    never = [
        n
        for n in registry.QUERIES
        if n not in registry._DRIVER_GREEN
        and n not in green
        and n not in registry._ROWS_ONLY_TAIL
    ]

    print(f"checked: {sum(1 for _ in green) + len(red)}  "
          f"green: {len(green)}  red: {len(red)}")
    if red:
        print("\nRED rows (fix before rotating):")
        for n, why in sorted(red.items()):
            print(f"  {n}: {why}")
    print(f"\nAdd to _DRIVER_GREEN ({len(new_green)} names):")
    body = ", ".join(f'"{n}"' for n in new_green)
    print(textwrap.fill(body, 76, initial_indent="    ",
                        subsequent_indent="    "))
    if greened_defer:
        print(f"\nDrop from _DEFER_NEW (now green): {greened_defer}")
    greened_priority = sorted(green & set(registry._PRIORITY_NAMES))
    if greened_priority:
        print(f"\nDelete from _PRIORITY_NAMES (now green, {len(greened_priority)}):")
        for n in greened_priority:
            print(f"  {n}")
    print(f"\nStill never driver-checked after this fold: {len(never)}")
    for n in never:
        print(f"  {n}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1:])
