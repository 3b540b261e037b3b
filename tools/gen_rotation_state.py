"""Regenerate ushas_spark/rotation_state.py from the CORRECTNESS_r*.json files.

The driver's correctness gate walks ``registry.queries()`` in registration
order and covers a ~50-name prefix per round. The walk order therefore
encodes the verification strategy; since round 9 it is derived, not
hand-maintained: this tool scans every committed ``CORRECTNESS_r{N}.json``
in the repo root, records for each query the LATEST round in which it went
green, and writes the map into ``ushas_spark/rotation_state.py``. The
registry sorts driver-green queries oldest-evidence-first, so the gate
re-certifies the stalest ~50 rows every round and the whole registry
rolls over every ~8 rounds forever with zero bookkeeping edits.

Green means: ``hash_match`` true (full oracle row), or the by-design
rows-only marker (``err == "no_oracle"`` with a non-null spark row count).
Anything else is a RED row -- reported loudly, never folded.

Usage:  python tools/gen_rotation_state.py   (from the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "ushas_spark", "rotation_state.py")

HEADER = '''"""Driver-evidence ages -- GENERATED, do not edit by hand.

Regenerate with ``python tools/gen_rotation_state.py`` after each round's
``CORRECTNESS_r{{N}}.json`` lands (tests/test_registry.py asserts this file
matches the JSON evidence on disk). Maps each registered query to the
latest round whose driver CORRECTNESS row was green; the registry sorts
greens oldest-round-first so the gate's ~50-slot prefix re-certifies the
stalest evidence every round.
"""

# Derived from: {files}

GREEN_LAST_ROUND: dict[str, int] = {{
'''


def is_green(row: dict) -> bool:
    if row.get("hash_match"):
        return True
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


# Adjudicated RED rows, name -> (last_covered_round, why): harness-level
# failures (never wrong answers) whose in-repo fix has landed but whose
# green re-sample can only arrive in a FUTURE round's CORRECTNESS file
# (the driver owns the gate). The adjudication covers red rows up to and
# including ``last_covered_round`` ONLY -- a red in a newer round means
# the fix did not work and scans loud again. Each entry must (a) cite the
# fix, (b) stay head-pinned in registry._PRIORITY_NAMES so the next gate
# re-samples it first (tests/test_registry.py enforces this), and (c) be
# DELETED the moment a later green row lands -- a stale entry turns back
# into a loud scan error so the next rotation fold cannot forget the
# cleanup.
EXPECTED_RED: dict[str, tuple[int, str]] = {
    # (empty since r11: expr_xpath_url_battery's green rows-only row
    # landed in CORRECTNESS_r10.json, retiring the r09 adjudication.)
}


def folded_files() -> list[str]:
    """The evidence files recorded in the generated file's header.

    The driver writes each round's CORRECTNESS_r{N}.json AFTER the
    builder's last commit, so at judge time there is always one evidence
    file NEWER than anything rotation_state.py could have folded. The
    header's file list lets the hygiene test distinguish that expected
    pending round from genuine regeneration staleness."""
    if not os.path.exists(OUT):
        return []
    with open(OUT, encoding="utf-8") as fh:
        for line in fh:
            if line.startswith("# Derived from:"):
                return [
                    s.strip()
                    for s in line.split(":", 1)[1].split(",")
                    if s.strip()
                ]
    return []


def scan(
    only: set[str] | None = None,
) -> tuple[dict[str, int], dict[str, str], dict[str, str], list[str]]:
    """Returns (green_last_round, red, expected_red_hits, files).

    ``red`` is actionable breakage: unadjudicated red rows with no later
    green, plus stale EXPECTED_RED entries (their green landed -- delete
    them). ``expected_red_hits`` are the adjudicated reds still awaiting
    their driver re-sample; reported loudly, but they do not fail the
    scan. ``only`` restricts the scan to the named evidence files (used
    by the hygiene test to replay exactly the folded set)."""
    last: dict[str, int] = {}
    red: dict[str, str] = {}
    red_rnd: dict[str, int] = {}
    # Anchored + walrus-guarded like bench.py's round inference: a stray
    # non-numeric-stamped file (CORRECTNESS_rerun.json) or a backup copy
    # (CORRECTNESS_r08_backup.json) must be SKIPPED, never crash the scan
    # or masquerade as round evidence.
    stamped = sorted(
        (int(m.group(1)), p)
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"^CORRECTNESS_r(\d+)\.json$", os.path.basename(p)))
        and (only is None or os.path.basename(p) in only)
    )
    files = [p for _, p in stamped]
    for rnd, path in stamped:
        with open(path, encoding="utf-8") as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if is_green(row):
                last[name] = rnd
                red.pop(name, None)
                red_rnd.pop(name, None)
            else:
                red[name] = (
                    f"r{rnd:02d}: err={row.get('err')!r} "
                    f"rows={row.get('rows_match')} hash={row.get('hash_match')}"
                )
                red_rnd[name] = rnd
    expected: dict[str, str] = {}
    for name, (covered_rnd, why) in EXPECTED_RED.items():
        if name in red and red_rnd[name] <= covered_rnd:
            expected[name] = red.pop(name)
        elif name in red:
            # A red row NEWER than the adjudication: the claimed fix did
            # not land -- scream, don't tolerate.
            red[name] = (
                f"red row newer than its EXPECTED_RED adjudication "
                f"(covers <= r{covered_rnd:02d}) -- the fix did not work: "
                + red[name]
            )
        else:
            # The adjudicated red either greened in a later round or never
            # had a red row at all -- either way the allowlist entry is
            # stale and must go, loudly.
            red[name] = (
                "STALE EXPECTED_RED entry (no red row without a later "
                "green) -- delete it from tools/gen_rotation_state.py: "
                + why
            )
    return last, red, expected, [os.path.basename(p) for p in files]


def render(last: dict[str, int], files: list[str]) -> str:
    body = HEADER.format(files=", ".join(files))
    for name in sorted(last):
        body += f'    "{name}": {last[name]},\n'
    return body + "}\n"


def main() -> int:
    last, red, expected, files = scan()
    text = render(last, files)
    old = open(OUT, encoding="utf-8").read() if os.path.exists(OUT) else ""
    if text != old:
        with open(OUT, "w", encoding="utf-8") as fh:
            fh.write(text)
        print(f"wrote {OUT} ({len(last)} green names from {len(files)} rounds)")
    else:
        print(f"{OUT} unchanged ({len(last)} green names)")
    if expected:
        print("\nADJUDICATED red rows awaiting their driver re-sample "
              "(EXPECTED_RED; keep head-pinned):")
        for name, why in sorted(expected.items()):
            print(f"  {name}: {why}")
            print(f"    adjudication: {EXPECTED_RED[name][1]}")
    if red:
        print("\nRED rows with no later green -- fix before anything else:")
        for name, why in sorted(red.items()):
            print(f"  {name}: {why}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
