#!/usr/bin/env python
"""Driver-window rotation helper (run at round start).

The driver's correctness gate records the first 50 registry names in
lexical order (COVERAGE.md "Driver-window note"). After a round comes
back green, the window must rotate: proven names move behind ``z_``
(``ROTATED_GREEN_R1``) and the next batch of parked ``x_`` names
(``ROTATION_PENDING``) unparks to fill the 50 slots. Doing that by
hand across two frozenset literals is exactly the kind of mechanical
edit that eats an hour and invites typos — this script rewrites
``registry.py`` from the round's ``CORRECTNESS_r{N}.json``:

    python scripts/rotate_window.py --correctness CORRECTNESS_r04.json
    python scripts/rotate_window.py --correctness ... --dry-run

Rules:
- a window entry rotates to z_ iff its row is green (hash_match true,
  or rows_match true with no error for rows-only entries);
- a red/erred window entry stays UNPREFIXED (it must be re-proven);
- parked names unpark in lexical order until the window holds
  ``--window`` unprefixed names (fewer if the parking set runs dry).

After running: `python -m pytest tests/test_properties.py
tests/test_coverage_sync.py -q` — the coverage-sync gate will flag
every COVERAGE.md prefix that needs the matching x_ → bare / bare →
z_ spelling update.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY = os.path.join(REPO, "spark_dynamodb_spark", "registry.py")

_ROTATED_RE = re.compile(
    r"(ROTATED_GREEN_R1 = frozenset\(\n    \{\n)(.*?)(    \}\n\))", re.S
)
_PENDING_RE = re.compile(
    r"(ROTATION_PENDING: frozenset\[str\] = frozenset\(\n    \{\n)(.*?)(    \}\n\))",
    re.S,
)


def _parse_set(block: str) -> set[str]:
    return set(re.findall(r'"([^"]+)"', block))


def _format_set(names: set[str]) -> str:
    return "".join(f'        "{n}",\n' for n in sorted(names))


def green_names(correctness: dict) -> set[str]:
    out = set()
    for name, row in correctness.items():
        if row.get("err"):
            continue
        if row.get("hash_match") or (
            row.get("rows_match") and "hash_match" not in row
        ) or (row.get("rows_match") and row.get("hash_match") is None):
            out.add(name[3:] if name.startswith("zz_") else (name[2:] if name.startswith(("x_", "z_")) else name))
    return out


def plan_rotation(
    src: str, greens: set[str], window: int
) -> tuple[set[str], set[str], dict]:
    rotated = _parse_set(_ROTATED_RE.search(src).group(2))
    pending = _parse_set(_PENDING_RE.search(src).group(2))
    all_names = set(
        re.findall(r'^\s{4}"([a-z]\d{2}[0-9a-z]*_[a-z0-9_]+)",?$', src, re.M)
    )
    # names currently unprefixed = registered minus both rotation sets;
    # the source file only lists the sets, so derive the window from
    # the registry itself when importable, else from the caller.
    sys.path.insert(0, REPO)
    from spark_dynamodb_spark.registry import load_all

    specs = load_all().specs()
    # zz_ (ROWS_ONLY_VERIFIED) entries are permanently parked — they can
    # never hash-match and never rotate through these sets.
    unprefixed = {n for n in specs if not n.startswith(("x_", "z_", "zz_"))}

    to_rotate = {n for n in unprefixed if n in greens}
    stay_red = unprefixed - to_rotate
    new_rotated = rotated | to_rotate
    free_slots = max(0, window - len(stay_red))
    unpark = set(sorted(pending)[:free_slots])
    new_pending = pending - unpark
    info = {
        "window_green_rotating": sorted(to_rotate),
        "window_red_staying": sorted(stay_red),
        "unparking": sorted(unpark),
        "still_parked": len(new_pending),
        "new_window_size": len(stay_red) + len(unpark),
    }
    return new_rotated, new_pending, info


def rewrite(src: str, rotated: set[str], pending: set[str]) -> str:
    src = _ROTATED_RE.sub(
        lambda m: m.group(1) + _format_set(rotated) + m.group(3), src
    )
    src = _PENDING_RE.sub(
        lambda m: m.group(1) + _format_set(pending) + m.group(3), src
    )
    return src


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--correctness", required=True)
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    with open(args.correctness, encoding="utf-8") as f:
        greens = green_names(json.load(f))
    src = open(REGISTRY, encoding="utf-8").read()
    rotated, pending, info = plan_rotation(src, greens, args.window)
    print(json.dumps(info, indent=2))
    if args.dry_run:
        return
    open(REGISTRY, "w", encoding="utf-8").write(rewrite(src, rotated, pending))
    print(f"rewrote {REGISTRY}; now update COVERAGE.md prefixes and run "
          f"tests/test_coverage_sync.py + tests/test_properties.py")


if __name__ == "__main__":
    main()
