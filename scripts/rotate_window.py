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
- ``--keep a,b,c`` names stay UNPREFIXED even when green — the
  un-rotation discipline for entries whose implementation (or a
  shared code path) changed this round;
- parked names unpark in lexical order until the window holds
  ``--window`` unprefixed names (fewer if the parking set runs dry);
- STALEST-FIRST SPILL (VERDICT r14 "What's wrong" #1): when the
  parking set runs dry and slots remain, the spill is no longer left
  to the driver's lexical z_ order (which re-verifies the SAME
  z_a*/z_b* names every round while z_c99-class entries never earn a
  fresh row). Instead the script UN-rotates the rotated-green entries
  whose last REAL driver row is OLDEST (age from CORRECTNESS_r*.json;
  ties lexical), so every entry cycles through a real driver row
  about every ceil(375/50) ≈ 8 rounds.

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


def last_green_rounds(repo: str = REPO) -> dict[str, int]:
    """base name -> the LAST round whose driver row was green (hash,
    or rows-only-green for no-oracle entries). This is the staleness
    metric for the spill: the smaller the round, the longer since the
    entry earned a real driver row."""
    import glob

    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r0*(\d+)\.json$", path).group(1))
        with open(path, encoding="utf-8") as f:
            rows = json.load(f)
        for name, row in rows.items():
            if name.startswith("zz_diag_"):
                base = name[8:]
            elif name.startswith("zz_"):
                base = name[3:]
            elif name.startswith(("x_", "z_")):
                base = name[2:]
            else:
                base = name
            # Same green semantics as green_names (code-review r15): a
            # hash MISMATCH with matching row counts is RED — counting
            # it green would refresh the entry's staleness and make
            # the spill skip exactly the entry that needs re-proving.
            green = (
                row.get("hash_match")
                or (row.get("rows_match") and "hash_match" not in row and not row.get("err"))
                or (row.get("rows_match") and row.get("hash_match") is None and not row.get("err"))
                or (
                    row.get("err") == "no_oracle"
                    and (row.get("spark_rows") or 0) > 0
                )
            )
            if green:
                out[base] = max(out.get(base, 0), rnd)
    return out


def plan_rotation(
    src: str,
    greens: set[str],
    window: int,
    keep: frozenset[str] = frozenset(),
    ages: dict[str, int] | None = None,
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

    # --keep exists to hold CHANGED entries in the window; a typo'd or
    # stale name silently rotating away would defeat exactly that
    # discipline (code-review r15), so unknown names are a hard error.
    unknown_keep = keep - unprefixed
    if unknown_keep:
        raise ValueError(
            "--keep names not in the current unprefixed window: "
            f"{sorted(unknown_keep)}"
        )

    to_rotate = {n for n in unprefixed if n in greens and n not in keep}
    stay = unprefixed - to_rotate  # red/erred + explicitly kept
    new_rotated = rotated | to_rotate
    free_slots = max(0, window - len(stay))
    unpark = set(sorted(pending)[:free_slots])
    new_pending = pending - unpark
    # stalest-first spill: parking ran dry and slots remain — cycle
    # the oldest-proven z_ greens back through the window (names
    # rotated THIS run are by definition the freshest; exclude them)
    unrotate: list[str] = []
    spare = free_slots - len(unpark)
    if spare > 0 and ages is not None:
        candidates = sorted(
            new_rotated - to_rotate, key=lambda n: (ages.get(n, 0), n)
        )
        unrotate = candidates[:spare]
        new_rotated -= set(unrotate)
    info = {
        "window_green_rotating": sorted(to_rotate),
        "window_red_staying": sorted(stay - keep),
        "window_kept": sorted(stay & keep),
        "unparking": sorted(unpark),
        "unrotating_stalest": unrotate,
        "still_parked": len(new_pending),
        "new_window_size": len(stay) + len(unpark) + len(unrotate),
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
    ap.add_argument(
        "--keep",
        default="",
        help="comma-separated names that stay unprefixed even when "
        "green (implementation changed this round)",
    )
    ap.add_argument(
        "--no-stalest-spill",
        action="store_true",
        help="disable the stalest-first z_ un-rotation refill",
    )
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    with open(args.correctness, encoding="utf-8") as f:
        greens = green_names(json.load(f))
    keep = frozenset(n for n in args.keep.split(",") if n)
    ages = None if args.no_stalest_spill else last_green_rounds()
    src = open(REGISTRY, encoding="utf-8").read()
    rotated, pending, info = plan_rotation(
        src, greens, args.window, keep=keep, ages=ages
    )
    print(json.dumps(info, indent=2))
    if args.dry_run:
        return
    open(REGISTRY, "w", encoding="utf-8").write(rewrite(src, rotated, pending))
    print(f"rewrote {REGISTRY}; now update COVERAGE.md prefixes and run "
          f"tests/test_coverage_sync.py + tests/test_properties.py")


if __name__ == "__main__":
    main()
