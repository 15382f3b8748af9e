#!/usr/bin/env python
"""Generate the one-table coverage index (VERDICT r7 "Next round" #1):

    registry name -> COVERAGE.md row label -> first green driver round

Reads every CORRECTNESS_r*.json in the repo root plus COVERAGE.md and
prints a markdown table ready to paste into COVERAGE.md's "Coverage
index" appendix (tests/test_coverage_index.py pins the committed
appendix to this script's output, so regenerate after every rotation
or registry change):

    python scripts/coverage_index.py > /tmp/index.md

Round pin (VERDICT r9 "What's wrong" #1): the driver writes
CORRECTNESS_r{N}.json AFTER the builder's last commit of round N, so
an unpinned generator would read newer artifacts than the committed
appendix and the pinning test would go red at judging time through no
fault of the appendix. The generated table therefore records the max
round it consumed in a `<!-- coverage-index-pin: rN -->` line, and the
test replays generation AT THAT PIN — driver artifacts from rounds
greater than the pin are ignored by the comparison, so a
freshly-written CORRECTNESS file can never fail the committed
appendix. Regenerating (which advances the pin) folds them in.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_TOKEN = re.compile(r"`((?:zz_diag_|zz_|[xz]_)?[abcs]\d{2}[0-9a-z]*_[a-z0-9_]+)`")


def strip(n: str) -> str:
    if n.startswith("zz_diag_"):
        return n[8:]
    return n[3:] if n.startswith("zz_") else (n[2:] if n.startswith(("x_", "z_")) else n)


def max_round_present() -> int:
    """Highest round number with a CORRECTNESS artifact on disk."""
    rounds = [
        int(re.search(r"_r0*(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    return max(rounds) if rounds else 0


def first_green_rounds(pin: int | None = None) -> dict[str, str]:
    """name -> 'rN' of the first driver round whose row was green
    (hash_match, or rows_match with no error for rows-only).
    Rounds greater than `pin` (if given) are ignored."""
    hash_green: dict[str, str] = {}
    rows_green: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = re.search(r"_r0*(\d+)\.json$", path).group(1)
        if pin is not None and int(rnd) > pin:
            continue
        with open(path, encoding="utf-8") as f:
            rows = json.load(f)
        for name, row in rows.items():
            base = strip(name)
            if row.get("hash_match") or (row.get("rows_match") and not row.get("err")):
                hash_green.setdefault(base, f"r{rnd}")
            elif row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0:
                # the driver's weaker rows check ran and produced
                # rows; counts as green only if no later round
                # hash-proved the entry (rows-only-by-construction)
                rows_green.setdefault(base, f"r{rnd} (rows-only)")
    return {**rows_green, **hash_green}


def coverage_rows() -> dict[str, str]:
    """name -> the '#' label of the COVERAGE.md table row listing it."""
    out: dict[str, str] = {}
    with open(os.path.join(REPO, "COVERAGE.md"), encoding="utf-8") as f:
        for line in f:
            if not line.startswith("|"):
                continue
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            if len(cells) < 2 or cells[0] in ("#", "---", ""):
                continue
            if set(cells[0]) <= {"-", " "}:
                continue
            label = cells[0]
            for tok in _TOKEN.findall(line):
                out.setdefault(strip(tok), label)
    return out


def main(pin: int | None = None) -> None:
    sys.path.insert(0, REPO)
    from spark_dynamodb_spark.registry import load_all

    if pin is None:
        pin = max_round_present()
    greens = first_green_rounds(pin)
    labels = coverage_rows()
    names = sorted({strip(n) for n in load_all().specs()})
    print(f"<!-- coverage-index-pin: r{pin} -->")
    print("| registry name | COVERAGE row | first green driver round |")
    print("| --- | --- | --- |")
    missing_label = []
    for n in names:
        lab = labels.get(n)
        if lab is None:
            missing_label.append(n)
            lab = "?"
        print(f"| `{n}` | {lab} | {greens.get(n, 'pending (added this round)')} |")
    if missing_label:
        print(
            f"\nWARNING: no COVERAGE.md row found for: {missing_label}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
