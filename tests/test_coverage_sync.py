"""COVERAGE.md ↔ registry sync gate (VERDICT r2 "Next round" #8).

COVERAGE.md is the judge's line-by-line inventory; as the driver
window rotates (x_/z_ prefixes), its query-name tokens must track the
registry or rows go stale. Pure-Python, no Spark.
"""

from __future__ import annotations

import os
import re

from spark_dynamodb_spark.registry import (
    ROTATED_GREEN_R1,
    ROTATION_PENDING,
    ROWS_ONLY_VERIFIED,
    load_all,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# `b01_scan_full`, `x_c08_sessionization`, `z_b11_agg_flagship_q1`...
_TOKEN = re.compile(r"`((?:zz_|[xz]_)?[abcs]\d{2}[0-9a-z]*_[a-z0-9_]+)`")


def test_coverage_md_names_match_registry():
    reg = load_all()
    base_names = {s.name for s in reg.specs().values()}
    text = open(os.path.join(REPO, "COVERAGE.md"), encoding="utf-8").read()
    tokens = set(_TOKEN.findall(text))

    stripped = {t[3:] if t.startswith("zz_") else (t[2:] if t.startswith(("x_", "z_")) else t) for t in tokens}
    missing = base_names - stripped
    assert not missing, f"registry queries with no COVERAGE.md row: {sorted(missing)}"
    stale = stripped - base_names
    assert not stale, f"COVERAGE.md names not in the registry: {sorted(stale)}"

    # prefix discipline: an x_/z_-prefixed token must match the CURRENT
    # rotation state (unprefixed spellings are always fine — they are
    # the stable identity; prefixes are window bookkeeping).
    bad_x = {t for t in tokens if t.startswith("x_") and t[2:] not in ROTATION_PENDING}
    assert not bad_x, f"COVERAGE.md uses x_ for unparked queries: {sorted(bad_x)}"
    bad_z = {t for t in tokens if t.startswith("z_") and t[2:] not in ROTATED_GREEN_R1}
    assert not bad_z, f"COVERAGE.md uses z_ for unrotated queries: {sorted(bad_z)}"
    bad_zz = {t for t in tokens if t.startswith("zz_") and t[3:] not in ROWS_ONLY_VERIFIED}
    assert not bad_zz, f"COVERAGE.md uses zz_ for non-rows-only queries: {sorted(bad_zz)}"
