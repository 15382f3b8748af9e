"""The COVERAGE.md coverage-index appendix must match what
scripts/coverage_index.py generates from CORRECTNESS_r*.json + the
registry — a stale index is worse than none (it is the table a fresh
context trusts to audit coverage in one read). Pure-Python, no Spark.

The comparison replays generation AT THE APPENDIX'S RECORDED PIN
(`<!-- coverage-index-pin: rN -->`), so a CORRECTNESS_r{N+1}.json the
driver writes after the round's last commit cannot fail the committed
appendix (VERDICT r9 "What's wrong" #1 — the design race is closed by
construction, not by regenerating faster).
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_index_appendix_current():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import coverage_index

    text = open(os.path.join(REPO, "COVERAGE.md"), encoding="utf-8").read()
    marker = "## Coverage index"
    assert marker in text, "coverage-index appendix missing from COVERAGE.md"
    appendix = text.split(marker, 1)[1]
    pin_m = re.search(r"<!-- coverage-index-pin: r(\d+) -->", appendix)
    assert pin_m, (
        "coverage-index appendix has no round pin — regenerate with "
        "scripts/coverage_index.py"
    )
    pin = int(pin_m.group(1))

    buf = io.StringIO()
    with redirect_stdout(buf):
        coverage_index.main(pin=pin)
    generated = [l for l in buf.getvalue().splitlines() if l.startswith("|")]

    committed = [l for l in appendix.splitlines() if l.startswith("|")]
    assert committed == generated, (
        "COVERAGE.md coverage-index appendix is stale — regenerate with "
        "scripts/coverage_index.py"
    )
