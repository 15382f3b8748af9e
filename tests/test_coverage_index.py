"""The COVERAGE.md coverage-index appendix must match what
scripts/coverage_index.py generates from CORRECTNESS_r*.json + the
registry — a stale index is worse than none (it is the table a fresh
context trusts to audit coverage in one read). Pure-Python, no Spark.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_index_appendix_current():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import coverage_index

    buf = io.StringIO()
    with redirect_stdout(buf):
        coverage_index.main()
    generated = [l for l in buf.getvalue().splitlines() if l.startswith("|")]

    text = open(os.path.join(REPO, "COVERAGE.md"), encoding="utf-8").read()
    marker = "## Coverage index"
    assert marker in text, "coverage-index appendix missing from COVERAGE.md"
    appendix = text.split(marker, 1)[1]
    committed = [l for l in appendix.splitlines() if l.startswith("|")]
    assert committed == generated, (
        "COVERAGE.md coverage-index appendix is stale — regenerate with "
        "scripts/coverage_index.py"
    )
