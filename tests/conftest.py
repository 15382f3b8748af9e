from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from spark_dynamodb_spark.session import get_spark

    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # Default sf0.001 keeps the suite fast; the driver checks at
    # sf0.01, and data-dependent float near-ties CAN differ between
    # the two (c45's round() tie appeared only at sf0.01). Before
    # shipping new oracle entries, re-run at driver scale:
    #   SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 \
    #     python -m pytest tests/test_oracle_parity.py
    return os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMALL)
