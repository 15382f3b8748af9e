"""Fixture-drift tripwire (VERDICT r2 "Next round" #2).

The driver regenerated the fixtures at round-2 start and silently
changed ``events.ts`` from timestamp[ns] to timestamp[us]; every red
round-2 correctness row traced to that one drift. This test pins
FIXTURES.md's measured schema tables to the actual parquet footers at
EVERY scale factor, so the next regeneration fails loudly here instead
of corrupting results downstream.

No Spark needed — pure pyarrow footer reads, so it runs in <1s.
"""

from __future__ import annotations

import os
import re

import pyarrow.parquet as pq
import pytest

from spark_dynamodb_spark.tables import TABLE_NAMES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES_MD = os.path.join(REPO, "FIXTURES.md")
SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

# "### lineitem (6,000 rows @ sf0.001) — fact" → table name
_HEADER = re.compile(r"^### (\w+) \(")
_ROW = re.compile(r"^\| *([A-Za-z_][\w]*) *\| *([^|]+?) *\|")


def parse_fixtures_md() -> dict[str, list[tuple[str, str]]]:
    """FIXTURES.md's measured schema tables → {table: [(col, type)]}."""
    tables: dict[str, list[tuple[str, str]]] = {}
    current: str | None = None
    for line in open(FIXTURES_MD, encoding="utf-8"):
        m = _HEADER.match(line)
        if m:
            current = m.group(1) if m.group(1) in TABLE_NAMES else None
            continue
        if current is None:
            continue
        m = _ROW.match(line)
        if not m or m.group(1) in ("column",):
            continue
        tables.setdefault(current, []).append((m.group(1), m.group(2).strip()))
    return tables


def arrow_type_str(t) -> str:
    """pyarrow type → the spelling FIXTURES.md uses.

    str(list<element: float>) → list<float> (pyarrow names the child
    field "item" or "element" depending on writer); everything else
    matches pyarrow's own rendering (int64, double, string,
    timestamp[us]...).
    """
    return str(t).replace("item: ", "").replace("element: ", "")


def test_testdata_present():
    """The tripwire is meaningless if it silently collects nothing:
    at least one driver fixture directory must exist (the schema
    tests below parametrize over SF_DIRS and would vanish quietly)."""
    assert SF_DIRS, "no /root/testdata/sf* directories found — fixture tripwire cannot run"


def test_fixtures_md_documents_all_tables():
    doc = parse_fixtures_md()
    assert sorted(doc) == sorted(TABLE_NAMES), (
        "FIXTURES.md must document every fixture table",
        sorted(set(TABLE_NAMES) - set(doc)),
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", TABLE_NAMES)
def test_fixture_schema_matches_doc(sf_dir: str, name: str):
    """The parquet footer at each sf matches FIXTURES.md column-for-
    column, type-for-type (names ordered as on disk)."""
    doc = parse_fixtures_md()[name]
    schema = pq.read_schema(os.path.join(sf_dir, f"{name}.parquet"))
    actual = [(f.name, arrow_type_str(f.type)) for f in schema]
    assert actual == doc, (
        f"{name} @ {sf_dir}: parquet footer drifted from FIXTURES.md "
        f"(regenerated fixtures?) — update FIXTURES.md AND re-verify "
        f"every operator that touches the changed columns",
        actual,
        doc,
    )
