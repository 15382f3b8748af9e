"""Run every registered query against its DuckDB oracle at sf0.001 —
the same check the driver performs at sf0.01 (BASELINE.md t2)."""

from __future__ import annotations

import pytest

from spark_dynamodb_spark.registry import load_all

from .parity import compare, duck_connect

SPECS = load_all().specs()
WITH_ORACLE = [n for n, s in SPECS.items() if s.oracle is not None]
ROWS_ONLY = [n for n, s in SPECS.items() if s.oracle is None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, duck, name):
    from spark_dynamodb_spark.maintenance import release_cached

    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    problems = compare(name, df, spec.oracle, duck)
    # each query call mints fresh localCheckpoints; release them so a
    # 340-entry sweep doesn't accumulate executor storage (VERDICT r11
    # #7 — observed as transient collectToPython failures late in
    # long multi-query sessions)
    release_cached(spark)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    from spark_dynamodb_spark.maintenance import release_cached

    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
    release_cached(spark)
