"""Query registry: the single source of truth behind __spark_entry__.py.

Every operator deliverable from SURVEY.md §2 registers here as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) a DuckDB oracle SQL string. The driver
hash-compares the two at sf0.01; ``tests/test_oracle_parity.py`` runs
the same comparison locally.

Column-name discipline (driver contract): the comparator sorts columns
by name before hashing, so every computed column is aliased to the
SAME name in both the Spark callable and the oracle SQL.

Float discipline: double aggregation order differs between engines, so
sums of doubles are routed through exact decimal arithmetic
(``functions.exact.dsum``) and cast back to double — bitwise-equal in
Spark and DuckDB regardless of partitioning.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


class QueryRegistry:
    def __init__(self) -> None:
        self._specs: dict[str, QuerySpec] = {}

    def register(self, name: str, fn: QueryFn, oracle: str | None, doc: str = "") -> None:
        if name in self._specs:
            raise ValueError(f"duplicate query name: {name}")
        self._specs[name] = QuerySpec(name, fn, oracle, doc)

    def queries(self) -> dict[str, QueryFn]:
        return {n: s.fn for n, s in sorted(self._specs.items())}

    def oracle_sql(self) -> dict[str, str]:
        return {n: s.oracle for n, s in sorted(self._specs.items()) if s.oracle is not None}

    def specs(self) -> dict[str, QuerySpec]:
        return dict(sorted(self._specs.items()))


REGISTRY = QueryRegistry()


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def wrap(fn: QueryFn) -> QueryFn:
        REGISTRY.register(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


def load_all() -> QueryRegistry:
    """Import every module that registers queries (idempotent)."""
    # Imports are inside the function so that importing the package stays
    # cheap and circular imports are impossible.
    from spark_dynamodb_spark.operators import (  # noqa: F401
        aggregates,
        dedup,
        extras,
        joins,
        multimodal,
        relational,
        scalars,
        setops,
        similarity,
        text_analysis,
        udfs,
        windows,
    )
    from spark_dynamodb_spark.sources import dynamo_queries  # noqa: F401
    from spark_dynamodb_spark.streaming import stream_queries  # noqa: F401

    return REGISTRY
