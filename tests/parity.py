"""Local replica of the driver's correctness gate.

Runs each registered Spark query and its DuckDB oracle over the same
parquet fixtures and compares row count + column names + order-
insensitive canonical values. Stricter than a hash: on mismatch it
prints the first differing rows.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import duckdb

from spark_dynamodb_spark.tables import TABLE_NAMES, table_path

FLOAT_SIG = 12  # significant digits for float canonicalization


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(v: Any) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.{FLOAT_SIG}g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    if hasattr(v, "tolist"):  # numpy array
        return _canon(v.tolist())
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i].lower() for i in order]
    out = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return names, out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    return list(df.columns), [tuple(r) for r in df.collect()]


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(name: str, spark_df, oracle: str, con) -> list[str]:
    """Return a list of problem strings (empty = pass)."""
    problems: list[str] = []
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duck_result(con, oracle)
    sc, sr = canonical_rows(s_cols, s_rows)
    dc, dr = canonical_rows(d_cols, d_rows)
    if sc != dc:
        problems.append(f"{name}: column mismatch spark={sc} duck={dc}")
        return problems
    if len(sr) != len(dr):
        problems.append(f"{name}: row count spark={len(sr)} duck={len(dr)}")
    diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
    if diffs:
        a, b = diffs[0]
        cells = [(c, x, y) for c, x, y in zip(sc, a, b) if x != y]
        problems.append(
            f"{name}: {len(diffs)}/{len(sr)} differing rows; first diff cells: {cells[:4]}"
        )
    return problems
