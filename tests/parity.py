"""Local replica of the driver's correctness gate — DRIVER-STRICT.

Round-1 lesson (VERDICT.md "What's wrong" #4): the old replica
canonicalized lists natively and rounded floats to 12 significant
digits, which hid exactly the three failures the driver caught
(b20/b23 array-typed output columns crash the driver's pandas
``sort_values``; b22 int-vs-float dtype drift stringifies
differently).  This version mirrors the driver's observed pipeline so
local green ⇒ driver green:

1. Spark side → ``df.toPandas()``; oracle side → ``con.execute(sql)
   .df()`` — the same pandas materialization the driver uses.
2. Any array/map/struct-typed output column in an oracle-checked
   query is an immediate failure (the driver's canonicalizer dies on
   unhashable list cells — CORRECTNESS_r01 b20_strings/b23_maps).
3. Columns sorted by name, rows sorted with pandas ``sort_values``
   over all columns, then each cell compared as ``str(value)`` — no
   float rounding, so int64 1500 vs float64 1500.0 is a mismatch,
   exactly like the driver's stringified hash (CORRECTNESS_r01
   b22_math).
4. Numeric *kind* (int vs float) is compared per column and reported
   explicitly, because that is the only dtype drift that changes
   ``str()`` output.

Calibration: at sf0.01 this replica fails precisely the three
round-1 driver failures before their fixes and passes the other 47
driver-checked entries (see tests/test_parity_strictness.py).
"""

from __future__ import annotations

import datetime as dt
from typing import Any

import duckdb
import pandas as pd

from spark_dynamodb_spark.tables import TABLE_NAMES, table_path

# Spark type names whose pandas cells are unhashable (list/dict) — the
# driver's sort_values crashes on them, so oracle-checked queries must
# never emit them.
_UNSORTABLE_TYPES = ("array", "map", "struct")


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _cell(v: Any) -> str:
    """str() of a pandas cell, with the engine-neutral normalizations
    the driver's passes imply (dates/timestamps compare equal across
    duckdb's datetime64 and Spark's datetime.date materializations)."""
    if v is None:
        return "None"
    if isinstance(v, float) and v != v:  # NaN (also catches pd.NA-ish floats)
        return "nan"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        if v.time() == dt.time(0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def _kind(dtype) -> str:
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    return "other"


def _canon_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    # The driver sorts the raw frame (this is where it crashes on list
    # cells); sorting stringified cells is deterministic across engines
    # while still refusing to hide dtype drift (str happens per-cell
    # first, so 1500 vs 1500.0 sort into different places AND differ).
    out = pdf.map(_cell) if hasattr(pdf, "map") else pdf.applymap(_cell)
    out.columns = [c.lower() for c in out.columns]
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df, oracle: str, con) -> list[str]:
    """Return a list of problem strings (empty = pass)."""
    problems: list[str] = []

    for f in spark_df.schema.fields:
        tname = f.dataType.typeName()
        if tname in _UNSORTABLE_TYPES:
            problems.append(
                f"{name}: output column '{f.name}' is {tname}-typed — the driver's "
                "canonicalizer crashes on unhashable cells; stringify it "
                "(array_join/to_json) on both sides"
            )
    if problems:
        return problems

    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(oracle).df()

    s_cols = sorted(c.lower() for c in s_pdf.columns)
    d_cols = sorted(c.lower() for c in d_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"{name}: column mismatch spark={s_cols} duck={d_cols}")
        return problems

    # Numeric-kind drift is exactly what the driver's stringified hash
    # trips on (b22_math: BIGINT 1500 vs DOUBLE 1500.0).
    s_kinds = {c.lower(): _kind(t) for c, t in s_pdf.dtypes.items()}
    d_kinds = {c.lower(): _kind(t) for c, t in d_pdf.dtypes.items()}
    for c in s_cols:
        if s_kinds[c] != d_kinds[c] and "other" not in (s_kinds[c], d_kinds[c]):
            problems.append(
                f"{name}: dtype-kind drift on '{c}': spark={s_kinds[c]} duck={d_kinds[c]} "
                "— str() hashes differ even when values are equal"
            )
    if problems:
        return problems

    sr = _canon_frame(s_pdf)
    dr = _canon_frame(d_pdf)
    if len(sr) != len(dr):
        problems.append(f"{name}: row count spark={len(sr)} duck={len(dr)}")
        return problems
    neq = (sr != dr).any(axis=1)
    if neq.any():
        i = int(neq.idxmax())
        cells = [
            (c, sr.at[i, c], dr.at[i, c]) for c in sr.columns if sr.at[i, c] != dr.at[i, c]
        ]
        problems.append(
            f"{name}: {int(neq.sum())}/{len(sr)} differing rows; first diff cells: {cells[:4]}"
        )
    return problems
