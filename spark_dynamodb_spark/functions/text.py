"""Text helpers for dedup / text-analysis operators (SURVEY §2 Part C).

Hash discipline: Spark's ``F.hash``/``F.xxhash64`` have no DuckDB
equivalent, so anything that must hash-match the oracle derives 64-bit
integers from **md5** (identical in both engines) via
``conv(substr(md5(x),1,15), 16, 10)``. 15 hex chars = 60 bits, fits a
signed BIGINT in both engines. Spark-only paths (MinHash at scale) are
free to use ``xxhash64`` which is faster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical form for dedup."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def shingles(col: Column | str, k: int = 3) -> Column:
    """k-token shingles as array<string> (space-joined token windows).

    Built as k-1 array-level zip_with passes over shifted copies of
    the token array (out[i] accumulates t_i..t_{i+j}), then one final
    slice to the n-k+1 true windows. This replaces the obvious
    per-index ``transform(idx, i -> concat_ws(slice(toks, i, k)))``
    which allocates a fresh k-array per position — measured 5.7×
    slower at sf0.1 (the whole-corpus shingling pass dropped 4.7 s →
    0.8 s). zip_with pads the shorter side with null and concat_ws
    skips nulls, which exactly reproduces the short-document rule:
    documents with fewer than k tokens yield one shingle of the whole
    text.
    """
    toks = tokens(col)
    n = F.size(toks)
    out = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1, F.greatest(n - j, F.lit(0)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(out, 1, F.greatest(n - (k - 1), F.lit(1)))


def md5_64(col: Column | str) -> Column:
    """Engine-portable 60-bit integer hash (see module docstring)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("long")


def sql_md5_64(expr: str) -> str:
    """DuckDB mirror of :func:`md5_64`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_normalize_text(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def sql_tokens(expr: str) -> str:
    return f"string_split({sql_normalize_text(expr)}, ' ')"


def simple_tokens(col: Column | str) -> Column:
    """Lowercase whitespace tokens with empties dropped — the light
    tokenizer shared by the diversity/index/chunking/vocab ops (no
    punctuation normalization; pairs with sql_simple_tokens)."""
    name = col if isinstance(col, str) else None
    expr = name or "text"
    return F.expr(f"filter(split(lower({expr}), ' '), x -> x <> '')")


def sql_simple_tokens(expr: str) -> str:
    """DuckDB mirror of :func:`simple_tokens`."""
    return f"list_filter(string_split(lower({expr}), ' '), x -> x <> '')"
