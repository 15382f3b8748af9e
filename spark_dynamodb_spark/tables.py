"""Fixture table loading (TESTDATA.md / FIXTURES.md).

The driver provides deterministic parquet fixtures per scale factor:
``region nation customer supplier part orders lineitem events
documents embeddings``. These stand in for DynamoDB tables (the
reference's unit of data — SURVEY §1.1); the ``sources/`` package
additionally re-exports some of them as keyed document stores for the
"dynamo" DataSource round-trip tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# (applicationId, abspath, fingerprint) -> (weakref(session), DataFrame).
# Memoizes the LAZY reader handle, not any data: spark.read.parquet
# pays file listing + a footer read per call (~120 ms on this host,
# round-15 measurement), and multi-table queries re-pay it per table
# per run (b06 alone calls load_table five times). The fingerprint
# (size + mtime of the fixture file/dir) guards the only way the
# answer could change — the driver regenerating fixtures — so a stale
# handle can never survive a refresh. The owning SESSION is checked by
# live-object identity against a weakref (round 16, VERDICT r15 #5):
# the previous id(spark) key component could theoretically collide
# after GC address reuse — same hazard registry._harden_session
# documents — whereas `ref() is spark` can only be true for the very
# session that created the handle.
_TABLE_CACHE: dict[tuple, tuple] = {}


def _fingerprint(path: str) -> tuple:
    st = os.stat(path)
    if os.path.isfile(path):
        return (st.st_size, st.st_mtime_ns)
    parts = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            s = os.stat(os.path.join(root, f))
            parts.append((f, s.st_size, s.st_mtime_ns))
    return tuple(parts)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (memoized per session + fingerprint).

    ``events.ts`` has drifted across fixture regenerations —
    TIMESTAMP(NANOS) in round 1/2, ``timestamp[us]`` (isAdjustedToUTC=
    false → Spark TIMESTAMP_NTZ) since the round-2 refresh — so this
    single choke point normalizes every variant to one canonical type:
    session-timezone TIMESTAMP at microsecond precision (the session tz
    is UTC, session.py:32). Downstream operators may assume plain
    TIMESTAMP and use ``unix_micros`` freely.

    - nanos fixtures: Spark can't read TIMESTAMP(NANOS) natively
      (PARQUET_TYPE_ILLEGAL); read nanos as long (``nanosAsLong``) and
      truncate to micros.
    - µs/NTZ fixtures: cast NTZ → TIMESTAMP; under the UTC session tz
      this is epoch-preserving and matches DuckDB's naive reading.

    The DuckDB oracle mirror (EVENTS_TS_SQL) is the identity on µs
    timestamps and the same ns→µs truncation on nanos ones.
    """
    import weakref

    path = os.path.abspath(table_path(sf_dir, name))
    key = (
        spark.sparkContext.applicationId,
        path,
        _fingerprint(path),
    )
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0]() is spark:
        return hit[1]
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as long
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":  # timestamp[us], no tz
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif ts_type != "timestamp":  # loudly reject a third drift variant
            raise ValueError(
                f"events.ts loaded as unhandled type {ts_type!r} — the "
                f"fixtures drifted again; extend tables.load_table AND "
                f"streaming.events_stream (and re-check EVENTS_TS_SQL)"
            )
    else:
        df = spark.read.parquet(path)
    _TABLE_CACHE[key] = (weakref.ref(spark), df)
    return df


# DuckDB-side mirror of the events.ts normalization. The driver
# registers `events` as a raw view, so every oracle SQL that touches ts
# inlines this expression. epoch_ns works on both TIMESTAMP_NS (old
# fixtures) and TIMESTAMP (current µs fixtures); // 1000 then
# make_timestamp reconstructs µs — the identity for µs inputs, the
# truncation for ns ones. Lockstep with load_table by construction.
EVENTS_TS_SQL = "make_timestamp(epoch_ns(ts) // 1000)"

# Integer-micros variant of the same normalization (for oracles that
# work on the epoch-microsecond axis directly). Keep BOTH constants in
# lockstep with load_table — they are the single source of truth for
# the DuckDB side of the events.ts rule; oracle SQL must interpolate
# these rather than inlining the expression.
EVENTS_TS_US_SQL = "epoch_ns(ts) // 1000"


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for spark.sql use)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


# stage dirs this process created (never swept) + apps already swept
_SESSION_STAGE_PATHS: set[str] = set()
_SWEPT_APPS: set[str] = set()


def scratch_stage_path(spark: SparkSession, entry: str, sf_dir: str) -> str:
    """Session-isolated staging dir for an entry's signature parquet:
    unique per (entry, sf_dir, Spark application), so concurrent
    sessions can never clobber each other's stage while one is
    mid-read (code-review r10 — the first spelling keyed on sf_dir
    alone). Within one session, repeated runs overwrite their OWN
    stage (callers write mode=overwrite each invocation), so no
    stale-cache fingerprinting is needed. The dir name keeps the
    ``<entry>_sigs_`` prefix the plan gates assert on.

    Round 12 (VERDICT r11 #6): the first call per application also
    sweeps STALE stage dirs left by dead sessions — the per-app
    fingerprint means no session ever overwrote a prior session's
    dirs, and 161 had accumulated in the temp root. The sweep skips
    everything this session registered and anything touched within
    the last hour (maintenance.sweep_scratch), so live concurrent
    sessions are never clipped."""
    import hashlib
    import os
    import tempfile

    app = spark.sparkContext.applicationId
    tag = hashlib.md5(f"{entry}:{sf_dir}:{app}".encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"{entry}_sigs_{tag}")
    _SESSION_STAGE_PATHS.add(path)
    # freshen the mtime on every ACCESS, not just on write: the sweep's
    # liveness heuristic is "touched within the last hour", and a query
    # that re-READS a stage for longer than that (large-SF verify
    # phases) would otherwise look dead to a concurrently starting
    # session (code review r12)
    if os.path.isdir(path):
        try:
            os.utime(path)
        except OSError:
            pass
    if app not in _SWEPT_APPS:
        _SWEPT_APPS.add(app)
        from spark_dynamodb_spark.maintenance import sweep_scratch

        sweep_scratch(keep=_SESSION_STAGE_PATHS)
    return path
