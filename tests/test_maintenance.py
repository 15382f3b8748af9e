"""Session maintenance: executor-storage release + stale-stage sweep
(VERDICT r11 #6/#7)."""

from __future__ import annotations

import os
import time

import pytest


def test_release_cached_unpersists_everything(spark):
    """release_cached must unpersist caches AND localCheckpoints (the
    classes ADVICE r10 flagged as accumulating), report the count, and
    leave plain caches recomputable. It also pins the contract that
    makes 'between queries only' mandatory: a checkpointed frame's
    lineage is truncated, so it becomes unreadable once released."""
    from spark_dynamodb_spark.maintenance import release_cached

    release_cached(spark)  # start clean (other tests may have pinned RDDs)
    ck = spark.range(100).localCheckpoint(eager=True)
    ca = spark.range(50).cache()
    ca.count()
    lazy = spark.range(25).localCheckpoint(eager=False)
    lazy.count()  # materialize
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert len(jmap) == 3
    assert release_cached(spark) == 3
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0
    # plain cache: still readable (recomputes from lineage)
    assert ca.count() == 50
    # checkpointed frame: lineage is gone — the documented reason
    # release_cached is a BETWEEN-queries operation
    with pytest.raises(Exception):
        ck.count()
    assert release_cached(spark) == 0  # idempotent on an empty store


def test_sweep_scratch_reaps_only_stale_unregistered_dirs(tmp_path):
    """Stale fingerprinted stage dirs are reaped; the current session's
    registered dirs, FRESH dirs (live concurrent sessions), and
    non-stage names are untouched."""
    from spark_dynamodb_spark.maintenance import sweep_scratch

    old = time.time() - 7200
    stale = tmp_path / "c110_pairs_sigs_0123456789"
    fresh = tmp_path / "c99_sigs_abcdef0123"
    kept = tmp_path / "c105_exact_sigs_fedcba9876"
    other = tmp_path / "not_a_stage_dir"
    for d in (stale, fresh, kept, other):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
    os.utime(stale, (old, old))
    os.utime(kept, (old, old))
    os.utime(other, (old, old))

    removed = sweep_scratch(
        keep={str(kept)}, max_age_seconds=3600, root=str(tmp_path)
    )
    assert removed == [str(stale)]
    assert not stale.exists()
    assert fresh.exists() and kept.exists() and other.exists()


def test_scratch_stage_path_sweeps_once_per_app(spark, tmp_path, monkeypatch):
    """The first scratch_stage_path call of a session reaps dead
    sessions' stage dirs from the temp root; the session's own path is
    registered before the sweep so it can never self-delete."""
    import tempfile

    from spark_dynamodb_spark import tables

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    stale = tmp_path / "c110_sigs_aaaaaaaaaa"
    stale.mkdir()
    old = time.time() - 7200
    os.utime(stale, (old, old))
    # force a fresh "session start" for this app
    monkeypatch.setattr(tables, "_SWEPT_APPS", set())
    monkeypatch.setattr(tables, "_SESSION_STAGE_PATHS", set())

    p = tables.scratch_stage_path(spark, "c110", "/root/testdata/sf0.001")
    assert not stale.exists()  # dead session's dir reaped
    assert p in tables._SESSION_STAGE_PATHS
    assert os.path.basename(p).startswith("c110_sigs_")
    # second call: no sweep state change, same path
    assert tables.scratch_stage_path(spark, "c110", "/root/testdata/sf0.001") == p


def test_registry_wrapper_caps_plan_string_length(spark, sf_dir):
    """Every registered query hardens its session once: the plan-string
    render cap protects long default-memory sessions (a 351-query
    sweep OOMed in generateTreeString; see registry._harden_session).
    The wrapper must preserve the callable's identity metadata."""
    from spark_dynamodb_spark.registry import _PLAN_STRING_CAP, load_all

    spec = load_all().resolve("c01_dedup_exact")
    assert spec.fn.__name__  # functools.wraps preserved
    spec.fn(spark, sf_dir).count()
    got = spark.conf.get("spark.sql.maxPlanStringLength").lower().rstrip("b")
    assert int(got) <= _PLAN_STRING_CAP
