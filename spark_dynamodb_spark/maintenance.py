"""Session maintenance: executor-storage and scratch-dir hygiene.

Long-lived sessions that run many registry queries accumulate state
the queries themselves cannot clean up:

- ``localCheckpoint`` RDDs (the lineage-cut discipline used by the
  BPE/unigram trainers, c110's verify barrier, AQE memos, ...) stay
  pinned in executor storage after the query's action completes — a
  new set per query CALL, never reused across calls (ADVICE r10 /
  VERDICT r11 #7).
- fingerprinted scratch stage dirs under ``.scratch/dynamo`` persist
  across sessions (VERDICT r11 #6) — see :func:`sweep_scratch`.

Neither is a correctness problem inside one query; both are
storage-lifetime problems across hundreds of queries in one session
(the driver's correctness sweep, ``tests/test_oracle_parity.py``,
``bench.py``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def release_cached(spark: SparkSession) -> int:
    """Unpersist EVERY RDD currently pinned in executor storage
    (caches, eager and lazy localCheckpoints) and return how many
    were released.

    Call this BETWEEN queries only: a checkpointed DataFrame's
    lineage is truncated at the checkpoint, so unpersisting it makes
    that DataFrame unreadable (verified in
    tests/test_maintenance.py) — plain ``.cache()`` frames merely
    recompute. The registry contract makes this safe: every query
    call builds its relations (and therefore its checkpoints) from
    scratch, so nothing persisted by a COMPLETED query is ever read
    again by the next one.
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    rdds = list(jmap.values())
    for jrdd in rdds:
        jrdd.unpersist()
    return len(rdds)


_STAGE_SUFFIX_RE = None  # compiled lazily (keep import surface tiny)


def sweep_scratch(
    keep: frozenset[str] | set[str] = frozenset(),
    max_age_seconds: int = 3600,
    root: str | None = None,
) -> list[str]:
    """Reap STALE session-fingerprinted stage dirs (``<entry>_sigs_<tag>``
    under the temp root — the c99/c105/c110 staging class, keyed by
    applicationId so every session mints new ones and nothing ever
    deleted prior sessions' dirs: 161 had accumulated by round 12,
    VERDICT r11 #6).

    Two independent guards keep concurrent sessions safe: paths in
    ``keep`` (the current session's registry, tables.py) are never
    touched, and a dir is only reaped when its mtime is older than
    ``max_age_seconds`` (a LIVE parallel session keeps its stages
    fresh by writing into them; a dir an hour cold belongs to a dead
    application). Returns the removed paths.
    """
    import os
    import re
    import shutil
    import tempfile
    import time

    global _STAGE_SUFFIX_RE
    if _STAGE_SUFFIX_RE is None:
        _STAGE_SUFFIX_RE = re.compile(r"_sigs_[0-9a-f]{10}$")
    root = root or tempfile.gettempdir()
    now = time.time()
    removed: list[str] = []
    try:
        names = os.listdir(root)
    except OSError:
        return removed
    for name in names:
        path = os.path.join(root, name)
        if (
            not _STAGE_SUFFIX_RE.search(name)
            or path in keep
            or not os.path.isdir(path)
        ):
            continue
        try:
            if now - os.path.getmtime(path) > max_age_seconds:
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
        except OSError:
            continue
    return removed
