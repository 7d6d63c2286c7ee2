"""Tracked persist: every intermediate the engine pins is registered
here so callers can release executor storage deterministically.

persist() without a matching unpersist() is correct for a single run
but pins storage memory for the lifetime of a long-lived session —
repeated suite invocations accumulate cache entries (Spark's
CacheManager dedupes identical plans, but distinct sf_dirs or code
paths do not collide). The contract:

- operators call ``tracked_persist(df)`` instead of ``df.persist()``;
- whoever consumes the query's result calls ``release_cached()`` when
  done (bench.py does so after each query; tests via fixture).

``release_cached`` is safe to call at any time: unpersist(blockingized
False) only drops cache entries, never changes results — the plan
recomputes if re-used.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
# registry mutations are lock-guarded: statement-serving threads
# (REST/thrift) and streaming worker threads can reach tracked_persist
# or release_cached concurrently with the main thread, and an
# unguarded check-then-pop races to an IndexError.
_LOCK = threading.Lock()


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for later release. Returns the same df."""
    df.persist()
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked DataFrame; returns how many were
    released. Idempotent — the tracking list is drained."""
    n = 0
    while True:
        with _LOCK:
            if not _TRACKED:
                return n
            df = _TRACKED.pop()
        df.unpersist()
        n += 1
