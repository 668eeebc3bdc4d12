"""Session staging with eviction (r7 ADVICE item 3).

The id()-keyed staging caches (clustering's point/neighbor/core-label
chain, similarity's brute-force truth, the entry module's stable
events handle) pin the input DataFrame plus an eagerly
localCheckpointed result so every same-session consumer reuses one
materialization. Keeping the input reference is load-bearing (it
stabilizes ``id()`` against CPython reuse), but an unbounded dict
makes eviction impossible: a long-lived driver that processes many
inputs accumulates checkpoint blocks for process lifetime.

``stage`` keeps the convention and adds the eviction hook: when a NEW
input identity arrives, every entry owned by a DIFFERENT input is
dropped first. Dropping the Python references releases the
checkpointed DataFrame to GC, which is exactly how localCheckpoint
blocks are reclaimed (Spark's ContextCleaner unpersists the backing
RDD once the last reference dies) — so a superseded input's blocks are
freed instead of pinned forever, while all variants for the CURRENT
input (e.g. brute-force truth at several (n_queries, k)) stay warm.
"""

from __future__ import annotations

import threading
from typing import Callable

from pyspark.sql import DataFrame

#: One process-wide re-entrant lock for every id()-keyed staging
#: cache (this module's `stage`, plus the direct-dict helpers in
#: similarity/trees). Staging helpers are reachable from thread pools
#: (the plan-lint builders, guide §2.6); without the lock two threads
#: missing the same key both run the eager-checkpoint build and store
#: divergent staged identities. RLock because a build() may itself
#: stage a nested table (e.g. GANN topk -> assignment).
STAGING_LOCK = threading.RLock()


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition ``df`` to the configured default parallelism
    (r10, guide §2.5): the test fixtures are single-row-group parquet
    files, so scans — and every projection fused into them — run as
    ONE task no matter the core count; the driver's 8-vs-32-core
    scaling block measured ratios <= 1 for that reason. An EXPLICIT
    width is load-bearing: AQE coalesces repartition(col) right back
    to one tiny partition, hiding the CPU-bound work again (measured:
    dedup_cdc 4.0 s -> 4.0 s with implicit width, -> 0.98 s with the
    explicit width). Only use above per-row-HEAVY projections whose
    downstream result is partition-invariant (aggregations, keyed
    joins, windows with total orderings). At cluster scale the scan
    already arrives split and the one narrow exchange this adds is
    noise next to the per-row compute it parallelizes; the width
    follows spark.default.parallelism, i.e. the documented env knob.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)


def stage(
    cache: dict,
    key,
    owner,
    build: Callable[[], DataFrame],
    checkpoint: bool = True,
    keep_owners: int = 2,
) -> DataFrame:
    """Return the staged result for ``key``, building (and eagerly
    localCheckpointing, unless ``checkpoint=False``) on first touch.

    ``owner`` is the object whose identity scopes the entry (the input
    DataFrame, or the SparkSession for per-session handles). On a miss
    the cache is trimmed so at most ``keep_owners`` input-identity
    generations survive (the incoming one plus the most recent
    ``keep_owners - 1`` others, by first-touch order). Keeping one
    spare generation means two live inputs used in alternation within
    a session (e.g. the entry module's stable events interleaved with
    a test-local events frame) stay warm instead of thrashing each
    other's eager localCheckpoints on every switch (r8 ADVICE item 4),
    while superseded generations beyond that are still released to GC
    so their checkpoint blocks are reclaimed.
    """
    with STAGING_LOCK:
        return _stage_locked(cache, key, owner, build, checkpoint, keep_owners)


def _stage_locked(
    cache: dict,
    key,
    owner,
    build: Callable[[], DataFrame],
    checkpoint: bool,
    keep_owners: int,
) -> DataFrame:
    hit = cache.get(key)
    if hit is None:
        # distinct owner generations, oldest-first (dict order = first
        # touch); evict everything older than the keep_owners-1 most
        # recent generations besides the incoming owner.
        owners: list = []
        for v in cache.values():
            if all(v[0] is not o for o in owners):
                owners.append(v[0])
        others = [o for o in owners if o is not owner]
        evict = others[: max(0, len(others) - (keep_owners - 1))]
        stale = [
            k for k, v in cache.items() if any(v[0] is o for o in evict)
        ]
        for k in stale:
            del cache[k]
        df = build()
        if checkpoint:
            df = df.localCheckpoint(eager=True)
        hit = (owner, df)
        cache[key] = hit
    return hit[1]
