"""Scoped persist tracking — operator-internal caches that don't leak.

Several operators persist() multi-consumer intermediates (prefix-join token
sets, incremental-dedup signature tables, LM score relations) because their
lineage is probed 2-3× during one materialization — each a measured 2-4×
win (see the call sites).  But a bare persist() lives until the session
dies: back-to-back calls (bench sweeps, correctness sweeps, long-lived
notebook sessions) accumulate executor storage until useful blocks get
evicted (r6 ADVICE finding).

``scoped_persist`` keeps the win and fixes the lifetime: every handle is
registered here, and harnesses call ``release_all()`` between queries
(bench.py, tools/check_correctness.py do).  Releasing is always SAFE —
an unpersisted DataFrame silently recomputes — so the worst case of a
missing release_all() call is the old behavior, and the worst case of an
early one is a recompute.

Storage level is explicitly MEMORY_AND_DISK (serialized form, not pyspark's
MEMORY_AND_DISK_DESER default): spill-to-disk rather than drop-on-eviction,
because the relations cached here (token posting lists, signature tables)
cost far more to rebuild than to re-read, and the serialized form keeps the
footprint honest while a leak-window is open.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# Tracking is PER-THREAD: scoped_persist happens on the thread that builds
# the plan, and two concurrent foreachBatch sinks in one session run their
# callbacks on separate threads — a shared positional list would let one
# stream's release pop the other's in-flight caches and strand entries as
# permanent leaks (review r9).  release_all still drains every thread's
# list (the bench/sweep harness scope).
_LOCAL = threading.local()
_ALL_LISTS: list[list[DataFrame]] = []
_LOCK = threading.Lock()


def _tracked() -> list[DataFrame]:
    lst = getattr(_LOCAL, "lst", None)
    if lst is None:
        lst = []
        _LOCAL.lst = lst
        with _LOCK:
            _ALL_LISTS.append(lst)
    return lst


def scoped_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() + register the handle for the next ``release_all()``."""
    out = df.persist(level)
    _tracked().append(out)
    return out


def scoped_persist_corpus(df: DataFrame) -> DataFrame:
    """``scoped_persist`` at DISK_ONLY — for DATA-SCALE (per-document /
    per-token) relations with genuine multi-consumer reuse.  Serialized
    blocks go straight to local disk and read back through the OS page
    cache (warm re-reads stay memory-speed on a healthy node) WITHOUT
    competing with task memory for unroll space: the sf100 probe OOM'd an
    8 GB local heap unrolling a 5M-doc MEMORY_AND_DISK cache under 32
    concurrent explode tasks (r12) — at 100 TB a memory-backed corpus cache
    is never the right trade.  Executor-memory-BOUNDED relations (vocab
    tables, codebooks, centroids, params rows) keep the MEMORY_AND_DISK
    default via plain ``scoped_persist``."""
    return scoped_persist(df, StorageLevel.DISK_ONLY)


def materialized(df: DataFrame) -> DataFrame:
    """Force a scoped-persisted relation to materialize NOW, so that
    downstream JOIN planning sees the cache's ACTUAL byte size instead of a
    width-scaled estimate.  Catalyst guesses array columns at ~16 B/cell, so
    a per-doc relation carrying a shingle-set array can be estimated 1000×
    small through an opaque node (MapInArrow reports no cardinality) — at
    sf100 that mis-picked a BroadcastHashJoin over a multi-GB build side and
    aborted on spark.driver.maxResultSize (r14).  A materialized
    InMemoryRelation reports its true cached size, so the broadcast-vs-
    shuffle decision becomes stats-driven at every scale: broadcast at
    bench scale (relation genuinely small), shuffled join at corpus scale.
    The action itself costs one job that the first downstream consumer
    would have paid anyway (the persist is always multi-consumer here)."""
    df.count()
    return df


def mark() -> int:
    """Current tracking position ON THIS THREAD — pair with
    ``release_since`` to scope persists to one unit of work (e.g. one
    foreachBatch invocation) inside a long-lived session where nobody
    calls ``release_all``."""
    return len(_tracked())


def release_since(pos: int, blocking: bool = True) -> int:
    """Unpersist every handle THIS THREAD registered after ``mark()``
    returned ``pos`` — the streaming-sink scope: a per-batch cache must not
    outlive its micro-batch or a week-long stream accumulates one cache per
    batch.  Thread-local, so concurrent sinks never release each other's
    caches."""
    lst = _tracked()
    n = 0
    while len(lst) > pos:
        df = lst.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    return n


def release_all(blocking: bool = True) -> int:
    """Unpersist every tracked cache on EVERY thread; returns how many.

    Blocking by default: the async form leaves blocks for the
    ContextCleaner, so a bench/sweep's next query still pays eviction
    pressure for the previous one's caches — the exact cross-query
    pollution this module exists to stop."""
    with _LOCK:
        lists = list(_ALL_LISTS)
    n = 0
    for lst in lists:
        while lst:
            df = lst.pop()
            try:
                df.unpersist(blocking=blocking)
            except Exception:
                pass  # session already stopped — nothing to free
            n += 1
    return n
