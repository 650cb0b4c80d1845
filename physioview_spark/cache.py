"""Session-lifetime bookkeeping for operator-internal persists.

Several operators pin an intermediate frame (``dedup_delta``'s band and
candidate sets, ``semantic_dedup_delta``'s bucketed delta,
``tfidf_topk``'s term frequencies, the metrics family's
``_seg_samples`` / per-subject extents / per-second aggregates, ...)
because their lazy return value references it from multiple lineages —
without the persist the corpus explode (or the full-size sample scan)
re-runs per consumer, measured as an executor OOM at the 10x corpus
(PLANS.md). The operators return LAZY frames, so they cannot eagerly
unpersist: the caller hasn't executed anything yet. In a long-lived
session that repeatedly invokes these operators, the storage blocks
accumulate — the bench observed exactly this heap growth and had to
``spark.catalog.clearCache()`` between targets. A second session-wide
consequence: Spark's CacheManager substitutes InMemoryRelation into any
LATER plan containing an EQUAL subtree, so plan-shape-sensitive tooling
(tools/plan_census.py) must release pins between queries to see
fresh-session plans.

:func:`pin` is the persist used at those sites: it registers the frame
so :func:`release_pinned` can drop every operator-internal block AFTER
the caller has consumed the results — the precise version of the
bench's blanket ``clearCache`` (which also evicts caller-owned caches).
Call it between repeated invocations, or rely on session teardown.

Lifecycle contract (ADVICE r17 item 2): release is EXPLICIT-ONLY — an
unscoped pin persists until ``release_pinned()``/``pinned_frames()``
exit or session end, never until garbage collection. Spark's
CacheManager registers cached data BY LOGICAL PLAN and holds it
independently of any Python or JVM Dataset object, so dropping
references frees nothing; that is also why ``_PINNED`` must hold
STRONG references — a weakref registry would drop the only handle
that can still ``unpersist()`` the blocks, leaving ``clearCache()``
(caller caches included) as the only recourse. The registry holds
only operator-internal frames; caller-facing caches (e.g.
``run_pipeline``'s ``cache_annotated``) use a bare ``persist()`` so a
scope exit here cannot evict what the caller still owns.

For deterministic scoping, :func:`pinned_frames` wraps a block so that
everything pinned INSIDE it is released on exit — long-lived sessions
that invoke pin-internally operators in a loop get bounded storage
without having to know which operators pin::

    with pinned_frames():
        result = dedup_delta(new, corpus).collect()
    # operator-internal persists are gone here; `result` is plain rows
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist (MEMORY_AND_DISK) and register for later release."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PINNED.append(df)
    return df


def _release_from(start: int) -> int:
    n = 0
    while len(_PINNED) > start:
        df = _PINNED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped; nothing to release
    return n


def release_pinned() -> int:
    """Unpersist every operator-internal frame pinned since the last
    release. Safe while results are still lazily held — Spark just
    recomputes on next use. Returns the number of frames released."""
    return _release_from(0)


@contextmanager
def pinned_frames():
    """Scope operator-internal persists to a block: frames pinned
    inside are unpersisted on exit (normal or exceptional), frames
    pinned BEFORE entry are left alone. CONSUME results inside the
    block (collect/write) — a lazy DataFrame escaping the scope simply
    recomputes its pinned inputs on next use (correct, just unpinned).
    Re-entrant: nested scopes release only their own pins."""
    start = len(_PINNED)
    try:
        yield
    finally:
        _release_from(start)
