"""Session-lifetime bookkeeping for operator-internal persists.

Several operators pin an intermediate frame (``dedup_delta``'s band and
candidate sets, ``semantic_dedup_delta``'s bucketed delta,
``tfidf_topk``'s term frequencies, ...) because their lazy return value
references it from multiple lineages — without the persist the corpus
explode re-runs per consumer, measured as an executor OOM at the 10x
corpus (PLANS.md). The operators return LAZY frames, so they cannot
eagerly unpersist: the caller hasn't executed anything yet. In a
long-lived session that repeatedly invokes these operators, the
storage blocks accumulate — the bench observed exactly this heap
growth and had to ``spark.catalog.clearCache()`` between targets.

:func:`pin` is the persist used at those sites: it registers the frame
so :func:`release_pinned` can drop every operator-internal block AFTER
the caller has consumed the results — the precise version of the
bench's blanket ``clearCache`` (which also evicts caller-owned caches).
Call it between repeated invocations, or rely on session teardown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist (MEMORY_AND_DISK) and register for later release."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PINNED.append(df)
    return df


def release_pinned() -> int:
    """Unpersist every operator-internal frame pinned since the last
    release. Safe while results are still lazily held — Spark just
    recomputes on next use. Returns the number of frames released."""
    n = 0
    while _PINNED:
        df = _PINNED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped; nothing to release
    return n
