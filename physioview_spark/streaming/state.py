"""Crash-safe maintenance for external bucketed state tables.

The near-dup band table (:mod:`physioview_spark.streaming.documents`)
and the semantic vector table (:mod:`~.embeddings`) share one layout —
an external parquet table partitioned by ``batch_id`` and bucketed on
the join key — and one maintenance need: periodically rewriting the
many small per-batch files into a consolidated partition. The session
catalog cannot RENAME external tables with per-partition locations, so
the swap is a read-back rewrite; the ordering here guarantees a
COMPLETE copy of the state exists at every instant:

1. staging table is written fully (live table untouched);
2. only then is the live table dropped and rewritten from staging;
3. staging is dropped last.

A crash inside step 2 leaves ``tableExists(live)`` false — before this
module, the next micro-batch would have silently treated the
accumulated corpus as empty and re-admitted duplicates (r08 ADVICE).
Batch processors now call :func:`recover_state_table` first: when the
live table is missing but a staging table exists, the staging copy is
by construction complete, and the swap is finished instead.
"""

from __future__ import annotations

import shutil


def recover_state_table(
    spark, table: str, staging: str, staging_path: str, live_path: str,
    write,
) -> bool:
    """Finish a compaction that crashed after dropping the live table.

    ``write(df, name, path)`` must register ``name`` as an external
    overwrite-mode table at ``path`` (the same writer the compactor
    uses, so the bucketing spec is preserved). No-op unless the live
    table is missing AND a staging table exists; overwrite mode cleans
    any partial files the crashed rewrite left at ``live_path``.
    Returns True when a recovery ran.
    """
    if spark.catalog.tableExists(table):
        return False
    if not spark.catalog.tableExists(staging):
        return False
    write(spark.read.table(staging), table, live_path)
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    shutil.rmtree(staging_path, ignore_errors=True)
    return True


def swap_compacted(
    spark, table: str, staging: str, staging_path: str, live_path: str,
    consolidated, write,
) -> None:
    """Replace ``table``'s data with ``consolidated`` via the swap-last
    ordering above. ``consolidated`` must read FROM the live table
    lazily (it is materialized into staging before the live table is
    touched)."""
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    shutil.rmtree(staging_path, ignore_errors=True)
    write(consolidated, staging, staging_path)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write(spark.read.table(staging), table, live_path)
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    shutil.rmtree(staging_path, ignore_errors=True)
