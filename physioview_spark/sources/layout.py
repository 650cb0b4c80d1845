"""Multi-dimensional data layout: Z-order (Morton) clustering for
parquet scan pruning.

Partition pruning handles ONE leading dimension; real curation and
signal workloads filter on several (subject AND time window; domain AND
quality band). Sorting by column A localizes A in file-level min/max
stats but smears B across every file, so predicate pushdown on B prunes
nothing. Interleaving the bits of both columns into one Morton value
and range-partitioning + sorting on it localizes EVERY interleaved
dimension at once — each output file covers a small hyper-rectangle, so
the engine's ordinary parquet min/max pruning skips most files for a
filter on any clustered column (the Delta/Iceberg OPTIMIZE ZORDER
pattern, done with stock Spark writes).

Scale shape: one 1-row min/max aggregate (broadcast), one projection
computing the Morton value (pure bit arithmetic in whole-stage
codegen), one range exchange. The range boundaries come from Spark's
built-in sampling; no driver collect of data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
) -> tuple[DataFrame, Column]:
    """Attach normalized ``bits``-wide integer ranks for each column and
    return (df_with_helpers, morton) where ``morton`` interleaves the
    columns' bits (column 0 owns the least-significant position of each
    group, matching its name leading the pruning story).

    Normalization is min/max linear scaling from a single 1-row
    aggregate cross-joined back (broadcast nested loop of one row — no
    shuffle of the data itself). Linear scaling keeps the math
    SQL-reproducible; heavily skewed columns trade some balance for it
    (range partitioning on the final value still balances output files
    via sampling). Nulls (and constant columns, whose span is null)
    rank 0, sorting together at the origin.

    ``bits`` is clamped so the interleaved value fits the POSITIVE
    range of a 64-bit long: ``bits * len(cols) <= 63``. Without the
    clamp a 4-column default-bits call would shift into the sign bit
    and negative Morton values would sort the far corner of the
    hyper-rectangle BEFORE the origin, silently breaking the
    contiguous-range property pruning depends on.
    """
    if not (1 <= len(cols) <= 4):
        raise ValueError("zorder_value interleaves 1-4 columns")
    bits = min(int(bits), 63 // len(cols))
    mins = [F.min(F.col(c).cast("double")).alias(f"__mn_{c}")
            for c in cols]
    maxs = [F.max(F.col(c).cast("double")).alias(f"__mx_{c}")
            for c in cols]
    stats = df.agg(*mins, *maxs)
    out = df.crossJoin(F.broadcast(stats))
    top = (1 << bits) - 1
    ranks = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.nullif(mx - mn, F.lit(0.0))
        frac = (F.col(c).cast("double") - mn) / span
        scaled = F.least(F.floor(frac * (top + 1)).cast("long"),
                         F.lit(top))
        # explicit null test, NOT coalesce-around-least: least() skips
        # null operands, so a null value (or null span) would otherwise
        # rank at `top` — the max corner — instead of the origin
        rank = F.when(scaled.isNull(), F.lit(0)).otherwise(scaled)
        ranks.append(rank)
    morton = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for j, rank in enumerate(ranks):
            bit = F.shiftright(rank, i).bitwiseAND(F.lit(1))
            morton = morton.bitwiseOR(
                F.shiftleft(bit, i * n + j))
    return out, morton


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``:
    range-partition on the Morton value (sampled boundaries → balanced
    files), sort within each partition so row-group stats are tight,
    drop the helper columns, write.

    Readers need nothing special: `spark.read.parquet(path).where(...)`
    on any clustered column prunes files through ordinary min/max
    stats. Cite: reference has no layout optimizer (single-node CSV
    pipelines); this is engine-side scale machinery per SURVEY §7.4.
    """
    clash = [c for c in df.columns
             if c == "__z" or c.startswith(("__mn_", "__mx_"))]
    if clash:
        raise ValueError(
            f"write_zordered reserves __z/__mn_*/__mx_* helper names; "
            f"rename input columns {clash} (they would be silently "
            f"dropped from the written output)")
    out, morton = zorder_value(df, cols, bits)
    out = out.withColumn("__z", morton)
    helper_cols = [c for c in out.columns
                   if c.startswith("__mn_") or c.startswith("__mx_")]
    (
        out.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *helper_cols)
        .write.mode("overwrite").parquet(path)
    )


def write_sized(
    df: DataFrame,
    path: str,
    target_mb: int = 256,
    sample_rows: int = 10_000,
    format: str = "parquet",
    mode: str = "overwrite",
    min_partitions: int = 1,
    max_partitions: int | None = None,
) -> int:
    """Size-targeted write: pick the output partition count from
    MEASURED bytes/row so files land near ``target_mb`` — the small-
    files/giant-files answer for 100 TB sinks (a fixed
    ``repartition(N)`` is wrong at every other scale; AQE coalesces
    SHUFFLE partitions, not final write file counts under an explicit
    partitioning).

    Bytes/row is estimated from a bounded ``sample_rows`` head:
    probing the columnar writer's real compressed size would cost a
    trial write, so the estimate takes the sample's in-memory pandas
    footprint with a 2.5x parquet-compression haircut — coarse, but
    within ~2x on the engine's tables, and the failure mode that
    matters at 100 TB is 128 MB vs 64 GB files, not 128 vs 200 MB.
    Row count comes from ``df.count()`` (one job).

    Returns the partition count used. The write repartitions by a
    round-robin of the row (no key skew) and leaves ordering to the
    caller (compose with :func:`write_zordered` when pruning layout
    matters more than file sizing).
    """
    n_rows = df.count()
    if n_rows == 0:
        df.limit(0).write.format(format).mode(mode).save(path)
        return 1
    sample = df.limit(min(sample_rows, n_rows)).toPandas()
    mem_bytes = int(sample.memory_usage(index=False, deep=True).sum())
    bytes_per_row = max(1.0, mem_bytes / max(1, len(sample)) / 2.5)
    total_mb = n_rows * bytes_per_row / (1024 * 1024)
    n_parts = max(min_partitions, int(total_mb // target_mb) + 1)
    if max_partitions is not None:
        n_parts = min(n_parts, max_partitions)
    df.repartition(n_parts).write.format(format).mode(mode).save(path)
    return n_parts
