"""Streaming document curation front-door, batch/streaming-polymorphic.

A 100 TB corpus is not ingested in one batch — it arrives as a stream of
crawled/uploaded documents. The curation gate (quality scoring, language
ID, exact dedup) is stateless-or-watermarked, so the SAME function body
runs as a batch job over parquet or as a Structured Streaming query over
`readStream`:

- quality score / language ID / token counts: pure column expressions —
  identical in both modes by construction.
- exact dedup: `dropDuplicates(text_hash)` in batch;
  `dropDuplicatesWithinWatermark(text_hash)` in streaming, which keeps
  state only for the watermark horizon — unbounded-state-safe. A
  duplicate arriving later than the watermark delay is NOT caught in
  streaming mode (by design: bounded state); run the batch
  `exact_duplicates` pass over the accumulated corpus for the long tail.
  Pinned semantics (tests/test_streaming.py::TestLateDataWatermark): a
  duplicate inside the horizon of its first occurrence is dropped in
  any arrival order; the key's state is evicted once the eviction
  watermark passes first-seen + delay, after which the SAME text is
  emitted again — and rows behind the late-events watermark (one batch
  of grace, see streaming/rolling.py) are dropped outright.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from physioview_spark.llm import text
from physioview_spark.streaming import state
from physioview_spark.streaming.rolling import with_watermark_if_streaming


def _band_writer(n_buckets: int):
    """Band-state table writer (overwrite, batch_id-partitioned,
    bucketed on the band join key) shared by compaction and its crash
    recovery so the spec never diverges between the two paths."""
    def _write(df, name, path):
        (df.write.mode("overwrite")
         .partitionBy("batch_id")
         .bucketBy(n_buckets, "band", "band_hash")
         .option("path", path)
         .format("parquet").saveAsTable(name))
    return _write


def streaming_doc_curation(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    min_quality: float = 0.2,
) -> DataFrame:
    """Quality-gate + language-ID + exact-dedup a document stream.

    Output: one row per surviving (first-seen, quality-passing) unique
    text: ``(doc_id, ingest ts, text_hash, lang_pred, n_tokens,
    quality_score)``.
    """
    df = with_watermark_if_streaming(docs, ts_col, watermark)
    scored = text.detect_language(text.quality_score(df))
    kept = (
        scored.withColumn("text_hash", F.md5("text"))
        .where(F.col("quality_score") >= min_quality)
    )
    if kept.isStreaming:
        kept = kept.dropDuplicatesWithinWatermark(["text_hash"])
    else:
        kept = kept.dropDuplicates(["text_hash"])
    return kept.select(
        "doc_id", ts_col, "text_hash", "lang_pred", "n_tokens",
        "quality_score",
    )


def _band_table_name(state_dir: str) -> str:
    """Catalog name for a stream instance's accumulated band table,
    derived from the state dir so concurrent streams don't collide."""
    import hashlib

    return ("pv_stream_bands_"
            + hashlib.md5(state_dir.encode()).hexdigest()[:12])


def drop_near_dup_state(spark, state_dir: str) -> None:
    """Drop the managed band table backing a
    :func:`streaming_near_dup_lsh` instance (the pairs output under
    ``state_dir`` is plain parquet — remove the directory itself)."""
    spark.sql(f"DROP TABLE IF EXISTS {_band_table_name(state_dir)}")


def compact_near_dup_state(
    spark, state_dir: str, upto_batch_id: int, n_buckets: int = 8,
) -> None:
    """Periodic maintenance for a long-running
    :func:`streaming_near_dup_lsh` stream: every micro-batch appends one
    file per bucket, so old partitions accumulate small files. This
    rewrites all partitions with ``batch_id <= upto_batch_id`` into a
    single consolidated partition (same bucketing spec — the read-side
    join plan is unchanged) via a staging table (the in-memory
    catalog's RENAME keeps stale per-partition locations, so the swap
    is a read-back rewrite; a Hive/Delta metastore would rename
    atomically). Run it from a separate maintenance job BETWEEN
    micro-batches of batches already final (a compacted batch_id must be
    older than any batch the stream could still redeliver — Structured
    Streaming only retries the latest unresolved batch, so anything
    below the last committed checkpoint is safe).

    The consolidated rows keep ``batch_id = upto_batch_id`` so the
    processor's ``batch_id < current`` prior-read and its retry guard
    semantics are preserved for all live batches. The swap is the
    crash-safe staging-first ordering of
    :mod:`physioview_spark.streaming.state`; the batch processor
    recovers from staging if a crash lands between drop and rewrite."""
    table = _band_table_name(state_dir)
    staging = table + "_compact"
    bands_path = os.path.join(state_dir, "bands")
    staging_path = os.path.join(state_dir, "bands_compact")
    write = _band_writer(n_buckets)
    state.recover_state_table(
        spark, table, staging, staging_path, bands_path, write)
    src = spark.read.table(table)
    old = (src.where(F.col("batch_id") <= upto_batch_id)
           .withColumn("batch_id", F.lit(int(upto_batch_id))))
    keep = src.where(F.col("batch_id") > upto_batch_id)
    state.swap_compacted(
        spark, table, staging, staging_path, bands_path,
        old.unionByName(keep), write)


def streaming_near_dup_lsh(
    docs: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    n_buckets: int = 8,
):
    """NEAR-dup candidate detection over a document stream: incremental
    MinHash-LSH via ``foreachBatch`` against an accumulating band table.

    Exact dedup streams with ``dropDuplicatesWithinWatermark``; near-dup
    has no built-in streaming operator, so each micro-batch (1) computes
    its docs' LSH band hashes (same ``_lsh_bands`` as the batch path),
    (2) emits candidate pairs by joining the batch's bands against the
    band table accumulated from ALL prior batches plus itself, and
    (3) appends its bands to that table. An unordered pair is emitted
    exactly once — in the micro-batch of its later-arriving member —
    so the union of emitted pairs over any prefix of the stream equals
    the batch :func:`physioview_spark.llm.dedup.minhash_lsh_candidates`
    over the same prefix (parity-tested in tests/test_streaming.py,
    including across a simulated micro-batch retry).

    State layout:
      - accumulated bands: a MANAGED BUCKETED TABLE (``n_buckets`` on
        the join key ``(band, band_hash)``), partitioned by ``batch_id``
        — the bucketed scan joins the batch's bands without an Exchange
        on the accumulated side, so per-batch shuffle cost covers the
        BATCH only, independent of how much state has accumulated.
        Drop via :func:`drop_near_dup_state`.
      - ``state_dir/pairs``: (id_a, id_b) parquet partitioned by
        ``batch_id``, written with DYNAMIC PARTITION OVERWRITE.

    Exactly-once on retry: foreachBatch may redeliver a batch_id after a
    failure. Pairs are overwrite-keyed on their batch_id partition
    (idempotent rewrite of identical rows); bands append LAST and only
    after checking the table does not already hold this batch_id's
    partition — if it does, every state write of the attempt committed
    and the redelivery is a no-op. The prior-bands read filters
    ``batch_id < current``, so a retry never joins against its own
    earlier output.

    Remaining 100 TB maintenance (not a per-batch cost): each batch
    appends one file per bucket, so a long-running stream wants a
    periodic compaction rewrite of old partitions into fewer files —
    the read-side plan shape is unchanged by it.

    Returns a ``DataStreamWriter`` — caller picks trigger/checkpoint and
    calls ``start()``.
    """
    return docs.writeStream.foreachBatch(near_dup_batch_processor(
        state_dir, text_col, id_col, k, num_hashes, band_size, n_buckets))


def near_dup_batch_processor(
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    n_buckets: int = 8,
):
    """The ``foreachBatch`` body behind :func:`streaming_near_dup_lsh`,
    exposed so tests can drive micro-batches (and redeliver one, the
    retry path) without a running stream."""
    from physioview_spark.llm.dedup import _lsh_bands

    pairs_path = os.path.join(state_dir, "pairs")
    table = _band_table_name(state_dir)

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # an interrupted compaction may have dropped the live table
        # with the only complete copy in staging — finish its swap
        # rather than treating the accumulated state as empty
        state.recover_state_table(
            spark, table, table + "_compact",
            os.path.join(state_dir, "bands_compact"),
            os.path.join(state_dir, "bands"),
            _band_writer(n_buckets))
        have_state = spark.catalog.tableExists(table)
        if have_state and (
            spark.read.table(table)
            .where(F.col("batch_id") == batch_id).limit(1).count() > 0
        ):
            return  # retried batch whose state writes all committed
        # Batch fan-out (r18, guide §2.5 "input skew"): a micro-batch
        # from a file stream is partitioned by its source FILES — one
        # scratch file = ONE task, and the whole shingle+md5+partial-
        # min map side serializes on one core (measured 5-6 s of a
        # 6.5 s batch at sf0.1 halves, 31 cores idle). Hash-fan-out by
        # doc id when the batch is narrower than the session — at
        # production batch sizes (many source files) the condition is
        # false and no exchange is added.
        cores = spark.sparkContext.defaultParallelism
        if batch.rdd.getNumPartitions() < cores:
            batch = batch.repartition(cores, F.col(id_col))
        new = _lsh_bands(
            batch, text_col, id_col, k, num_hashes, band_size
        ).persist()
        try:
            prior = (
                spark.read.table(table)
                .where(F.col("batch_id") < batch_id)
                if have_state else None
            )
            new_sel = new.select(
                F.col(id_col).alias("__new_id"), "band", "band_hash")
            # within-batch candidates (strict < : each pair once)
            intra = (
                new_sel.join(
                    new.select(F.col(id_col).alias("__old_id"), "band",
                               "band_hash"),
                    ["band", "band_hash"],
                ).where(F.col("__new_id") < F.col("__old_id"))
            )
            pairs = intra
            if prior is not None:
                cross = (
                    new_sel.join(
                        prior.select(F.col(id_col).alias("__old_id"),
                                     "band", "band_hash"),
                        ["band", "band_hash"],
                    ).where(F.col("__new_id") != F.col("__old_id"))
                )
                pairs = pairs.unionByName(cross)
            (pairs.select(
                F.least("__new_id", "__old_id").alias("id_a"),
                F.greatest("__new_id", "__old_id").alias("id_b"))
             .distinct()
             .withColumn("batch_id", F.lit(int(batch_id)))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(pairs_path))
            (new.select(id_col, "band", "band_hash")
             .withColumn("batch_id", F.lit(int(batch_id)))
             .write.mode("append")
             .partitionBy("batch_id")
             .bucketBy(n_buckets, "band", "band_hash")
             # external table rooted in state_dir: the files live with
             # the stream's state (removed with it), not in the host
             # session's spark-warehouse CWD, which may not be writable
             .option("path", os.path.join(state_dir, "bands"))
             .format("parquet").saveAsTable(table))
        finally:
            new.unpersist()

    return _process
