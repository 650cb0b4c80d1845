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
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, functions as F

from physioview_spark.llm import text
from physioview_spark.streaming.rolling import with_watermark_if_streaming


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


def streaming_near_dup_lsh(
    docs: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
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
    over the same prefix (parity-tested in tests/test_streaming.py).

    State layout under ``state_dir``:
      ``bands/``  (id, band, band_hash) parquet, append-only
      ``pairs/``  (id_a, id_b) parquet, append-only

    Scale shape: per batch, one shuffle over the BATCH's shingles (tiny)
    plus a (batch-bands x accumulated-bands) equi-join on (band,
    band_hash) — batch side broadcast when small. At 100 TB the
    accumulated table should be a bucketed table (or Delta with a merge
    keyed on ``batch_id`` for exactly-once retries); the append-parquet
    form here keeps the same plan shape with plain files.

    Returns a ``DataStreamWriter`` — caller picks trigger/checkpoint and
    calls ``start()``.
    """
    from physioview_spark.llm.dedup import _lsh_bands

    bands_path = os.path.join(state_dir, "bands")
    pairs_path = os.path.join(state_dir, "pairs")

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        new = _lsh_bands(
            batch, text_col, id_col, k, num_hashes, band_size
        ).persist()
        try:
            try:
                prior = spark.read.parquet(bands_path)
            except AnalysisException:  # first micro-batch: no state yet
                prior = None
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
             .write.mode("append").parquet(pairs_path))
            (new.select(id_col, "band", "band_hash")
             .write.mode("append").parquet(bands_path))
        finally:
            new.unpersist()

    return docs.writeStream.foreachBatch(_process)
