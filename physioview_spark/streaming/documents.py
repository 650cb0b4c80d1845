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
