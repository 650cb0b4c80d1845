"""Structured Streaming surface.

The reference is batch-only (SURVEY §2.9): its rolling/segment SQA
metrics are the streaming-shaped operators. Here they are expressed so
ONE definition runs identically under batch and under Structured
Streaming (watermark + event-time windows) — live ingest becomes a
`readStream` swap, not a rewrite.
"""

from physioview_spark.streaming.rolling import (
    await_stream, streaming_eda_features,
    streaming_eda_features_extended, streaming_rolling_sqa,
    streaming_seconds_hr, streaming_segment_sqa,
    with_watermark_if_streaming,
)
from physioview_spark.streaming.stateful import streaming_ibis
from physioview_spark.streaming.documents import (
    drop_near_dup_state, near_dup_batch_processor,
    streaming_doc_curation, streaming_near_dup_lsh,
)

__all__ = [
    "await_stream",
    "streaming_eda_features", "streaming_eda_features_extended",
    "streaming_rolling_sqa",
    "streaming_seconds_hr", "streaming_segment_sqa",
    "with_watermark_if_streaming", "streaming_ibis",
    "drop_near_dup_state", "near_dup_batch_processor",
    "streaming_doc_curation", "streaming_near_dup_lsh",
]
