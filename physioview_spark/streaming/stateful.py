"""Custom stateful streaming operator: incremental IBI computation.

Parity: batch IBI is an ordered lag diff over beat rows (W1, reference:
physioview/physioview.py:977-1020; batch engine operator
operators/ibi.py). Under Structured Streaming the previous beat can sit
in an earlier micro-batch, so the diff needs keyed state: the last beat
timestamp per subject, carried with ``applyInPandasWithState`` — Spark's
idiomatic escape hatch for custom sequential streaming logic.

Semantics: one output row per beat with ``ibi_ms`` = millisecond gap to
the subject's previous beat (null for the subject's first-ever beat).
Beats are assumed in event-time order per subject within the stream
(guaranteed by the upstream watermark + sorted source in practice;
within a micro-batch the operator sorts explicitly).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "subject_id string, ts timestamp, ibi_ms double"
_STATE_SCHEMA = "last_us long"


def _ibi_func(key, pdf_iter, state: GroupState):
    (subject_id,) = key
    last_us = state.get[0] if state.exists else None
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        pdf = pdf.sort_values("ts")
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        prev = us.shift(1)
        if last_us is not None:
            prev.iloc[0] = last_us
        last_us = int(us.iloc[-1])
        yield pd.DataFrame({
            "subject_id": subject_id,
            "ts": pdf["ts"].values,
            "ibi_ms": (us - prev) / 1000.0,
        })
    if last_us is not None:
        state.update((last_us,))


def streaming_ibis(beats: DataFrame, watermark: str = "1 minute") -> DataFrame:
    """Incremental per-subject IBI over a stream of beat events
    (rows: subject_id, ts). Works on batch DataFrames too (falls back to
    the relational lag-window form — same output)."""
    if not beats.isStreaming:
        from pyspark.sql import Window, functions as F

        w = Window.partitionBy("subject_id").orderBy("ts")
        return beats.select(
            "subject_id", "ts",
            (F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
             / 1000.0).alias("ibi_ms"),
        )
    return (
        beats.withWatermark("ts", watermark)
        .groupBy("subject_id")
        .applyInPandasWithState(
            _ibi_func, _OUT_SCHEMA, _STATE_SCHEMA,
            "append", GroupStateTimeout.NoTimeout,
        )
    )
