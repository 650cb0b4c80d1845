"""Event-time windowed SQA metrics, batch/streaming-polymorphic.

Parity: segmented metrics (A1/A3, reference: pipeline/SQA.py:161-196),
rolling metrics (A4, reference: pipeline/SQA.py:114-175), per-second
harmonic-mean HR (A5, reference: pipeline/SQA.py:631-723 — Graham 1978).

Spark-first: all three are pure event-time window aggregations
(`F.window(ts, size [, slide])`), which Catalyst compiles to hash
aggregations in batch and to incremental stateful aggregations under
Structured Streaming. The SAME function body serves both: pass a batch
DataFrame or a `readStream` DataFrame. A watermark is attached only in
streaming mode so late data is bounded and state can be evicted.

Late / out-of-order semantics (pinned by
tests/test_streaming.py::TestLateDataWatermark): rows may arrive in any
order within the watermark delay and land in their window; a window is
emitted once, when the eviction watermark (max event time seen minus
delay, updated per micro-batch) passes its end. A straggler is DROPPED
when its window end is behind the LATE-EVENTS watermark — Spark's
``watermarkForLateEvents`` trails ``watermarkForEviction`` by one
micro-batch, so a row arriving in the same batch that closes its window
still merges in (one batch of grace); a batch later it is filtered
(``numRowsDroppedByWatermark``) and the emitted window is final. The
stateful twin (``streaming_eda_features_extended``) filters late ROWS
against that same late-events watermark before the state function, so a
timed-out window key is never resurrected into a duplicate emission.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def await_stream(query, timeout_sec: float | None = None) -> None:
    """Block until a (typically ``availableNow``-triggered) streaming
    query terminates, or raise.

    ``StreamingQuery.awaitTermination(timeout)`` signals timeout by
    RETURNING ``False`` — it does not raise. A caller that ignores the
    return and then reads the memory sink gets a partially-populated
    (often empty) frame: a silent wrong answer instead of an error.
    Here a timeout stops the query and raises ``TimeoutError`` so
    harnesses record a failure they can see.

    ``awaitTermination`` still raises ``StreamingQueryException`` itself
    when the stream died with an error — that propagates unchanged.
    """
    if timeout_sec is None:
        timeout_sec = float(
            os.environ.get("PHYSIOVIEW_STREAM_TIMEOUT_SEC", "600"))
    if not query.awaitTermination(timeout_sec):
        try:
            query.stop()
        except Exception:
            # stop() failing (e.g. the query just errored) must not
            # replace the TimeoutError diagnosis below
            pass
        raise TimeoutError(
            f"streaming query {query.name!r} still running after "
            f"{timeout_sec}s; refusing to read an incomplete sink "
            "(raise PHYSIOVIEW_STREAM_TIMEOUT_SEC on a loaded machine)")


def with_watermark_if_streaming(df: DataFrame, ts_col: str,
                                delay: str) -> DataFrame:
    """Attach an event-time watermark when (and only when) ``df`` is a
    streaming DataFrame — keeps operator definitions batch/streaming
    polymorphic."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def streaming_segment_sqa(
    samples: DataFrame,
    seg_seconds: int = 60,
    min_hr: float = 40.0,
    watermark: str = "2 minutes",
    beat_col: str = "beat",
    artifact_col: str = "artifact",
) -> DataFrame:
    """Tumbling-window segment SQA: detected/artifact counts, artifact %,
    and the Invalid rule (P7: detected < min_hr*(seg/60) or > a FLAT 220,
    reference: pipeline/SQA.py:193-196) per (subject, segment window).

    The Invalid rule is the SAME expression as the batch twin
    (operators/metrics.py compute_metrics): only the lower bound scales
    with segment length; the 220 upper bound is flat, and a valid segment
    carries NULL (not 0) — one frame, one answer in both modes.
    """
    df = with_watermark_if_streaming(samples, "ts", watermark)
    detected = F.sum(F.when(F.col(beat_col) == 1, 1).otherwise(0))
    artifacts = F.sum(F.when(F.col(artifact_col) == 1, 1).otherwise(0))
    lo = int(min_hr * (seg_seconds / 60.0))
    return (
        df.groupBy("subject_id", F.window("ts", f"{seg_seconds} seconds"))
        .agg(detected.alias("n_detected"), artifacts.alias("n_artifact"))
        .select(
            "subject_id",
            F.col("window.start").alias("segment_start"),
            "n_detected",
            "n_artifact",
            F.round(
                F.col("n_artifact")
                / F.nullif(F.col("n_detected"), F.lit(0)) * 100.0,
                2,
            ).alias("pct_artifact"),
            F.when(
                (F.col("n_detected") < F.lit(lo))
                | (F.col("n_detected") > 220),
                1,
            ).cast("int").alias("invalid"),
        )
    )


def streaming_rolling_sqa(
    samples: DataFrame,
    window_seconds: int = 300,
    step_seconds: int = 15,
    watermark: str = "10 minutes",
    beat_col: str = "beat",
    artifact_col: str = "artifact",
) -> DataFrame:
    """Sliding-window SQA (A4): size/step windows over beat + artifact
    flags. In streaming this is incremental multi-window state; in batch
    Catalyst expands each row into its covering windows (same results)."""
    df = with_watermark_if_streaming(samples, "ts", watermark)
    return (
        df.groupBy(
            "subject_id",
            F.window("ts", f"{window_seconds} seconds",
                     f"{step_seconds} seconds"),
        )
        .agg(
            F.sum(F.when(F.col(beat_col) == 1, 1).otherwise(0))
            .alias("n_detected"),
            F.sum(F.when(F.col(artifact_col) == 1, 1).otherwise(0))
            .alias("n_artifact"),
        )
        .select(
            "subject_id",
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_detected", "n_artifact",
        )
    )


def streaming_eda_features(
    samples: DataFrame,
    value_cols: list[str] = ("phasic", "tonic"),
    window_seconds: int = 180,
    step_seconds: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """A12 streaming twin: the flirt-style rolling EDA feature frame
    (operators/eda_metrics.py compute_eda_features) under Structured
    Streaming — the feature set is already pure sliding-window
    aggregation (mean/std/min/max/range/rms/sum, regr_slope trend, exact
    interpolated percentiles), so the SAME body runs incrementally once
    a watermark bounds the window state. Batch/streaming parity asserted
    in tests/test_streaming.py."""
    from physioview_spark.operators.eda_metrics import compute_eda_features

    df = with_watermark_if_streaming(samples, "ts", watermark)
    return compute_eda_features(
        df, value_cols=value_cols, window_seconds=window_seconds,
        step_seconds=step_seconds,
    )


def streaming_eda_features_extended(
    samples: DataFrame,
    value_cols: list[str] = ("phasic", "tonic"),
    window_seconds: int = 180,
    step_seconds: int | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """A12 extended streaming twin over tumbling OR sliding windows.

    The extended feature set (entropies, peaks, line integral — see
    operators/eda_metrics.py ``extended=True``) is order-dependent, so
    its batch form uses unbounded analytic windows that Structured
    Streaming cannot run incrementally. The streaming shape is instead
    the engine's stateful pattern (streaming/stateful.py): key by
    (subject, window id), buffer the window's samples in keyed state
    (bounded: window_seconds x sample rate, e.g. 180 s x 4 Hz =
    720 floats/col), and emit ONE row per window when the event-time
    watermark closes it — computed by the same NumPy kernel
    (operators/eda_metrics.py ``eda_window_stats_np``) the batch parity
    test pins against the relational forms.

    ``step_seconds`` < ``window_seconds`` (the batch gear's default
    180s/60s geometry — r15, VERDICT r14 item 4) replicates each sample
    into its covering windows BEFORE the stateful groupBy (exactly
    ``F.window``'s epoch-aligned assignment, via an exact-integer
    ``sequence(floordiv(t-win,step)+1, floordiv(t,step))`` explode), so
    the same tumbling machinery runs per overlapping window. State and
    shuffle grow by the bounded overlap factor window/step (x3 at the
    default geometry). Default ``None`` keeps tumbling. Batch input
    falls back to ``compute_eda_features(extended=True)`` at the same
    geometry, so batch==stream comparisons are one call on each side.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    from physioview_spark.operators.eda_metrics import (
        EXTENDED_FEATURES, compute_eda_features, eda_window_stats_np,
    )

    value_cols = list(value_cols)
    if step_seconds is None:
        step_seconds = window_seconds
    if step_seconds > window_seconds:
        raise ValueError("step_seconds must be <= window_seconds")
    if not samples.isStreaming:
        return compute_eda_features(
            samples, value_cols=value_cols,
            window_seconds=window_seconds, step_seconds=step_seconds,
            ts_col=ts_col, extended=True)

    out_schema = ("subject_id string, window_start timestamp, "
                  "window_end timestamp, n long, " + ", ".join(
                      f"{c}_{f} double" for c in value_cols
                      for f in EXTENDED_FEATURES))
    # full-microsecond timestamps in state: the order-dependent features
    # must see the exact sample order, and integer seconds tie at any
    # sub-1 Hz-resolution rate (the batch twin orders by ts_col)
    state_schema = ("us array<long>, " + ", ".join(
        f"v_{i} array<double>" for i in range(len(value_cols))))
    win_us = int(window_seconds * 1_000_000)
    step_us = int(step_seconds * 1_000_000)

    def func(key, pdf_iter, state: GroupState):
        subject, wid = key
        if state.hasTimedOut:
            us, *vals = state.get
            state.remove()
            us = np.asarray(us, dtype=np.int64)
            order = np.argsort(us, kind="stable")
            # batch __sec is integer-second truncation of the timestamp
            secs = (us[order] // 1_000_000).astype(np.float64)
            row = {
                "subject_id": subject,
                "window_start": pd.Timestamp(int(wid) * step_us,
                                             unit="us"),
                "window_end": pd.Timestamp(int(wid) * step_us + win_us,
                                           unit="us"),
                "n": len(order),
            }
            for c, v in zip(value_cols, vals):
                x = np.asarray(v, dtype=np.float64)[order]
                stats = eda_window_stats_np(x, secs)
                row.update({f"{c}_{f}": stats[f]
                            for f in EXTENDED_FEATURES})
            yield pd.DataFrame([row])
            return
        us, *vals = (state.get if state.exists
                     else ([], *[[] for _ in value_cols]))
        us = list(us)
        vals = [list(v) for v in vals]
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            t = pdf[ts_col].astype("datetime64[us]").astype("int64")
            us.extend(int(x) for x in t)
            for i, c in enumerate(value_cols):
                vals[i].extend(pdf[c].astype(float).tolist())
        state.update((us, *vals))
        # close the window once the event-time watermark passes its end
        state.setTimeoutTimestamp((int(wid) * step_us + win_us) // 1000)

    t_us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp"),
        F.col(ts_col))
    # exact-integer floor division (no double rounding at 1e15 us):
    # floordiv(a, b) = (a - pmod(a, b)) / b, pmod >= 0
    fdiv = lambda a, b: ((a - F.pmod(a, F.lit(b))) / F.lit(b)).cast("long")  # noqa: E731,E501
    # covering epoch-aligned window ids: starts s = k*step with
    # t - win < s <= t — identical to F.window's batch assignment
    wids = (F.sequence(fdiv(t_us - F.lit(win_us), step_us) + F.lit(1),
                       fdiv(t_us, step_us))
            if step_seconds < window_seconds
            else F.array(fdiv(t_us, step_us)))
    return (
        samples.withWatermark(ts_col, watermark)
        # materialized column, not a groupBy alias — the stateful
        # operator resolves grouping attributes, not expressions
        .withColumn("__wid", F.explode(wids))
        .groupBy("subject_id", "__wid")
        .applyInPandasWithState(
            func, out_schema, state_schema,
            "append", GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_seconds_hr(
    beats: DataFrame,
    watermark: str = "30 seconds",
    ibi_col: str = "ibi_ms",
) -> DataFrame:
    """Per-second beat stats (A5): N beats, mean IBI, harmonic-mean HR
    ``1/mean(1/hr)`` (Graham 1978, reference: pipeline/SQA.py:666-669).

    Input: beat events only (one row per detected beat, with its IBI in
    ms). The reference's ±1 s context window becomes a 3 s sliding window
    with 1 s step, centered by construction.
    """
    df = with_watermark_if_streaming(beats, "ts", watermark)
    hr = F.lit(60000.0) / F.col(ibi_col)
    return (
        df.where(F.col(ibi_col).isNotNull() & (F.col(ibi_col) > 0))
        .groupBy("subject_id", F.window("ts", "3 seconds", "1 second"))
        .agg(
            F.count(F.lit(1)).alias("n_beats"),
            F.avg(F.col(ibi_col)).alias("mean_ibi_ms"),
            (F.lit(1.0) / F.avg(F.lit(1.0) / hr)).alias("harmonic_hr"),
        )
        .select(
            "subject_id",
            # label = the center second of the 3 s window
            F.timestamp_add("SECOND", F.lit(1), F.col("window.start"))
            .alias("second"),
            "n_beats", "mean_ibi_ms", "harmonic_hr",
        )
    )
