"""Interbeat intervals: ordered diff over beat rows.

Parity: ``compute_ibis`` writes ``IBI_ms = diff(beats_ix) / fs * 1000`` at
the *later* beat row of each consecutive pair (reference:
physioview/physioview.py:977-1020).

Spark-first: a ``lag`` window over beat rows partitioned by subject — one
shuffle on ``subject_id`` that every later per-subject stage reuses. The
flag-column form joins the sparse IBI values back onto the sample frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def compute_ibis(
    beats: DataFrame,
    fs: float,
    idx_col: str = "sample_idx",
    by: str = "subject_id",
    out_col: str = "ibi_ms",
) -> DataFrame:
    """IBI series from a frame of beat rows (one row per detected beat)."""
    w = Window.partitionBy(by).orderBy(idx_col)
    return beats.withColumn(
        out_col,
        ((F.col(idx_col) - F.lag(idx_col).over(w)) / F.lit(fs) * 1000.0),
    )


def attach_ibis(
    samples: DataFrame,
    fs: float,
    beat_col: str = "beat",
    idx_col: str = "sample_idx",
    by: str = "subject_id",
    out_col: str = "ibi_ms",
) -> DataFrame:
    """Annotate the full sample frame with a sparse IBI column.

    IBI is non-null only at beat rows (NaN-sparse parity with the
    reference's ``IBI`` column) — computed with a window over beat rows
    only, then rejoined by (subject, sample_idx).
    """
    beats = samples.where(F.col(beat_col) == 1).select(by, idx_col)
    ibis = compute_ibis(beats, fs, idx_col=idx_col, by=by, out_col=out_col)
    return samples.join(ibis, on=[by, idx_col], how="left")
