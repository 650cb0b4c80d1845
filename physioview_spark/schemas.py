"""Canonical schemas for the engine's sample frames and metric frames.

The reference's fundamental abstraction is "one pandas row = one sample on a
uniform grid implied by fs", with the positional index doing double duty as
the sample number (reference: physioview/physioview.py:89-102, 945-975).
That implicit index is not shuffle-safe, so every Spark frame carries it
explicitly: ``subject_id`` (partitioning key) and ``sample_idx`` (0-based
position on the grid). Timestamps are derived, not authoritative:
``ts = start + sample_idx / fs``.
"""

from __future__ import annotations

from pyspark.sql import types as T

SUBJECT = T.StructField("subject_id", T.StringType(), False)
SAMPLE_IDX = T.StructField("sample_idx", T.LongType(), False)
TS = T.StructField("ts", T.TimestampType(), True)


def signal_schema(*value_cols: str, flags: tuple[str, ...] = ()) -> T.StructType:
    """Sample-frame schema: subject_id, sample_idx, ts, value cols, flag cols.

    Flags are nullable doubles (1.0 / NULL) to keep parity with the
    reference's NaN-sparse annotation columns (reference:
    pipeline/SQA.py:107, 241); internal operators treat them as booleans.
    """
    fields = [SUBJECT, SAMPLE_IDX, TS]
    fields += [T.StructField(c, T.DoubleType(), True) for c in value_cols]
    fields += [T.StructField(c, T.DoubleType(), True) for c in flags]
    return T.StructType(fields)


# Core frames
ECG_SCHEMA = signal_schema("ecg")
PPG_SCHEMA = signal_schema("bvp")
EDA_SCHEMA = signal_schema("eda")
ACC_SCHEMA = signal_schema("x", "y", "z")
TEMP_SCHEMA = signal_schema("temp")

# Cardiac SQA metric frame (reference: pipeline/SQA.py:161-196, 608-629)
CARDIAC_METRICS_SCHEMA = T.StructType([
    T.StructField("subject_id", T.StringType(), False),
    T.StructField("segment", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("n_detected", T.LongType(), True),
    T.StructField("n_expected", T.LongType(), True),
    T.StructField("n_missing", T.LongType(), True),
    T.StructField("pct_missing", T.DoubleType(), True),
    T.StructField("n_artifact", T.LongType(), True),
    T.StructField("pct_artifact", T.DoubleType(), True),
    T.StructField("invalid", T.IntegerType(), True),
])

# EDA QA metric frame (reference: pipeline/SQA.py:2120-2131, 2218-2229)
EDA_METRICS_SCHEMA = T.StructType([
    T.StructField("subject_id", T.StringType(), False),
    T.StructField("segment", T.LongType(), False),
    T.StructField("n_valid", T.LongType(), True),
    T.StructField("pct_valid", T.DoubleType(), True),
    T.StructField("n_invalid", T.LongType(), True),
    T.StructField("pct_invalid", T.DoubleType(), True),
    T.StructField("out_of_range", T.LongType(), True),
    T.StructField("pct_out_of_range", T.DoubleType(), True),
    T.StructField("excessive_slope", T.LongType(), True),
    T.StructField("pct_excessive_slope", T.DoubleType(), True),
    T.StructField("temp_out_of_range", T.LongType(), True),
    T.StructField("pct_temp_out_of_range", T.DoubleType(), True),
    T.StructField("n_scrs", T.LongType(), True),
])

# Beat-editor edit log (reference: docs/beat-editor-json.rst:57-67)
BEAT_EDIT_SCHEMA = T.StructType([
    T.StructField("x", T.DoubleType(), True),
    T.StructField("y", T.DoubleType(), True),
    T.StructField("from", T.DoubleType(), True),
    T.StructField("to", T.DoubleType(), True),
    T.StructField("editType", T.StringType(), True),
])
