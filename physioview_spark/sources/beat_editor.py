"""Beat Editor JSON interchange — S13 (sink), S14 (source), Q5 (apply).

Parity: the reference exports a records-oriented JSON per subject with
``Signal``/``Beat``/``Segment`` and epoch-ms timestamps for the Node/React
Beat Editor (``write_beat_editor_file``, reference:
physioview/physioview.py:1594-1688), then re-ingests ``*_edited.json``
edit instructions (``x``, ``y``, ``from``, ``to``,
``editType in {ADD, DELETE, UNUSABLE}``, reference:
docs/beat-editor-json.rst:57-67) and applies them with as-of joins and
span fills (``process_beat_edits``, reference:
physioview/physioview.py:1690-1831).

Spark-first: the sink is a distributed ``df.write.json`` after a
projection; the source is ``spark.read.json`` with an explicit schema
(never inferSchema over a big edit corpus); the application is fully
relational — dedupe-keep-last (window), as-of join with tolerance
(operators/asof.py), interval join for unusable spans
(operators/spans.py) — no per-subject Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

EDIT_SCHEMA = T.StructType([
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("from", T.DoubleType()),
    T.StructField("to", T.DoubleType()),
    T.StructField("editType", T.StringType()),
])


def write_beat_editor_json(
    df: DataFrame,
    path: str,
    fs: float,
    signal_col: str,
    beats_col: str = "beat",
    ts_col: str | None = "ts",
    extra_cols: list[str] | None = None,
) -> str:
    """Project to the Beat Editor schema and write JSON, partitioned by
    subject so the editor can read one subject's file without a scan.

    Timestamps are epoch milliseconds (the reference's
    ``date_format='epoch'``); without ``ts_col`` a 1-based ``Sample``
    column is emitted; ``Segment`` is added when missing (60 s windows,
    reference :1670-1671).
    """
    cols = [F.col("subject_id")]
    if ts_col and ts_col in df.columns:
        ms = F.timestamp_diff(
            "MILLISECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col(ts_col).cast("timestamp_ntz"),
        )
        cols.append(ms.alias("Timestamp"))
    else:
        cols.append((F.col("sample_idx") + 1).alias("Sample"))
    if "segment" in df.columns:
        cols.append(F.col("segment").alias("Segment"))
    else:
        cols.append(
            (F.floor(F.col("sample_idx") / int(fs * 60)) + 1).alias("Segment"))
    cols.append(F.col(signal_col).alias("Signal"))
    cols.append(F.col(beats_col).cast("double").alias("Beat"))
    for c in extra_cols or []:
        if c in df.columns:
            cols.append(F.col(c))
    (df.select(*cols)
       .write.mode("overwrite").partitionBy("subject_id").json(path))
    return path


def read_beat_edits(spark: SparkSession, path: str,
                    subject_id: str | None = None) -> DataFrame:
    """S14: read ``*_edited.json`` edit instructions with a fixed schema.

    ``subject_id`` overrides the default file-name-derived subject (the
    reference names files ``{subject}_edited.json``)."""
    df = spark.read.schema(EDIT_SCHEMA).json(path)
    if subject_id is not None:
        subj = F.lit(subject_id)
    else:
        subj = F.regexp_replace(
            F.element_at(F.split(F.input_file_name(), "/"), -1),
            r"(_edited)?\.json$", "")
    return df.withColumn("subject_id", subj)


def process_beat_edits(
    samples: DataFrame,
    edits: DataFrame,
    use_ts: bool = True,
) -> DataFrame:
    """Q5: apply ADD / DELETE / UNUSABLE edits to the sample frame.

    Output adds ``edited`` (final beat set), ``deleted_beat``,
    ``added_beat``, ``unusable`` — 1.0 / null sparse flags, matching the
    reference's column semantics (reference:
    physioview/physioview.py:1720-1831):

    - beat edits (non-null ``x``) are deduped keep-last per location and
      mapped to the nearest sample within 2 ms (timestamp mode) or
      1 sample (sample mode);
    - unusable ``[from, to]`` spans flag every sample in range (interval
      join, the Spark-simpler equivalent of the reference's
      nearest-endpoint ``searchsorted`` trick, reference :1761-1790);
    - ``edited`` = original beats, minus deletions, minus beats inside
      unusable spans, plus additions.
    """
    from physioview_spark.operators.asof import asof_join

    beat_edits = edits.filter(F.col("x").isNotNull())
    span_edits = edits.filter(
        F.col("from").isNotNull() & F.col("to").isNotNull())

    if use_ts:
        key_col, tol = "ts", 0.002
        # epoch ms -> timestamp, matching the sink's epoch-ms export
        beat_edits = beat_edits.withColumn(
            key_col,
            F.timestamp_millis(F.col("x").cast("long"))
            .cast(dict(samples.dtypes).get("ts", "timestamp")))
    else:
        key_col, tol = "sample_idx", 1.0
        beat_edits = beat_edits.withColumn(
            key_col, F.round(F.col("x")).cast("long"))

    # dedupe keep-LAST edit per location (reference :1754-1755); file
    # order is made explicit first (nondeterministic exprs can't sit
    # directly in a window ORDER BY)
    beat_edits = beat_edits.withColumn("__ord", F.monotonically_increasing_id())
    w_dupe = (Window.partitionBy("subject_id", key_col)
              .orderBy(F.col("__ord").desc()))
    beat_edits = (beat_edits
                  .withColumn("__rn", F.row_number().over(w_dupe))
                  .filter(F.col("__rn") == 1)
                  .select("subject_id", key_col,
                          F.col("editType").alias("edit_type")))

    out = asof_join(
        samples, beat_edits, on=key_col, by="subject_id",
        direction="nearest", tolerance=tol, suffix="_e")
    out = out.drop(f"{key_col}_e")

    # unusable spans: sample key BETWEEN from AND to (broadcast spans)
    if use_ts:
        point = F.timestamp_diff(
            "MILLISECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col("ts").cast("timestamp_ntz"),
        ).cast("double")
    else:
        point = F.col("sample_idx").cast("double")
    spans = span_edits.select(
        "subject_id",
        F.least("from", "to").alias("__lo"),
        F.greatest("from", "to").alias("__hi"),
    )
    out = out.withColumn("__pt", point)
    matched = (out.join(
        F.broadcast(spans),
        on=[out.subject_id == spans.subject_id,
            F.col("__pt") >= F.col("__lo"),
            F.col("__pt") <= F.col("__hi")],
        how="left_semi")
        .select("subject_id", "sample_idx", F.lit(1.0).alias("unusable")))
    out = out.join(matched, ["subject_id", "sample_idx"], "left")

    one = F.lit(1.0)
    beat = F.col("beat") == 1
    is_add = F.col("edit_type_e") == "ADD"
    is_del = F.col("edit_type_e") == "DELETE"
    unusable = F.col("unusable") == 1.0
    return (out
            .withColumn("deleted_beat", F.when(is_del, one))
            .withColumn("added_beat", F.when(is_add, one))
            .withColumn(
                "edited",
                F.when(is_add, one)
                 .when(is_del | unusable, F.lit(None).cast("double"))
                 .when(beat, one))
            .drop("edit_type_e", "__pt"))


def rescale_edit_indices(
    edits: DataFrame, source_fs: float, target_fs: float
) -> DataFrame:
    """K23 parity: remap edit sample indices between sampling rates,
    ``rint(ix * target/source)`` (reference: dashboard/utils.py:860-868).
    Applies to ``x`` and to ``from``/``to`` span bounds when present."""
    scale = float(target_fs) / float(source_fs)
    out = edits
    for c in ("x", "from", "to"):
        if c in edits.columns:
            out = out.withColumn(
                c, F.round(F.col(c) * scale).cast("double"))
    return out
