"""JSONL document ingest/egress — the raw-crawl side of the curation
suite (beyond-reference; the physioview reference ingests CSV/EDF/E4
only, but a training-data pipeline's inputs arrive as JSONL shards).

Scale stances baked in:
- **Never infer schema.** Reading JSON without a schema runs a whole
  extra pass over 100 TB just to guess types (and guesses differently
  shard to shard). Callers pass a schema or take the documents-table
  default.
- **PERMISSIVE + quarantine, not fail-fast.** Real crawls contain
  truncated lines, stray BOMs, and mixed encodings; one bad record must
  not kill a 1000-executor job. Malformed lines are routed to a
  quarantine frame for audit.
- **Line-splittable.** JSONL (one object per line) splits on newlines,
  so a 1 GB shard fans out across tasks; ``multiLine`` JSON does not —
  deliberately unsupported here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Default schema matching the engine's ``documents`` table.
DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

_CORRUPT = "_corrupt_record"


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    corrupt_col: str = _CORRUPT,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL shards into ``(good, quarantine)`` frames.

    ``good`` carries exactly ``schema``'s columns for rows that parsed;
    ``quarantine`` carries ``(corrupt_col,)`` — the raw text of every
    line that did not (malformed JSON, or a parsed line whose field
    TYPE mismatched — PERMISSIVE semantics, so ingest audits see every
    suspect line).

    Implementation note: this reads ``spark.read.text`` + ``from_json``
    rather than ``spark.read.json``, because plans over a raw JSON scan
    that reference only the corrupt column are rejected by the analyzer
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — even a
    plain ``quarantine.count()`` throws after column pruning. The
    text-scan form has no such landmine, is the same single
    line-splittable pass, and keeps parsing JVM-side (``from_json`` is
    a codegen'd Catalyst expression, not a UDF).
    """
    full = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType())])
    # blank lines (shard separators, trailing newlines) are skipped, as
    # JSONL tooling conventionally does — quarantining them would bury
    # the genuinely truncated records an ingest audit looks for
    raw = spark.read.text(path).where(F.trim(F.col("value")) != "")
    parsed = raw.select(
        F.col("value"),
        F.from_json(
            "value", full,
            {"columnNameOfCorruptRecord": corrupt_col}).alias("j"),
    )
    names = [f.name for f in schema.fields]
    bad_row = F.col("j").isNull() | F.col(f"j.{corrupt_col}").isNotNull()
    good = parsed.where(~bad_row).select(
        *[F.col(f"j.{n}").alias(n) for n in names])
    quarantine = parsed.where(bad_row).select(
        F.col("value").alias(corrupt_col))
    return good, quarantine


def write_jsonl(
    df: DataFrame,
    path: str,
    n_files: int | None = None,
    compression: str | None = None,
) -> None:
    """Write a frame as JSONL shards. ``n_files`` coalesces (narrow, no
    shuffle) for small exports; default keeps the upstream partitioning
    — at corpus scale one file per task is the right layout. Use a
    splittable layout (many files) rather than one giant compressed
    blob; gzip shards are fine because the file, not the byte stream,
    is the split unit here."""
    out = df.coalesce(n_files) if n_files else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
