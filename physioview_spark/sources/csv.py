"""Generic CSV ingest with column mapping — S6/S7/S9 parity.

- ``load_signal_csv``: reads one or many CSVs, maps arbitrary user headers
  to the canonical schema (Timestamp / <dtype> / X / Y / Z / TEMP), adds an
  explicit ``sample_idx`` (replacing the reference's positional index) and
  a ``subject_id`` from the file name (reference: dashboard/utils.py:437-492).
- Batch mode is ONE multi-file scan with ``input_file_name()`` — Spark's
  partition-parallel read replaces the reference's sequential per-file loop
  (reference: dashboard/callbacks.py:743-892), the single biggest
  scalability win over the original.
- ``infer_unix_unit``: s/ms/µs inference from the median magnitude
  (reference: dashboard/utils.py:308-325).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def infer_unix_unit(df: DataFrame, ts_col: str,
                    sample_rows: int = 10000) -> str | None:
    """Infer Unix timestamp unit (s/ms/us) from the median magnitude of
    a BOUNDED sample. All three unit bands differ by >=100x, so any
    sample answers as reliably as the full column; the previous
    full-column median was an extra eager pass over every row of every
    CSV at ingest (reference does the same on pandas, where the data is
    already in memory — on a 100 TB scan it is not free)."""
    med = (df.select(F.col(ts_col).cast("double").alias("m"))
           .where(F.col("m").isNotNull())
           .limit(sample_rows)
           .agg(F.median("m").alias("m"))
           .first()["m"])
    if med is None:
        return None
    if 1e8 < med < 2e9:
        return "s"
    if 1e11 < med < 2e13:
        return "ms"
    if 1e14 < med < 2e16:
        return "us"
    return None


def _to_timestamp(col, unit: str):
    c = F.col(col).cast("double")
    scale = {"s": 1.0, "ms": 1e3, "us": 1e6}[unit]
    return F.timestamp_micros((c / scale * 1e6).cast("long"))


def load_signal_csv(
    spark: SparkSession,
    path: str | list[str],
    dtype: str,
    header_map: dict[str, str],
    fs: float | None = None,
    has_ts: bool = True,
    assume_partitioned: bool = False,
) -> DataFrame:
    """Read CSV(s) into the canonical sample frame.

    ``header_map``: user header -> canonical name ('ts', the dtype value
    column, 'x','y','z','temp'). ``sample_idx`` is assigned per subject in
    file order (row_number over a monotonic id — stable for text files).

    ``assume_partitioned``: shuffle-free indexing for the file-per-subject
    layout — each scan partition holds whole subjects (true for CSVs
    below ``maxPartitionBytes``), so ``sample_idx`` is a per-partition
    running count per subject via ``mapInPandas`` instead of a
    ``row_number`` over a full-frame exchange. At cohort scale the dense
    frame then reaches the kernels without ever shuffling.
    """
    raw = spark.read.csv(path, header=True, inferSchema=True)
    subject = F.regexp_replace(
        F.element_at(F.split(F.input_file_name(), "/"), -1), r"\.csv$", ""
    )
    df = raw.withColumn("subject_id", subject)
    selected = [F.col("subject_id")]
    if not assume_partitioned:
        df = df.withColumn("__mono", F.monotonically_increasing_id())
        selected.append(F.col("__mono"))
    for user_col, canon in header_map.items():
        selected.append(F.col(f"`{user_col}`").alias(canon))
    df = df.select(*selected)
    if assume_partitioned:
        import numpy as np

        out_schema = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema]
            + ["sample_idx long"])

        def assign(batches):
            counters: dict[str, int] = {}
            for pdf in batches:
                pdf = pdf.reset_index(drop=True)
                idx = np.empty(len(pdf), dtype=np.int64)
                for subj, grp in pdf.groupby("subject_id", sort=False):
                    c0 = counters.get(subj, 0)
                    n = len(grp)
                    idx[grp.index.to_numpy()] = np.arange(c0, c0 + n)
                    counters[subj] = c0 + n
                pdf["sample_idx"] = idx
                yield pdf

        df = df.mapInPandas(assign, out_schema)
    else:
        w = Window.partitionBy("subject_id").orderBy("__mono")
        df = df.withColumn(
            "sample_idx", F.row_number().over(w) - 1).drop("__mono")

    if has_ts and "ts" in df.columns:
        dt = dict(df.dtypes)["ts"]
        if dt in ("bigint", "double", "int"):
            unit = infer_unix_unit(df, "ts")
            if unit is not None:
                df = df.withColumn("ts", _to_timestamp("ts", unit))
            elif fs:
                # numeric but not unix: treat as seconds-elapsed at fs
                df = df.withColumn(
                    "ts",
                    F.timestamp_micros(
                        (F.col("ts").cast("double") * 1e6).cast("long")
                    ),
                )
        elif dt == "string":
            df = df.withColumn("ts", F.to_timestamp("ts"))
    front = ["subject_id", "sample_idx"] + (["ts"] if "ts" in df.columns else [])
    rest = [c for c in df.columns if c not in front]
    return df.select(*front, *rest)


def write_stage(df: DataFrame, base_dir: str, stage: str,
                fmt: str = "parquet") -> str:
    """Stage materialization sink (replaces the reference's per-subject
    temp CSVs, reference: dashboard/callbacks.py:859-888): one partitioned
    parquet dataset per stage, partitioned by subject for pruned re-reads."""
    out = os.path.join(base_dir, stage)
    (df.write.mode("overwrite").partitionBy("subject_id")
     .format(fmt).save(out))
    return out


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
) -> str:
    """Bucketed-table sink for co-located joins (SURVEY §7 scale path).

    Writing both sides of a recurring big-big join bucketed on the join
    key lets Spark plan a sort-merge join with NO Exchange on either
    side — at 100 TB the shuffle this avoids is the dominant cost of the
    join. Bucket pruning also serves point lookups on the bucket key.
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
    return table


def is_valid_csv_member(name: str) -> bool:
    """S8 parity: archive-member CSV validity (reference:
    dashboard/utils.py:280-287) — .csv suffix, not a macOS resource fork,
    not hidden, not a directory entry."""
    base = name.rsplit("/", 1)[-1]
    return (
        name.endswith(".csv")
        and not name.startswith(("__MACOSX/", "."))
        and not base.startswith(".")
        and not name.endswith("/")
    )


def probe_csv_headers(spark: SparkSession, path: str) -> list[str]:
    """S8 parity: header row of a CSV without a full scan (reference:
    dashboard/utils.py:422-428) — one bounded head read, no Spark job."""
    line = read_first_line(spark, path)
    if not line:
        return []
    return [h.strip() for h in line.split(",")]


def list_batch_files(spark: SparkSession, path: str | list[str],
                     suffix: str | None = None) -> list[str]:
    """Driver-side file enumeration through the Hadoop FileSystem API —
    one metadata RPC per path/glob, any scheme Spark can read (file, hdfs,
    s3a, ...). Directories expand one level, matching ``spark.read``."""
    from physioview_spark.sources import fsio

    return fsio.list_files(spark, path, suffix=suffix)


def read_first_line(spark: SparkSession, uri: str,
                    max_bytes: int = 65536) -> str:
    """First line of a file with a BOUNDED read (<= ``max_bytes``) on
    every scheme — local files via open(), remote via one positioned
    Hadoop FileSystem read. Never a Spark job: validating thousands of
    remote CSVs costs O(files) stream opens, not O(files) job-launch
    round trips (and never a full-file pass)."""
    from physioview_spark.sources import fsio

    head = fsio.read_head(spark, uri, max_bytes)
    return head.split(b"\n", 1)[0].decode("utf-8", "replace").rstrip("\r")


def validate_batch_headers(
    spark: SparkSession, path: str | list[str]
) -> tuple[bool, dict[str, list[str]]]:
    """S7 parity: verify header homogeneity across a batch of CSVs
    (reference: dashboard/callbacks.py:455-462).

    Cost model: one FileSystem metadata listing + one bounded (<=64 KiB)
    head read per FILE — independent of corpus bytes. The previous
    implementation scanned and shuffled every row of every CSV to pick
    line 1 (and its first-row-per-input_file_name ordering was unsound
    for files split across partitions); at 100 TB that scan, not the
    validation, would dominate the whole ingest."""
    headers: dict[str, list[str]] = {}
    for uri in list_batch_files(spark, path):
        line = read_first_line(spark, uri)
        headers[uri] = [h.strip() for h in line.split(",")]
    uniq = {tuple(v) for v in headers.values()}
    return len(uniq) <= 1, headers
