"""Shared helpers for the engine's declared query suite."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# Pinned parquet results for queries whose semantics are not
# SQL-expressible but whose inputs are fully deterministic and
# sf-independent (synthetic kernel signals, fake multimodal codecs).
# Regenerate intentionally with tools/make_fixture_oracles.py after a
# kernel behavior change; the oracle then guards against silent
# regressions the same way the SQL twins do.
FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "oracle",
)


def fixture_oracle(name: str) -> str | None:
    """DuckDB SQL reading the pinned fixture for ``name``, or None when no
    fixture has been generated (the query then stays rows-only)."""
    d = os.path.join(FIXTURE_DIR, name)
    if not os.path.isdir(d):
        return None
    return f"SELECT * FROM read_parquet('{d}/*.parquet')"


def read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a driver table; tolerate TIMESTAMP(NANOS) parquet columns.

    The events table is written with nanosecond timestamps, which Spark's
    parquet reader only accepts as LongType under the legacy flag — so set
    it defensively (the driver's session may not have it) and convert any
    nanos-long ``ts`` back to a microsecond timestamp (integer arithmetic;
    DuckDB likewise truncates ns → µs on read).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos long -> naive (NTZ) microsecond timestamp, session-tz-proof
        df = df.withColumn(
            "ts",
            F.timestamp_add(
                "MICROSECOND",
                F.expr("ts div 1000"),
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            ),
        )
    return df


def epoch_s(col: Column | str) -> Column:
    """Naive epoch seconds (truncated) of an NTZ timestamp — matches
    DuckDB ``floor(epoch(ts))`` regardless of the Spark session timezone."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "SECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), c
    )


def ntz_lit(s: str) -> Column:
    """Timezone-independent timestamp literal for comparisons against the
    driver's (NTZ) parquet timestamp columns."""
    return F.lit(s).cast("timestamp_ntz")


def safe_div(num: Column, den: Column) -> Column:
    """ANSI-safe division: null when the denominator is zero.

    The driver may run queries under ``spark.sql.ansi.enabled=true``
    (the Spark 4 default), where bare division by zero raises.
    """
    return num / F.nullif(den, F.lit(0))


# Events-as-signal mapping used by the SQA-shaped queries: the driver's
# `events` table plays the role of an annotated sample frame — `user_id` is
# the subject, epoch-seconds since 2024-01-01 the sample index (fs = 1 Hz),
# 'purchase' events are beats, 'error' events artifacts.
EPOCH0 = "2024-01-01 00:00:00"


def events_as_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    sec = F.timestamp_diff(
        "SECOND", F.lit(EPOCH0).cast("timestamp_ntz"), F.col("ts")
    )
    return (
        ev.withColumn("subject_id", F.col("user_id").cast("string"))
        .withColumn("sample_idx", sec.cast("long"))
        .withColumn("beat", F.when(F.col("event_type") == "purchase", 1.0))
        .withColumn("artifact", F.when(F.col("event_type") == "error", 1.0))
    )
