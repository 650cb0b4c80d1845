"""Interval (range) joins and span expansion — J3 / Q7 operators.

Parity: the reference maps unusable ``[from, to]`` spans onto nearest sample
indices with ``searchsorted`` (reference: physioview/physioview.py:1761-1790)
and expands contiguous blocks when upsampling edits (reference:
dashboard/callbacks.py:2464-2478).

Spark-first: an interval join is ``sample.k BETWEEN span.lo AND span.hi``
with the (small) span side broadcast — simpler and plan-friendlier than the
reference's nearest-endpoint trick. Block expansion is
``sequence`` + ``explode`` (the engine's only UDTF-shaped op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    spans: DataFrame,
    point_col: str,
    lo_col: str = "from",
    hi_col: str = "to",
    by: list[str] | None = None,
    how: str = "inner",
    broadcast_spans: bool = True,
) -> DataFrame:
    """Join points to the spans containing them.

    Span tables (edit logs, unusable regions) are tiny relative to sample
    frames, so the span side broadcasts — the join is then a narrow
    map-side nested-loop with no shuffle of the big side. At 100 TB the
    sample frame never moves.
    """
    by = by or []
    rhs = F.broadcast(spans) if broadcast_spans else spans
    cond = (F.col(f"__p.{point_col}") >= F.col(f"__s.{lo_col}")) & (
        F.col(f"__p.{point_col}") <= F.col(f"__s.{hi_col}")
    )
    for b in by:
        cond = cond & (F.col(f"__p.{b}") == F.col(f"__s.{b}"))
    out = points.alias("__p").join(rhs.alias("__s"), cond, how)
    span_cols = [c for c in spans.columns if c not in by]
    return out.select(
        *[F.col(f"__p.{c}") for c in points.columns],
        *[F.col(f"__s.{c}").alias(c) for c in span_cols],
    )


def expand_spans(
    spans: DataFrame,
    lo_col: str = "from",
    hi_col: str = "to",
    step: int = 1,
    out_col: str = "sample_idx",
) -> DataFrame:
    """Explode [lo, hi] integer spans into one row per position."""
    return spans.withColumn(
        out_col,
        F.explode(
            F.sequence(
                F.col(lo_col).cast("long"), F.col(hi_col).cast("long"), F.lit(step)
            )
        ),
    )


def flag_spans(
    samples: DataFrame,
    spans: DataFrame,
    point_col: str = "sample_idx",
    lo_col: str = "from",
    hi_col: str = "to",
    by: list[str] | None = None,
    flag_col: str = "unusable",
) -> DataFrame:
    """Mark sample rows falling inside any span with ``flag_col = 1``.

    Left interval-join + dedup: a sample inside two overlapping spans is
    still flagged once.
    """
    by = by or ["subject_id"]
    marked = interval_join(
        samples.select(*by, point_col).dropDuplicates([*by, point_col]),
        spans.select(*by, lo_col, hi_col),
        point_col, lo_col, hi_col, by=by, how="inner",
    ).select(*by, point_col).dropDuplicates([*by, point_col]).withColumn(
        flag_col, F.lit(1.0)
    )
    return samples.join(marked, on=[*by, point_col], how="left")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side with a
    random bucket and explode the right side across all buckets, so one
    hot key spreads over ``salt_buckets`` shuffle partitions.

    AQE's skew-join split (enabled in the session factory) handles most
    skew at runtime; explicit salting is for the pathological case — a
    single subject/key holding a double-digit percentage of the data —
    where even a split partition pins one task per side. Right side must
    be the smaller input (it is replicated ``salt_buckets`` times).
    """
    from pyspark.sql import functions as F

    if isinstance(on, str):
        on = [on]
    lhs = left.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    rhs = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return lhs.join(rhs, on + ["__salt"], how).drop("__salt")
