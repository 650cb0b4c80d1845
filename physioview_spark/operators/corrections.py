"""Correction acceptance/revert and unusable-boundary hygiene — Q6/Q7.

Parity:
- Q6 accept/revert (reference: dashboard/utils.py:139-185): accept swaps
  the suggested ``corrected`` flags into ``beat`` (saving ``original_beat``)
  and re-runs artifact identification; revert restores ``original_beat``.
- Q7 boundary nulling (reference: dashboard/callbacks.py:1660-1688): for
  every contiguous unusable block, the LAST non-null IBI/artifact before
  the block and the FIRST after it are nulled (their intervals cross the
  unusable region).

Spark-first: Q6 is pure column surgery plus the engine's artifact kernel;
Q7 is gaps-and-islands (row_number difference) for block bounds, then two
small aggregate joins — no per-subject Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

B = "subject_id"


def accept_corrections(
    samples: DataFrame,
    fs: float,
    artifact_method: str = "cbd",
    artifact_tol: float = 1.0,
) -> DataFrame:
    """Q6 accept: ``original_beat`` := old beats, ``beat`` := corrected
    flags, artifacts re-identified on the new beat train."""
    out = (
        samples
        .withColumn("original_beat",
                    F.when(F.col("beat") == 1, F.lit(1.0)))
        .withColumn("beat", F.when(F.col("corrected") == 1, F.lit(1.0)))
        .drop("corrected")
    )
    return _reidentify_artifacts(out, fs, artifact_method, artifact_tol)


def revert_corrections(
    samples: DataFrame,
    fs: float,
    artifact_method: str = "cbd",
    artifact_tol: float = 1.0,
) -> DataFrame:
    """Q6 revert: ``beat`` := ``original_beat``, artifacts re-identified."""
    out = samples.withColumn(
        "beat", F.when(F.col("original_beat") == 1, F.lit(1.0)))
    return _reidentify_artifacts(out, fs, artifact_method, artifact_tol)


def _reidentify_artifacts(samples, fs, method, tol):
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from physioview_spark.functions.kernels_artifacts import (
        identify_artifacts,
    )

    schema = T.StructType(
        samples.drop("artifact").schema.fields
        + [T.StructField("artifact", T.DoubleType(), True)]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx").reset_index(drop=True)
        pdf = pdf.drop(columns=["artifact"], errors="ignore")
        beats = pdf.index[pdf["beat"] == 1].to_numpy()
        beat_samples = pdf["sample_idx"].to_numpy()[beats]
        arts = identify_artifacts(beat_samples, fs, method=method, tol=tol)
        artifact = np.full(len(pdf), np.nan)
        if len(arts):
            pos = np.searchsorted(pdf["sample_idx"].to_numpy(), arts)
            artifact[pos] = 1.0
        pdf["artifact"] = artifact
        return pdf

    return samples.groupBy(B).applyInPandas(run, schema=schema)


def unusable_blocks(samples: DataFrame,
                    unusable_col: str = "unusable") -> DataFrame:
    """Contiguous unusable blocks per subject via gaps-and-islands:
    block id = sample_idx - row_number (constant within a run)."""
    w = Window.partitionBy(B).orderBy("sample_idx")
    return (
        samples.where(F.col(unusable_col) == 1)
        .select(B, "sample_idx")
        .withColumn("__grp",
                    F.col("sample_idx") - F.row_number().over(w))
        .groupBy(B, "__grp")
        .agg(F.min("sample_idx").alias("lo"),
             F.max("sample_idx").alias("hi"))
        .drop("__grp")
    )


def null_boundary_values(
    samples: DataFrame,
    value_cols: list[str] = ("ibi_ms", "artifact"),
    unusable_col: str = "unusable",
) -> DataFrame:
    """Q7: for each unusable block, null the last non-null value before it
    and the first after it, per value column. Blocks are few, so bound
    lookups broadcast; the sample frame is touched with two joins, no
    Python."""
    blocks = unusable_blocks(samples, unusable_col)
    out = samples
    for c in value_cols:
        vals = samples.where(F.col(c).isNotNull()).select(B, "sample_idx")
        pre = (
            vals.join(F.broadcast(blocks), on=B)
            .where(F.col("sample_idx") < F.col("lo"))
            .groupBy(B, "lo")
            .agg(F.max("sample_idx").alias("sample_idx"))
            .select(B, "sample_idx")
        )
        post = (
            vals.join(F.broadcast(blocks), on=B)
            .where(F.col("sample_idx") > F.col("hi"))
            .groupBy(B, "hi")
            .agg(F.min("sample_idx").alias("sample_idx"))
            .select(B, "sample_idx")
        )
        kill = pre.union(post).distinct().withColumn("__kill", F.lit(1))
        out = (
            out.join(F.broadcast(kill), [B, "sample_idx"], "left")
            .withColumn(c, F.when(F.col("__kill").isNull(), F.col(c)))
            .drop("__kill")
        )
    return out
