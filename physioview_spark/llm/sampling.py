"""Deterministic stratified sampling for corpus curation.

A 100 TB curation pipeline rarely takes everything it crawled: it fills
per-stratum quotas (language x quality bucket, domain mixing weights,
dedup-cluster caps). The operators here are deterministic — the "random"
order is a seeded hash of the document id, so the same corpus + seed
always yields the same sample, independent of partitioning — and every
expression has an exact ANSI-SQL twin for the DuckDB oracle.

Scale design: per-stratum top-k uses ``row_number`` over
``Window.partitionBy(strata)``. Spark >= 3.5 rewrites the ``rank <= k``
filter into a ``WindowGroupLimit`` physical node, which applies a partial
per-mapper limit BEFORE the shuffle — each map task forwards at most
``k`` rows per stratum it sees, so the exchange carries
O(num_partitions * strata * k) rows, not the corpus. Verified in the plan
audit (PLANS.md). Strata counts are small (languages x buckets), so
stratum skew is bounded by the same partial limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sample_order(id_col: str = "doc_id", seed: int = 42) -> F.Column:
    """Deterministic pseudo-random sort key: ``md5(seed || '|' || id)``.

    Stable across runs, partitionings, and engines (DuckDB computes the
    identical digest), unlike ``F.rand`` which is per-partition-seeded.
    """
    return F.md5(
        F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    quota: int | dict[tuple, int],
    id_col: str = "doc_id",
    seed: int = 42,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Take up to ``quota`` rows per stratum, deterministically.

    ``quota`` is either one int for every stratum or a dict mapping a
    stratum key tuple (values of ``strata_cols``, in order) to its own
    quota — the domain-mixing-weights use case. Unlisted strata get no
    rows. The per-stratum quota table is tiny and broadcast.

    Output: input columns + ``rank_col`` (1-based position in the
    stratum's hash order). Ties in the hash (practically impossible for
    md5) break on ``id_col``.
    """
    w = (
        Window.partitionBy(*strata_cols)
        .orderBy(sample_order(id_col, seed), F.col(id_col))
    )
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    if isinstance(quota, int):
        return ranked.where(F.col(rank_col) <= quota)
    spark = df.sparkSession
    rows = [(*k, v) for k, v in quota.items()]
    schema_cols = [df.schema[c] for c in strata_cols]
    quotas = spark.createDataFrame(
        rows, ", ".join(
            [f"{f.name} {f.dataType.simpleString()}" for f in schema_cols]
            + ["__quota bigint"]
        ),
    )
    return (
        ranked.join(F.broadcast(quotas), strata_cols)
        .where(F.col(rank_col) <= F.col("__quota"))
        .drop("__quota")
    )


def quality_bucket(
    score_col: str = "quality_score",
    n_buckets: int = 5,
    out_col: str = "q_bucket",
) -> F.Column:
    """Equal-width bucket of a [0, 1] score into ``0..n_buckets-1``
    (score 1.0 clamps into the top bucket)."""
    return F.least(
        F.floor(F.col(score_col) * n_buckets), F.lit(n_buckets - 1)
    ).cast("int").alias(out_col)
