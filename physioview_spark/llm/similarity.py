"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — JVM-side ``zip_with`` +
  ``aggregate`` dot products (no Python). The baseline and the verifier.
- ``lsh_topk``: random-hyperplane LSH — deterministic pseudo-hyperplanes
  derived from md5 (engine-independent, no RNG state), candidates =
  same-bucket vectors, exact re-rank inside the bucket. The scale path:
  at 100 TB the bucket join replaces the full cross product.
- ``embedding_near_dups``: cosine-threshold near-duplicate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.nullif(_norm(a) * _norm(b), F.lit(0.0))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (broadcast the queries —
    the small side — so the corpus scan stays partition-local)."""
    q = queries.select(
        F.col(q_id).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(c_id).alias("match_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("match_id"))
        .withColumn("sim", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    )


def hyperplane_sign(vec: Column, plane_id: int, dim: int) -> Column:
    """Sign of <vec, h_plane>: h components are deterministic pseudo-randoms
    in [-0.5, 0.5) from md5(plane||dim-index) — reproducible everywhere."""
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"h{plane_id}|"), i.cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("double") / F.lit(float(1 << 32)) - 0.5
        ),
    )
    dot = F.aggregate(
        F.zip_with(vec, comps, lambda x, h: x.cast("double") * h),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (dot >= 0).cast("int")


def lsh_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """Bucket id = concatenated hyperplane sign bits."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * 2 + hyperplane_sign(vec, p, dim)
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only same-LSH-bucket pairs are scored.

    With n_planes sign bits the corpus splits into 2^n buckets; the join
    is on bucket id (hash join, no cross product). Recall measured against
    ``cosine_topk`` in tests.
    """
    q = queries.select(
        F.col(q_id).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("bucket", lsh_bucket(F.col("__qv"), n_planes, dim))
    c = corpus.select(
        F.col(c_id).alias("match_id"), F.col(vec_col).alias("__cv")
    ).withColumn("bucket", lsh_bucket(F.col("__cv"), n_planes, dim))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("match_id"))
        .withColumn("sim", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "bucket", "match_id", "sim", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), LSH-bucketed so
    only same-bucket pairs are compared."""
    v = df.select(id_col, vec_col).withColumn(
        "bucket", lsh_bucket(F.col(vec_col), n_planes, dim)
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "sim",
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6),
        )
        .where(F.col("sim") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "sim",
        )
    )
