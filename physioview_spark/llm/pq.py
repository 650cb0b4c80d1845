"""Product quantization (PQ) for embedding columns: train / encode /
asymmetric-distance top-k search.

int8 quantization (similarity.quantize_int8) shrinks vector storage 4x;
PQ is the next gear: split each vector into ``m`` subspaces, k-means
each subspace into ``n_codes`` centroids, and store only the m code
ids — ``m`` bytes per vector (for n_codes <= 256) instead of ``4*dim``,
a 32x shrink at dim=64/m=8. Search never reconstructs: a query builds
an ``m x n_codes`` lookup table of per-subspace dot products once, and
every database vector scores as m table lookups (asymmetric distance
computation, ADC — Jégou et al. 2011, public method).

Spark shapes:

- **train**: ``m`` independent :func:`train_ivf_centroids` fits over
  sliced views of the corpus (each a distributed pyspark.ml KMeans on
  an optional sample); codebooks come back as plain lists — bounded,
  ``m x n_codes x dim/m`` floats.
- **encode**: ``m`` :func:`assign_ivf_bucket` argmins over
  ``F.slice`` views — the same expr/pandas gears, fused into one
  projection over the scan; no shuffle.
- **search**: the query-side LUTs are computed driver-side from the
  (by definition bounded) query set and broadcast as a literal-free
  column; each corpus row's score is a pure JVM ``aggregate`` of m
  ``element_at`` lookups — no Python in the corpus-sized path, and the
  per-query top-k rank filter rewrites to WindowGroupLimit. Scores are
  exact dot products against the RECONSTRUCTION (rounded to 6), so on
  L2-normalized inputs the ranking approximates cosine with
  quantization error bounded by the codebook resolution.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F

from physioview_spark.llm.similarity import (
    assign_ivf_bucket, train_ivf_centroids, vector_is_finite,
)


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 7,
) -> list[list[list[float]]]:
    """Per-subspace codebooks: ``codebooks[j][c]`` is centroid ``c`` of
    subspace ``j``. ``dim`` must divide evenly by ``m``."""
    first = corpus.select(vec_col).first()
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    books = []
    for j in range(m):
        sub = corpus.select(
            F.slice(F.col(vec_col), j * d + 1, d).alias(vec_col))
        books.append(train_ivf_centroids(
            sub, n_centroids=n_codes, vec_col=vec_col,
            sample_fraction=sample_fraction, seed=seed + j))
    return books


def encode_pq(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
    method: str = "auto",
) -> DataFrame:
    """Adds ``out_col``: array<int> of length m — the per-subspace
    nearest-centroid codes. One projection, no shuffle; gears follow
    :func:`assign_ivf_bucket` per subspace."""
    d = len(codebooks[0][0])
    # excluded-vector contract (r17 null-axis, r18 extremes;
    # similarity.vector_is_finite): a NULL or non-finite vector has no
    # nearest centroid in any subspace — it joins neither the index
    # nor any ADC scoring; callers keep such rows elsewhere if needed
    df = df.where(vector_is_finite(F.col(vec_col)))
    codes = [
        assign_ivf_bucket(
            F.slice(F.col(vec_col), j * d + 1, d), book, method=method)
        for j, book in enumerate(codebooks)
    ]
    return df.withColumn(out_col, F.array(*codes))


def pq_reconstruct(
    codes: Column,
    codebooks: list[list[list[float]]],
) -> Column:
    """Approximate vector from codes: concatenation of the selected
    per-subspace centroids (JVM literal lookup, no Python)."""
    from physioview_spark.llm.similarity import lit_matrix

    parts = []
    for j, book in enumerate(codebooks):
        # one parsed SQL literal per subspace book — the element-wise
        # F.array/F.lit form costs a py4j round-trip per element
        lit_book = lit_matrix(book)
        parts.append(F.element_at(
            lit_book, F.element_at(codes, j + 1) + 1))
    return F.flatten(F.array(*parts))


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    q_id: str = "vec_id",
    q_vec: str = "embedding",
) -> DataFrame:
    """ADC top-k: ``(query_id, match_id, score, rank)`` per query, score
    = dot(query, reconstruction(match)) rounded to 6, rank by
    ``(score DESC, match_id)``.

    The query set is collected driver-side to build the LUTs — bounded
    by the operator's contract (queries are the broadcast side, exactly
    as in cosine_topk); the corpus-sized path is one broadcast
    nested-loop join + a pure-JVM aggregate of ``m`` element_at
    lookups per (query, row) — no Python, no shuffle before the
    per-query WindowGroupLimit top-k."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    q_rows = queries.select(q_id, q_vec).collect()
    lut_rows = []
    for r in q_rows:
        if r[q_vec] is None or not np.isfinite(
                np.asarray(r[q_vec], dtype=np.float64)).all():
            continue  # excluded-vector contract: no LUT, no matches
        qv = np.asarray(r[q_vec], dtype=np.float64)
        lut = [
            [round(float(np.dot(qv[j * d:(j + 1) * d], np.asarray(c))), 9)
             for c in codebooks[j]]
            for j in range(m)
        ]
        lut_rows.append((r[q_id], lut))
    qf = codes_df.sparkSession.createDataFrame(
        lut_rows, f"query_id long, __lut array<array<double>>")
    score = F.round(F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
        lambda acc, j: acc + F.element_at(
            F.element_at(F.col("__lut"), j + 1),
            F.element_at(F.col(codes_col), j + 1) + 1),
    ), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id"))
    return (
        codes_df.select(F.col(id_col).alias("match_id"), codes_col)
        .crossJoin(F.broadcast(qf))
        .withColumn("score", score)
        .select("query_id", "match_id", "score")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivfpq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    bucket_col: str = "bucket",
    q_id: str = "vec_id",
    q_vec: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the production ANN layout (FAISS IndexIVFPQ shape) —
    a coarse quantizer routes each query to its ``n_probe`` nearest
    buckets and ADC scoring runs only over those buckets' codes, so
    the per-query cost drops from O(N) lookups to
    O(N * n_probe / n_cells) while storage stays ``m`` bytes/vector.

    ``codes_df`` must carry ``bucket_col`` (from
    :func:`physioview_spark.llm.similarity.assign_ivf_bucket` with the
    SAME centroids) alongside ``codes_col`` — assign once at encode
    time and both columns persist together. The probe join is an
    equi-join on bucket id with the broadcast query side (same shape
    as ivf_topk); probes gear-switch with the codebook size
    (:func:`~physioview_spark.llm.similarity.probe_ivf_buckets`);
    scoring is the same JVM LUT aggregate as :func:`pq_topk`.
    Output: ``(query_id, match_id, score, rank)``.
    """
    from physioview_spark.llm.similarity import probe_ivf_buckets

    m = len(codebooks)
    d = len(codebooks[0][0])
    q_rows = queries.select(q_id, q_vec).collect()
    lut_rows = []
    for r in q_rows:
        if r[q_vec] is None or not np.isfinite(
                np.asarray(r[q_vec], dtype=np.float64)).all():
            continue  # excluded-vector contract: no LUT, no matches
        qv = np.asarray(r[q_vec], dtype=np.float64)
        lut = [
            [round(float(np.dot(qv[j * d:(j + 1) * d], np.asarray(c))), 9)
             for c in codebooks[j]]
            for j in range(m)
        ]
        lut_rows.append((r[q_id], [float(x) for x in qv], lut))
    spark = codes_df.sparkSession
    qf = spark.createDataFrame(
        lut_rows,
        "query_id long, __qv array<double>, __lut array<array<double>>")
    q = (qf.withColumn(
            bucket_col,
            F.explode(probe_ivf_buckets(F.col("__qv"), centroids,
                                        n_probe)))
         .select("query_id", "__lut", bucket_col))
    score = F.round(F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
        lambda acc, j: acc + F.element_at(
            F.element_at(F.col("__lut"), j + 1),
            F.element_at(F.col(codes_col), j + 1) + 1),
    ), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id"))
    return (
        codes_df.select(F.col(id_col).alias("match_id"), codes_col,
                        bucket_col)
        .join(F.broadcast(q), bucket_col)
        .withColumn("score", score)
        .select("query_id", "match_id", "score")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pq_topk_refined(
    codes_df: DataFrame,
    emb_df: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    refine: int = 4,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    vec_col: str = "embedding",
    method: str = "expr",
) -> DataFrame:
    """ADC-then-exact refinement (the standard PQ quality knob, Jégou
    et al. 2011 §IV): :func:`pq_topk` shortlists ``k * refine``
    candidates per query from the CODES alone, then the shortlist —
    and only the shortlist — is re-scored with the exact cosine
    against the original embeddings and cut to the final ``k``.
    Output matches :func:`similarity.cosine_topk`'s shape
    ``(query_id, match_id, sim, rank)``.

    Scale shape: the ADC pass is pq_topk's corpus-sized
    broadcast-NLJ + WindowGroupLimit; its output is BOUNDED
    (queries x k x refine rows), so the exact pass broadcasts the
    candidate list against ONE scan of the embedding table (semi-join
    shape — the full-precision vectors are only read for candidates)
    and computes queries x k x refine exact cosines, not corpus-sized
    work. Like pq_topk, a query matching itself is not filtered —
    drop ``query_id == match_id`` downstream if self-matches are not
    wanted.
    """
    from physioview_spark.llm.similarity import _cosine_by

    cand = pq_topk(
        codes_df, queries, codebooks, k=k * refine,
        id_col=id_col, codes_col=codes_col, q_id=q_id, q_vec=q_vec,
    ).select("query_id", "match_id")
    ce = (
        emb_df.select(F.col(id_col).alias("match_id"),
                      F.col(vec_col).alias("__cv"))
        .join(F.broadcast(cand), "match_id")
    )
    q = queries.select(F.col(q_id).alias("query_id"),
                       F.col(q_vec).alias("__qv"))
    cos = _cosine_by(method)
    scored = (
        ce.join(F.broadcast(q), "query_id")
        .withColumn("sim", F.round(cos(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    )
