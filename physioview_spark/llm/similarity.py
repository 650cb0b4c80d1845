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

import numpy as np
import pandas as pd
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


def _hoisted_cosine(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    """``cosine(va, vb)`` with the norm folds HOISTED to once per
    vector: callers compute ``na = _norm(va)`` / ``nb = _norm(vb)`` on
    the one-row-per-vector side of a pair join and pass them through,
    so each scored pair evaluates ONE fold (the dot) instead of three.
    Bit-identical to :func:`cosine` — the same ``_norm`` fold runs on
    the same vector values, and the final dot/nullif division is
    unchanged (guide §4.1: cheaper per-row expressions; measured 2.8x
    on embedding_near_dup_pairs' re-rank)."""
    return _dot(va, vb) / F.nullif(na * nb, F.lit(0.0))


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized twin of :func:`cosine`: one pandas UDF whose
    batch cost is a NumPy rowwise dot instead of per-row interpreted
    aggregate expressions — the same measured win as semantic_dedup's
    matmul gear. Zero-norm pairs come back null (``nanvl``), matching
    the JVM ``nullif`` exactly, so downstream desc-orderings keep nulls
    last instead of NaN first. Opt-in (``method='arrow'``) on the exact
    cosine paths: BLAS summation order can differ from the JVM fold in
    the last ulp, so oracle-pinned fixture queries stay on the expr
    form."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(x: pd.Series, y: pd.Series) -> pd.Series:
        X = np.stack(x.to_numpy()).astype(np.float64)
        Y = np.stack(y.to_numpy()).astype(np.float64)
        den = np.linalg.norm(X, axis=1) * np.linalg.norm(Y, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = (X * Y).sum(axis=1) / den
        s[den == 0.0] = np.nan
        return pd.Series(s)

    return F.nanvl(_cos(a, b), F.lit(None).cast("double"))


def _cosine_by(method: str):
    if method == "expr":
        return cosine
    if method == "arrow":
        return cosine_arrow
    raise ValueError(f"method must be expr|arrow, got {method!r}")


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "expr",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (broadcast the queries —
    the small side — so the corpus scan stays partition-local).
    ``method='arrow'`` swaps the per-pair cosine expressions for the
    Arrow-vectorized batch form (:func:`cosine_arrow`) — the corpus-
    scale gear; the default stays on deterministic JVM expressions for
    the oracle-pinned fixtures."""
    # excluded-vector contract (vector_is_finite): a NULL vector's NULL
    # sim already sorts last on both engines, but a NaN-component
    # vector's NaN sim sorts FIRST — filter both sides explicitly
    q = queries.where(vector_is_finite(F.col(vec_col))).select(
        F.col(q_id).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.where(vector_is_finite(F.col(vec_col))).select(
        F.col(c_id).alias("match_id"), F.col(vec_col).alias("__cv"))
    if method == "expr":
        # norm folds hoisted to once per vector (see _hoisted_cosine)
        q = q.withColumn("__qn", _norm(F.col("__qv")))
        c = c.withColumn("__cn", _norm(F.col("__cv")))
        sim = _hoisted_cosine(F.col("__qv"), F.col("__cv"),
                              F.col("__qn"), F.col("__cn"))
    else:
        sim = _cosine_by(method)(F.col("__qv"), F.col("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("match_id"))
        .withColumn("sim", F.round(sim, 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    )


def _plane_components(plane_id: int, dim: int) -> list[float]:
    """Hyperplane components, computed ONCE driver-side: deterministic
    pseudo-randoms in [-0.5, 0.5) from md5(plane||dim-index) —
    bit-identical to any engine recomputing the same digests (the
    DuckDB oracles do), and exactly representable doubles (n/2^32 is
    exact scaling, 0.5 exact)."""
    import hashlib

    return [
        int(hashlib.md5(f"h{plane_id}|{i}".encode()).hexdigest()[:8], 16)
        / float(1 << 32) - 0.5
        for i in range(dim)
    ]


def _plane_dot(vec: Column, plane_id: int, dim: int) -> Column:
    """<vec, h_plane> with the plane folded to a LITERAL array.

    The pre-r08 version derived each component with per-row md5
    expressions — the index came from a ``sequence`` column, so
    Catalyst could not constant-fold and every row paid dim digests
    per plane (1024 md5/row at 16 planes x dim 64; the r08 ANN bench
    measured LSH slower than brute force because of it). The fold
    over the literal array keeps the exact same multiply-add order,
    so signatures are bit-identical to the old gear and to the SQL
    oracles."""
    comps = F.array(*[F.lit(c) for c in _plane_components(plane_id, dim)])
    return F.aggregate(
        F.zip_with(vec, comps, lambda x, h: x.cast("double") * h),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def hyperplane_sign(vec: Column, plane_id: int, dim: int) -> Column:
    """Sign bit of <vec, h_plane> (see :func:`_plane_dot`)."""
    return (_plane_dot(vec, plane_id, dim) >= 0).cast("int")


def lsh_bucket(vec: Column, n_planes: int, dim: int, band: int = 0) -> Column:
    """Bucket id = concatenated hyperplane sign bits. ``band`` selects an
    independent plane set (plane ids band*n_planes..band*n_planes+n-1) so
    callers can OR several bands for recall."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * 2 + hyperplane_sign(vec, band * n_planes + p, dim)
    return bucket


def _banded_buckets(vec: Column, n_planes: int, dim: int,
                    n_bands: int) -> Column:
    """Array of (band, bucket) structs — one entry per independent
    plane-set, for the multi-band explode."""
    return F.array(*[
        F.struct(
            F.lit(bnd).alias("band"),
            lsh_bucket(vec, n_planes, dim, band=bnd).alias("bucket"),
        )
        for bnd in range(n_bands)
    ])


def _probe_buckets(vec: Column, n_planes: int, dim: int, band: int,
                   n_probe: int) -> Column:
    """Multi-probe bucket list for ONE band: the vector's own bucket
    plus the ``n_probe`` Hamming-distance-1 buckets whose flipped plane
    has the smallest |margin| — the classic multi-probe LSH probing
    sequence (Lv et al., VLDB'07) truncated to single-bit perturbations.
    A near-boundary plane is the likeliest sign to differ between two
    close vectors, so flipping lowest-|dot| bits buys the most recall
    per extra probe. Pure JVM expressions; evaluated on the QUERY side
    only — the corpus still hashes each vector to exactly one bucket per
    band."""
    dots = [_plane_dot(vec, band * n_planes + p, dim)
            for p in range(n_planes)]
    base = F.lit(0)
    for d in dots:
        base = base * 2 + (d >= 0).cast("int")
    # own bucket sorts first (margin -1 < any |dot|)
    cands = [F.struct(F.lit(-1.0).alias("m"), base.alias("bucket"))]
    for p, d in enumerate(dots):
        mask = 1 << (n_planes - 1 - p)
        cands.append(F.struct(
            F.abs(d).alias("m"),
            base.bitwiseXOR(F.lit(mask)).alias("bucket")))
    arr = F.array_sort(F.array(*cands))
    return F.array_distinct(F.transform(
        F.slice(arr, 1, 1 + min(n_probe, n_planes)),
        lambda s: s["bucket"]))


def _banded_probe_buckets(vec: Column, n_planes: int, dim: int,
                          n_bands: int, n_probe: int) -> Column:
    """(band, bucket) structs across all bands, multi-probe on each."""
    def tag(bnd):
        # NB: a two-arg lambda would be read by F.transform as
        # (element, index) — keep the closure single-arg
        return lambda b: F.struct(
            F.lit(bnd).alias("band"), b.alias("bucket"))

    per_band = []
    for bnd in range(n_bands):
        probes = _probe_buckets(vec, n_planes, dim, bnd, n_probe)
        per_band.append(F.transform(probes, tag(bnd)))
    return F.flatten(F.array(*per_band))


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    n_bands: int = 1,
    n_probe: int = 0,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "expr",
) -> DataFrame:
    """Approximate top-k: only pairs sharing an LSH bucket are scored.

    With n_planes sign bits the corpus splits into 2^n buckets; the join
    is on bucket id (hash join, no cross product). ``n_bands`` > 1 ORs
    independent plane-sets (same OR-of-ANDs scheme as
    ``embedding_near_dups``): a pair at angle theta is missed by one
    p-plane band with probability 1-(1-theta/pi)^p and by ALL b bands
    with that to the b-th power, so recall rises with b while the join
    stays an equi-join on (band, bucket) — the corpus is still scanned
    once, just exploded b-fold. ``n_probe`` > 0 adds MULTI-PROBE on the
    query side: each query additionally probes the n_probe
    Hamming-distance-1 buckets flipping its lowest-|margin| planes
    (:func:`_probe_buckets`), lifting recall at a FIXED band count —
    i.e. without growing the corpus-side explode at all (the expensive
    side at 100 TB; the query side is broadcast). Candidates reached
    via several bands/probes are deduplicated on (query_id, match_id)
    before the exact re-rank. Recall measured against ``cosine_topk``
    in tests. ``method='arrow'`` swaps the re-rank's per-pair cosine
    for the Arrow batch form — MEASURED SLOWER here at high candidate
    fan-out (expr 6.8-8.9 s vs arrow 9-12.6 s on the 160k ANN bench):
    per-pair Arrow ships both vectors per candidate across the Python
    boundary, while the JVM fold rides whole-stage codegen. Kept for
    shapes with few, wide candidates; the true scale gear for massive
    candidate sets is the per-bucket matmul (``embedding_near_dups``
    ``method='matmul'``), where each vector crosses the boundary once
    per bucket, not once per pair.
    """
    # excluded-vector contract (vector_is_finite): search family —
    # both sides drop NULL/non-finite vectors
    q = queries.where(vector_is_finite(F.col(vec_col))).select(
        F.col(q_id).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.where(vector_is_finite(F.col(vec_col))).select(
        F.col(c_id).alias("match_id"), F.col(vec_col).alias("__cv")
    )
    if method == "expr":
        # norm folds hoisted to once per vector (see _hoisted_cosine)
        q = q.withColumn("__qn", _norm(F.col("__qv")))
        c = c.withColumn("__cn", _norm(F.col("__cv")))
        sim = _hoisted_cosine(F.col("__qv"), F.col("__cv"),
                              F.col("__qn"), F.col("__cn"))
        q_carry, c_carry = ["__qn"], ["__cn"]
    else:
        sim = _cosine_by(method)(F.col("__qv"), F.col("__cv"))
        q_carry, c_carry = [], []
    if n_bands == 1 and n_probe == 0:
        qb = q.withColumn("bucket", lsh_bucket(F.col("__qv"), n_planes, dim))
        cb = c.withColumn("bucket", lsh_bucket(F.col("__cv"), n_planes, dim))
        scored = (
            cb.join(F.broadcast(qb), "bucket")
            .where(F.col("query_id") != F.col("match_id"))
            .withColumn("sim", F.round(sim, 6))
        )
        out_cols = ["query_id", "bucket", "match_id", "sim", "rank"]
    else:
        qb = q.select(
            "query_id", "__qv", *q_carry,
            F.explode(_banded_probe_buckets(
                F.col("__qv"), n_planes, dim, n_bands, n_probe)).alias("bb"),
        ).select("query_id", "__qv", *q_carry, "bb.band", "bb.bucket")
        cb = c.select(
            "match_id", "__cv", *c_carry,
            F.explode(_banded_buckets(F.col("__cv"), n_planes, dim,
                                      n_bands)).alias("bb"),
        ).select("match_id", "__cv", *c_carry, "bb.band", "bb.bucket")
        scored = (
            cb.join(F.broadcast(qb), ["band", "bucket"])
            .where(F.col("query_id") != F.col("match_id"))
            .dropDuplicates(["query_id", "match_id"])
            .withColumn("sim", F.round(sim, 6))
        )
        out_cols = ["query_id", "match_id", "sim", "rank"]
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*out_cols)
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int = 64,
    n_bands: int = 4,
    max_bucket_size: int | None = None,
    method: str = "expr",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), multi-band LSH:
    each vector hashes into ``n_bands`` INDEPENDENT plane-set buckets and
    candidates are pairs sharing ANY band's bucket (classic OR-of-ANDs).

    One band of p planes misses a pair at angle theta with probability
    1-(1-theta/pi)^p; OR-ing b bands drives the miss rate to that to the
    b-th power while the join stays an equi-join on (band, bucket) — the
    same sub-quadratic cost shape, recall restored. Candidates are
    deduplicated on (id_a, id_b) BEFORE the exact cosine re-rank so a
    pair sharing several bands is scored once.

    ``max_bucket_size`` skips (band, bucket) groups larger than the cap
    before the self-join — the quadratic guard for embedding farms with
    huge identical-vector families (cf. dedup.minhash_lsh_candidates).

    ``method`` gears: ``expr`` (default — deterministic JVM cosine, the
    oracle-pinned path) and ``arrow`` score pair-at-a-time after the
    candidate join; ``matmul`` instead runs one ``applyInPandas`` per
    (band, bucket) computing the normalized Gram matrix — per-pair cost
    drops from interpreted O(d) expressions to a BLAS row, the win
    measured on semantic_dedup's identical shape. Vector transfer is
    corpus x n_bands rows (attach once per band) instead of 2x per
    candidate pair, so matmul wins whenever buckets average more than
    ~2 x n_bands members — i.e. exactly when the expr path starts to
    hurt. All gears round cosine to 6 decimals, treat zero-norm as
    never-similar, and dedupe pairs found by several bands."""
    # excluded-vector contract (vector_is_finite): dedup-family
    # semantics — NULL/non-finite vectors emit NO pairs (trivially
    # unique); without the filter a NaN component turns every plane
    # dot NaN and every sign bit 1 (NaN compares greatest on both
    # engines), so ALL poisoned vectors would collapse into the
    # all-ones bucket of every band and NaN cosine >= threshold (true
    # under NaN-greatest) would pair them with everything there
    v = df.where(vector_is_finite(F.col(vec_col))).select(id_col, vec_col)
    banded = v.select(
        id_col,
        F.explode(_banded_buckets(F.col(vec_col), n_planes, dim,
                                  n_bands)).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    if method == "matmul":
        thr = float(threshold)
        joined = banded.join(v, id_col)

        def _bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf[id_col].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            n = len(ids)
            if n < 2:
                return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0],
                                     "sim": np.zeros(0)})
            X = np.stack(pdf[vec_col].to_numpy())[order].astype(np.float64)
            norms = np.linalg.norm(X, axis=1)
            zero = norms == 0.0
            norms[zero] = 1.0
            U = X / norms[:, None]
            S = np.round(U @ U.T, 6)
            S[zero, :] = np.nan  # zero-norm: cosine undefined ->
            S[:, zero] = np.nan  # never similar (JVM nullif parity)
            iu, ju = np.triu_indices(n, k=1)
            s = S[iu, ju]
            with np.errstate(invalid="ignore"):
                hit = s >= thr  # NaN compares False, like a null filter
            return pd.DataFrame({"id_a": ids[iu[hit]],
                                 "id_b": ids[ju[hit]], "sim": s[hit]})

        id_t = df.schema[id_col].dataType.simpleString()
        return (
            joined.groupBy("band", "bucket").applyInPandas(
                _bucket_pairs,
                schema=f"id_a {id_t}, id_b {id_t}, sim double")
            # dedupe multi-band hits on the KEY, not the float: the same
            # pair scored inside two different-shaped Gram matrices is
            # not guaranteed bit-identical pre-rounding
            .groupBy("id_a", "id_b").agg(F.max("sim").alias("sim"))
        )

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        # REPARTITION_BY_NUM ahead of the pair dedup (r18): the
        # dedup's own ENSURE_REQUIREMENTS exchange gets AQE byte-
        # coalesced, and the compute-heavy cosine re-rank (broadcast
        # vector joins + interpreted dot fold) lives in ITS reduce
        # stage — measured running on 5 of 32 cores at sf0.1. The
        # explicit numbered exchange is never coalesced and satisfies
        # the dedup's clustering, so no extra shuffle; (id_a, id_b)
        # is effectively unique, so no skew to split.
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism,
            F.col("id_a"), F.col("id_b"))
        .distinct()
    )
    # Hoist the norm to once per VECTOR instead of once per PAIR: the
    # higher-order-function folds (_dot/_norm) are CodegenFallback —
    # interpreted per element — so the 3-fold-per-pair cosine dominated
    # the re-rank (guide §4.1: prefer cheaper expressions per row).
    # Bit-identical: _norm runs the same fold on the same vector, just
    # on the 1-row-per-vector side of the join, and the final
    # dot/nullif(na*nb) division is unchanged.
    vn = v.withColumn("__nrm", _norm(F.col(vec_col)))
    va = vn.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
                   F.col("__nrm").alias("__na"))
    vb = vn.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
                   F.col("__nrm").alias("__nb"))
    if method == "expr":
        sim = _hoisted_cosine(F.col("__va"), F.col("__vb"),
                              F.col("__na"), F.col("__nb"))
    else:
        sim = _cosine_by(method)(F.col("__va"), F.col("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("sim", F.round(sim, 6))
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def knn_graph(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int = 64,
    n_bands: int = 4,
    max_bucket_size: int | None = None,
    method: str = "expr",
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH over the corpus itself —
    every vector's top-``k`` neighbors among its multi-band LSH
    candidates (the all-pairs sibling of :func:`lsh_topk`, which serves
    an external query set). The kNN graph is the substrate for
    diversity filtering, graph-based dedup, and coreset selection over
    embedding farms.

    Cost shape: candidates come from the same OR-of-ANDs banded
    equi-join as :func:`embedding_near_dups` and each UNORDERED pair is
    scored exactly once (the ``<`` join), then mirrored into both
    orientations for ranking — half the cosine evaluations of a naive
    directed join. The per-node top-k is a ``row_number <= k`` filter,
    which Spark executes as WindowGroupLimit: a partial per-mapper
    limit runs BEFORE the shuffle, so the exchange carries
    O(partitions * nodes * k), not the candidate set.
    ``max_bucket_size`` is the usual quadratic guard. Ties (cosine
    rounds to 6 decimals) break on neighbor id, so the graph is
    deterministic and engine-reproducible.

    Output: ``(id_col, neighbor_id, sim, rank)``, rank 1-based; nodes
    whose every band-bucket was singleton (or capped) emit no rows.
    """
    scored = embedding_near_dups(
        df, threshold=float("-inf"), id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, dim=dim, n_bands=n_bands,
        max_bucket_size=max_bucket_size, method=method)
    # mirror via explode, NOT a self-union: a union would reference
    # `scored` twice and re-execute the whole candidate-generation +
    # scoring lineage per branch (measured 2x wall on the 10x corpus)
    sym = scored.select(
        F.explode(F.array(
            F.struct(F.col("id_a").alias(id_col),
                     F.col("id_b").alias("neighbor_id"), F.col("sim")),
            F.struct(F.col("id_b").alias(id_col),
                     F.col("id_a").alias("neighbor_id"), F.col("sim")),
        )).alias("__e")
    ).select("__e.*")
    w = Window.partitionBy(id_col).orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    scoring: str = "auto",
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    bucket every vector by its nearest centroid (the IVF coarse
    quantizer), compare pairs only WITHIN a bucket, and drop each vector
    that has a lower-id near-duplicate (rounded cosine >= threshold) in
    its bucket — the deterministic keep-first policy. Returns the kept
    rows as (id, bucket).

    This is the pairwise variant (drop on any lower-id neighbor);
    cluster-exact semantics compose from
    :func:`physioview_spark.llm.dedup.connected_components` over the
    pair list when transitivity matters. Scale shape: one JVM-side
    centroid argmin per vector (no shuffle), one equi-join on bucket for
    the pair search — cross-bucket pairs are never scored, which is the
    SemDeDup trade: recall bounded by quantizer quality, cost linear in
    sum of bucket-size^2 (cap via ``max_bucket_size``, the same
    quadratic guard as the LSH paths: pair SEARCH is suppressed in an
    oversized bucket, but its documents are all kept — the guard bounds
    work, it never drops data).

    ``scoring`` gears mirror :func:`assign_ivf_bucket`: ``expr`` scores
    each candidate pair with JVM cosine expressions (deterministic, the
    oracle-pinned fixture path); ``pandas`` runs one ``applyInPandas``
    per bucket computing the full normalized Gram matrix — per-pair
    cost drops from interpreted O(d) expressions to a BLAS matmul (the
    10x scale run measured the expression path dominating). Both round
    cosines to 6 decimals before thresholding and treat zero-norm
    vectors as never-similar; ``auto`` follows the same k*dim switch as
    assignment so small fixtures stay byte-deterministic."""
    v = df.select(id_col, vec_col)
    b = v.withColumn("bucket", assign_ivf_bucket(F.col(vec_col), centroids))
    # The quadratic guard applies only to the pair-scoring input; `b`
    # itself stays complete so every document survives to the kept-rows
    # anti-join (docs in skipped buckets can never appear in `dropped`).
    scored = b
    if max_bucket_size is not None:
        w = Window.partitionBy("bucket")
        scored = (
            b.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    if scoring == "auto":
        scoring = "pandas" if len(centroids) * len(centroids[0]) > 1024 \
            else "expr"
    if scoring == "expr":
        # norm folds hoisted to once per vector (see _hoisted_cosine)
        sn = scored.withColumn("__nrm", _norm(F.col(vec_col)))
        lo = sn.select(F.col(id_col).alias("__lo_id"),
                       F.col(vec_col).alias("__lo_v"),
                       F.col("__nrm").alias("__lo_n"), "bucket")
        hi = sn.select(F.col(id_col).alias("__hi_id"),
                       F.col(vec_col).alias("__hi_v"),
                       F.col("__nrm").alias("__hi_n"), "bucket")
        dropped = (
            lo.join(hi, "bucket")
            .where(F.col("__lo_id") < F.col("__hi_id"))
            .where(F.round(_hoisted_cosine(
                F.col("__lo_v"), F.col("__hi_v"),
                F.col("__lo_n"), F.col("__hi_n")), 6) >= threshold)
            .select(F.col("__hi_id").alias(id_col))
            .distinct()
        )
    elif scoring == "pandas":
        thr = float(threshold)

        def _bucket_dropped(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf[id_col].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            X = np.stack(pdf[vec_col].to_numpy())[order].astype(np.float64)
            n = len(ids)
            if n < 2:
                return pd.DataFrame({id_col: ids[:0]})
            norms = np.linalg.norm(X, axis=1)
            zero = norms == 0.0
            norms[zero] = 1.0
            U = X / norms[:, None]
            S = np.round(U @ U.T, 6)
            S[zero, :] = np.nan  # zero-norm: cosine undefined -> never
            S[:, zero] = np.nan  # similar (mirrors the JVM nullif)
            iu, ju = np.triu_indices(n, k=1)
            with np.errstate(invalid="ignore"):
                hit = S[iu, ju] >= thr
            return pd.DataFrame({id_col: np.unique(ids[ju[hit]])})

        # NULL-bucket rows (NULL/non-finite vectors, kept as
        # trivially-unique) must not reach the Gram matmul —
        # np.stack would crash on None and NaN rows poison S
        dropped = scored.where(F.col("bucket").isNotNull()) \
            .groupBy("bucket").applyInPandas(
            _bucket_dropped,
            schema=f"{id_col} {df.schema[id_col].dataType.simpleString()}"
        ).distinct()
    else:
        raise ValueError(
            f"scoring must be auto|expr|pandas, got {scoring!r}")
    return (
        b.join(dropped, id_col, "left_anti")
        .select(id_col, F.col("bucket").cast("int").alias("bucket"))
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 7,
) -> list[list[float]]:
    """IVF coarse quantizer: k-means centroids (pyspark.ml, trained on a
    sample when given). Returns plain Python lists — the centroid table is
    tiny (n_centroids x dim) and ships to executors as literals."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # excluded-vector contract (vector_is_finite): one NaN vector in
    # the training sample would poison every centroid it touches
    df = corpus.where(vector_is_finite(F.col(vec_col))).select(
        F.col(vec_col).alias("__v"))
    if sample_fraction:
        df = df.sample(fraction=sample_fraction, seed=seed)
    feats = df.select(array_to_vector(
        F.transform("__v", lambda x: x.cast("double"))).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(feats)
    return [list(map(float, c)) for c in model.clusterCenters()]


def lit_matrix(rows: list[list[float]]) -> Column:
    """``array<array<double>>`` literal built as ONE parsed SQL string.

    PySpark's ``F.lit(list)`` recurses element-wise — one py4j
    round-trip per element, ~0.74 s of DRIVER time for a 16x64
    codebook (measured r18) — while a single ``F.expr`` call ships the
    whole matrix in one round-trip and parses JVM-side. Bit-identical
    to the element-wise form: ``repr(float)`` is the shortest
    round-tripping decimal and ``Double.parseDouble`` is correctly
    rounded, so every element (denormals, max-double, -0.0 included)
    parses back to the same bits — asserted against ``F.lit`` on
    adversarial values in tests/test_llm.py."""
    return F.expr("array(" + ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in row) + ")"
        for row in rows) + ")")


def _centroid_dists(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of squared L2 distances from ``vec`` to each centroid,
    evaluated JVM-side (centroids are literal arrays).

    Built as ONE ``transform`` over a nested literal instead of k
    Python-built per-centroid expressions: the zip_with/aggregate
    builders each cost dozens of py4j round-trips, so the k-expression
    form spent ~4.7 s of DRIVER time constructing the plan for a
    16x8-subspace PQ encode (measured r18; the runtime math — same
    zip_with square fold per centroid, same order — is bit-identical,
    and these folds were already interpreted, never codegen'd). The
    literal itself ships via :func:`lit_matrix` — ``F.lit`` on a
    nested list recurses element-wise, which was 0.74 s of the
    remaining construct time (measured r18)."""
    lit_books = lit_matrix(centroids)
    return F.transform(
        lit_books,
        lambda c: F.aggregate(
            F.zip_with(vec, c,
                       lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, v: acc + v))


def vector_is_finite(c: Column) -> Column:
    """VECTOR FINITENESS CONTRACT (r17 NULL-vector wave, extended by
    the r18 extremes axis): a vector that is NULL or contains ANY
    non-finite component (NaN / +-Inf — training bugs and overflowed
    encoders produce both at corpus scale) has no usable geometry.
    The search/quantization family (cosine/LSH/kNN/IVF/PQ/int8/
    centroids) EXCLUDES such vectors on both the query and corpus
    sides; the dedup family KEEPS them as trivially-unique (their
    bucket is NULL, so the bucket equi-join never pairs them — same
    mechanism that keeps NULL vectors). Without the exclusion a NaN
    component is not inert: NaN cosine scores sort FIRST under
    descending rank on both engines (NaN is greatest), so one poisoned
    vector would top every query's top-k, and NaN >= threshold is TRUE
    so it would 'near-duplicate' everything in its bucket."""
    return c.isNotNull() & ~F.exists(
        c, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))))


def assign_ivf_bucket(
    vec: Column,
    centroids: list[list[float]],
    method: str = "auto",
) -> Column:
    """Nearest-centroid id (NULL for NULL/non-finite vectors — the
    finiteness contract; see :func:`vector_is_finite`), two gears:

    - ``expr``: argmin over literal centroid-distance expressions —
      pure JVM, zero Python, the right gear for small codebooks (the
      fixture queries' k=8). Expression size grows as k x dim, and the
      10x scale measurement (PLANS.md) showed that width dominating
      wall time by k~25.
    - ``pandas``: one Arrow-vectorized UDF computing
      ``argmin(-2 X C^T + |c|^2)`` over each batch — codebook size only
      affects a NumPy matmul. Ties break to the lowest centroid id in
      BOTH gears (array_position finds the first minimum; np.argmin
      returns the first), but FP rounding differs between the two
      formulas, so near-tie assignments can flip — ``auto`` therefore
      switches on a fixed k*dim threshold, keeping small-codebook
      (oracle-pinned) plans on the expr gear deterministically.
    """
    if not centroids:
        # an empty codebook has no nearest centroid for ANY vector —
        # the empty-corpus case belongs to the caller (short-circuit to
        # an empty result, or substitute a dummy centroid when the data
        # side is also empty; see plans/queries_llm._seed_codebook)
        raise ValueError(
            "centroids must be non-empty — an empty corpus cannot seed "
            "a codebook; handle the empty input before bucketing")
    if method == "auto":
        method = "pandas" if len(centroids) * len(centroids[0]) > 1024 \
            else "expr"
    if method == "expr":
        d = _centroid_dists(vec, centroids)
        # NULL vec -> NULL dists -> NULL bucket falls out naturally; a
        # NaN component would NOT (all-NaN dists argmin to bucket 0 via
        # NaN-equality), hence the explicit finiteness gate
        return F.when(
            vector_is_finite(vec),
            F.array_position(d, F.array_min(d)).cast("int") - 1)
    if method != "pandas":
        raise ValueError(f"method must be auto|expr|pandas, got {method!r}")
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C * C).sum(axis=1)

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        # row-mask NULL/non-finite vectors to a NULL bucket instead of
        # letting np.stack crash on None (the pre-r18 gear assumed a
        # pre-filtered input — untrue for the dedup family's frames)
        arrs = v.to_numpy()
        mask = np.array([
            a is not None
            and np.isfinite(np.asarray(a, dtype=np.float64)).all()
            for a in arrs])
        out = np.full(len(arrs), -1, dtype=np.int64)
        if mask.any():
            X = np.stack(arrs[mask]).astype(np.float64)
            # |x|^2 constant per row -> argmin needs only -2xC^T + |c|^2
            scores = -2.0 * (X @ C.T) + c2
            out[mask] = np.argmin(scores, axis=1)
        return pd.Series(
            [int(x) if x >= 0 else None for x in out], dtype="Int32")

    return _assign(vec)


def probe_ivf_buckets(
    vec: Column,
    centroids: list[list[float]],
    n_probe: int,
    method: str = "auto",
) -> Column:
    """Array of the ``n_probe`` nearest centroid ids (ascending
    distance, ties to the lowest id) — the multi-probe sibling of
    :func:`assign_ivf_bucket`, with the same two gears and the same
    auto threshold:

    - ``expr``: literal centroid-distance expressions + one array_sort
      — right for small codebooks (the oracle-pinned k=8 queries).
    - ``pandas``: Arrow-vectorized argpartition over a NumPy matmul.
      Literal expressions grow as k x dim in CODE size, and the r08
      ANN bench measured the k=126/dim=64 probe paying ~1.2 MB task
      binaries and seconds of codegen before touching any data (the
      cost is per-plan, not per-row) — at the sqrt(N) codebooks real
      corpora need, the vectorized gear is the only viable one.

    As with assign_ivf_bucket, FP rounding differs between the two
    formulas, so near-tie probe sets can differ between gears; auto
    keeps small (oracle-pinned) codebooks on the deterministic expr
    gear.
    """
    if method == "auto":
        method = "pandas" if len(centroids) * len(centroids[0]) > 1024 \
            else "expr"
    if method == "expr":
        pairs = F.transform(
            _centroid_dists(vec, centroids),
            lambda d, i: F.struct(d.alias("d"), i.alias("bucket")))
        # finiteness gate: NULL probe set for NULL/non-finite vectors
        # (see assign_ivf_bucket)
        return F.when(
            vector_is_finite(vec),
            F.slice(F.array_sort(pairs), 1, n_probe)["bucket"])
    if method != "pandas":
        raise ValueError(f"method must be auto|expr|pandas, got {method!r}")
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    p = min(n_probe, len(centroids))

    @pandas_udf("array<int>")
    def _probe(v: pd.Series) -> pd.Series:
        # same row-masking as _assign: NULL/non-finite -> NULL probes
        arrs = v.to_numpy()
        mask = np.array([
            a is not None
            and np.isfinite(np.asarray(a, dtype=np.float64)).all()
            for a in arrs])
        rows: list = [None] * len(arrs)
        if mask.any():
            X = np.stack(arrs[mask]).astype(np.float64)
            scores = -2.0 * (X @ C.T) + c2
            # stable full argsort: ascending distance, ties to lowest id
            # (argpartition would be O(k) but breaks ties arbitrarily)
            order = np.argsort(scores, axis=1, kind="stable")[:, :p]
            for i, row in zip(np.nonzero(mask)[0], order):
                rows[i] = row.astype(np.int32)
        return pd.Series(rows)

    return _probe(vec)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 4,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their
    nearest-centroid bucket; each query probes its ``n_probe`` closest
    buckets and re-ranks exactly inside them.

    The scale path next to LSH: the corpus is scanned once to assign
    buckets, the probe join is an equi-join on bucket id with the
    (small) query side broadcast — no cross product, and recall is
    tunable via n_probe instead of hash width. Both the corpus
    assignment and the query probes pick the expr/pandas gear by the
    codebook's k x dim (see :func:`probe_ivf_buckets`).
    """
    # excluded-vector contract (r17 null-axis, r18 extremes): NULL or
    # non-finite vectors have no usable geometry — exclude both sides
    # up front (see vector_is_finite; the bucket/probe columns also
    # NULL out for them, but the explicit filter keeps the contract
    # visible at the join inputs)
    c = corpus.where(vector_is_finite(F.col(vec_col))).select(
        F.col(c_id).alias("match_id"), F.col(vec_col).alias("__cv")
    ).withColumn("bucket", assign_ivf_bucket(F.col("__cv"), centroids,
                                             method=method))

    qd = queries.where(vector_is_finite(F.col(vec_col))).select(
        F.col(q_id).alias("query_id"), F.col(vec_col).alias("__qv"))
    q = (qd.withColumn(
            "bucket",
            F.explode(probe_ivf_buckets(F.col("__qv"), centroids,
                                        n_probe, method=method)))
         .select("query_id", "__qv", "bucket"))

    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("match_id"))
        .withColumn("sim", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_embedding",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = round(x_i / scale)`` — the 4x storage/IO shrink applied to
    embedding farms before ANN serving (a PQ-lite; recall cost is the
    rounding error, bounded by scale/2 per component).

    Pure column arithmetic (transform + aggregate fold), no UDF, fuses
    into the scan projection: at 100 TB this is a free rider on
    whatever pass writes the vectors. All-zero vectors keep scale 0 and
    an all-zero code (guarded division). round() half-up on the scaled
    doubles is deterministic and SQL-reproducible, so quantized tables
    hash-match across engines.
    """
    # excluded-vector contract (vector_is_finite): a NaN/Inf component
    # makes scale NaN/Inf and, under the driver session's ANSI mode,
    # the tinyint cast of a NaN code THROWS — non-finite vectors are
    # excluded like NULLs (quantized farms serve the search family,
    # which excludes them anyway)
    df = df.where(vector_is_finite(F.col(vec_col)))
    v = F.col(vec_col)
    amax = F.aggregate(
        F.transform(v, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0), lambda acc, x: F.greatest(acc, x))
    scale = (amax / F.lit(127.0)).alias("__s")
    return (
        df.withColumn("__s", scale)
        .withColumn(
            out_col,
            F.when(F.col("__s") == 0.0,
                   F.transform(v, lambda x: F.lit(0).cast("tinyint")))
            .otherwise(F.transform(
                v,
                # try_cast, NOT cast: identical on every row that
                # survives the finiteness filter (codes are in
                # [-127, 127] by construction), but ANSI-safe when
                # Catalyst's InferFiltersFromGenerate clones this
                # expression into the pushed-down filter and codegen's
                # common-subexpression elimination evaluates it BEFORE
                # the short-circuiting vector_is_finite conjunct —
                # observed: a NaN component crashed the declared query
                # (CAST_OVERFLOW) even though the filter precedes this
                # projection in the plan
                lambda x: F.round(x.cast("double") / F.col("__s"), 0)
                .try_cast("tinyint"))))
        .withColumn(scale_col, F.round(F.col("__s"), 9))
        .drop("__s")
    )


def dequantize_int8(
    df: DataFrame,
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_int8`: ``x_i ~ q_i * scale``."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col),
            lambda q: q.cast("double") * F.col(scale_col)),
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Mean vector per label — the distributed class-prototype /
    codebook-training primitive (the full-data counterpart of
    :func:`train_ivf_centroids`' sampled k-means, and the "mean of my
    cluster" half of a SemDeDup pipeline).

    Output: ``(label_col, n_vecs, centroid)`` with components rounded
    to ``decimals`` (sum order across partitions is not associative in
    floats; rounding well above ulp scale makes the result
    partitioning- and engine-independent).

    Scale shape: posexplode to (label, idx, x) — dim rows per vector —
    then a map-side-combinable avg per (label, idx); the exchange
    carries labels x dim rows, never the corpus. Reassembly sorts each
    label's (idx, mean) pairs inside one aggregate row. No driver
    collect: the centroid table stays a DataFrame however many labels
    exist (collect it yourself if it feeds ``assign_ivf_bucket``
    literals).
    """
    # excluded-vector contract (vector_is_finite): one NaN component
    # would poison its coordinate's mean for the whole label
    ex = df.where(vector_is_finite(F.col(vec_col))).select(
        label_col, F.posexplode(vec_col).alias("__i", "__x"))
    m = ex.groupBy(label_col, "__i").agg(
        F.avg(F.col("__x").cast("double")).alias("__mx"),
        F.count(F.lit(1)).alias("__n"))
    return m.groupBy(label_col).agg(
        F.max("__n").cast("long").alias("n_vecs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("__i", "__mx"))),
            lambda s: F.round(s["__mx"], decimals),
        ).alias("centroid"),
    )


def semantic_dedup_delta(
    new: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    prefilter: bool = True,
    corpus_bucket_col: str | None = None,
    scoring: str = "expr",
    new_bucket_col: str | None = None,
) -> DataFrame:
    """Incremental SemDeDup: score a NEW embedding batch against an
    EXISTING corpus without re-pairing the corpus with itself — the
    embedding twin of :func:`physioview_spark.llm.dedup.dedup_delta`
    (daily increments into a deduplicated reference corpus, same
    centroids across increments so bucket geometry is stable).

    ``new_bucket_col`` mirrors ``corpus_bucket_col`` for the NEW side:
    a caller that already bucketed the batch (the streaming processor
    buckets once and reuses the same frame for its state write) names
    the column and the k x dim assignment fold is not rebuilt here —
    the column must come from :func:`assign_ivf_bucket` with the SAME
    centroids (parity-tested in tests/test_llm.py).

    ``corpus_bucket_col`` names a PRECOMPUTED bucket column on the
    corpus: assignment is then skipped for the corpus side. CAVEAT,
    measured (r08): when the corpus is a table bucketed on that column
    the join skips the Exchange — and with it AQE's skew-splitting of
    the k fat partitions a k-cell coarse quantizer produces (the join
    key has only k distinct values). On such low-cardinality keys the
    exchange IS the scale mechanism and the bucketed read ran 7x
    slower; use this parameter to skip re-assignment cost on an
    already-bucketed FRAME, not to chase exchange elimination.
    ``scoring='pandas'`` swaps the per-pair cosine expressions for one
    per-bucket normalized Gram matmul (each vector crosses the Python
    boundary once per bucket, not once per pair — the winning side of
    the r08 boundary-crossing rule); same 6-decimal rounding,
    threshold, and (sim desc, id asc) tie-break as the expr gear,
    parity-tested. ``'auto'`` follows the k*dim switch so the
    oracle-pinned seed-codebook queries stay byte-deterministic.

    One decision row per new vector: ``(id_col, decision, match_id,
    sim)`` with ``decision`` in ``drop_corpus_dup`` (a corpus vector in
    the same bucket has rounded cosine >= threshold; match = best sim,
    ties on lowest id), ``drop_batch_dup`` (a LOWER-id new vector in
    the bucket matches — keep-first within the batch), or ``keep``.
    Corpus matches take precedence in the reported match. When corpus
    ids precede batch ids, the kept set equals
    :func:`semantic_dedup` over the union restricted to the batch
    (asserted by the parity test) — the corpus side contributes no new
    drops by construction, because it was deduplicated when ingested.

    Scale shape — one-sided like dedup_delta: the corpus pays one scan
    (bucket argmin is a JVM projection, no shuffle), and with
    ``prefilter`` its vectors are broadcast-semi-joined against the
    batch's bucket set BEFORE moving — only touched buckets' members
    reach the pair join, so a tiny delta against a 100 TB corpus
    shuffles O(touched buckets), not O(corpus). ``max_bucket_size``
    suppresses pair SEARCH in oversized corpus buckets (work bound,
    never a data drop — unmatched new vectors stay ``keep``). Scoring
    is the deterministic JVM cosine gear; per-batch-vector best-match
    windows partition on the delta id, so window input is delta-sized.
    """
    from physioview_spark import cache as _cache

    if new_bucket_col is not None:
        vn_raw = new.select(
            id_col, vec_col, F.col(new_bucket_col).alias("bucket"))
    else:
        vn_raw = new.select(id_col, vec_col).withColumn(
            "bucket", assign_ivf_bucket(F.col(vec_col), centroids))
    vn = _cache.pin(vn_raw)  # 4 lineages below; release via cache scope
    if corpus_bucket_col is not None:
        vc = corpus.select(
            id_col, vec_col, F.col(corpus_bucket_col).alias("bucket"))
    else:
        vc = corpus.select(id_col, vec_col).withColumn(
            "bucket", assign_ivf_bucket(F.col(vec_col), centroids))
    if prefilter:
        vc = vc.join(F.broadcast(vn.select("bucket").distinct()),
                     "bucket", "semi")
    if max_bucket_size is not None:
        # full membership of touched buckets survives the semi-join, so
        # these counts equal the unfiltered corpus bucket sizes
        w = Window.partitionBy("bucket")
        vc = (
            vc.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    if scoring == "auto":
        scoring = "pandas" if len(centroids) * len(centroids[0]) > 1024 \
            else "expr"
    if scoring == "pandas":
        # the applyInPandas output schema carries the id column, so it
        # must be derived from the INPUT id type (a hardcoded `long`
        # would fail at runtime — or silently coerce — for string ids
        # reached implicitly via scoring='auto' on large codebooks)
        id_sql_type = vn.schema[id_col].dataType.simpleString()
        if id_sql_type not in ("tinyint", "smallint", "int", "bigint",
                               "string"):
            raise ValueError(
                f"scoring='pandas' supports integral or string id "
                f"columns; {id_col!r} is {id_sql_type} — use "
                f"scoring='expr' or cast the id")
        id_is_int = id_sql_type != "string"
        thr = float(threshold)
        union = (
            vn.select(F.col(id_col).alias("__id"),
                      F.col(vec_col).alias("__v"), "bucket",
                      F.lit(1).alias("__new"))
            .unionByName(vc.select(
                F.col(id_col).alias("__id"),
                F.col(vec_col).alias("__v"), "bucket",
                F.lit(0).alias("__new")))
        )

        def _bucket_best(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf["__id"].to_numpy()
            is_new = pdf["__new"].to_numpy() == 1
            ni = np.where(is_new)[0]
            if len(ni) == 0:
                return pd.DataFrame({
                    "__nid": ids[:0], "__c_mid": ids[:0],
                    "__c_sim": np.array([], dtype=np.float64),
                    "__b_mid": ids[:0],
                    "__b_sim": np.array([], dtype=np.float64)})
            X = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(X, axis=1)
            zero = norms == 0.0
            norms[zero] = 1.0
            U = X / norms[:, None]
            S = np.round(U @ U.T, 6)
            S[zero, :] = np.nan  # zero-norm never similar (JVM nullif)
            S[:, zero] = np.nan
            ci = np.where(~is_new)[0]
            ci = ci[np.argsort(ids[ci], kind="stable")]  # ties -> low id
            nid_sorted = ni[np.argsort(ids[ni], kind="stable")]
            # numpy scalar -> python value; string ids arrive as a
            # plain object array and pass through unchanged
            py = lambda v: v.item() if hasattr(v, "item") else v
            out = []
            for i in nid_sorted:
                c_mid = c_sim = b_mid = b_sim = None
                if len(ci):
                    sims = S[i, ci]
                    with np.errstate(invalid="ignore"):
                        ok = sims >= thr
                    if ok.any():
                        mx = sims[ok].max()
                        j = ci[int(np.argmax(sims == mx))]
                        c_mid, c_sim = py(ids[j]), float(mx)
                lower = nid_sorted[ids[nid_sorted] < ids[i]]
                if len(lower):
                    sims = S[i, lower]
                    with np.errstate(invalid="ignore"):
                        ok = sims >= thr
                    if ok.any():
                        mx = sims[ok].max()
                        j = lower[int(np.argmax(sims == mx))]
                        b_mid, b_sim = py(ids[j]), float(mx)
                out.append((py(ids[i]), c_mid, c_sim, b_mid, b_sim))
            res = pd.DataFrame(
                out, columns=["__nid", "__c_mid", "__c_sim",
                              "__b_mid", "__b_sim"])
            # nullable extension dtypes: a missing match must arrive
            # as SQL null (NaN in a plain float64 column is NOT null
            # to Spark, and would poison the downstream coalesce).
            # String ids stay object-typed (None IS null there).
            if id_is_int:
                res["__nid"] = res["__nid"].astype("int64")
                res["__c_mid"] = res["__c_mid"].astype("Int64")
                res["__b_mid"] = res["__b_mid"].astype("Int64")
            res["__c_sim"] = res["__c_sim"].astype("Float64")
            res["__b_sim"] = res["__b_sim"].astype("Float64")
            return res

        # same NULL-bucket guard as semantic_dedup's matmul gear
        best = union.where(F.col("bucket").isNotNull()) \
            .groupBy("bucket").applyInPandas(
            _bucket_best,
            schema=f"__nid {id_sql_type}, __c_mid {id_sql_type}, "
                   f"__c_sim double, __b_mid {id_sql_type}, "
                   f"__b_sim double")
        joined = vn.select(F.col(id_col).alias("__nid")) \
            .join(best, "__nid", "left")
    elif scoring == "expr":
        # norm folds hoisted to once per vector (see _hoisted_cosine)
        bn = vn.select(F.col(id_col).alias("__nid"),
                       F.col(vec_col).alias("__nv"), "bucket",
                       _norm(F.col(vec_col)).alias("__nn"))
        bc = vc.select(F.col(id_col).alias("__cid"),
                       F.col(vec_col).alias("__cv"), "bucket",
                       _norm(F.col(vec_col)).alias("__cn"))
        wn = Window.partitionBy("__nid").orderBy(
            F.desc("__sim"), F.asc("__mid"))
        corp_best = (
            bn.join(bc, "bucket")
            .withColumn("__sim", F.round(_hoisted_cosine(
                F.col("__nv"), F.col("__cv"),
                F.col("__nn"), F.col("__cn")), 6))
            .where(F.col("__sim") >= threshold)
            .select("__nid", F.col("__cid").alias("__mid"), "__sim")
            .withColumn("__rn", F.row_number().over(wn))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        lo = vn.select(F.col(id_col).alias("__lo"),
                       F.col(vec_col).alias("__lv"), "bucket",
                       _norm(F.col(vec_col)).alias("__ln"))
        hi = vn.select(F.col(id_col).alias("__nid"),
                       F.col(vec_col).alias("__hv"), "bucket",
                       _norm(F.col(vec_col)).alias("__hn"))
        batch_best = (
            lo.join(hi, "bucket")
            .where(F.col("__lo") < F.col("__nid"))
            .withColumn("__sim", F.round(_hoisted_cosine(
                F.col("__lv"), F.col("__hv"),
                F.col("__ln"), F.col("__hn")), 6))
            .where(F.col("__sim") >= threshold)
            .select("__nid", F.col("__lo").alias("__mid"), "__sim")
            .withColumn("__rn", F.row_number().over(wn))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        c = corp_best.select("__nid", F.col("__mid").alias("__c_mid"),
                             F.col("__sim").alias("__c_sim"))
        b = batch_best.select("__nid", F.col("__mid").alias("__b_mid"),
                              F.col("__sim").alias("__b_sim"))
        joined = (
            vn.select(F.col(id_col).alias("__nid"))
            .join(c, "__nid", "left")
            .join(b, "__nid", "left")
        )
    else:
        raise ValueError(
            f"scoring must be auto|expr|pandas, got {scoring!r}")
    return joined.select(
        F.col("__nid").alias(id_col),
        F.when(F.col("__c_mid").isNotNull(), "drop_corpus_dup")
        .when(F.col("__b_mid").isNotNull(), "drop_batch_dup")
        .otherwise("keep").alias("decision"),
        F.coalesce("__c_mid", "__b_mid").alias("match_id"),
        F.coalesce("__c_sim", "__b_sim").alias("sim"),
    )
