"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale stance (the point of each design):
- exact: one hash-groupBy — a single shuffle on a 16-byte key at any scale.
- jaccard: shingle-explode + self-join on shingle. Quadratic in the worst
  case; it is the *verifier*, not the scale path.
- minhash_lsh: signature = per-seed min of md5(seed||shingle) (string
  minhash — lexicographic min of an avalanche hash is a valid permutation
  sample, and reproduces bit-for-bit in any engine with md5). Bands of
  rows hash to buckets; only same-bucket pairs are candidates — the
  classic sub-quadratic near-dup path for 100 TB corpora.
- simhash: 32-bit weighted-bit signature; near-dups = signatures within
  Hamming distance d (bucketed by rotated prefixes at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window, functions as F, types as T

from physioview_spark import cache as _cache
from physioview_spark.llm.text import (
    tokens as word_tokens,
    word_shingles,
    word_shingles_of,
)


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Clusters of byte-identical texts: (hash, size, member ids)."""
    h = df.select(id_col, F.md5(F.col(text_col)).alias("text_hash"))
    return (
        h.groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min(id_col).alias("keeper_id"),
        )
        .where(F.col("cluster_size") > 1)
    )


def shingle_frame(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3,
                  distinct: bool = True) -> DataFrame:
    """(id, shingle) rows; ``distinct`` dedups them (a corpus-wide
    shuffle — pass False when the consumer is duplicate-insensitive,
    e.g. a per-doc min)."""
    # token array materialized before the shingle lambda references it:
    # interpreted HOFs have no subexpression elimination, so the inline
    # word_shingles() form re-tokenized the whole text once per shingle
    # position (measured 3.08 s -> 0.36 s on this frame at sf0.1, r18)
    out = (
        df.select(id_col, word_tokens(text_col).alias("__sh_toks"))
        .select(
            id_col,
            F.explode(
                word_shingles_of(F.col("__sh_toks"), k)).alias("shingle"),
        )
    )
    return out.distinct() if distinct else out


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold (exact, via
    |A∩B| / (|A|+|B|-|A∩B|) from a shingle self-join).

    ``max_doc_freq`` drops shingles appearing in more than that many
    documents BEFORE the self-join (standard stopword-shingle pruning):
    a shingle with document frequency f fans out into f*(f-1)/2 candidate
    rows, so one hot shingle ("the quick" in every doc) turns the join
    quadratic at corpus scale. Jaccard is then computed consistently over
    the pruned shingle space (sizes and intersections both exclude hot
    shingles)."""
    sh = shingle_frame(df, text_col, id_col, k)
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col(f"a.shingle") == F.col(f"b.shingle"))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a")
                   .withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b")
              .withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / F.nullif(F.col("n_a") + F.col("n_b") - F.col("n_common"),
                           F.lit(0)),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_common", "jaccard")


def _seed_minhash_cols(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    num_hashes: int,
) -> DataFrame:
    """One groupBy(id) pass with every seed's minhash as a COLUMN:
    ``(id, __mh0 .. __mh{n-1})`` where ``__mh{s}`` = min over shingles
    of md5(s || '|' || shingle) — the same value the former
    explode(seeds)+groupBy(id, seed) pipeline produced per (id, seed)
    row (``concat(cast(s as string), '|', sh)`` == ``concat('s|', sh)``
    for a literal seed).

    Why columns instead of exploded rows (r18, guide §2.3/§2.4): the
    seed explode multiplied the shingle frame 8x before the partial
    aggregate — every shingle string copied into 8 rows, 8 hash-map
    probes per shingle on the (id, seed) key — and banding then needed
    a SECOND shuffle to regroup (id, seed) rows by (id, band). Columns
    do the identical md5 work with one probe per shingle row on the
    bare id key, one output-sized exchange, and band hashes become a
    plain projection (no second aggregate).

    The shingle frame is NOT deduped first: min over a multiset equals
    min over its set, so skipping the distinct removes the only
    corpus-size shuffle — the groupBy map-side combines to one partial
    row per id per task.

    Scaling limit (ADVICE r18): the aggregate emits one column per
    seed, and past ~100 columns (num_hashes >> the default 8, e.g. a
    128-hash MinHash config) the operator exceeds
    ``spark.sql.codegen.maxFields`` and falls off whole-stage codegen —
    a silent perf cliff, not a correctness one (min-of-string already
    runs as SortAggregate either way). Callers needing very wide
    signatures should raise ``maxFields`` or shard the seed range into
    multiple passes joined on id."""
    sh = shingle_frame(df, text_col, id_col, k, distinct=False)
    return sh.groupBy(id_col).agg(*[
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle"))))
        .alias(f"__mh{s}")
        for s in range(num_hashes)
    ])


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """(id, seed, minhash) rows: minhash = min over shingles of
    md5(seed || '|' || shingle). Engine-portable by construction.

    Computed column-wise in one groupBy(id) pass (see
    :func:`_seed_minhash_cols`) and unpivoted with ``stack`` — an
    output-sized generate, not a shuffle. Row set, values, and types
    are identical to the former explode(seeds) form: every id with at
    least one shingle emits exactly ``num_hashes`` (seed, minhash)
    rows, seed is the same int, minhash the same md5 string.

    (The former seed-explode + groupBy(id, seed) pipeline was kept
    behind a temp ``PHYSIOVIEW_LSH_ONEPASS`` A/B gate through r18 and
    deleted in r19 after the interleaved on/off receipts in
    OPTIMIZATION_r19.md — the one-pass form's equality argument above
    is additionally pinned by the committed before/after plans in
    plans/r19/ and the oracle gate on every reacher.)"""
    mins = _seed_minhash_cols(df, text_col, id_col, k, num_hashes)
    pairs: list = []
    for s in range(num_hashes):
        pairs.append(F.lit(s))
        pairs.append(F.col(f"__mh{s}"))
    return mins.select(
        id_col,
        F.stack(F.lit(num_hashes), *pairs).alias("seed", "minhash"),
    )


def _lsh_bands(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    num_hashes: int,
    band_size: int,
) -> DataFrame:
    """(id, band, band_hash) rows: band = hash of ``band_size``
    consecutive minhash values.

    Band hashes are projected straight off the one-pass seed-minhash
    columns (r18): ``sort_array(array(__mh{b*bs} ..))`` over a band's
    literal seed set equals ``sort_array(collect_list(minhash))`` over
    its (id, band) group — every id carries every seed (the min
    aggregate runs over >= 1 shingle row for each id in the frame), so
    the collected list was exactly the band's ``band_size`` mins, and
    the former groupBy(id, band) exchange disappears. ``band`` keeps
    the BIGINT type ``floor(seed / band_size)`` produced."""
    mins = _seed_minhash_cols(df, text_col, id_col, k, num_hashes)
    n_bands = -(-num_hashes // band_size)
    pairs: list = []
    for b in range(n_bands):
        members = [
            F.col(f"__mh{s}")
            for s in range(b * band_size,
                           min((b + 1) * band_size, num_hashes))
        ]
        pairs.append(F.lit(b).cast("long"))
        pairs.append(F.md5(F.concat_ws(",", F.sort_array(F.array(*members)))))
    return mins.select(
        id_col,
        F.stack(F.lit(n_bands), *pairs).alias("band", "band_hash"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band.

    ``max_bucket_size`` skips buckets larger than that many docs BEFORE
    the self-join: a bucket of m members fans out into m*(m-1)/2 pairs,
    so one boilerplate bucket (cookie banners, license headers) turns
    the join quadratic at corpus scale. Oversized buckets are near-exact
    dup groups — run :func:`exact_duplicates` (one linear shuffle) first
    and cap the residual here. For clustering, prefer
    :func:`lsh_star_edges`, which never goes quadratic."""
    bands = _lsh_bands(df, text_col, id_col, k, num_hashes, band_size)
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "band_hash")
        bands = (
            bands.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def lsh_star_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Star edges per LSH bucket: every member connects to the bucket's
    min id instead of to every other member — O(m) edges per bucket vs
    O(m^2) for all-pairs, with IDENTICAL connected components (within a
    bucket, all-pairs and the star reach the same members, so the
    transitive closure over the union of buckets is unchanged). This is
    the scale path for cluster-level dedup: no self-join anywhere, one
    window over (band, band_hash)."""
    bands = _lsh_bands(df, text_col, id_col, k, num_hashes, band_size)
    w = Window.partitionBy("band", "band_hash")
    hub = F.min(id_col).over(w)
    return (
        bands.select(hub.alias("id_a"), F.col(id_col).alias("id_b"))
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected edge list by iterative
    min-label propagation: ``(node, cluster_id)`` where ``cluster_id`` is
    the smallest node id in the component.

    Each round is one equi-join (edges x labels) + one min-groupBy, with
    the label frame eagerly materialized (``localCheckpoint``) so the plan
    does not re-expand the whole lineage per iteration (the engine's known
    iterative-plan-explosion hazard). Rounds needed = graph diameter;
    near-dup graphs from LSH banding are near-cliques (diameter ~2), so
    this converges in 2-3 rounds at any corpus size. For adversarial
    long-path graphs the alternating star-contraction algorithm (Kiveris
    et al., "Connected Components in MapReduce and Beyond") drops rounds
    to O(log^2 n); not needed for dedup workloads.

    Deterministic: labels are min ids, independent of partitioning.

    Local gear (r18): when the materialized edge list fits under
    ``PHYSIOVIEW_CC_LOCAL_MAX_EDGES`` (default 500k symmetric edges —
    a bounded, broadcast-sized collect, NOT a corpus-sized one: the
    edge list is the banding's output, already capped by the callers'
    bucket guards), the components are solved with a driver union-find
    in one pass instead of ~3 Spark jobs per propagation round. The
    iterative path at sf0.1 spent ~5 s of pure job overhead on a
    55-cluster graph (measured r18); the label function (min id per
    component) is identical by construction. Above the cap the
    distributed propagation runs, itself one join+groupBy and ONE
    action per round (the changed flag rides the checkpointed frame,
    replacing the old labels-vs-new join with a scan).
    """
    e = (pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
         .localCheckpoint(eager=True))

    cap = int(os.environ.get("PHYSIOVIEW_CC_LOCAL_MAX_EDGES", "500000"))
    # e is materialized (one pass over the pair producer's pipeline), so
    # count() is a metadata-cheap scan and the collect below is bounded
    # by the cap (tens of MB at worst). Union-find is direction- and
    # duplicate-agnostic, so the local gear skips the symmetrize +
    # distinct shuffle the propagation path needs.
    if cap > 0 and e.count() <= cap:
        rows = e.collect()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for r in rows:
            u, v = r[0], r[1]
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by min so every root IS its component's min id
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        out = [(n, find(n)) for n in parent]
        id_type = pairs.schema[id_a].dataType
        schema = T.StructType([
            T.StructField("node", id_type, False),
            T.StructField("cluster_id", id_type, False),
        ])
        return pairs.sparkSession.createDataFrame(out, schema)

    edges = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    edges = edges.distinct().localCheckpoint(eager=True)
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("label").alias("vl")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vl").alias("nbr_min"))
        )
        new = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nbr_min", "label")
                ).alias("label"),
                (F.coalesce("nbr_min", "label") < F.col("label"))
                .alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new.where(F.col("__chg")).count()
        labels = new.select("u", "label")
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("label").alias("cluster_id"))


def cluster_decisions(
    pairs: DataFrame,
    universe: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Full-universe keep/drop decisions from a near-dup pair list —
    the composition step that turns ANY pair producer (MinHash-LSH,
    SimHash, perceptual image hash, audio fingerprint, video signature,
    semantic embedding pairs) into cluster-exact dedup:
    ``(id, cluster_id, cluster_size, is_keeper)`` for EVERY id in
    ``universe``. Connected components over the pairs (min-id label),
    keeper = the minimum id per component; ids in no pair are singleton
    keepers via a left join — they never enter the component iteration,
    so the iterative cost is bounded by the pair graph, not the corpus.
    """
    cc = connected_components(pairs, id_a, id_b)
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    labeled = cc.join(sizes, "cluster_id").select(
        F.col("node").alias(id_col), "cluster_id", "cluster_size")
    return (
        universe.select(id_col)
        .join(labeled, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            F.coalesce("cluster_size", F.lit(1).cast("long"))
            .alias("cluster_size"),
        )
        .withColumn("is_keeper", F.col(id_col) == F.col("cluster_id"))
    )


def dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Near-duplicate clusters: MinHash-LSH candidate pairs → connected
    components → ``(doc_id, cluster_id, cluster_size, is_keeper)``.

    The keeper is the min doc id per cluster (deterministic de-selection
    policy: a training pipeline drops every member with
    ``is_keeper = false``). Only documents that appear in at least one
    candidate pair are emitted — untouched documents are implicitly their
    own singleton cluster and need no shuffle."""
    pairs = lsh_star_edges(df, text_col, id_col, k, num_hashes, band_size)
    cc = connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "cluster_id")
        .select(
            F.col("node").alias(id_col),
            "cluster_id",
            "cluster_size",
            (F.col("node") == F.col("cluster_id")).alias("is_keeper"),
        )
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-doc SimHash: sum ±1 per bit over token hashes, take signs.

    Token hash = first 8 hex chars of md5 (32 bits via conv). JVM-side
    throughout (explode + bitwise ops + groupBy).

    Token-contract tier 4 (llm/text.py module docstring): a TOKENLESS
    (empty/whitespace-only) doc collapses to one empty-string token —
    identical to ``word_shingles(col, 1)`` and to the minhash path's
    whole-text gram — so empty docs keep a signature and cluster with
    each other; NULL text explodes to no rows and drops out of the
    signature frame, same as every token-derived frame. The split is
    :func:`~physioview_spark.llm.text.tokens` itself (explicit
    TOKEN_WS class, phantom '' entries dropped), so the tier-0
    whitespace definition holds here too."""
    toks_arr = word_tokens(F.col(text_col))
    terms = F.when(F.size(toks_arr) == 0, F.array(F.lit(""))).otherwise(
        toks_arr
    )
    toks = df.select(
        id_col,
        F.explode(F.transform(terms, lambda w: F.lower(w))).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    toks = toks.withColumn("h", h)
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_cols)
    sig = sum(
        (F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
         for i in range(bits)),
        F.lit(0),
    )
    return agg.select(id_col, sig.cast("long").alias("simhash"))


def auto_blocks(
    n: int, bits: int = 32, max_hamming: int = 3,
) -> tuple[int, int] | None:
    """Pick the ``blocks=(b, q)`` pigeonhole gear for ``n`` signatures,
    or ``None`` when the default single-chunk key already minimizes
    estimated shuffle rows (:func:`hamming_banded_pairs` resolves
    ``blocks="auto"`` through this — the same measured-crossover auto
    contract as ``scoring='auto'`` / ``probe_ivf_buckets`` in
    llm/similarity.py).

    Cost model per gear (``t`` tables keying ``k`` bits):
    ``fanout_weight * t * n`` exploded rows through the exchange
    plus ``t * n*(n-1)/2 / 2**k`` expected random-collision candidate
    pairs (uniform-key approximation; near-dup families sit on top of
    both gears equally, so they cancel out of the comparison). The
    fan-out weight 50 is fit from the three measured gear walls on the
    72k image corpus (PLANS.md "Multimodal pigeonhole-Hamming at
    x100": default 3.87 s / 35.4M cands + 0.5M fan-out, blocks=(8,2)
    5.26 s / 1.12M + 2.0M, blocks=(10,4) 27.0 s / 45.5k + 15.1M ->
    alpha/beta ~52): locally candidates are near-free (whole-stage-
    codegen popcount) while fan-out rows pay explode+exchange+distinct;
    on a real cluster both cross exchanges and the true ratio
    compresses toward 1-3x, so the weight is CONSERVATIVE — it can
    only delay adopting a bigger fan-out, never explode one
    prematurely. With it, the 64-bit/max-6 family's crossover lands at
    ~160k signatures, the same decade as the ~215k PLANS.md
    back-of-envelope (which dropped the 7x table factor from the
    default gear's candidate mass). The
    default gear is ``t = max_hamming + 1`` disjoint chunks of
    ``bits // (max_hamming + 1)`` bits; candidates under it grow
    ~n^2 in a FIXED key space, which is the quadratic defect the gear
    exists to fix (measured 9,947x candidate growth for 100x rows,
    PLANS.md r11). Admissibility mirrors the explicit-gear guards:
    ``1 <= q <= b - max_hamming`` (100% recall), key width <= 62 bits
    (BIGINT), ``C(b, q) <= 256`` (fan-out sanity). Ties prefer
    ``b | bits`` (no uncovered top bits), then fewer tables."""
    from math import comb

    if n < 2:
        return None
    fanout_weight = 50.0  # receipt-calibrated, see docstring

    def cost(tables: int, key_bits: int) -> float:
        return (fanout_weight * tables * n
                + tables * (n * (n - 1) / 2.0) / float(1 << key_bits))

    default_cost = cost(max_hamming + 1, bits // (max_hamming + 1))
    best: tuple[int, int] | None = None
    best_key: tuple[float, int, int] | None = None
    for b in range(max_hamming + 2, bits + 1):
        chunk_bits = bits // b
        if chunk_bits < 1:
            break
        for q in range(1, b - max_hamming + 1):
            if q * chunk_bits > 62:
                break
            tables = comb(b, q)
            if tables > 256:
                continue  # not monotone in q (decreases past b/2)
            c = cost(tables, q * chunk_bits)
            key = (c, 0 if bits % b == 0 else 1, tables)
            if c < default_cost and (best_key is None or key < best_key):
                best, best_key = (b, q), key
    return best


def hamming_banded_pairs(
    sig: DataFrame,
    sig_col: str,
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    blocks: tuple[int, int] | str | None = None,
    approx_count: int | None = None,
) -> DataFrame:
    """All pairs whose ``bits``-wide signatures are within Hamming
    distance ``max_hamming`` — the shared engine behind SimHash text
    near-dups and perceptual-hash image near-dups.

    Pigeonhole banding (default, ``blocks=None``): the signature splits
    into ``max_hamming + 1`` disjoint chunks, so two signatures within
    the distance agree exactly on at least one chunk — candidate
    generation joins on (chunk index, chunk value) with 100% recall,
    then an exact popcount filter gives 100% precision.
    ``max_bucket_size`` skips chunk buckets with more members than that
    BEFORE the self-join — the quadratic guard shared with
    :func:`minhash_lsh_candidates` (an oversized bucket is a near-exact
    dup family; handle it with :func:`exact_duplicates` or
    cluster-level :func:`dup_clusters`). Output: (id_a, id_b, hamming).

    ``blocks=(b, q)`` is the SCALE gear — generalized pigeonhole in the
    style of Manku et al. (WWW'07, the production simhash-dedup
    design): split into ``b`` blocks and key candidates on every
    ``q``-combination of block values (C(b, q) tables). A pair within
    distance ``max_hamming`` poisons at most ``max_hamming`` blocks, so
    while ``q <= b - max_hamming`` some enumerated combination is fully
    clean on both sides — recall stays 100%. The point: key length is
    ``q * (bits // b)`` bits, so the bucket space GROWS with q — the
    default single-chunk key is ``bits/(max_hamming+1)`` bits, a FIXED
    space whose per-bucket occupancy (and so random-collision candidate
    mass) grows linearly with corpus size; picking q so that the key
    length tracks ~2*log2(N) holds expected bucket occupancy constant,
    the same index-growth contract as LSH planes ~ log2 N
    (llm/similarity.py) and sqrt-N IVF codebooks. Cost: C(b, q) tables
    of row fan-out instead of max_hamming + 1 (capped at 256 —
    a combination explosion is a configuration error, not a plan).
    ``blocks=None`` keeps the historical single-chunk plan bit-for-bit.

    ``blocks="auto"`` resolves the gear from the signature count via
    :func:`auto_blocks` — single-chunk below the measured shuffle-row
    crossover (~160k signatures for the 64-bit/max-6 phash family —
    same decade as the ~215k PLANS.md r11 envelope), a grown (b, q)
    key above it, so a caller at 10^7 signatures no longer needs to
    know the crossover to avoid the N^2-in-a-fixed-key-space candidate
    mass. Pass ``approx_count``
    (any upstream estimate within ~2x is fine — the cost curves are
    shallow near the crossover) to skip the one extra ``sig.count()``
    job auto otherwise runs; explicit ``blocks`` tuples and ``None``
    never count.

    .. warning:: ``blocks='auto'`` WITHOUT ``approx_count`` makes plan
       CONSTRUCTION eager: the gear choice needs N, so building (not
       executing) the DataFrame triggers a ``sig.count()`` Spark job.
       The gear cannot be deferred to execution time — the physical
       plan's shape (table count, key width) depends on it. Code paths
       that must stay lazy — the declared registry queries, the plan
       census, anything that only ``explain()``s — pass an explicit
       gear or an ``approx_count`` (ADVICE r13).
    """
    if blocks == "auto":
        n = approx_count if approx_count is not None else sig.count()
        blocks = auto_blocks(n, bits=bits, max_hamming=max_hamming)
    elif isinstance(blocks, str):
        raise ValueError(f"blocks must be 'auto', a (b, q) tuple, or "
                         f"None, got {blocks!r}")
    if blocks is None:
        chunk_bits = bits // (max_hamming + 1)
        chunks = sig.select(
            id_col, sig_col,
            F.explode(F.sequence(F.lit(0), F.lit(max_hamming))).alias("c"),
        ).withColumn(
            "chunk_val",
            F.expr(f"shiftright({sig_col}, CAST(c * {chunk_bits} AS INT))")
            .bitwiseAND(F.lit((1 << chunk_bits) - 1)),
        )
    else:
        import itertools
        from functools import reduce
        from math import comb

        b, q = blocks
        if not (1 <= q <= b - max_hamming):
            raise ValueError(
                f"blocks=({b}, {q}) breaks the pigeonhole recall "
                f"guarantee: need 1 <= q <= b - max_hamming "
                f"= {b - max_hamming}")
        # When b does not divide bits, the TOP bits % b signature bits
        # are excluded from every block key. Recall is unaffected (an
        # uncovered-bit difference never poisons a block key, and the
        # exact popcount filter restores precision), but those uncovered
        # bits inflate candidate mass — prefer b | bits when tuning.
        chunk_bits = bits // b
        if chunk_bits < 1:
            raise ValueError(f"blocks b={b} exceeds signature bits={bits}")
        if q * chunk_bits > 62:
            raise ValueError(
                f"combined key width {q * chunk_bits} bits overflows "
                "the BIGINT key; reduce q or increase b")
        if comb(b, q) > 256:
            raise ValueError(
                f"C({b}, {q}) = {comb(b, q)} tables — combination "
                "explosion; pick a smaller q or b")

        def chunk(blk: int):
            return F.expr(
                f"shiftright({sig_col}, {blk * chunk_bits})"
            ).bitwiseAND(F.lit((1 << chunk_bits) - 1))

        combos = list(itertools.combinations(range(b), q))
        keys = F.array(*[
            F.struct(
                F.lit(t).alias("c"),
                reduce(lambda acc, jb: acc + F.shiftleft(
                    chunk(jb[1]), jb[0] * chunk_bits),
                    enumerate(combo[1:], start=1), chunk(combo[0]),
                ).alias("chunk_val"))
            for t, combo in enumerate(combos)
        ])
        chunks = (
            sig.select(id_col, sig_col, F.explode(keys).alias("__k"))
            .select(id_col, sig_col,
                    F.col("__k.c").alias("c"),
                    F.col("__k.chunk_val").alias("chunk_val"))
        )
    if max_bucket_size is not None:
        w = Window.partitionBy("c", "chunk_val")
        chunks = (
            chunks.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{sig_col}").alias("sig_a"),
            F.col(f"b.{sig_col}").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    blocks: tuple[int, int] | str | None = None,
    approx_count: int | None = None,
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= max_hamming — SimHash
    signatures through the shared :func:`hamming_banded_pairs`
    pigeonhole engine (``blocks`` = the Manku multi-block scale gear;
    ``"auto"`` + optional ``approx_count`` = the measured-crossover
    auto selection)."""
    sig = simhash(df, text_col, id_col, bits)
    return hamming_banded_pairs(
        sig, "simhash", id_col, bits, max_hamming, max_bucket_size,
        blocks=blocks, approx_count=approx_count)


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_hits: int = 1,
    bloom_prefilter: bool = False,
    bloom_fpp: float = 0.05,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at
    least ``min_hits`` distinct k-word shingles with any benchmark
    document (the n-gram-overlap rule used to scrub eval sets out of
    pretraining corpora).

    Output: ``(id, n_bench_docs, max_overlap)`` for contaminated docs —
    ``n_bench_docs`` = how many benchmark docs it collides with,
    ``max_overlap`` = largest shared-shingle count with any one of them.

    Scale shape: benchmark sets are tiny next to the corpus, so the
    bench shingle frame is **broadcast** — the corpus side streams
    through a broadcast hash join with NO corpus-wide shuffle: corpus
    shingles are exploded un-deduped (a distinct first would shuffle
    the whole corpus), the broadcast join keeps only hit rows, and the
    distinct-shingle dedup runs on those (tiny) hits.

    ``bloom_prefilter=True`` inserts a Bloom probe of the corpus
    shingle stream against the bench shingle set BEFORE the exact
    broadcast join — for a benchmark suite whose distinct k-gram set
    runs to millions of rows, the broadcast hashmap is the cost center
    and the ~6.2-bits/key bitmap (5% FPP default) is 15-20x smaller. The exact join
    still verifies every survivor, so FPs cannot flag a clean doc:
    results are bit-identical (eagerly builds the filter: one count +
    one collect over the bench side)."""
    tsh = shingle_frame(train, text_col, id_col, k, distinct=False)
    bsh = (
        shingle_frame(bench, text_col, id_col, k)
        .withColumnRenamed(id_col, "__bench_id")
    )
    if bloom_prefilter:
        from physioview_spark.llm.bloom import (
            bloom_build, bloom_parameters, bloom_probe, bloom_to_bitmap)
        n_b = bsh.select("shingle").distinct().count()
        m, n_h = bloom_parameters(max(1, n_b), bloom_fpp)
        bitmap = bloom_to_bitmap(
            bloom_build(bsh.select("shingle"), ["shingle"], m, n_h), m)
        tsh = bloom_probe(tsh, ["shingle"], bitmap, m, n_h)
    hits = (
        tsh.join(F.broadcast(bsh), "shingle")
        .select(id_col, "__bench_id", "shingle")
        .distinct()
        .groupBy(id_col, "__bench_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_hits)
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bench_docs"),
        F.max("n_common").alias("max_overlap"),
    )


def dedup_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passage_tokens: int = 16,
    out_col: str = "text_dedup",
) -> DataFrame:
    """Exact duplicate-passage removal with reassembly: cut every
    document into fixed ``passage_tokens``-token windows, remove every
    window whose exact text recurs ANYWHERE in the corpus, keep the
    single first occurrence (ordered by ``(id, position)``), and stitch
    each document back together from its surviving windows — the
    substring-level exact dedup of Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better"), approximated at a
    fixed window stride instead of a suffix array. Unlike
    :func:`physioview_spark.llm.text.winnow_fingerprints` (which only
    *detects* shared spans) this operator *rewrites* the corpus.

    Output: ``(id_col, n_passages, n_removed, out_col)`` — one row per
    input document; a document whose every passage is a repeat keeps an
    empty string.

    Scale shape: passages explode at ~1/passage_tokens of the token
    count; the occurrence aggregate groups on ``md5(passage)`` (16-byte
    key, map-side partial combine) and keeps only ``count`` plus the
    min ``(id, pos)`` struct — no window over occurrences. The
    join back is a shuffle join on the same hash key; a corpus-hot
    passage (a license paragraph repeated millions of times) lands on
    one reducer only in that join, which AQE skew-split handles, and
    every copy but one is dropped right there. Reassembly sorts each
    doc's surviving (pos, passage) pairs inside one aggregate row
    (array_sort on structs), not with a window.
    """
    from physioview_spark.llm.text import token_chunks

    k = int(passage_tokens)
    # stride == chunk_size -> the exact non-overlapping windowing this
    # operator needs; reuse token_chunks so the chunk-boundary
    # arithmetic lives in ONE place (an empty doc yields its one
    # zero-token chunk there — filtered here, reattached via the spine)
    passages = (
        token_chunks(df, text_col, id_col, chunk_size=k, stride=k)
        .where(F.col("chunk_tokens") > 0)
        .select(id_col, F.col("chunk_id").alias("__pos"),
                F.col("chunk_text").alias("__passage"))
        .withColumn("__ph", F.md5("__passage"))
    )
    occ = passages.groupBy("__ph").agg(
        F.count(F.lit(1)).alias("__occ"),
        F.min(F.struct(F.col(id_col).alias("__id"),
                       F.col("__pos").alias("__p"))).alias("__first"),
    )
    flagged = passages.join(occ, "__ph").withColumn(
        "__keep",
        (F.col("__occ") == 1)
        | ((F.col(id_col) == F.col("__first.__id"))
           & (F.col("__pos") == F.col("__first.__p"))),
    )
    rebuilt = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(F.when(~F.col("__keep"), 1).otherwise(0))
        .cast("long").alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep"),
                               F.struct(F.col("__pos").alias("p"),
                                        F.col("__passage").alias("s"))))),
                lambda x: x["s"],
            ),
        ).alias(out_col),
    )
    return (
        df.select(id_col).join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_passages", F.lit(0).cast("long"))
            .alias("n_passages"),
            F.coalesce("n_removed", F.lit(0).cast("long"))
            .alias("n_removed"),
            F.coalesce(out_col, F.lit("")).alias(out_col),
        )
    )


def dedup_delta(
    new: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    prefilter: bool | str = True,
    bloom_fpp: float = 0.05,
) -> DataFrame:
    """Incremental dedup: score a NEW batch against an EXISTING corpus
    without re-pairing the corpus with itself — the production shape
    (daily crawl increments into a reference corpus; the batch twin of
    ``streaming/documents.streaming_near_dup_lsh``).

    One decision row per new document:
    ``(id_col, decision, match_id, jaccard)`` with ``decision`` in
    ``drop_exact`` (byte-identical text exists in the corpus;
    ``match_id`` = smallest such corpus id, jaccard 1.0),
    ``drop_near_dup`` (an LSH candidate verified at shingle-Jaccard >=
    ``threshold``; ``match_id`` = the best match, ties on id), or
    ``keep``.

    Scale shape — everything is one-sided: the corpus contributes one
    16-byte-hash aggregate (exact), its band table, and shingles for
    CANDIDATE docs only; no corpus self-join anywhere, so a tiny delta
    against a 100 TB corpus costs O(delta) plus one corpus pass (at
    which point the corpus band/hash tables are exactly what you
    would persist between increments — see the streaming twin's
    bucketed state for that layout). ``max_bucket_size`` caps corpus
    LSH buckets before the candidate join (a viral boilerplate bucket
    would otherwise fan every matching new doc into it); the exact
    path is unaffected by the cap.

    ``prefilter`` (default on) broadcast-semi-joins DELTA-derived key
    sets against every corpus-side table before it shuffles — the
    runtime-filter pattern, exact instead of Bloom, so results are
    bit-identical:

    * exact path: corpus md5 rows are probed against the new batch's
      distinct md5 set before the keeper aggregate, so the corpus
      text-hash shuffle shrinks from O(corpus) to O(hits);
    * band table: corpus band rows are probed against the new batch's
      (band, band_hash) set BEFORE the bucket-size guard — a touched
      bucket keeps its full membership, so guard counts and candidates
      are unchanged, but untouched buckets (almost all of them) never
      shuffle;
    * shingle verify: the corpus shingle explode runs only over
      candidate docs (semi-join on the candidate id set) instead of
      the whole corpus — per-doc shingle counts are identical.

    Every broadcast is bounded by the DELTA batch (the operator's
    premise); pass ``prefilter=False`` when the "delta" is comparable
    to the corpus, which restores the plain shuffle plans.

    ``prefilter="bloom"`` swaps the exact broadcast key sets for Bloom
    filters (:mod:`physioview_spark.llm.bloom`): ~6.2 bits/key at the
    default 5% FPP (loose is right for a prune-only prefilter — fewer
    hash probes, and leaked rows just reach the exact join) instead of
    16-byte md5 rows plus hashmap overhead,
    so the broadcast-the-delta regime survives deltas an order of
    magnitude larger. False positives only let extra corpus rows
    through the prune into the exact join/verify, so decisions are
    bit-identical to the exact gear (Bloom has no false negatives).
    The bloom gear is partially EAGER: it runs one count + one filter
    build on the delta before returning (runtime-filter construction);
    the exact gear stays fully lazy.
    """
    if prefilter not in (True, False, "exact", "bloom"):
        raise ValueError(
            f"prefilter must be True/False/'exact'/'bloom', got {prefilter!r}")
    use_bloom = prefilter == "bloom"
    if prefilter == "exact":
        prefilter = True
    if use_bloom:
        from physioview_spark.llm.bloom import (
            bloom_build, bloom_parameters, bloom_probe, bloom_to_bitmap)
        n_new = new.count()  # one sizing job over the (small) delta
    n_ids = new.select(id_col)
    # --- exact: one corpus-side hash aggregate, joined on 16 bytes
    c_rows = corpus.select(F.md5(F.col(text_col)).alias("__h"), id_col)
    if use_bloom:
        m_h, k_h = bloom_parameters(n_new, bloom_fpp)
        h_bitmap = bloom_to_bitmap(
            bloom_build(new.select(F.md5(F.col(text_col)).alias("__h")),
                        ["__h"], m_h, k_h),
            m_h)
        c_rows = bloom_probe(c_rows, ["__h"], h_bitmap, m_h, k_h)
    elif prefilter:
        c_rows = c_rows.join(
            F.broadcast(new.select(F.md5(F.col(text_col)).alias("__h"))
                        .distinct()),
            "__h", "semi")
    c_hash = c_rows.groupBy("__h").agg(F.min(id_col).alias("__exact_id"))
    exact = (
        new.select(id_col, F.md5(F.col(text_col)).alias("__h"))
        .join(c_hash, "__h")
        .select(id_col, "__exact_id")
    )
    # --- near: one-sided band join, then exact Jaccard on candidates
    bn = _lsh_bands(new, text_col, id_col, k, num_hashes, band_size) \
        .withColumnRenamed(id_col, "__nid")
    bc = _lsh_bands(corpus, text_col, id_col, k, num_hashes, band_size) \
        .withColumnRenamed(id_col, "__cid")
    if use_bloom:
        # bn feeds the bloom build and the candidate join — same
        # two-consumer persist as the exact gear
        bn = _cache.pin(bn)
        n_band_rows = max(1, n_new * (num_hashes // band_size))
        m_b, k_b = bloom_parameters(n_band_rows, bloom_fpp)
        b_bitmap = bloom_to_bitmap(
            bloom_build(bn.select("band", "band_hash"),
                        ["band", "band_hash"], m_b, k_b),
            m_b)
        bc = bloom_probe(bc, ["band", "band_hash"], b_bitmap, m_b, k_b)
    elif prefilter:
        # bn feeds two consumers here (the broadcast probe and the
        # candidate join) — persist so the delta's minhash explode
        # runs once, not per lineage
        bn = _cache.pin(bn)
        bc = bc.join(
            F.broadcast(bn.select("band", "band_hash").distinct()),
            ["band", "band_hash"], "semi")
    if max_bucket_size is not None:
        ok_buckets = (
            bc.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .where(F.col("__bsz") <= max_bucket_size)
            .select("band", "band_hash")
        )
        bc = bc.join(ok_buckets, ["band", "band_hash"])
    cand = (
        bn.join(bc, ["band", "band_hash"])
        .select("__nid", "__cid").distinct()
    )
    corpus_verify = corpus
    if prefilter:  # truthy for "bloom" too: the candidate-id set is
        # tiny post-banding, so the exact semi-join stays the right
        # gear even when the delta-sized sets above went Bloom
        # cand feeds two consumers below (the corpus-doc prune and the
        # intersection join); persisting the tiny candidate set stops
        # the second consumer re-running the corpus minhash explode
        cand = _cache.pin(cand)
        corpus_verify = corpus.join(
            F.broadcast(cand.select(F.col("__cid").alias(id_col))
                        .distinct()),
            id_col, "semi")

    # each shingle frame feeds TWO consumers (its size aggregate and
    # the intersection join); without a spill-safe persist the lineage
    # re-explodes the corpus per consumer CONCURRENTLY with the minhash
    # explode — measured executor OOM at the 10x corpus on a default
    # heap (the get_missing pattern, operators/metrics.py)
    shn = _cache.pin(
        shingle_frame(new, text_col, id_col, k)
        .withColumnRenamed(id_col, "__nid")
        .withColumnRenamed("shingle", "__s"))
    shc = _cache.pin(
        shingle_frame(corpus_verify, text_col, id_col, k)
        .withColumnRenamed(id_col, "__cid")
        .withColumnRenamed("shingle", "__s"))
    sz_n = shn.groupBy("__nid").agg(F.count(F.lit(1)).alias("__na"))
    sz_c = shc.groupBy("__cid").agg(F.count(F.lit(1)).alias("__nb"))
    inter = (
        cand.join(shn, "__nid")
        .join(shc, ["__cid", "__s"])
        .groupBy("__nid", "__cid")
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    jac = (
        inter.join(sz_n, "__nid").join(sz_c, "__cid")
        .withColumn(
            "__j",
            F.round(
                F.col("__common")
                / F.nullif(F.col("__na") + F.col("__nb") - F.col("__common"),
                           F.lit(0)), 6))
        .where(F.col("__j") >= threshold)
    )
    w = Window.partitionBy("__nid").orderBy(F.desc("__j"), F.asc("__cid"))
    best = (
        jac.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("__nid", "__cid", "__j")
    )
    return (
        n_ids.join(exact, id_col, "left")
        .join(best, n_ids[id_col] == F.col("__nid"), "left")
        .select(
            id_col,
            F.when(F.col("__exact_id").isNotNull(), "drop_exact")
            .when(F.col("__cid").isNotNull(), "drop_near_dup")
            .otherwise("keep").alias("decision"),
            F.coalesce("__exact_id", "__cid").alias("match_id"),
            F.when(F.col("__exact_id").isNotNull(), F.lit(1.0))
            .otherwise(F.col("__j")).alias("jaccard"),
        )
    )
