"""Golden tests for the LLM-data operators: LSH recall vs exact methods,
simhash identity, language ID on known text, multimodal decode plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from physioview_spark.llm import dedup, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bend"),
        (2, "a completely different sentence about spark query engines and joins"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank"),
        (4, "machine learning pipelines deduplicate training data at scale"),
        (5, "el gato y el perro estan en la casa de que los vecinos"),
        (6, "der hund und die katze sind nicht in das haus ein mit"),
        (7, "the cat and the dog are in that house of it is"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_finds_clone(spark, docs):
    out = dedup.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["cluster_size"] == 2 and out[0]["keeper_id"] == 0


def test_jaccard_and_lsh_candidates_agree(spark, docs):
    exact = dedup.jaccard_pairs(docs, k=3, threshold=0.5)
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    assert (0, 3) in exact_pairs  # identical docs
    assert (0, 1) in exact_pairs  # one-word difference
    cand = dedup.minhash_lsh_candidates(docs, k=3, num_hashes=8, band_size=2)
    cand_pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    # LSH must recall the identical pair; near-identical with high prob
    assert (0, 3) in cand_pairs
    assert (0, 1) in cand_pairs


def test_jaccard_hot_shingle_guard(spark, docs):
    """df-capped shingle pruning: on the fixture corpus (no shingle hits
    the cap) results are identical; on a stopword-heavy corpus the shared
    hot token no longer drives O(n^2) candidate pairs."""
    base = {(r["id_a"], r["id_b"], r["n_common"], r["jaccard"])
            for r in dedup.jaccard_pairs(docs, k=3, threshold=0.5).collect()}
    capped = {(r["id_a"], r["id_b"], r["n_common"], r["jaccard"])
              for r in dedup.jaccard_pairs(
                  docs, k=3, threshold=0.5, max_doc_freq=7).collect()}
    assert capped == base  # cap above every fixture df -> unchanged

    # 40 otherwise-disjoint docs all containing "the": uncapped unigram
    # join yields C(40,2) candidate pairs through that one token
    stopworded = spark.createDataFrame(
        [(i, f"the unique{i} token{i} word{i}") for i in range(40)],
        "doc_id long, text string")
    uncapped = dedup.jaccard_pairs(stopworded, k=1, threshold=0.0)
    guarded = dedup.jaccard_pairs(stopworded, k=1, threshold=0.0,
                                  max_doc_freq=10)
    assert uncapped.count() == 40 * 39 // 2
    assert guarded.count() == 0


def test_simhash_identity_and_distance(spark, docs):
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sig[0] == sig[3]
    near = dedup.simhash_near_dups(docs, max_hamming=3)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in near.collect()}
    assert pairs.get((0, 3)) == 0


def test_language_id_known_sentences(spark, docs):
    out = {r["doc_id"]: r["lang_pred"]
           for r in text.detect_language(docs).collect()}
    assert out[0] == "en"
    assert out[5] == "es"
    assert out[6] == "de"
    assert out[7] == "en"


def test_token_count_and_fingerprint(spark, docs):
    counted = {r["doc_id"]: r["n_tokens"]
               for r in text.token_count(docs).collect()}
    assert counted[0] == 13
    fp = {r["doc_id"]: r["fingerprint"]
          for r in text.fingerprint(docs).collect()}
    assert fp[0] == fp[3]  # identical docs -> identical fingerprint
    assert fp[0] != fp[2]


def test_token_count_null_and_empty_text(spark):
    """r10 advisor: NULL text must count as 0 tokens, not the legacy
    sizeOfNull -1 — a -1 would SUM into the domain token masses feeding
    temperature_weights while a SQL oracle's CASE-NULL is excluded from
    SUM (latent doc_temperature_mixture divergence). Empty/whitespace
    text already counted 0; NULL now matches."""
    df = spark.createDataFrame(
        [(0, "three word doc"), (1, ""), (2, "   "), (3, None)],
        "doc_id long, text string")
    got = {r.doc_id: r.n_tokens for r in text.token_count(df).collect()}
    assert got == {0: 3, 1: 0, 2: 0, 3: 0}


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(5)
    base = rng.randn(40, 16).astype(np.float32)
    base[7] = base[3] + 0.01 * rng.randn(16).astype(np.float32)  # near-dup
    rows = [(i, [float(v) for v in base[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(spark, vectors):
    out = similarity.cosine_topk(
        vectors.where(F.col("vec_id") == 3), vectors, k=3
    ).collect()
    assert out[0]["match_id"] == 7 and out[0]["sim"] > 0.999
    # verify against numpy
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in vectors.collect()}
    q = rows[3]
    sims = {
        i: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
        for i, v in rows.items() if i != 3
    }
    best = sorted(sims, key=lambda i: (-round(sims[i], 6), i))[:3]
    assert [r["match_id"] for r in out] == best


def test_lsh_topk_recall(spark, vectors):
    exact = similarity.cosine_topk(
        vectors.where(F.col("vec_id") < 10), vectors, k=3
    )
    approx = similarity.lsh_topk(
        vectors.where(F.col("vec_id") < 10), vectors, k=3,
        n_planes=2, dim=16,
    )
    e = {(r["query_id"], r["match_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["match_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # 2 planes / 4 buckets: expect decent recall
    # the engineered near-dup pair must survive LSH bucketing
    assert (3, 7) in a


def test_lsh_topk_arrow_gear_parity(spark, vectors):
    """method='arrow' swaps the re-rank's per-pair cosine expressions
    for the Arrow batch gear (r08: candidate scoring dominates LSH
    once signatures are literal-folded). Signatures are shared, so the
    candidate set is identical; 6-decimal-rounded sims must match the
    expr gear on both the single-band and multi-band paths."""
    for kw in ({"n_planes": 2, "dim": 16},
               {"n_planes": 2, "dim": 16, "n_bands": 3, "n_probe": 1}):
        expr = similarity.lsh_topk(
            vectors.where(F.col("vec_id") < 10), vectors, k=3, **kw)
        arrow = similarity.lsh_topk(
            vectors.where(F.col("vec_id") < 10), vectors, k=3,
            method="arrow", **kw)
        cols = ["query_id", "match_id", "sim", "rank"]
        a = sorted(tuple(r[c] for c in cols) for r in expr.collect())
        b = sorted(tuple(r[c] for c in cols) for r in arrow.collect())
        assert a == b, kw


def test_lsh_topk_multiband_recall(spark, vectors):
    """OR-of-bands ANN: recall >=0.9 vs brute force at the same
    bucket-equi-join cost shape (single band at these plane counts is
    demonstrably lossier — asserted strictly better here)."""
    exact = similarity.cosine_topk(
        vectors.where(F.col("vec_id") < 10), vectors, k=3
    )
    e = {(r["query_id"], r["match_id"]) for r in exact.collect()}

    def recall(n_bands):
        out = similarity.lsh_topk(
            vectors.where(F.col("vec_id") < 10), vectors, k=3,
            n_planes=2, dim=16, n_bands=n_bands,
        )
        got = {(r["query_id"], r["match_id"]) for r in out.collect()}
        return len(e & got) / len(e), got

    r1, _ = recall(1)
    r6, got6 = recall(6)
    assert r6 >= 0.9, r6
    assert r6 >= r1
    assert (3, 7) in got6
    # multi-band output drops the ambiguous single-bucket column
    out = similarity.lsh_topk(vectors.limit(2), vectors, k=3,
                              n_planes=2, dim=16, n_bands=2)
    assert out.columns == ["query_id", "match_id", "sim", "rank"]


def test_lsh_topk_multiprobe_recall(spark, vectors):
    """Multi-probe LSH: probing Hamming-adjacent (lowest-margin) buckets
    of the QUERY code lifts recall at a fixed band count — the
    corpus-side explode (the expensive side at scale) does not grow."""
    exact = similarity.cosine_topk(
        vectors.where(F.col("vec_id") < 10), vectors, k=3
    )
    e = {(r["query_id"], r["match_id"]) for r in exact.collect()}

    def recall(n_probe):
        out = similarity.lsh_topk(
            vectors.where(F.col("vec_id") < 10), vectors, k=3,
            n_planes=2, dim=16, n_bands=2, n_probe=n_probe,
        )
        got = {(r["query_id"], r["match_id"]) for r in out.collect()}
        return len(e & got) / len(e), got

    r0, _ = recall(0)
    r2, got2 = recall(2)
    assert r2 >= 0.95, r2
    assert r2 >= r0
    assert (3, 7) in got2
    # no false positives: multi-probe only widens the candidate set,
    # the exact re-rank still scores true cosine
    out = similarity.lsh_topk(vectors.limit(2), vectors, k=3,
                              n_planes=2, dim=16, n_bands=2, n_probe=1)
    assert out.columns == ["query_id", "match_id", "sim", "rank"]


def test_embedding_near_dups(spark, vectors):
    out = similarity.embedding_near_dups(
        vectors, threshold=0.99, n_planes=2, dim=16
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(3, 7)}


def test_trigram_typicality_orders_outliers(spark):
    """A doc drawn from the corpus's dominant trigram distribution must
    score LOWER (more typical) than an off-distribution outlier; tiny
    docs (<3 chars) yield null."""
    from physioview_spark.llm import text as T
    common = "the cat and the dog and the rat sat on the mat"
    rows = [(i, common) for i in range(5)]
    rows.append((10, "zqxjkwvzqxjkwv!!##%%zzkk"))  # off-distribution
    rows.append((11, "ab"))                        # too short
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.trigram_typicality(df).collect()}
    assert out[11]["avg_neg_log2p"] is None and out[11]["n_trigrams"] == 0
    assert out[0]["avg_neg_log2p"] < out[10]["avg_neg_log2p"]
    assert out[0]["n_trigrams"] == len(common) - 2


def test_trigram_typicality_topk_residual(spark):
    """Bounded-counts path: with top_k smaller than the distinct-trigram
    count, tail trigrams score through the single residual rare bucket;
    the typical-vs-outlier ordering survives, and a top_k larger than
    the vocabulary reproduces the exact (unbounded) scores. The scoring
    join must broadcast the bounded table (never shuffle on the skewed
    trigram key)."""
    from physioview_spark.llm import text as T
    common = "the cat and the dog and the rat sat on the mat"
    rows = [(i, common) for i in range(5)]
    rows.append((10, "zqxjkwvzqxjkwv!!##%%zzkk"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {r["doc_id"]: r for r in T.trigram_typicality(df).collect()}
    # top_k sized to the typical doc's vocabulary (every common gram has
    # count >= 5, every outlier gram <= 2, so count-desc top-K keeps all
    # common grams exact and routes the outlier through the residual) —
    # mirroring the real regime where top-K covers the prose mass
    n_common = (df.where("doc_id = 0")
                .selectExpr("explode(transform(sequence(1, length(text) - 2),"
                            " i -> substring(lower(text), i, 3))) g")
                .distinct().count())
    capped = T.trigram_typicality(df, top_k=n_common)
    out = {r["doc_id"]: r for r in capped.collect()}
    # ordering preserved even though the outlier's grams are all rare
    assert out[0]["avg_neg_log2p"] < out[10]["avg_neg_log2p"]
    # rare grams share one bucket prob, so the outlier score changes
    assert out[10]["avg_neg_log2p"] != exact[10]["avg_neg_log2p"]
    # multiplicity-weighted n_trigrams unchanged by the bounding
    assert out[0]["n_trigrams"] == exact[0]["n_trigrams"]
    # top_k >= vocab => exact semantics
    wide = {r["doc_id"]: r
            for r in T.trigram_typicality(df, top_k=10**6).collect()}
    assert all(wide[k]["avg_neg_log2p"] == exact[k]["avg_neg_log2p"]
               for k in exact)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_strip_boilerplate_lines(spark):
    """Lines repeated >= min_repeats across the corpus are stripped from
    every doc; unique lines survive in order; all-boilerplate docs keep
    an empty string."""
    from physioview_spark.llm import text as T
    banner = "accept our cookies"
    rows = [
        (0, f"{banner}\nunique alpha\nunique beta"),
        (1, f"unique gamma\n{banner}"),
        (2, f"{banner}"),
        (3, "one of a kind\nalso unique"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           T.strip_boilerplate_lines(df, min_repeats=3).collect()}
    assert out[0]["text_clean"] == "unique alpha\nunique beta"
    assert out[0]["n_lines"] == 3 and out[0]["n_boilerplate"] == 1
    assert out[1]["text_clean"] == "unique gamma"
    assert out[2]["text_clean"] == "" and out[2]["n_boilerplate"] == 1
    assert out[3]["text_clean"] == "one of a kind\nalso unique"
    assert out[3]["n_boilerplate"] == 0
    # below the threshold nothing is stripped
    out4 = {r["doc_id"]: r for r in
            T.strip_boilerplate_lines(df, min_repeats=4).collect()}
    assert out4[2]["text_clean"] == banner


def test_strip_boilerplate_plan_no_forced_broadcast(spark):
    """The hot-line set is unbounded at corpus scale, so the plan must
    NOT carry an unconditional broadcast hint — AQE decides. The
    anti-join must also key on the 8-byte xxhash64, not the raw line."""
    from physioview_spark.llm import text as T
    df = spark.createDataFrame(
        [(0, "a\nb"), (1, "a\nc")], "doc_id long, text string")
    out = T.strip_boilerplate_lines(df, min_repeats=2)
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical and "broadcast" not in logical
    assert "xxhash64" in logical
    # and the line strings themselves never form the join key
    assert "LeftAnti" in logical and "__lh" in logical


def test_score_linear_closed_form(spark):
    """Linear-model inference: logit/sigmoid against hand-computed
    values, nulls read as 0, and the scoring projection adds no
    shuffle (no Exchange beyond the input's)."""
    import math

    from physioview_spark.llm import text as T
    df = spark.createDataFrame(
        [(0, 2.0, 1.0), (1, None, 4.0)], "doc_id long, a double, b double")
    out = {r["doc_id"]: r for r in T.score_linear(
        df, weights={"a": 0.5, "b": -0.25}, intercept=1.0).collect()}
    assert out[0]["model_logit"] == 1.75  # 1 + 0.5*2 - 0.25*1
    assert abs(out[0]["model_prob"]
               - round(1 / (1 + math.exp(-1.75)), 6)) < 1e-12
    assert out[1]["model_logit"] == 0.0   # null a -> 0; 1 - 0.25*4
    assert out[1]["model_prob"] == 0.5
    plan = T.score_linear(df, weights={"a": 1.0}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_char_entropy_known_values(spark):
    """Entropy against closed forms: uniform 4-char text = 2 bits,
    single-char flood = 0 bits, empty text = null."""
    from physioview_spark.llm import text as T
    rows = [(0, "abcd" * 16), (1, "a" * 40), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.char_entropy(df).collect()}
    assert abs(out[0]["entropy_bits"] - 2.0) < 1e-9
    assert out[0]["n_distinct_chars"] == 4 and out[0]["n_chars"] == 64
    assert out[1]["entropy_bits"] == 0.0
    assert out[2]["entropy_bits"] is None and out[2]["n_chars"] == 0
    # gibberish (wide alphabet) scores above natural-ish prose
    rows2 = [(0, "the cat sat on the mat and the dog sat too"),
             (1, "qZ3$kP9@xW1!mR7#vT5%bN2^cJ8&")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    o2 = {r["doc_id"]: r["entropy_bits"]
          for r in T.char_entropy(df2).collect()}
    assert o2[1] > o2[0]


def test_semantic_dedup_keep_first(spark, vectors):
    """SemDeDup: the engineered near-dup pair (3, 7) shares a nearest
    centroid, so the higher id is dropped and 3 is kept; every other
    vector survives; determinism under repartitioning."""
    cents_rows = (vectors.where(F.col("vec_id").isin(0, 5))
                  .orderBy("vec_id").select("embedding").collect())
    cents = [[float(x) for x in r["embedding"]] for r in cents_rows]
    out = similarity.semantic_dedup(
        vectors, cents, threshold=0.99).toPandas()
    kept = set(out["vec_id"])
    total = vectors.count()
    assert 7 not in kept and 3 in kept
    assert len(kept) == total - 1
    again = similarity.semantic_dedup(
        vectors.repartition(5), cents, threshold=0.99).toPandas()
    assert set(again["vec_id"]) == kept
    # quadratic guard: capping buckets below their size disables the
    # PAIR SEARCH only — every document (including those in skipped
    # buckets) must still be kept; the guard bounds work, not output
    full = similarity.semantic_dedup(
        vectors, cents, threshold=0.99, max_bucket_size=1).toPandas()
    assert set(full["vec_id"]) == set(
        r["vec_id"] for r in vectors.select("vec_id").collect())
    # the matmul scoring gear must decide identically to the JVM gear
    pd_out = similarity.semantic_dedup(
        vectors, cents, threshold=0.99, scoring="pandas").toPandas()
    assert set(pd_out["vec_id"]) == kept


def test_cosine_arrow_gear_parity(spark):
    """The Arrow cosine gear must produce the same rounded sims, null
    (not NaN-first) zero-norm semantics, and identical top-k rows as
    the expression gear."""
    rng = np.random.RandomState(9)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(40)]
    rows.append((40, [0.0] * 16))  # zero-norm vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.where("vec_id < 3")
    a = similarity.cosine_topk(qs, df, k=5, method="expr").collect()
    b = similarity.cosine_topk(qs, df, k=5, method="arrow").collect()
    key = lambda rs: sorted((r["query_id"], r["rank"], r["match_id"],
                             r["sim"]) for r in rs)
    assert key(a) == key(b)
    # zero-norm vector never ranks (null sim sorts last, rank > k)
    assert all(r["match_id"] != 40 for r in b)
    pa = similarity.embedding_near_dups(df, threshold=0.9,
                                        dim=16, method="expr").collect()
    pb = similarity.embedding_near_dups(df, threshold=0.9,
                                        dim=16, method="arrow").collect()
    assert sorted(map(tuple, pa)) == sorted(map(tuple, pb))


def test_lit_matrix_bit_identical_to_elementwise_lit(spark):
    """lit_matrix ships a codebook as ONE parsed SQL string (r18: the
    element-wise F.lit(list) recursion cost a py4j round-trip per
    element — 0.74 s of driver time per 16x64 codebook). The parsed
    literal must be BIT-identical to F.lit's element-wise build on
    adversarial doubles: repr() is the shortest round-tripping decimal
    and Double.parseDouble is correctly rounded, so this pins the
    whole contract, not a lucky subset."""
    adv = [
        [0.1, 1 / 3, 5e-324, 1.7976931348623157e308, -0.0,
         2.2250738585072014e-308, -1e-07, 123456789.123456789,
         1e16, -5.551115123125783e-17],
        [float(np.nextafter(0.95, 1.0)), -2.5, 1e-300, 3.0],
    ]
    for rows in (adv[:1], adv[1:], adv):
        elementwise = F.lit([[float(x) for x in r] for r in rows])
        parsed = similarity.lit_matrix(rows)
        got = spark.range(1).select(
            F.zip_with(
                # SQL '=' calls -0.0 equal to 0.0, so ALSO compare the
                # string renders — same JVM formatter both sides, so
                # equal strings <=> equal bits for non-NaN doubles
                F.flatten(elementwise), F.flatten(parsed),
                lambda a, b: a.eqNullSafe(b)
                & a.cast("string").eqNullSafe(b.cast("string")),
            ).alias("eq")).collect()[0]
        assert all(got["eq"]), rows


def test_semantic_dedup_delta_new_bucket_col_parity(spark):
    """Pre-bucketing the NEW side (new_bucket_col — the streaming
    processor's bucket-once path, r18) must produce decisions
    identical to the internal assignment on the same centroids,
    including NULL-bucket (non-finite) vectors."""
    rng = np.random.RandomState(7)
    cents = [[float(x) for x in rng.randn(8)] for _ in range(4)]
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(40)]
    vecs[5] = (5, list(vecs[3][1]))          # a batch dup
    vecs[9] = (9, None)                      # excluded vector
    new = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>")
    corpus = spark.createDataFrame(
        [(1000 + i, [float(x) for x in rng.randn(8)])
         for i in range(10)] + [(1100, list(vecs[7][1]))],
        "vec_id long, embedding array<double>")
    base = similarity.semantic_dedup_delta(
        new, corpus, cents, threshold=0.9).collect()
    pre = new.select(
        "vec_id", "embedding",
        similarity.assign_ivf_bucket(
            F.col("embedding"), cents).alias("bucket"))
    got = similarity.semantic_dedup_delta(
        pre, corpus, cents, threshold=0.9,
        new_bucket_col="bucket").collect()
    key = lambda r: r["vec_id"]
    assert sorted(got, key=key) == sorted(base, key=key)


def test_ivf_assignment_gears_agree(spark):
    """The Arrow-vectorized centroid-assignment gear (large codebooks)
    must bucket identically to the JVM expression gear on
    well-separated vectors, and 'auto' must pick expr for small
    codebooks (keeping oracle-pinned plans deterministic) and pandas
    past the k*dim threshold."""
    rng = np.random.RandomState(3)
    cents = (rng.randn(24, 64) * 10).astype(np.float64)
    vecs = [(i, [float(x) for x in cents[i % 24] + rng.randn(64) * 0.1])
            for i in range(120)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {}
    for method in ("expr", "pandas"):
        out = df.select(
            "vec_id",
            similarity.assign_ivf_bucket(
                F.col("embedding"), [list(c) for c in cents],
                method=method).alias("b")).collect()
        got[method] = {r["vec_id"]: r["b"] for r in out}
    assert got["expr"] == got["pandas"]
    assert all(got["expr"][i] == i % 24 for i in range(120))
    # auto thresholds: 8x64=512 -> expr (no Python eval in plan);
    # 24x64=1536 -> pandas (ArrowEvalPython appears)
    small = df.select(similarity.assign_ivf_bucket(
        F.col("embedding"), [list(c) for c in cents[:8]]).alias("b"))
    large = df.select(similarity.assign_ivf_bucket(
        F.col("embedding"), [list(c) for c in cents]).alias("b"))
    assert "ArrowEvalPython" not in \
        small._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in \
        large._jdf.queryExecution().executedPlan().toString()


def test_image_near_dups_exact_hamming_parity(spark):
    """The banded image near-dup path must return EXACTLY the pairs a
    brute-force Hamming scan over the perceptual hashes finds (100%
    recall from the pigeonhole chunks, 100% precision from the popcount
    verify) — including most of the planted perturbed variants, and
    nothing involving corrupt payloads."""
    from physioview_spark.llm import multimodal as M

    df = M.fake_image_near_dup_table(spark, n_base=48, n_dups=16)
    phs = {r["doc_id"]: r["phash"]
           for r in M.image_phash(df).collect() if r["valid"]}
    mask = (1 << 64) - 1
    want = {(a, b): bin((phs[a] ^ phs[b]) & mask).count("1")
            for a in phs for b in phs if a < b
            if bin((phs[a] ^ phs[b]) & mask).count("1") <= 6}
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in M.image_near_dups(df, max_hamming=6).collect()}
    assert got == want
    planted = [(j, 48 + j) for j in range(16) if j in phs and 48 + j in phs]
    found = [p for p in planted if p in got]
    assert len(found) >= len(planted) - 2, (planted, sorted(got))
    # corrupt payloads (truncated every 10th) never reach the pair set
    assert all(a % 10 != 9 and b % 10 != 9 for a, b in got
               if a < 48 and b < 48)


def test_hamming_blocks_gear_parity_and_guards(spark):
    """The generalized-pigeonhole scale gear (blocks=(b, q), Manku-style
    multi-block keys): every admissible (b, q) must return EXACTLY the
    brute-force pair set — the pigeonhole recall argument holds as long
    as q <= b - max_hamming — and inadmissible configurations must be
    rejected up front, not silently lose recall."""
    import pytest as _pt

    from physioview_spark.llm import multimodal as M
    from physioview_spark.llm.dedup import hamming_banded_pairs

    df = M.fake_image_near_dup_table(spark, n_base=48, n_dups=16)
    sig = M.image_phash(df).where("valid")
    phs = {r["doc_id"]: r["phash"] for r in sig.collect()}
    mask = (1 << 64) - 1
    want = {(a, b): bin((phs[a] ^ phs[b]) & mask).count("1")
            for a in phs for b in phs if a < b
            if bin((phs[a] ^ phs[b]) & mask).count("1") <= 6}

    def run(**kw):
        return {(r["id_a"], r["id_b"]): r["hamming"]
                for r in hamming_banded_pairs(
                    sig, "phash", bits=64, max_hamming=6, **kw).collect()}

    # default path == explicit single-chunk blocks == brute force
    assert run() == want
    assert run(blocks=(7, 1)) == want
    # longer keys (the scale point): C(8,2)=28 and C(10,3)=120 tables
    assert run(blocks=(8, 2)) == want
    assert run(blocks=(10, 3)) == want
    # image_near_dups surfaces the gear end-to-end
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in M.image_near_dups(df, max_hamming=6,
                                      blocks=(8, 2)).collect()}
    assert got == want

    # recall-breaking q, oversized key, and table explosion all raise
    with _pt.raises(ValueError, match="recall"):
        run(blocks=(8, 3))  # q > b - max_hamming
    with _pt.raises(ValueError, match="overflows"):
        hamming_banded_pairs(sig, "phash", bits=64, max_hamming=0,
                             blocks=(1, 1)).collect()  # 64-bit key
    with _pt.raises(ValueError, match="explosion"):
        run(blocks=(20, 7))  # C(20,7) = 77520 tables
    with _pt.raises(ValueError, match="exceeds signature bits"):
        hamming_banded_pairs(sig, "phash", bits=64, max_hamming=6,
                             blocks=(100, 1)).collect()


def test_hamming_blocks_auto_gear(spark):
    """blocks='auto' (VERDICT r12 item 3): the measured ~160k crossover
    is applied FOR the caller — single-chunk plan below it (bit-for-bit
    the oracle-pinned default), a grown admissible (b, q) key above it,
    pair set identical on both sides of the switch (the probe_ivf_buckets
    auto-gear contract)."""
    import pytest as _pt

    from physioview_spark.llm import multimodal as M
    from physioview_spark.llm.dedup import auto_blocks, hamming_banded_pairs

    # --- selection: below/above the documented crossovers ---
    assert auto_blocks(72_000, bits=64, max_hamming=6) is None
    assert auto_blocks(300_000, bits=64, max_hamming=6) == (8, 2)
    assert auto_blocks(10_000, bits=32, max_hamming=3) is None
    assert auto_blocks(500_000, bits=32, max_hamming=3) is not None
    assert auto_blocks(0, bits=64, max_hamming=6) is None
    # every selected gear is admissible, keys grow with n (the
    # log2 N index-growth contract), never shrink
    from math import comb
    prev_key = 0
    for n in (10**4, 10**5, 10**6, 10**7, 10**8):
        for bits, mh in ((64, 6), (32, 3)):
            g = auto_blocks(n, bits=bits, max_hamming=mh)
            if g is not None:
                b, q = g
                assert 1 <= q <= b - mh
                assert q * (bits // b) <= 62
                assert comb(b, q) <= 256
        g64 = auto_blocks(n, bits=64, max_hamming=6)
        key = 0 if g64 is None else g64[1] * (64 // g64[0])
        assert key >= prev_key or g64 is None
        if g64 is not None:
            prev_key = key

    # --- end-to-end parity on both sides of the switch ---
    df = M.fake_image_near_dup_table(spark, n_base=48, n_dups=16)
    sig = M.image_phash(df).where("valid")

    def run(**kw):
        return {(r["id_a"], r["id_b"]): r["hamming"]
                for r in hamming_banded_pairs(
                    sig, "phash", bits=64, max_hamming=6, **kw).collect()}

    want = run()  # the oracle-pinned default gear
    # below crossover: auto resolves to the default SINGLE-CHUNK plan —
    # not just the same rows, the same optimized plan
    below = hamming_banded_pairs(sig, "phash", bits=64, max_hamming=6,
                                 blocks="auto", approx_count=1000)
    default = hamming_banded_pairs(sig, "phash", bits=64, max_hamming=6)
    import re as _re

    def norm(d):  # expression IDs differ between instantiations
        return _re.sub(r"#\d+", "#",
                       d._jdf.queryExecution().optimizedPlan().toString())

    assert norm(below) == norm(default)
    # above crossover (forced via approx_count): gear plan, equal pairs
    assert run(blocks="auto", approx_count=300_000) == want
    # auto without approx_count runs one count job, then picks
    # single-chunk for this 64-row fixture
    assert run(blocks="auto") == want
    # the wrapper entry points pass the gear + count estimate through
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in M.image_near_dups(df, max_hamming=6, blocks="auto",
                                      approx_count=300_000).collect()}
    assert got == want

    with _pt.raises(ValueError, match="auto"):
        run(blocks="automatic")


def test_dct_phash_gear(spark):
    """pHash-style DCT gear: exact parity with brute-force Hamming on
    the fixture (same engine contract as the avg gear), invariance to
    global brightness/contrast, balanced bits (~half set by the median
    threshold), and planted variants still caught."""
    from physioview_spark.llm import multimodal as M

    # invariance: y = 0.6*x + 30 leaves every DCT bit unchanged
    base = M.encode_ppm(21, 16, 16, gray=True)
    dec = M._decode(base)
    lum = M._luma(dec[0], dec[1], dec[2], dec[3])
    h0 = M._dct_hash(lum)
    h1 = M._dct_hash(np.clip(0.6 * lum + 30, 0, 255))
    assert h0 == h1
    bits = bin(h0 & ((1 << 64) - 1)).count("1")
    assert 28 <= bits <= 34  # median threshold -> balanced

    df = M.fake_image_near_dup_table(spark, n_base=48, n_dups=16)
    phs = {r["doc_id"]: r["phash"]
           for r in M.image_phash(df, method="dct").collect()
           if r["valid"]}
    mask = (1 << 64) - 1
    want = {(a, b) for a in phs for b in phs if a < b
            if bin((phs[a] ^ phs[b]) & mask).count("1") <= 10}
    got = {(r["id_a"], r["id_b"]) for r in
           M.image_near_dups(df, max_hamming=10, method="dct").collect()}
    assert got == want
    planted = [(j, 48 + j) for j in range(16)
               if j in phs and 48 + j in phs]
    assert sum(p in got for p in planted) >= len(planted) - 3


def test_cluster_decisions_full_universe(spark):
    """cluster_decisions must cover EVERY id: pair members get their
    component's min-id keeper; untouched ids are singleton keepers;
    dropping non-keepers removes exactly the near-dup surplus."""
    from physioview_spark.llm import dedup
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (7, 8)], "id_a long, id_b long")
    universe = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long")
    out = {r["doc_id"]: r for r in
           dedup.cluster_decisions(pairs, universe).collect()}
    assert len(out) == 10
    assert [out[i]["cluster_id"] for i in (1, 2, 5)] == [1, 1, 1]
    assert [out[i]["cluster_id"] for i in (7, 8)] == [7, 7]
    assert out[1]["is_keeper"] and not out[2]["is_keeper"]
    assert out[1]["cluster_size"] == 3 and out[7]["cluster_size"] == 2
    for i in (0, 3, 4, 6, 9):  # untouched -> singleton keepers
        assert out[i]["is_keeper"] and out[i]["cluster_size"] == 1
    kept = [i for i in out if out[i]["is_keeper"]]
    assert sorted(kept) == [0, 1, 3, 4, 6, 7, 9]


def test_image_phash_validity_and_stability(spark):
    """Sub-grid images hash to null/invalid; identical payloads hash
    identically; a perturbed payload stays within a small Hamming
    distance of its source."""
    from physioview_spark.llm import multimodal as M

    tiny = M.encode_fake_image(1, width=4, height=4)   # below 8x8 grid
    base = M.encode_ppm(7, 16, 8)
    near = M.perturb_payload(base, n_tweaks=3, seed=99)
    df = spark.createDataFrame(
        [(0, bytearray(tiny)), (1, bytearray(base)), (2, bytearray(base)),
         (3, bytearray(near))],
        "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in M.image_phash(df).collect()}
    assert not out[0]["valid"] and out[0]["phash"] is None
    assert out[1]["valid"] and out[1]["phash"] == out[2]["phash"]
    d = bin((out[1]["phash"] ^ out[3]["phash"]) & ((1 << 64) - 1))
    assert d.count("1") <= 6


def test_audio_near_dups_exact_hamming_parity(spark):
    """Audio near-dup pairs (banded energy-delta fingerprints) must
    equal the brute-force Hamming scan — and catch the planted
    transcoded/gain-shifted/noised copies, which a byte-level exact
    dedup can never match (different container, different samples)."""
    from physioview_spark.llm import multimodal as M

    df = M.fake_audio_near_dup_table(spark, n_base=32, n_dups=12)
    fps = {r["doc_id"]: r["afp"]
           for r in M.audio_fingerprint(df).collect() if r["valid"]}
    mask = (1 << 64) - 1
    want = {(a, b) for a in fps for b in fps if a < b
            if bin((fps[a] ^ fps[b]) & mask).count("1") <= 6}
    got = {(r["id_a"], r["id_b"])
           for r in M.audio_near_dups(df, max_hamming=6).collect()}
    assert got == want
    planted = [(j, 32 + j) for j in range(12)
               if j in fps and 32 + j in fps]
    assert len(planted) >= 10
    assert sum(p in got for p in planted) >= len(planted) - 2
    # md5-exact dedup finds NONE of them (the payload bytes differ)
    import hashlib
    rows = {r["doc_id"]: bytes(r["payload"])
            for r in df.select("doc_id", "payload").collect()}
    assert all(hashlib.md5(rows[a]).hexdigest()
               != hashlib.md5(rows[b]).hexdigest() for a, b in planted)


def test_audio_fingerprint_gain_invariant(spark):
    """Pure gain change must not move a single fingerprint bit; too-short
    clips are invalid."""
    from physioview_spark.llm import multimodal as M

    base = M.encode_wav(5, seconds=1.0)
    gained = M.perturb_audio(base, gain=0.3, noise=0.0, seed=1)
    df = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(gained)),
         (2, bytearray(M.encode_wav(6, seconds=0.005)))],
        "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in M.audio_fingerprint(df).collect()}
    assert out[0]["valid"] and out[0]["afp"] == out[1]["afp"]
    assert not out[2]["valid"]  # 40 samples < 65 frames


def test_video_near_dups_exact_hamming_parity(spark):
    """Video near-dup pairs (majority-vote frame phash signatures) must
    equal brute-force Hamming at the bound, catching noised re-encodes
    AND first-frame trims (which flip knife-edge majority bits — hence
    the wider bound of 12); corrupt clips never pair."""
    from physioview_spark.llm import multimodal as M

    df = M.fake_video_near_dup_table(spark, n_base=16, n_dups=8)
    fps = {r["doc_id"]: r["vfp"]
           for r in M.video_phash(df).collect() if r["valid"]}
    mask = (1 << 64) - 1
    want = {(a, b) for a in fps for b in fps if a < b
            if bin((fps[a] ^ fps[b]) & mask).count("1") <= 12}
    got = {(r["id_a"], r["id_b"])
           for r in M.video_near_dups(df, max_hamming=12).collect()}
    assert got == want
    planted = [(j, 16 + j) for j in range(8)
               if j in fps and 16 + j in fps]
    assert len(planted) >= 6
    assert sum(p in got for p in planted) >= len(planted) - 1
    # transcode alone (PVVD -> Y4M, same luma) is Hamming 0
    clean = M.perturb_video(
        M.encode_fake_video(3, n_frames=24, width=16, height=16),
        noise=0, seed=0)
    df2 = spark.createDataFrame(
        [(0, bytearray(M.encode_fake_video(3, n_frames=24, width=16,
                                           height=16))),
         (1, bytearray(clean))], "doc_id long, payload binary")
    out = {r["doc_id"]: r["vfp"] for r in M.video_phash(df2).collect()}
    assert out[0] == out[1]


def test_embedding_near_dups_multiband_recall(spark):
    """OR-of-bands recall: >=0.95 of the brute-force near-dup pairs must
    survive the banded candidate join (single-band at these plane counts
    demonstrably loses pairs; multi-band recovers them)."""
    rng = np.random.RandomState(11)
    base = rng.randn(60, 16).astype(np.float32)
    # plant 12 near-dup pairs of varying closeness (cos ~0.9..0.999)
    for j in range(12):
        noise = (0.05 + 0.03 * j / 12) * rng.randn(16).astype(np.float32)
        base[40 + j] = base[j] + noise
    rows = [(i, [float(v) for v in base[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    norm = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = norm @ norm.T
    want = {(i, j) for i in range(60) for j in range(i + 1, 60)
            if round(float(sims[i, j]), 6) >= 0.9}
    assert len(want) >= 10  # the planted pairs are in play

    got = {(r["id_a"], r["id_b"])
           for r in similarity.embedding_near_dups(
               df, threshold=0.9, n_planes=4, dim=16, n_bands=6).collect()}
    recall = len(want & got) / len(want)
    assert recall >= 0.95, f"recall {recall}: {want - got}"
    assert got <= want  # exact re-rank: no false positives


def test_multimodal_decode_plumbing(spark):
    from physioview_spark.llm.multimodal import (
        _decode, encode_fake_image, extract_image_features, fake_image_table,
    )

    imgs = fake_image_table(spark, n=30, corrupt_every=10)
    feats = {r["doc_id"]: r for r in extract_image_features(imgs).collect()}
    assert len(feats) == 30
    bad = [i for i, r in feats.items() if not r["valid"]]
    assert bad == [9, 19, 29]
    # features match a direct numpy computation of the same payload
    img, w, h, c = _decode(encode_fake_image(4, width=8 + (4 % 5) * 4, height=8))
    assert feats[4]["width"] == w and feats[4]["valid"]
    assert abs(feats[4]["mean_intensity"] - round(float(img.mean()), 4)) < 1e-9


class TestRealCodecs:
    def test_ppm_p6_and_p5_roundtrip(self):
        from physioview_spark.llm.multimodal import _decode, encode_ppm

        img, w, h, c = _decode(encode_ppm(7, width=12, height=5))
        assert (w, h, c) == (12, 5, 3) and img.shape == (5, 36)
        img, w, h, c = _decode(encode_ppm(7, width=12, height=5, gray=True))
        assert (w, h, c) == (12, 5, 1) and img.shape == (5, 12)

    def test_pnm_header_grammar_and_corruption(self):
        from physioview_spark.llm.multimodal import _decode

        # comments + arbitrary whitespace in the header are legal
        raster = bytes(range(6))
        assert _decode(b"P5 # c\n # c2\n 3\t2\n255\n" + raster) is not None
        # short raster, 16-bit maxval, zero dims, bad token -> None
        assert _decode(b"P5\n3 2\n255\n" + raster[:-1]) is None
        assert _decode(b"P5\n3 2\n65535\n" + raster * 2) is None
        assert _decode(b"P5\n0 2\n255\n") is None
        assert _decode(b"P5\n3 x\n255\n" + raster) is None

    def test_wav_roundtrip_matches_pvau(self):
        """The same synthetic waveform through the REAL RIFF/WAVE
        container and the PVAU fixture must decode identically."""
        from physioview_spark.llm.multimodal import (
            _decode_audio, encode_fake_audio, encode_wav,
        )

        w_wav, r_wav = _decode_audio(encode_wav(5, seconds=0.25))
        w_pv, r_pv = _decode_audio(encode_fake_audio(5, seconds=0.25))
        assert r_wav == r_pv == 8000
        np.testing.assert_allclose(w_wav, w_pv)

    def test_wav_stereo_averages_to_mono(self):
        from physioview_spark.llm.multimodal import _decode_audio, encode_wav

        mono, _ = _decode_audio(encode_wav(5, seconds=0.25))
        stereo, rate = _decode_audio(
            encode_wav(5, seconds=0.25, channels=2))
        assert rate == 8000 and len(stereo) == len(mono)
        np.testing.assert_allclose(stereo, mono)

    def test_y4m_roundtrip_matches_pvvd(self):
        """Same deterministic luma through the REAL YUV4MPEG2 container
        and the PVVD fixture decodes to identical frames and fps."""
        from physioview_spark.llm.multimodal import (
            _parse_video, encode_fake_video, encode_y4m,
        )

        fy, fpsy = _parse_video(encode_y4m(3, n_frames=6))
        fp, fpsp = _parse_video(encode_fake_video(3, n_frames=6))
        assert fpsy == fpsp == 12.0
        np.testing.assert_array_equal(fy, fp)

    def test_y4m_corruption_paths(self):
        from physioview_spark.llm.multimodal import _parse_video, encode_y4m

        good = encode_y4m(3, n_frames=4)
        assert _parse_video(good) is not None
        assert _parse_video(good[: len(good) // 2]) is None  # mid-frame
        assert _parse_video(b"YUV4MPEG2 W0 H8 F12:1\n") is None
        assert _parse_video(b"YUV4MPEG2 W8 H8 F12:0\nFRAME\n") is None
        assert _parse_video(good.replace(b"FRAME", b"FRAMX", 1)) is None

    def test_wav_corrupt_header_is_invalid_row(self, spark):
        from physioview_spark.llm.multimodal import (
            encode_wav, extract_audio_features,
        )

        rows = [(0, bytearray(encode_wav(0, seconds=0.25))),
                (1, bytearray(encode_wav(1, seconds=0.25)[:20]))]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in
               extract_audio_features(df).collect()}
        assert out[0]["valid"] and out[0]["duration_s"] == 0.25
        assert not out[1]["valid"] and out[1]["sample_rate"] is None


class TestMultimodalAudioVideo:
    def test_audio_features_and_corruption(self, spark):
        from physioview_spark.llm.multimodal import (
            encode_fake_audio, extract_audio_features,
        )

        rows = []
        for i in range(12):
            p = encode_fake_audio(i, sample_rate=8000, seconds=0.5)
            if i % 5 == 4:
                p = p[:7]  # truncated header -> invalid
            rows.append((i, bytearray(p)))
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = extract_audio_features(df).orderBy("doc_id").toPandas()
        assert len(out) == 12
        ok = out[out["valid"]]
        assert len(ok) == 10
        assert (ok["duration_s"] == 0.5).all()
        assert (ok["rms_loudness"] > 0.1).all()
        assert (~out.loc[~out["valid"], "sample_rate"].notna()).all()

    def test_video_frame_sampling_one_to_many(self, spark):
        from physioview_spark.llm.multimodal import (
            encode_fake_video, sample_video_frames,
        )

        rows = [(i, bytearray(encode_fake_video(i, n_frames=24, fps=12.0)))
                for i in range(3)]
        rows.append((99, bytearray(b"nonsense")))
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = sample_video_frames(df, every_k=4).toPandas()
        # 24 frames / every 4 = 6 sampled frames per valid doc
        assert len(out) == 18
        per_doc = out.groupby("doc_id").size()
        assert set(per_doc.index) == {0, 1, 2}
        assert (per_doc == 6).all()
        first = out[out["frame_idx"] == 0]
        assert first["motion"].isna().all()
        later = out[out["frame_idx"] > 0]
        assert later["motion"].notna().all()
        # ts = frame/fps
        row = out[(out.doc_id == 0) & (out.frame_idx == 8)].iloc[0]
        assert abs(row["ts_s"] - 8 / 12.0) < 1e-6  # operator rounds to 6dp


class TestIvfAnn:
    def test_ivf_recall_vs_exact(self, spark, sf_dir):
        from physioview_spark.llm.similarity import (
            cosine_topk, ivf_topk, train_ivf_centroids,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cols = emb.columns
        id_col = "vec_id" if "vec_id" in cols else cols[0]
        vec_col = next(c for c, t in emb.dtypes if t.startswith("array"))
        corpus = emb.select(id_col, vec_col)
        queries = corpus.limit(8)

        centroids = train_ivf_centroids(
            corpus, n_centroids=8, vec_col=vec_col)
        assert len(centroids) == 8

        exact = cosine_topk(queries, corpus, k=5, q_id=id_col,
                            c_id=id_col, vec_col=vec_col).toPandas()
        approx = ivf_topk(queries, corpus, centroids, k=5, n_probe=4,
                          q_id=id_col, c_id=id_col,
                          vec_col=vec_col).toPandas()

        # per-query recall@5 of the IVF result against the exact top-5
        recalls = []
        for qid, grp in exact.groupby("query_id"):
            truth = set(grp["match_id"])
            got = set(approx[approx["query_id"] == qid]["match_id"])
            recalls.append(len(truth & got) / len(truth))
        assert np.mean(recalls) >= 0.5, recalls
        # every approx hit must carry the correct exact cosine
        merged = approx.merge(
            exact, on=["query_id", "match_id"], suffixes=("_a", "_e"))
        np.testing.assert_allclose(merged["sim_a"], merged["sim_e"])

    def test_bucket_assignment_total(self, spark, sf_dir):
        from physioview_spark.llm.similarity import (
            assign_ivf_bucket, train_ivf_centroids,
        )
        from pyspark.sql import functions as F

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        vec_col = next(c for c, t in emb.dtypes if t.startswith("array"))
        cents = train_ivf_centroids(emb, n_centroids=4, vec_col=vec_col)
        got = emb.withColumn(
            "b", assign_ivf_bucket(F.col(vec_col), cents))
        stats = got.groupBy("b").count().collect()
        assert {r["b"] for r in stats} <= {0, 1, 2, 3}
        assert sum(r["count"] for r in stats) == emb.count()


class TestTextExtensions:
    def test_bpe_token_count_known_values(self, spark):
        from physioview_spark.llm.text import bpe_token_count

        rows = [
            (0, "hello world"),          # 2 words: ceil(5/4)+ceil(5/4)=4
            (1, "internationalization"), # ceil(20/4) = 5
            (2, "a b, 12345!"),          # 1+1 + 1(,) + 1(num) + 1(!) = 5
            (3, ""),                     # 0
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["n_bpe_tokens"]
               for r in bpe_token_count(df).collect()}
        assert got == {0: 4, 1: 5, 2: 5, 3: 0}

    def test_winnow_fingerprints_share_substrings(self, spark):
        from physioview_spark.llm.text import winnow_fingerprints

        shared = "the common stretch of text that both documents contain"
        rows = [
            (0, f"prefix alpha {shared} suffix one"),
            (1, f"other beginning {shared} different tail"),
            (2, "wholly unrelated payload carrying zero matching spans qq"),
            (3, "tiny"),   # shorter than k=8 -> no fingerprints
            (4, "ninechars"),  # 9 chars -> 2 grams < window -> 1 fp
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        fp = winnow_fingerprints(df, k=8, window=4).toPandas()
        by_doc = {d: set(g["fp"]) for d, g in fp.groupby("doc_id")}
        assert 3 not in by_doc
        assert len(by_doc[4]) == 1
        # docs sharing a long substring share fingerprints
        assert len(by_doc[0] & by_doc[1]) >= 3
        assert len(by_doc[0] & by_doc[2]) == 0


class TestDupClusters:
    def test_connected_components_path_and_clique(self, spark):
        # component A: path 1-2-3-4 (needs >1 propagation round for the
        # min label to reach the far end); component B: clique {10,11,12};
        # component C: pair {20, 21}
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4),
             (10, 11), (10, 12), (11, 12),
             (20, 21)],
            "id_a long, id_b long",
        )
        cc = {r["node"]: r["cluster_id"]
              for r in dedup.connected_components(pairs).collect()}
        assert cc == {1: 1, 2: 1, 3: 1, 4: 1,
                      10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def test_connected_components_gears_agree(self, spark, monkeypatch):
        # r18 local union-find gear: PHYSIOVIEW_CC_LOCAL_MAX_EDGES
        # bounds the driver collect; 0 forces the distributed
        # propagation loop. Both gears must produce identical labels —
        # including on a path graph (multi-round propagation) and on
        # duplicate/reversed edges (the local gear skips the
        # symmetrize+distinct the distributed path relies on).
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),   # 6-path
             (2, 1), (1, 2),                           # dup + reversed
             (10, 11), (12, 11),                       # reversed star
             (20, 21)],
            "id_a long, id_b long",
        )
        local = {(r["node"], r["cluster_id"])
                 for r in dedup.connected_components(pairs).collect()}
        monkeypatch.setenv("PHYSIOVIEW_CC_LOCAL_MAX_EDGES", "0")
        dist = {(r["node"], r["cluster_id"])
                for r in dedup.connected_components(pairs).collect()}
        assert local == dist
        assert local == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (6, 1),
                         (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)}

    def test_dup_clusters_transitive_keeper(self, spark, docs):
        out = dedup.dup_clusters(docs).toPandas()
        # every cluster has exactly one keeper, and it is the min id
        for cid, g in out.groupby("cluster_id"):
            assert g["is_keeper"].sum() == 1
            assert g.loc[g["is_keeper"], "doc_id"].iloc[0] == g["doc_id"].min()
            assert (g["cluster_size"] == len(g)).all()
        # cluster ids are closed: every cluster_id is a member doc_id
        assert set(out["cluster_id"]) <= set(out["doc_id"])
        # members of one cluster are mutually reachable through LSH pairs
        pairs = dedup.minhash_lsh_candidates(docs).toPandas()
        edges = set(map(tuple, pairs.values)) | set(
            map(tuple, pairs[["id_b", "id_a"]].values))
        nodes_in_pairs = {n for e in edges for n in e}
        assert set(out["doc_id"]) == nodes_in_pairs

    def test_star_edges_same_components_as_all_pairs(self, spark, docs):
        star = dedup.lsh_star_edges(docs)
        allp = dedup.minhash_lsh_candidates(docs)
        cc_star = {(r["node"], r["cluster_id"])
                   for r in dedup.connected_components(star).collect()}
        cc_all = {(r["node"], r["cluster_id"])
                  for r in dedup.connected_components(allp).collect()}
        assert cc_star == cc_all
        # star never exceeds all-pairs edge count
        assert star.count() <= allp.count()

    def test_max_bucket_size_caps_blowup(self, spark):
        # 6 identical docs -> one bucket of 6 -> 15 pairs uncapped, 0 capped
        rows = [(i, "same text repeated for every single document here")
                for i in range(6)] + [(10, "an unrelated document entirely")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert dedup.minhash_lsh_candidates(df).count() == 15
        assert dedup.minhash_lsh_candidates(df, max_bucket_size=5).count() == 0


class TestStratifiedSample:
    def test_quota_and_determinism(self, spark):
        from physioview_spark.llm import sampling
        rows = [(i, "en" if i % 3 else "de") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = sampling.stratified_sample(df, ["lang"], quota=10)
        pdf = out.toPandas()
        assert (pdf.groupby("lang").size() == 10).all()
        assert set(pdf.groupby("lang")["sample_rank"].max()) == {10}
        # deterministic across partitionings
        again = sampling.stratified_sample(
            df.repartition(13), ["lang"], quota=10).toPandas()
        a = set(map(tuple, pdf[["doc_id", "sample_rank"]].values))
        b = set(map(tuple, again[["doc_id", "sample_rank"]].values))
        assert a == b

    def test_dict_quotas_mixing_weights(self, spark):
        from physioview_spark.llm import sampling
        rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(90)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = sampling.stratified_sample(
            df, ["lang"], quota={("en",): 5, ("de",): 2})
        counts = dict(
            out.groupBy("lang").count().rdd.map(tuple).collect())
        # per-stratum quotas honored; unlisted stratum (fr) dropped
        assert counts == {"en": 5, "de": 2}

    def test_small_stratum_underfills(self, spark):
        from physioview_spark.llm import sampling
        df = spark.createDataFrame(
            [(1, "en"), (2, "en"), (3, "de")], "doc_id long, lang string")
        out = sampling.stratified_sample(df, ["lang"], quota=10).toPandas()
        assert len(out) == 3  # every row kept when stratum < quota


class TestCurationOps:
    def test_repetition_stats_golden(self, spark):
        rows = [
            (0, "a b a b a b"),          # 2-grams: ab,ba,ab,ba,ab -> top 3/5
            (1, "w x y z q r"),          # all 2-grams unique -> top 1/5
            (2, "hi"),                   # short: one whole-text gram
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in text.repetition_stats(df).collect()}
        assert out[0]["top_2gram_frac"] == pytest.approx(3 / 5)
        # 3-grams of doc 0: aba,bab,aba,bab -> 4 total, 2 distinct -> 0.5
        assert out[0]["dup_3gram_frac"] == pytest.approx(0.5)
        assert out[1]["top_2gram_frac"] == pytest.approx(1 / 5)
        assert out[1]["dup_3gram_frac"] == 0.0
        assert out[2]["top_2gram_frac"] == 1.0

    def test_token_chunks_shapes(self, spark):
        toks = " ".join(f"t{i}" for i in range(80))
        df = spark.createDataFrame(
            [(0, toks), (1, "just three tokens")], "doc_id long, text string")
        out = text.token_chunks(df, chunk_size=32, stride=24).toPandas()
        d0 = out[out.doc_id == 0].sort_values("chunk_id")
        # 80 tokens, size 32, stride 24 -> ceil((80-32)/24)+1 = 3 chunks
        assert list(d0["chunk_id"]) == [0, 1, 2]
        assert list(d0["chunk_tokens"]) == [32, 32, 32]  # 48+32 = 80 exactly
        assert d0.iloc[1]["chunk_text"].split()[0] == "t24"  # overlap of 8
        # every token of the doc appears in some chunk
        covered = set(w for t in d0["chunk_text"] for w in t.split())
        assert covered == set(toks.split())
        d1 = out[out.doc_id == 1]
        assert len(d1) == 1 and d1.iloc[0]["chunk_tokens"] == 3

    def test_pii_scrub_redacts(self, spark):
        df = spark.createDataFrame(
            [(0, "mail bob@example.com or call 555-123-4567 from 10.0.0.1"),
             (1, "no pii here at all")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in text.pii_scrub(df).collect()}
        assert (out[0]["n_emails"], out[0]["n_phones"], out[0]["n_ips"]) == (1, 1, 1)
        assert out[0]["text_scrubbed"] == "mail <EMAIL> or call <PHONE> from <IP>"
        assert out[1]["text_scrubbed"] == "no pii here at all"

    def test_decontaminate_flags_overlap(self, spark):
        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string")
        train = spark.createDataFrame(
            [(0, "he saw the quick brown fox jumps over a fence today"),
             (1, "completely unrelated words about spark and parquet files")],
            "doc_id long, text string")
        out = dedup.decontaminate(train, bench, k=3, min_hits=3).collect()
        assert len(out) == 1
        r = out[0]
        # shared 3-shingles: "the quick brown","quick brown fox",
        # "brown fox jumps","fox jumps over" -> 4
        assert r["doc_id"] == 0 and r["max_overlap"] == 4 and r["n_bench_docs"] == 1

    def test_decontaminate_bloom_prefilter_parity(self, spark, docs):
        """The Bloom probe only prunes rows the exact broadcast join
        would reject anyway, so the flagged set and every count must be
        bit-identical with the prefilter on."""
        bench = docs.where(F.col("doc_id") == 0)
        train = docs.where(F.col("doc_id") != 0)
        plain = sorted(map(tuple, dedup.decontaminate(
            train, bench, k=3, min_hits=2).collect()))
        blm = sorted(map(tuple, dedup.decontaminate(
            train, bench, k=3, min_hits=2,
            bloom_prefilter=True).collect()))
        # docs 1 and 3 share the fox-dog-river shingle run with doc 0
        assert plain == blm and {t[0] for t in plain} == {1, 3}


class TestEpochShards:
    def _df(self, spark, n=500):
        return spark.range(n).select(F.col("id").alias("doc_id"))

    def test_coverage_balance_and_positions(self, spark):
        from physioview_spark.llm import sampling
        out = sampling.epoch_shards(self._df(spark), 8).collect()
        assert len(out) == 500
        by_shard: dict[int, list[int]] = {}
        for r in out:
            assert 0 <= r.shard < 8
            by_shard.setdefault(r.shard, []).append(r.shard_pos)
        # positions are 1..len dense per shard
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), shard
        # multinomial balance: 500 rows over 8 shards, expect ~62 each;
        # 5 sigma ~ +-39
        sizes = [len(ps) for ps in by_shard.values()]
        assert len(by_shard) == 8 and max(sizes) - min(sizes) < 80

    def test_deterministic_and_epoch_varies(self, spark):
        from physioview_spark.llm import sampling
        df = self._df(spark, 200)
        a = sorted(map(tuple, sampling.epoch_shards(df, 4, epoch=1).collect()))
        b = sorted(map(tuple, sampling.epoch_shards(df, 4, epoch=1).collect()))
        assert a == b  # pure function of (seed, epoch, id)
        c = sorted(map(tuple, sampling.epoch_shards(df, 4, epoch=2).collect()))
        assert a != c  # epochs genuinely reshuffle
        # python-side oracle for the shard assignment (engine-independent)
        import hashlib
        r0 = next(r for r in a if r[0] == 0)
        h = hashlib.md5(b"42|1|0").hexdigest()
        assert r0[1] == int(h[:15], 16) % 4

    def test_single_shuffle_plan(self, spark):
        from physioview_spark.llm import sampling
        plan = sampling.epoch_shards(self._df(spark), 16) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1  # only the window exchange

    def test_validation(self, spark):
        from physioview_spark.llm import sampling
        with pytest.raises(ValueError):
            sampling.epoch_shards(self._df(spark), 0)


class TestPackSequences:
    def test_contiguous_offsets_and_determinism(self, spark):
        from physioview_spark.llm import sampling
        rows = [(i, " ".join(["w"] * (5 + i % 7))) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = sampling.pack_sequences(df, ctx_len=16, n_shards=4).toPandas()
        assert len(out) == 60
        # within each shard, offsets are contiguous head-to-tail
        for _, g in out.groupby("shard"):
            g = g.sort_values("start_offset")
            expect = 0
            for _, r in g.iterrows():
                assert r["start_offset"] == expect
                assert r["seq_id"] == expect // 16
                expect += r["n_tokens"]
        # independent of input partitioning
        again = sampling.pack_sequences(
            df.repartition(7), ctx_len=16, n_shards=4).toPandas()
        key = lambda p: sorted(map(tuple, p.values))
        assert key(out) == key(again)

    def test_token_budget_exact_semantics(self, spark):
        """Exact mode: docs taken in hash order until the stratum's
        cumulative tokens cross the budget; the crossing doc is included,
        nothing after it."""
        from physioview_spark.llm import sampling
        rows = [(i, "en" if i % 2 == 0 else "de",
                 " ".join(["w"] * 10)) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, "
                                         "text string")
        out = sampling.token_budget_sample(
            df, ["lang"], budget_tokens=55).toPandas()
        # 10 tokens/doc, budget 55 -> 6 docs per stratum (tokens_before
        # of the 6th is 50 < 55; the 7th would be 60)
        per = out.groupby("lang").size()
        assert (per == 6).all()
        assert out["tokens_before"].max() == 50
        # deterministic under repartitioning
        again = sampling.token_budget_sample(
            df.repartition(7), ["lang"], budget_tokens=55).toPandas()
        key = lambda p: sorted(map(tuple, p.values))
        assert key(out) == key(again)

    def test_token_budget_exact_two_level_blocks(self, spark):
        """The exact mode's prefix scan is two-level: the heavy window
        partitions on (stratum, hash-prefix block), so a single stratum
        never runs as one task. The block split must not change the
        result: any n_blocks (including 1, the degenerate single-window
        case) yields identical rows, deterministically under
        repartitioning — the blocks are order-CONTIGUOUS slices of the
        hash order, so offsets merge exactly."""
        from physioview_spark.llm import sampling
        # ONE stratum, variable doc lengths: the worst case for the old
        # single-window plan and for block-boundary offset mistakes
        rows = [(i, "en", " ".join(["w"] * (5 + i % 13)))
                for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, "
                                         "text string")
        key = lambda p: sorted(map(tuple, p.values))
        ref = sampling.token_budget_sample(
            df, ["lang"], budget_tokens=700, n_blocks=1).toPandas()
        out = sampling.token_budget_sample(
            df, ["lang"], budget_tokens=700, n_blocks=16)
        assert key(out.toPandas()) == key(ref)
        assert key(sampling.token_budget_sample(
            df.repartition(7), ["lang"], budget_tokens=700,
            n_blocks=16).toPandas()) == key(ref)
        # the single stratum genuinely splits into many window tasks
        from pyspark.sql import functions as F2
        blocked = sampling.token_budget_sample(
            df, ["lang"], budget_tokens=10**9, n_blocks=16)
        plan = blocked._jdf.queryExecution().executedPlan().toString()
        assert "__blk" in plan  # heavy window keys on (stratum, block)
        n_used = (sampling.token_budget_sample(
            df, ["lang"], budget_tokens=10**9, n_blocks=16)
            .select(F2.col("tokens_before")).count())
        assert n_used == 300  # budget >= corpus keeps everything

    def test_token_budget_rate_mode_bound(self, spark):
        """Rate mode: stateless hash-threshold keep, expected tokens per
        stratum near the budget — no window, no per-stratum serial scan."""
        from physioview_spark.llm import sampling
        rows = [(i, "en", " ".join(["w"] * 10)) for i in range(600)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, "
                                         "text string")
        out = sampling.token_budget_sample(
            df, ["lang"], budget_tokens=2000, mode="rate").toPandas()
        got = out["n_tokens"].sum()
        assert 1000 <= got <= 3200, got  # expected 2000 of 6000 corpus
        # over-budget strata only: a rate of 1 keeps everything
        all_in = sampling.token_budget_sample(
            df, ["lang"], budget_tokens=10**9, mode="rate").toPandas()
        assert len(all_in) == 600

    def test_auto_shards_bound_per_task_input(self, spark):
        """n_shards=None derives the grid from corpus size so no single
        task (= one shard's running sum) sorts an unbounded slice. On a
        skewed corpus (one giant doc among many small) every shard's
        token total must stay within a hash-balance factor of the target
        plus the largest single document (which is indivisible)."""
        from physioview_spark.llm import sampling
        rows = [(i, " ".join(["w"] * (20 + i % 50))) for i in range(400)]
        rows.append((999, " ".join(["g"] * 4000)))  # skew: one giant doc
        df = spark.createDataFrame(rows, "doc_id long, text string")
        target = 1000  # tokens per shard — tiny, to force many shards
        out = sampling.pack_sequences(
            df, ctx_len=16, tokens_per_shard=target).toPandas()
        assert len(out) == 401
        n_shards = out["shard"].nunique()
        assert n_shards > 4  # actually scaled up from the corpus size
        per_shard = out.groupby("shard")["n_tokens"].sum()
        max_doc = out["n_tokens"].max()
        assert per_shard.max() <= 3 * target + max_doc
        # deterministic for the same corpus + seed, any partitioning
        again = sampling.pack_sequences(
            df.repartition(11), ctx_len=16,
            tokens_per_shard=target).toPandas()
        key = lambda p: sorted(map(tuple, p.values))
        assert key(out) == key(again)

    def test_wide_grid_uses_more_than_256_shards(self, spark):
        """Explicit n_shards > 256 must actually address every shard —
        the 2-hex-digit shard key only reaches 256 buckets, so the wide
        path widens the digit slice."""
        from physioview_spark.llm import sampling
        rows = [(i, "a b c") for i in range(3000)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = sampling.pack_sequences(
            df, ctx_len=16, n_shards=512).toPandas()
        assert out["shard"].nunique() > 256
        assert out["shard"].max() < 512


def test_simhash_max_bucket_size_guard(spark):
    # identical docs share every signature chunk -> one bucket of 6;
    # capped, the all-identical family produces no self-join pairs
    rows = [(i, "identical boilerplate text appearing everywhere online")
            for i in range(6)] + [(10, "something else entirely different")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.simhash_near_dups(df).count() == 15
    assert dedup.simhash_near_dups(df, max_bucket_size=5).count() == 0


def test_embedding_near_dup_bucket_guard(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    base = rng.normal(size=64)
    rows = [(i, (base + rng.normal(scale=1e-4, size=64)).tolist())
            for i in range(6)]
    rows.append((10, rng.normal(size=64).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = similarity.embedding_near_dups(df, threshold=0.99)
    assert uncapped.count() == 15  # the identical family, all pairs
    capped = similarity.embedding_near_dups(
        df, threshold=0.99, max_bucket_size=5)
    assert capped.count() == 0


class TestMixtureSample:
    def test_water_filling_rates_and_composition(self, spark):
        """T = min(m_d / w_d); the binding domain keeps everything and
        the realized mixture tracks the target within hash noise."""
        from physioview_spark.llm import sampling
        rows = ([(i, "a") for i in range(400)]
                + [(i + 1000, "b") for i in range(100)]
                + [(i + 2000, "c") for i in range(300)])
        df = spark.createDataFrame(rows, "doc_id long, dom string")
        out = sampling.mixture_sample(
            df, "dom", {"a": 0.5, "b": 0.25, "c": 0.25}).toPandas()
        got = out.groupby("dom").size()
        # T = min(400/.5, 100/.25, 300/.25) = 400 -> need 200/100/100;
        # b is binding: rate 1 keeps all 100 exactly
        assert got["b"] == 100
        assert 140 <= got["a"] <= 260, got
        assert 70 <= got["c"] <= 130, got
        # untargeted domains are dropped entirely
        df2 = df.union(spark.createDataFrame(
            [(9000, "zz")], "doc_id long, dom string"))
        out2 = sampling.mixture_sample(
            df2, "dom", {"a": 0.5, "b": 0.25, "c": 0.25}).toPandas()
        assert "zz" not in set(out2["dom"])

    def test_absent_target_domain_skipped_not_emptying(self, spark):
        """A targeted domain with no corpus rows is skipped in the min
        instead of forcing T=0 (infeasible -> feasible sub-mixture)."""
        from physioview_spark.llm import sampling
        df = spark.createDataFrame(
            [(i, "a") for i in range(50)], "doc_id long, dom string")
        out = sampling.mixture_sample(
            df, "dom", {"a": 0.5, "ghost": 0.5}).toPandas()
        assert len(out) == 50  # a is binding among present domains

    def test_token_weighted_and_deterministic(self, spark):
        from physioview_spark.llm import sampling
        rows = [(i, "a" if i % 2 else "b", "w " * (5 + i % 7))
                for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, dom string, "
                                         "text string")
        from physioview_spark.llm import text as t
        df = t.token_count(df)
        out = sampling.mixture_sample(
            df, "dom", {"a": 0.5, "b": 0.5}, weight_col="n_tokens")
        a = sorted(r["doc_id"] for r in out.collect())
        b = sorted(r["doc_id"] for r in out.collect())
        assert a == b and len(a) > 50


class TestPassageDedup:
    def test_first_occurrence_kept_and_reassembly(self, spark):
        from physioview_spark.llm import dedup
        shared = " ".join(f"s{i}" for i in range(4))   # one 4-token window
        uniq_a = " ".join(f"a{i}" for i in range(4))
        uniq_b = " ".join(f"b{i}" for i in range(4))
        rows = [
            (0, shared + " " + uniq_a),   # first occurrence of shared
            (1, shared + " " + uniq_b),   # repeat -> stripped
            (2, uniq_b),                  # exact window repeat of doc1's
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               dedup.dedup_passages(df, passage_tokens=4).collect()}
        assert out[0]["text_dedup"] == shared + " " + uniq_a
        assert out[0]["n_removed"] == 0
        assert out[1]["text_dedup"] == uniq_b  # shared window stripped
        assert out[1]["n_removed"] == 1
        # doc2's window == doc1's second window; (1,1) < (2,0) so doc1 keeps
        assert out[2]["text_dedup"] == "" and out[2]["n_removed"] == 1
        assert all(r["n_passages"] == (1 if r["doc_id"] == 2 else 2)
                   for r in out.values())

    def test_all_duplicate_doc_empties_and_empty_doc_survives(self, spark):
        from physioview_spark.llm import dedup
        txt = " ".join(f"w{i}" for i in range(8))
        df = spark.createDataFrame(
            [(0, txt), (1, txt), (2, "")], "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               dedup.dedup_passages(df, passage_tokens=8).collect()}
        assert out[0]["text_dedup"] == txt
        assert out[1]["text_dedup"] == "" and out[1]["n_removed"] == 1
        assert out[2]["n_passages"] == 0 and out[2]["text_dedup"] == ""

    def test_partial_tail_window_and_order(self, spark):
        """Tail windows shorter than the stride hash on their own text;
        surviving windows reassemble in original position order."""
        from physioview_spark.llm import dedup
        df = spark.createDataFrame(
            [(0, "p q r s t"), (1, "x y p q r s t")],
            "doc_id long, text string")
        out = {r["doc_id"]: r["text_dedup"] for r in
               dedup.dedup_passages(df, passage_tokens=2).collect()}
        # doc0 windows: 'p q','r s','t'; doc1: 'x y','p q','r s','t' —
        # doc0 wins the shared windows ((0,pos) < (1,pos'))
        assert out[0] == "p q r s t"
        assert out[1] == "x y"


class TestKnnGraph:
    def test_knn_graph_recall_and_shape(self, spark, vectors):
        """kNN graph vs brute force: strong recall at 6 bands on the
        16-dim fixture; ranks 1..k, neighbors unique per node, no
        self-edges; the engineered near-dup pair is each other's top-1."""
        out = similarity.knn_graph(
            vectors, k=3, n_planes=2, dim=16, n_bands=6).toPandas()
        assert out["rank"].between(1, 3).all()
        assert (out["vec_id"] != out["neighbor_id"]).all()
        per = out.groupby("vec_id")
        assert (per["neighbor_id"].nunique() == per.size()).all()
        top1 = out[out["rank"] == 1].set_index("vec_id")["neighbor_id"]
        assert top1[3] == 7 and top1[7] == 3
        exact = similarity.cosine_topk(vectors, vectors, k=4).toPandas()
        exact = exact[exact["query_id"] != exact["match_id"]]
        exact["r"] = exact.groupby("query_id").cumcount()
        e = {(r.query_id, r.match_id)
             for r in exact[exact["r"] < 3].itertuples()}
        a = {(r.vec_id, r.neighbor_id) for r in out.itertuples()}
        assert len(e & a) / len(e) >= 0.8, len(e & a) / len(e)

    def test_knn_graph_deterministic_and_partial_limit(self, spark,
                                                       vectors):
        a = sorted(map(tuple, similarity.knn_graph(
            vectors, k=2, n_planes=2, dim=16, n_bands=4).collect()))
        b = sorted(map(tuple, similarity.knn_graph(
            vectors, k=2, n_planes=2, dim=16, n_bands=4).collect()))
        assert a == b and len(a) > 0
        plan = similarity.knn_graph(
            vectors, k=2, n_planes=2, dim=16, n_bands=4
        )._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan  # partial top-k before shuffle


def test_near_dups_matmul_gear_parity(spark, vectors):
    """The per-(band,bucket) Gram gear must reproduce the expr gear's
    pair decisions and rounded sims exactly on the fixture."""
    kw = dict(threshold=0.2, n_planes=2, dim=16, n_bands=4)
    e = {(r["id_a"], r["id_b"]): r["sim"]
         for r in similarity.embedding_near_dups(
             vectors, method="expr", **kw).collect()}
    m = {(r["id_a"], r["id_b"]): r["sim"]
         for r in similarity.embedding_near_dups(
             vectors, method="matmul", **kw).collect()}
    assert set(e) == set(m)
    assert all(abs(e[k] - m[k]) < 2e-6 for k in e)
    # knn_graph through the matmul gear: same graph as expr
    ge = sorted(map(tuple, similarity.knn_graph(
        vectors, k=3, n_planes=2, dim=16, n_bands=4).collect()))
    gm = sorted(map(tuple, similarity.knn_graph(
        vectors, k=3, n_planes=2, dim=16, n_bands=4,
        method="matmul").collect()))
    assert [t[:2] for t in ge] == [t[:2] for t in gm]


def test_vocabulary_topk_semantics_and_partial_limit(spark):
    df = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a b d")], "doc_id long, text string")
    out = text.vocabulary_topk(df, k=3).collect()
    assert [(r["word"], r["freq"], r["rank"]) for r in out] == [
        ("a", 4, 1), ("b", 3, 2), ("c", 1, 3)]  # tie c/d breaks on word
    assert out[0]["cum_frac"] == round(4 / 9, 6)
    assert out[-1]["cum_frac"] == round(8 / 9, 6)
    plan = text.vocabulary_topk(df, k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    # the rank<=k filter must become a partial-limit shape so the
    # vocabulary never crosses the shuffle: Spark rewrites the
    # empty-partition row_number filter either to WindowGroupLimit or
    # (here) to TakeOrderedAndProject / Local+GlobalLimit over the sort
    assert ("WindowGroupLimit" in plan
            or "TakeOrderedAndProject" in plan
            or "LocalLimit" in plan), plan


def test_mixture_zero_mass_domain_skipped_not_emptying(spark):
    """A targeted domain PRESENT but with zero mass (all-empty docs
    under a token weighting) must be skipped in the water-filling min
    like an absent one — not force T=0 and empty the whole output."""
    from physioview_spark.llm import sampling, text as t
    rows = [(i, "a", "w x y z") for i in range(40)]
    rows += [(100 + i, "b", "   ") for i in range(5)]  # zero tokens
    df = t.token_count(spark.createDataFrame(
        rows, "doc_id long, dom string, text string"))
    out = sampling.mixture_sample(
        df, "dom", {"a": 0.5, "b": 0.5}, weight_col="n_tokens").toPandas()
    assert len(out) == 40  # a binding among positive-mass domains
    assert set(out["dom"]) == {"a"}


def test_quantize_int8_roundtrip_bounds_and_zero_vector(spark):
    rows = [(i, [float(np.sin(i * 17 + j) * (1 + i)) for j in range(16)])
            for i in range(20)]
    rows.append((99, [0.0] * 16))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = similarity.quantize_int8(df)
    deq = similarity.dequantize_int8(q, out_col="recon")
    for r in deq.collect():
        codes, scale = r["q_embedding"], r["q_scale"]
        assert all(-127 <= c <= 127 for c in codes)
        if r["vec_id"] == 99:
            assert scale == 0.0 and all(c == 0 for c in codes)
            continue
        assert scale > 0
        # symmetric rounding: per-component error <= scale/2 (+ the
        # 1e-9 scale rounding slack)
        orig = [float(x) for x in r["embedding"]]
        err = max(abs(a - b) for a, b in zip(orig, r["recon"]))
        assert err <= scale / 2 + 1e-6, (r["vec_id"], err, scale)
        # the max-|x| component hits exactly +/-127
        assert max(abs(c) for c in codes) == 127


def test_label_centroids_match_numpy(spark, vectors):
    df = vectors.withColumn("label", (F.col("vec_id") % 3).cast("int"))
    out = {r["label"]: r for r in
           similarity.label_centroids(df).collect()}
    rows = df.collect()
    for lab in (0, 1, 2):
        X = np.stack([np.array(r["embedding"], dtype=np.float64)
                      for r in rows if r["label"] == lab])
        assert out[lab]["n_vecs"] == len(X)
        got = np.array(out[lab]["centroid"])
        assert np.allclose(got, np.round(X.mean(axis=0), 6), atol=2e-6)
        assert len(got) == X.shape[1]  # ordered, full-dim reassembly


class TestDedupDelta:
    def test_decisions_and_one_sidedness(self, spark, docs):
        """new batch vs corpus: exact clone -> drop_exact with the
        corpus keeper; near-dup -> drop_near_dup with best match;
        novel -> keep. Corpus-internal duplicates must NOT produce
        rows (decisions are per NEW doc only)."""
        new = docs.where(F.col("doc_id").isin(3, 1, 4))
        corpus = docs.where(~F.col("doc_id").isin(3, 1, 4))
        out = {r["doc_id"]: r for r in dedup.dedup_delta(
            new, corpus, threshold=0.5).collect()}
        assert set(out) == {1, 3, 4}
        # doc 3 == doc 0 byte-identical -> exact
        assert out[3]["decision"] == "drop_exact"
        assert out[3]["match_id"] == 0 and out[3]["jaccard"] == 1.0
        # doc 1 is a one-word near-dup of doc 0
        assert out[1]["decision"] == "drop_near_dup"
        assert out[1]["match_id"] == 0 and 0.5 <= out[1]["jaccard"] < 1.0
        # doc 4 is unrelated to the corpus
        assert out[4]["decision"] == "keep"
        assert out[4]["match_id"] is None and out[4]["jaccard"] is None

    def test_bucket_cap_guards_near_path_only(self, spark, docs):
        new = docs.where(F.col("doc_id").isin(3, 1))
        corpus = docs.where(~F.col("doc_id").isin(3, 1))
        out = {r["doc_id"]: r for r in dedup.dedup_delta(
            new, corpus, threshold=0.5, max_bucket_size=0).collect()}
        # cap kills every LSH bucket -> near-dup path silent, exact
        # path unaffected
        assert out[3]["decision"] == "drop_exact"
        assert out[1]["decision"] == "keep"


def test_script_profile_scripts_and_dominance(spark):
    rows = [
        (0, "hello world"),                    # pure latin
        (1, "你好世界"),       # pure CJK
        (2, "привет"),  # pure cyrillic
        (3, "abc 中文 中文字"),   # CJK-dominant mix
        (4, ""),                               # empty
        (5, "12345"),                          # digits only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.script_profile(df).collect()}
    assert out[0]["dominant_script"] == "latin"
    assert out[0]["frac_latin"] == round(10 / 11, 6)
    assert out[1]["dominant_script"] == "cjk"
    assert out[1]["frac_cjk"] == 1.0
    assert out[2]["dominant_script"] == "cyrillic"
    assert out[2]["frac_cyrillic"] == 1.0
    assert out[3]["dominant_script"] == "cjk"
    assert out[4]["dominant_script"] == "none"
    assert out[4]["frac_latin"] == 0.0
    assert out[5]["frac_digit"] == 1.0
    # digits don't claim dominance; latin wins ties at zero
    assert out[5]["dominant_script"] == "latin"


class TestCuratedCorpusIO:
    def test_write_apply_and_manifest(self, spark, tmp_path):
        from physioview_spark.llm import corpus_io
        docs = spark.createDataFrame(
            [(0, "a b c", "en"), (1, "d e", "de"), (2, "f", "en"),
             (3, "g h i j", "fr")],
            "doc_id long, text string, lang string")
        dec = spark.createDataFrame(
            [(0, "keep"), (1, "drop_low_quality"), (2, "keep")],
            "doc_id long, decision string")  # doc 3: no decision row
        out = str(tmp_path / "curated")
        manifest = corpus_io.write_curated_corpus(docs, dec, out)
        assert manifest["decisions"] == {"keep": 2,
                                         "drop_low_quality": 1}
        assert manifest["n_total"] == 3
        assert manifest["tokens"] == {"keep": 4, "drop_low_quality": 2}
        back = spark.read.parquet(f"{out}/corpus")
        assert sorted(r["doc_id"] for r in back.collect()) == [0, 2]
        # un-reviewed doc 3 never ships
        assert back.where("doc_id = 3").count() == 0
        # partition pruning layout: lang directories exist
        import os
        assert os.path.isdir(f"{out}/corpus/lang=en")
        import json as j
        raw = [r["value"] for r in
               spark.read.text(f"{out}/manifest").collect()]
        assert j.loads(raw[0])["n_total"] == 3


def test_tfidf_topk_closed_form_and_residual(spark):
    """Closed-form tf*ln(N/df) on a 3-doc corpus with an unbounded
    vocabulary; then a capped vocabulary routes tail words through the
    mean-tail-df residual while head words keep exact idf. The scoring
    join must broadcast the bounded head (never shuffle on the skewed
    word key) and the per-doc top-k must WindowGroupLimit."""
    import math

    from physioview_spark.llm import text as T
    rows = [
        (1, "apple apple banana"),
        (2, "apple cherry"),
        (3, "banana cherry cherry dates"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wide = T.tfidf_topk(df, k=10, top_vocab=10**6)
    got = {(r["doc_id"], r["word"]): r for r in wide.collect()}
    # N=3; df: apple 2, banana 2, cherry 2, dates 1
    assert got[(1, "apple")]["tf"] == 2
    assert got[(1, "apple")]["score"] == round(2 * math.log(3 / 2), 6)
    assert got[(3, "dates")]["score"] == round(1 * math.log(3 / 1), 6)
    # deterministic rank: doc 3 scores dates(1.098) > cherry(0.81) >
    # banana(0.405)
    d3 = sorted((r for r in got.values() if r["doc_id"] == 3),
                key=lambda r: r["rank"])
    assert [r["word"] for r in d3] == ["dates", "cherry", "banana"]
    # capped vocabulary: head = 3 highest-df words (apple, banana,
    # cherry by df desc, word asc); 'dates' is tail -> residual df =
    # mean tail df = 1.0 (only tail word), so its score is unchanged
    # here; shrink head to 2 so the residual mixes cherry(2) + dates(1)
    capped = T.tfidf_topk(df, k=10, top_vocab=2)
    cg = {(r["doc_id"], r["word"]): r for r in capped.collect()}
    # head words exact
    assert cg[(1, "apple")]["score"] == got[(1, "apple")]["score"]
    assert cg[(3, "banana")]["score"] == got[(3, "banana")]["score"]
    # tail words share df_eff = (2+1)/2 = 1.5
    want = round(2 * math.log(3 / 1.5), 6)
    assert cg[(3, "cherry")]["score"] == want
    assert cg[(3, "dates")]["score"] == round(1 * math.log(3 / 1.5), 6)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_release_cached_frames_drops_operator_persists(spark):
    """Operator-internal persists (tfidf's tf frame, dedup_delta's
    band/candidate sets, ...) accumulate storage across invocations in
    a long-lived session (r08 ADVICE — the bench OOM'd from exactly
    this). release_cached_frames unpersists every pinned frame; results
    stay correct afterwards (lazy consumers just recompute)."""
    from physioview_spark.llm import release_cached_frames
    from physioview_spark.llm import text as T

    release_cached_frames()  # start from a clean registry
    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple cherry")],
        "doc_id long, text string")
    out = T.tfidf_topk(df, k=5, top_vocab=100)
    n_rows = out.count()
    assert n_rows > 0
    released = release_cached_frames()
    assert released >= 1
    assert release_cached_frames() == 0  # registry drains
    # lazy frame still usable after release (recompute, not error)
    assert out.count() == n_rows


def test_pinned_frames_scope(spark):
    """r09 advisor fix: the context-manager API releases
    operator-internal persists deterministically on exit — including
    on exception — and only the frames pinned INSIDE the scope
    (pre-existing pins survive; nested scopes release their own)."""
    import pytest as _pt

    from physioview_spark import cache as _cache
    from physioview_spark.llm import pinned_frames
    from physioview_spark.llm import text as T

    _cache.release_pinned()  # clean registry
    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple cherry")],
        "doc_id long, text string")
    outer = _cache.pin(df.select("doc_id"))
    outer.count()
    with pinned_frames():
        out = T.tfidf_topk(df, k=5, top_vocab=100)
        n_rows = out.count()
        assert n_rows > 0
        assert len(_cache._PINNED) > 1  # operator pinned inside
    # scope released its own pins; the outer pin is untouched
    assert _cache._PINNED == [outer]
    assert outer.storageLevel.useMemory
    assert out.count() == n_rows  # lazy escapee recomputes fine
    with _pt.raises(RuntimeError):
        with pinned_frames():
            _cache.pin(df.select("text")).count()
            raise RuntimeError("boom")
    assert _cache._PINNED == [outer]  # released on exception too
    assert _cache.release_pinned() == 1


class TestDedupDeltaPrefilter:
    """dedup_delta's prefilter gears (exact broadcast semi-join, bloom)
    must be prune-only: bit-identical decisions to the plain plan."""

    def test_prefilter_parity_and_plan(self, spark, docs):
        """prefilter=True (broadcast semi-join runtime filters on every
        corpus-side table) must be bit-identical to the plain shuffle
        plan, including under the bucket-size guard — touched buckets
        keep full membership so guard counts are unchanged."""
        new = docs.where(F.col("doc_id").isin(3, 1, 4))
        corpus = docs.where(~F.col("doc_id").isin(3, 1, 4))
        for cap in (None, 0, 100):
            plain = sorted(map(tuple, dedup.dedup_delta(
                new, corpus, threshold=0.5, max_bucket_size=cap,
                prefilter=False).collect()))
            fast = sorted(map(tuple, dedup.dedup_delta(
                new, corpus, threshold=0.5, max_bucket_size=cap,
                prefilter=True).collect()))
            assert plain == fast, cap
            blm = sorted(map(tuple, dedup.dedup_delta(
                new, corpus, threshold=0.5, max_bucket_size=cap,
                prefilter="bloom").collect()))
            # Bloom FPs only weaken the PRUNE; the exact join/verify
            # behind it rejects them, so decisions are bit-identical
            assert plain == blm, cap
        plan = dedup.dedup_delta(new, corpus, threshold=0.5) \
            ._jdf.queryExecution().executedPlan().toString()
        # delta-derived key sets reach the corpus side as broadcast
        # LeftSemi probes (exact runtime filters, not shuffles)
        assert "LeftSemi, BuildRight" in plan


class TestBloomFilter:
    """physioview_spark.llm.bloom — distributed Bloom filter used as
    dedup_delta's compressed prefilter gear. The load-bearing claims:
    no false negatives ever (prune-only safety), FP rate near the
    sizing formula, and both probe gears agree exactly."""

    def _frames(self, spark):
        members = spark.range(0, 3000).select(
            F.concat(F.lit("doc-"), F.col("id")).alias("key"))
        probe = spark.range(0, 12000).select(
            F.concat(F.lit("doc-"), F.col("id")).alias("key"))
        return members, probe

    def test_no_false_negatives_and_fp_rate(self, spark):
        from physioview_spark.llm import bloom
        members, probe = self._frames(spark)
        m, k = bloom.bloom_parameters(3000, 0.01)
        words = bloom.bloom_build(members, ["key"], m, k)
        bitmap = bloom.bloom_to_bitmap(words, m)
        # every member must survive the probe — Bloom has no false
        # negatives, which is what makes the prefilter prune-only-safe
        assert bloom.bloom_probe(members, ["key"], bitmap, m, k) \
            .count() == 3000
        kept = bloom.bloom_probe(probe, ["key"], bitmap, m, k).count()
        fp_rate = (kept - 3000) / 9000
        assert fp_rate < 0.03, fp_rate  # 3x the 1% design point
        # maybe + definitely_not partition the probe frame
        dropped = bloom.bloom_probe(probe, ["key"], bitmap, m, k,
                                    keep="definitely_not").count()
        assert kept + dropped == 12000

    def test_gear_parity_jvm_pandas_join(self, spark):
        from physioview_spark.llm import bloom
        members, probe = self._frames(spark)
        m, k = bloom.bloom_parameters(3000, 0.02)
        words = bloom.bloom_build(members, ["key"], m, k)
        bitmap = bloom.bloom_to_bitmap(words, m)
        jvm = sorted(r.key for r in bloom.bloom_probe(
            probe, ["key"], bitmap, m, k).collect())
        pnd = sorted(r.key for r in bloom.bloom_probe(
            probe, ["key"], bitmap, m, k, gear="pandas").collect())
        joined = sorted(r.key for r in bloom.bloom_probe_join(
            probe, ["key"], words, m, k).collect())
        assert jvm == pnd == joined
        # the jvm gear must also preserve the probed frame's columns
        cols = bloom.bloom_probe(probe, ["key"], bitmap, m, k).columns
        assert cols == probe.columns

    def test_empty_filter_rejects_everything(self, spark):
        from physioview_spark.llm import bloom
        members, probe = self._frames(spark)
        m, k = 640, 3
        words = bloom.bloom_build(members.limit(0), ["key"], m, k)
        bitmap = bloom.bloom_to_bitmap(words, m)
        assert bloom.bloom_probe(probe, ["key"], bitmap, m, k).count() == 0
        assert bloom.bloom_probe_join(probe, ["key"], words, m, k) \
            .count() == 0

    def test_join_gear_null_keys_and_duplicates(self, spark):
        """The join gear verdicts per DISTINCT key and joins back
        null-safely: null keys keep a consistent verdict instead of
        dropping out of the equi-join, and duplicate probe rows all
        survive."""
        from physioview_spark.llm import bloom
        members = spark.createDataFrame(
            [("a",), (None,)], "key string")
        probe = spark.createDataFrame(
            [("a",), ("a",), (None,), ("zz",)], "key string")
        m, k = 640, 3
        words = bloom.bloom_build(members, ["key"], m, k)
        maybe = [r.key for r in bloom.bloom_probe_join(
            probe, ["key"], words, m, k).collect()]
        # members (incl. the null key, hashed consistently on both
        # sides) are kept, duplicates preserved; "zz" may only survive
        # as an FP, which a 640-bit filter over 2 keys won't produce
        assert sorted(maybe, key=str) == sorted(["a", "a", None], key=str)

    def test_composite_key(self, spark):
        from physioview_spark.llm import bloom
        members = spark.range(0, 500).select(
            (F.col("id") % 8).alias("band"), F.col("id").alias("band_hash"))
        m, k = bloom.bloom_parameters(500, 0.01)
        words = bloom.bloom_build(members, ["band", "band_hash"], m, k)
        bitmap = bloom.bloom_to_bitmap(words, m)
        assert bloom.bloom_probe(members, ["band", "band_hash"],
                                 bitmap, m, k).count() == 500
        # shifted composite keys are (mostly) rejected — same columns,
        # different pairing
        probe = spark.range(1000, 1500).select(
            (F.col("id") % 8).alias("band"), F.col("id").alias("band_hash"))
        kept = bloom.bloom_probe(probe, ["band", "band_hash"],
                                 bitmap, m, k).count()
        assert kept < 25  # 500 non-members at 1% FPP

    def test_parameter_sizing_and_validation(self, spark):
        from physioview_spark.llm import bloom
        m, k = bloom.bloom_parameters(1_000_000, 0.01)
        assert m % 64 == 0 and 9.0 < m / 1_000_000 < 10.2 and k == 7
        assert bloom.bloom_parameters(0, 0.01) == (64, 1)
        with pytest.raises(ValueError):
            bloom.bloom_parameters(10, 1.5)
        with pytest.raises(ValueError):
            bloom.bloom_build(spark.range(1), ["id"], 100, 3)  # not %64
        with pytest.raises(ValueError):
            bloom.bloom_to_bitmap(spark.range(0).selectExpr(
                "id as word_idx", "id as bits"), 1 << 40)

    def test_auto_gear_selection(self, spark, docs):
        """r09 advisor fix: the default gear is 'auto' — jvm up to
        _JVM_PROBE_MAX_BITS (the one-row local-relation transport is a
        plan-attached Python list, GBs of driver memory at the 2^30
        cap), pandas (numpy TorrentBroadcast) above."""
        import numpy as np

        from physioview_spark.llm import bloom
        m_small, k = bloom.bloom_parameters(100, 0.01)
        words = bloom.bloom_build(docs.select("text"), ["text"],
                                  m_small, k)
        small = bloom.bloom_to_bitmap(words, m_small)
        plan = bloom.bloom_probe(docs, ["text"], small, m_small, k,
                                 gear="auto") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan  # jvm gear chosen
        assert "ArrowEvalPython" not in plan
        m_big = bloom._JVM_PROBE_MAX_BITS + 64
        big = np.zeros(m_big // 64, dtype=np.uint64)
        plan = bloom.bloom_probe(docs, ["text"], big, m_big, k) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan  # pandas gear auto-selected
        assert "BroadcastNestedLoopJoin" not in plan
        with pytest.raises(ValueError, match="gear"):
            bloom.bloom_probe(docs, ["text"], small, m_small, k,
                              gear="spark")

    def test_probe_plans_zero_shuffle(self, spark, docs):
        """Both in-row gears exist to avoid shuffling the probed frame:
        the jvm gear is a broadcast NLJ against one bitmap row with the
        bit test in codegen (no Python either); the pandas gear is a
        projection through one Arrow UDF."""
        from physioview_spark.llm import bloom
        m, k = bloom.bloom_parameters(100, 0.01)
        words = bloom.bloom_build(docs.select("text"), ["text"], m, k)
        bitmap = bloom.bloom_to_bitmap(words, m)
        for gear in ("jvm", "pandas"):
            plan = bloom.bloom_probe(docs, ["text"], bitmap, m, k,
                                     gear=gear) \
                ._jdf.queryExecution().executedPlan().toString()
            # no data shuffle; the jvm gear's BroadcastExchange of the
            # single bitmap row is the point, not a violation
            assert "Exchange hashpartitioning" not in plan, gear
            assert "Exchange rangepartitioning" not in plan, gear
            if gear == "jvm":
                assert "ArrowEvalPython" not in plan
                assert "BroadcastNestedLoopJoin" in plan


class TestBpe:
    def test_train_matches_hand_computed_merges(self, spark):
        """Sennrich's classic corpus: low x5, lower x2, newest x6,
        widest x3. Pair freqs give (e,s)=9 first, then the cascade
        (es,t), (est,</w>); the (l,o)/(o,w) tie at 7 resolves
        lexicographically to (l,o)."""
        from physioview_spark.llm import bpe

        words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 \
            + ["widest"] * 3
        df = spark.createDataFrame([(0, " ".join(words))],
                                   "doc_id long, text string")
        merges = bpe.train_bpe(df, num_merges=5)
        assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"),
                          ("l", "o"), ("lo", "w")]
        # determinism: retrain -> identical
        assert bpe.train_bpe(df, num_merges=5) == merges

    def test_tokenization_parity_on_unicode_whitespace(self, spark):
        """Training (JVM \\s+, ASCII-only without UNICODE_CHARACTER
        CLASS) and encoding (Python) must segment identically: a
        U+00A0 non-breaking space is NOT a separator on either side,
        so 'foo\\u00A0bar' is one word type in both paths."""
        from physioview_spark.llm import bpe

        nb = "foo\u00a0bar"  # explicit escape: invisible in source
        txt = f"{nb} {nb} baz baz baz"
        df = spark.createDataFrame([(0, txt)], "doc_id long, text string")
        freqs = dict(bpe.word_frequencies(df))
        assert freqs == {nb: 2, "baz": 3}
        merges = bpe.train_bpe(df, num_merges=50, min_pair_freq=1)
        ranks = {p: i for i, p in enumerate(merges)}
        toks = bpe.apply_bpe(df, merges).first()["bpe_tokens"]
        want = []
        for w in [nb, nb, "baz", "baz", "baz"]:
            want.extend(bpe.encode_word(w, ranks))
        assert toks == want

    def test_encode_word_applies_ranks_in_order(self):
        from physioview_spark.llm import bpe

        ranks = {p: i for i, p in enumerate(
            [("e", "s"), ("es", "t"), ("est", "</w>"),
             ("l", "o"), ("lo", "w"), ("low", "est</w>")])}
        assert bpe.encode_word("lowest", ranks) == ["lowest</w>"]
        assert bpe.encode_word("low", ranks) == ["low", "</w>"]
        assert bpe.encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]

    def test_apply_bpe_distributed_matches_local_and_roundtrips(
            self, spark, docs):
        from physioview_spark.llm import bpe

        merges = bpe.train_bpe(docs, num_merges=40)
        ranks = {p: i for i, p in enumerate(merges)}
        out = bpe.apply_bpe(docs, merges).select(
            "doc_id", "text", "bpe_tokens").collect()
        assert len(out) == docs.count()
        for r in out:
            toks = r["bpe_tokens"]
            # distributed encoding == driver-side reference, word by word
            want = []
            for w in (r["text"] or "").lower().split():
                want.extend(bpe.encode_word(w, ranks))
            assert toks == want
            # lossless roundtrip: strip </w> markers -> original words
            rebuilt = "".join(toks).replace("</w>", " ").split()
            assert rebuilt == (r["text"] or "").lower().split()


def test_preprocessing_chain_curate_tokenize_pack(spark, docs):
    """End-to-end pretraining preprocessing over one relational flow:
    curation decisions -> apply (keep-only) -> BPE encode -> pack into
    a (shard, ctx window) grid. Conservation invariants at each seam:
    kept docs survive intact, BPE roundtrips the text, and packing's
    running offsets account for every BPE token exactly once."""
    from physioview_spark.llm import bpe, sampling
    from physioview_spark.llm.corpus_io import apply_decisions
    from pyspark.sql import Window as W

    # gate: exact-dup keeper + a minimum length
    keeper = F.min("doc_id").over(W.partitionBy(F.md5("text")))
    toks = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+")))
    decisions = docs.select(
        "doc_id",
        F.when(F.col("doc_id") != keeper, F.lit("drop_duplicate"))
        .when(toks < 3, F.lit("drop_short"))
        .otherwise(F.lit("keep")).alias("decision"),
    )
    kept = apply_decisions(docs, decisions)
    n_kept = kept.count()
    assert 0 < n_kept < docs.count()  # both gates fired

    merges = bpe.train_bpe(kept, num_merges=30)
    enc = bpe.apply_bpe(kept, merges).withColumn(
        "bpe_text", F.concat_ws(" ", "bpe_tokens"))
    # pack on the BPE token stream (whitespace tokens of bpe_text ==
    # the BPE tokens, so pack's token accounting is the real one)
    packed = sampling.pack_sequences(
        enc, text_col="bpe_text", ctx_len=16, n_shards=4)
    rows = packed.collect()
    assert len(rows) == n_kept
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    total = 0
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["start_offset"])
        off = 0
        for r in rs:
            assert r["start_offset"] == off  # head-to-tail, no gaps
            assert r["seq_id"] == off // 16
            off += r["n_tokens"]
        total += off
    # every BPE token accounted exactly once
    want = enc.select(F.sum(F.size("bpe_tokens"))).first()[0]
    assert total == want


class TestSemanticDedupDelta:
    def _frames(self, spark):
        import numpy as np

        rng = np.random.RandomState(11)
        base = rng.randn(30, 16)
        rows = []
        # corpus: ids 0..29, spread vectors
        for i in range(30):
            rows.append((i, [float(x) for x in base[i]]))
        corpus = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        # new batch: ids 100+: 3 near-copies of corpus vecs, one
        # internal near-pair, two novel
        def jitter(v, eps=0.01):
            w = np.array(v) + eps * rng.randn(16)
            return [float(x) for x in w]
        nrows = [
            (100, jitter(base[0])), (101, jitter(base[5])),
            (102, jitter(base[9])),
            (103, [float(x) for x in rng.randn(16)]),
            (104, None), (105, [float(x) for x in rng.randn(16)]),
        ]
        nrows[4] = (104, jitter(np.array(nrows[3][1])))  # 104 dups 103
        new = spark.createDataFrame(
            nrows, "vec_id long, embedding array<float>")
        cents = [[float(x) for x in base[i]] for i in range(0, 30, 8)]
        return new, corpus, cents

    def test_parity_with_batch_union_and_decisions(self, spark):
        from physioview_spark.llm import similarity

        new, corpus, cents = self._frames(spark)
        out = {r["vec_id"]: r for r in similarity.semantic_dedup_delta(
            new, corpus, cents, threshold=0.95).collect()}
        assert len(out) == 6
        # kept set == batch semantic_dedup over the union, restricted
        # to the batch (corpus ids precede batch ids)
        union = corpus.unionByName(new)
        batch_keep = {r["vec_id"] for r in similarity.semantic_dedup(
            union, cents, threshold=0.95).collect()} & set(out)
        delta_keep = {i for i, r in out.items() if r["decision"] == "keep"}
        assert delta_keep == batch_keep
        # corpus near-copies identified with their corpus match
        for nid, cid in ((100, 0), (101, 5), (102, 9)):
            # only assert when bucket geometry put them together (the
            # quantizer contract); with centroids AT the corpus vecs it
            # must hold
            assert out[nid]["decision"] == "drop_corpus_dup", nid
            assert out[nid]["match_id"] == cid
            assert out[nid]["sim"] >= 0.95
        # batch-internal pair: keep-first
        assert out[103]["decision"] == "keep" or \
            out[103]["decision"] == "drop_corpus_dup"
        if out[103]["decision"] == "keep":
            assert out[104]["decision"] == "drop_batch_dup"
            assert out[104]["match_id"] == 103

    def test_prefilter_parity_and_guard(self, spark):
        from physioview_spark.llm import similarity

        new, corpus, cents = self._frames(spark)
        for cap in (None, 0, 50):
            a = sorted(map(tuple, similarity.semantic_dedup_delta(
                new, corpus, cents, threshold=0.95, max_bucket_size=cap,
                prefilter=True).collect()))
            b = sorted(map(tuple, similarity.semantic_dedup_delta(
                new, corpus, cents, threshold=0.95, max_bucket_size=cap,
                prefilter=False).collect()))
            assert a == b, cap
        # cap=0 kills corpus pair search entirely -> no corpus dups,
        # batch-internal decisions unaffected, nothing lost
        capped = {r["vec_id"]: r for r in similarity.semantic_dedup_delta(
            new, corpus, cents, threshold=0.95,
            max_bucket_size=0).collect()}
        assert len(capped) == 6
        assert all(r["decision"] != "drop_corpus_dup"
                   for r in capped.values())
        plan = similarity.semantic_dedup_delta(
            new, corpus, cents, threshold=0.95)._jdf \
            .queryExecution().executedPlan().toString()
        assert "LeftSemi, BuildRight" in plan

    def test_scoring_gear_and_stored_bucket_parity(self, spark):
        """r08: the per-bucket matmul scoring gear and the
        precomputed-bucket corpus path (what the streaming processor
        now feeds from its state table) must reproduce the expr gear's
        decisions exactly — same 6-decimal rounding, threshold, and
        (sim desc, id asc) tie-break."""
        from physioview_spark.llm import similarity
        from physioview_spark.llm.similarity import assign_ivf_bucket

        new, corpus, cents = self._frames(spark)

        def run(**kw):
            return sorted(map(tuple, similarity.semantic_dedup_delta(
                new, kw.pop("corpus", corpus), cents, threshold=0.95,
                **kw).collect()))

        base = run()
        assert run(scoring="pandas") == base
        pc = corpus.withColumn(
            "bkt", assign_ivf_bucket(F.col("embedding"), cents))
        assert run(corpus=pc, corpus_bucket_col="bkt") == base
        assert run(corpus=pc, corpus_bucket_col="bkt",
                   scoring="pandas") == base
        # cap applies identically through the pandas gear
        assert run(scoring="pandas", max_bucket_size=0) == \
            run(max_bucket_size=0)

    def test_pandas_gear_string_ids_and_dtype_guard(self, spark):
        """r09 advisor fix: the pandas gear's applyInPandas schema is
        derived from the INPUT id type, so string ids work identically
        to the expr gear (scoring='auto' can reach the pandas gear
        implicitly on large codebooks); unsupported id types fail with
        a clear driver-side error instead of inside an executor."""
        import pytest as _pt

        from physioview_spark.llm import similarity

        new, corpus, cents = self._frames(spark)
        sid = F.format_string("id%03d", F.col("vec_id"))
        news = new.withColumn("vec_id", sid)
        corps = corpus.withColumn("vec_id", sid)
        a = sorted(map(tuple, similarity.semantic_dedup_delta(
            news, corps, cents, threshold=0.95,
            scoring="expr").collect()))
        b = sorted(map(tuple, similarity.semantic_dedup_delta(
            news, corps, cents, threshold=0.95,
            scoring="pandas").collect()))
        assert a == b and len(a) == 6
        assert any(r[1] == "drop_corpus_dup" and r[2] == "id000"
                   for r in a)
        newd = new.withColumn("vec_id", F.col("vec_id").cast("double"))
        with _pt.raises(ValueError, match="integral or string"):
            similarity.semantic_dedup_delta(
                newd, corpus.withColumn(
                    "vec_id", F.col("vec_id").cast("double")),
                cents, scoring="pandas")


class TestProductQuantization:
    def test_encode_reconstruct_and_adc_closed_form(self, spark):
        """A vector that IS a concatenation of codebook centroids
        encodes to exactly those codes, reconstructs bit-exactly, and
        its ADC score against any query equals the plain dot product
        with the reconstruction (numpy reference, round 6)."""
        import numpy as np

        from physioview_spark.llm import pq

        rng = np.random.RandomState(2)
        m, n_codes, d = 4, 3, 2
        books = [[[float(x) for x in rng.randn(d)] for _ in range(n_codes)]
                 for _ in range(m)]
        picks = [2, 0, 1, 2]
        vec = [x for j, c in enumerate(picks) for x in books[j][c]]
        df = spark.createDataFrame(
            [(1, vec), (2, [float(x) for x in rng.randn(m * d)])],
            "vec_id long, embedding array<double>")
        enc = pq.encode_pq(df, books)
        rows = {r["vec_id"]: r for r in enc.withColumn(
            "recon", pq.pq_reconstruct(F.col("pq_codes"), books))
            .collect()}
        assert rows[1]["pq_codes"] == picks
        assert np.allclose(rows[1]["recon"], vec)
        # ADC == dot(query, reconstruction) for every row
        qv = [float(x) for x in rng.randn(m * d)]
        queries = spark.createDataFrame(
            [(9, qv)], "vec_id long, embedding array<double>")
        got = {r["match_id"]: r["score"] for r in pq.pq_topk(
            enc, queries, books, k=2).collect()}
        for vid, r in rows.items():
            want = round(float(np.dot(qv, np.asarray(r["recon"]))), 6)
            assert abs(got[vid] - want) <= 1e-6, vid

    def test_recall_on_clustered_corpus_and_plan(self, spark):
        """PQ retrieval in its operating regime — STRUCTURED data:
        30 well-separated clusters x 8 members (within-cluster cosine
        ~0.99). Exact top-5 for a member is its cluster mates; PQ(m=8,
        16 codes, 32x compression) must recover them with recall@5
        >= 0.8. (On near-orthogonal random vectors — e.g. the fixture
        embedding table, exact-NN cosines 0.27-0.37 — NO 32x code can
        rank neighbors; measured recall 0.03 there, which is the
        information-theoretic reality, not a plan property.)"""
        import numpy as np

        from physioview_spark.llm import pq
        from physioview_spark.llm.similarity import cosine_topk

        rng = np.random.RandomState(9)
        centers = rng.randn(30, 64)
        centers /= np.linalg.norm(centers, axis=1)[:, None]
        rows = []
        for c in range(30):
            for i in range(8):
                v = centers[c] + 0.05 * rng.randn(64)
                v /= np.linalg.norm(v)
                rows.append((c * 100 + i, [float(x) for x in v]))
        unit = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        books = pq.train_pq(unit, m=8, n_codes=16)
        assert len(books) == 8 and len(books[0]) == 16
        enc = pq.encode_pq(unit, books)
        queries = unit.where(F.col("vec_id") % 100 == 0).limit(6)
        exact = cosine_topk(queries, unit, k=5, q_id="vec_id",
                            c_id="vec_id").toPandas()
        # recall@8 of the exact top-5 (standard R@N, N>k): cluster
        # mates quantize to IDENTICAL codes, so within PQ's tied
        # scores the id tie-break picks an arbitrary subset at k=5 —
        # widening to 8 (the cluster size) makes containment the
        # correct criterion, and PQ must recover the whole cluster
        approx = pq.pq_topk(enc, queries, books, k=8).toPandas()
        recalls = []
        for qid, grp in exact.groupby("query_id"):
            truth = set(grp["match_id"])
            got = set(approx[approx["query_id"] == qid]["match_id"])
            recalls.append(len(truth & got) / len(truth))
        assert np.mean(recalls) >= 0.9, recalls
        # the plan's corpus side is JVM-only: no Python eval above the
        # codes scan in the scoring join
        plan = pq.pq_topk(enc, queries, books, k=5)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        assert "WindowGroupLimit" in plan

        # ADC-then-exact refinement: the exact re-rank over the
        # shortlist resolves exactly the tie problem above — recall@5
        # at k=5 (self-matches dropped to mirror cosine_topk), where
        # raw ADC ties made k=5 arbitrary
        refined = pq.pq_topk_refined(
            enc, unit, queries, books, k=6, refine=4).toPandas()
        refined = refined[refined["query_id"] != refined["match_id"]]
        r5 = []
        for qid, grp in exact.groupby("query_id"):
            truth = set(grp["match_id"])
            got = set(refined[refined["query_id"] == qid]
                      .nsmallest(5, "rank")["match_id"])
            r5.append(len(truth & got) / len(truth))
        assert np.mean(r5) >= 0.95, r5
        # and the exact sims must agree with cosine_topk's on shared
        # pairs (same rounding, same definition)
        merged = refined.merge(
            exact, on=["query_id", "match_id"], how="inner")
        assert (abs(merged["sim_x"] - merged["sim_y"]) <= 1e-6).all()


def test_ivfpq_matches_full_pq_within_probed_buckets(spark):
    """IVF-PQ == plain PQ restricted to the probed buckets: with
    n_probe = n_cells the results are identical to pq_topk, and with
    n_probe=1 every match lives in the query's own bucket."""
    import numpy as np

    from physioview_spark.llm import pq
    from physioview_spark.llm.similarity import (
        assign_ivf_bucket, train_ivf_centroids,
    )

    rng = np.random.RandomState(4)
    centers = rng.randn(10, 32)
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    for c in range(10):
        for i in range(6):
            v = centers[c] + 0.05 * rng.randn(32)
            v /= np.linalg.norm(v)
            rows.append((c * 100 + i, [float(x) for x in v]))
    unit = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(unit, n_centroids=6)
    books = pq.train_pq(unit, m=4, n_codes=16)
    enc = pq.encode_pq(unit, books).withColumn(
        "bucket", assign_ivf_bucket(F.col("embedding"), cents))
    queries = unit.where(F.col("vec_id") % 100 == 0).limit(4)

    full = sorted(map(tuple, pq.pq_topk(
        enc, queries, books, k=3).collect()))
    allprobe = sorted(map(tuple, pq.ivfpq_topk(
        enc, queries, cents, books, k=3, n_probe=6).collect()))
    assert full == allprobe
    one = pq.ivfpq_topk(enc, queries, cents, books, k=3, n_probe=1)
    got = one.collect()
    assert len(got) > 0
    buckets = {r["vec_id"]: r["bucket"] for r in enc.collect()}
    for r in got:
        assert buckets[r["match_id"]] == buckets[r["query_id"]]
    # plan shape (r08 audit): the probe join is a broadcast equi-join
    # on bucket id (never a nested loop over the full corpus), the
    # per-query top-k rewrites to WindowGroupLimit, and only the
    # reduced score rows cross an exchange
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_probe_ivf_buckets_gear_parity(spark):
    """The expr and pandas probe gears must agree on well-separated
    data (near-ties are the documented divergence caveat, as with
    assign_ivf_bucket): same n_probe bucket ids, same order, ties to
    the lowest centroid id. The r08 ANN bench found the literal-expr
    probe paying ~1.2 MB task binaries at k=126 — the pandas gear is
    the scale path, so its semantics must be pinned."""
    import numpy as np

    from physioview_spark.llm.similarity import probe_ivf_buckets

    rng = np.random.RandomState(21)
    cents = rng.randn(12, 16)
    cents /= np.linalg.norm(cents, axis=1)[:, None]
    cl = [[float(x) for x in c] for c in cents]
    rows = []
    for i in range(40):
        c = i % 12
        v = cents[c] + 0.03 * rng.randn(16)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {}
    for gear in ("expr", "pandas"):
        got[gear] = {r["vec_id"]: list(r["p"]) for r in df.select(
            "vec_id", probe_ivf_buckets(
                F.col("embedding"), cl, 3, method=gear).alias("p")
        ).collect()}
    assert got["expr"] == got["pandas"]
    # nearest probe == assign_ivf_bucket, and it is the home cluster
    for i, probes in got["expr"].items():
        assert probes[0] == i % 12
        assert len(probes) == 3
    # exact-tie determinism on the pandas gear: duplicated centroids
    # must probe in ascending id order
    dup = [cl[0], cl[0], cl[1]]
    out = {r["vec_id"]: list(r["p"]) for r in df.select(
        "vec_id", probe_ivf_buckets(
            F.col("embedding"), dup, 2, method="pandas").alias("p")
    ).collect()}
    for probes in out.values():
        assert probes[0] != 1 or probes != [1, 0]  # 0 before 1 on tie
        if 0 in probes and 1 in probes:
            assert probes.index(0) < probes.index(1)


def test_train_quality_classifier_roundtrips_into_score_linear(spark):
    """Distributed LR training returns weights that score_linear serves
    with the SAME decision function: on linearly separable synthetic
    quality features, the served probabilities classify a held-out set
    perfectly and match pyspark.ml's own predictions."""
    import numpy as np

    from physioview_spark.llm import text as T

    rng = np.random.RandomState(7)
    rows = []
    for i in range(400):
        good = i % 2 == 0
        frac_alpha = (0.8 if good else 0.3) + 0.05 * rng.randn()
        n_tokens = (300 if good else 20) + 10 * rng.randn()
        rows.append((i, float(frac_alpha), float(n_tokens), int(good)))
    df = spark.createDataFrame(
        rows, "doc_id long, frac_alpha double, n_tokens double, label int")
    train = df.where(F.col("doc_id") % 4 != 0)
    test = df.where(F.col("doc_id") % 4 == 0)
    weights, intercept = T.train_quality_classifier(
        train, "label", ["frac_alpha", "n_tokens"])
    assert set(weights) == {"frac_alpha", "n_tokens"}
    served = T.score_linear(test, weights, intercept)
    got = served.select("doc_id", "label", "model_prob").collect()
    acc = np.mean([(r["model_prob"] >= 0.5) == bool(r["label"])
                   for r in got])
    assert acc == 1.0
    # serving parity with the trainer's own sigmoid (score_linear
    # rounds the logit to 6 before the sigmoid; tolerance covers it)
    import math
    for r in served.limit(5).collect():
        z = (intercept + weights["frac_alpha"] * r["frac_alpha"]
             + weights["n_tokens"] * r["n_tokens"])
        want = 1.0 / (1.0 + math.exp(-round(z, 6)))
        assert abs(r["model_prob"] - round(want, 6)) <= 1e-6


def test_materialize_packed_grid_conservation_and_parity(spark, docs):
    """The materialized token-id grid must agree exactly with the
    pack_sequences ADDRESS layout run on the same token stream: every
    token appears exactly once, every sequence is ctx_len long with
    full sequences unpadded, per-shard ids reassemble to the shard's
    concatenated document order, and document addresses match
    pack_sequences on the synthesized token text."""
    from physioview_spark.llm import bpe, sampling

    merges = bpe.train_bpe(docs, num_merges=25)
    enc = bpe.apply_bpe(docs, merges)
    ctx = 16
    grid = sampling.materialize_packed(
        enc, ctx_len=ctx, n_shards=4, pad_id=0).collect()
    total_tokens = enc.select(F.sum(F.size("bpe_tokens"))).first()[0]
    # conservation: every real slot exactly once
    assert sum(r["n_real"] for r in grid) == total_tokens
    for r in grid:
        assert len(r["token_ids"]) == ctx
        assert all(t > 0 for t in r["token_ids"][:r["n_real"]])
        assert all(t == 0 for t in r["token_ids"][r["n_real"]:])
    # within a shard, only the LAST sequence may be partial
    by_shard = {}
    for r in grid:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["seq_id"])
        assert [r["seq_id"] for r in rs] == list(range(len(rs)))
        for r in rs[:-1]:
            assert r["n_real"] == ctx, (shard, r["seq_id"])
    # address parity with pack_sequences over the same token stream
    # (whitespace-join the BPE tokens so both paths count identically)
    as_text = enc.select(
        "doc_id", F.concat_ws(" ", "bpe_tokens").alias("text"))
    addr = sampling.pack_sequences(
        as_text, ctx_len=ctx, n_shards=4).collect()
    shard_tokens = {s: sum(r["n_real"] for r in rs)
                    for s, rs in by_shard.items()}
    for s, rs in by_shard.items():
        want = sum(a["n_tokens"] for a in addr if a["shard"] == s)
        assert shard_tokens[s] == want, s


def test_materialize_packed_explicit_vocab_oov(spark):
    """Explicit-vocab OOV contract (r08 ADVICE fix): an out-of-vocab
    token's slot is already booked in the running offsets, so it must
    map to unk_id (slots stay aligned) or fail loudly — never be
    silently dropped (the old inner join compacted later tokens left
    within the window and corrupted the grid with no error)."""
    import pytest

    from physioview_spark.llm import sampling

    df = spark.createDataFrame(
        [(1, ["a", "b", "MISSING", "c"]), (2, ["a", "c"])],
        "doc_id long, bpe_tokens array<string>")
    vocab = {"a": 10, "b": 11, "c": 12}

    # unk_id path: OOV keeps its slot with the unk code
    grid = sampling.materialize_packed(
        df, ctx_len=4, n_shards=1, vocab=vocab, unk_id=99,
        pad_id=0).collect()
    assert sum(r["n_real"] for r in grid) == 6  # all slots kept
    ids = []
    for r in sorted(grid, key=lambda r: r["seq_id"]):
        ids.extend(r["token_ids"][:r["n_real"]])
    assert ids.count(99) == 1  # MISSING mapped, in place
    assert set(ids) <= {10, 11, 12, 99}

    # no-unk path: loud failure, not silent corruption
    with pytest.raises(Exception, match="not in vocab"):
        sampling.materialize_packed(
            df, ctx_len=4, n_shards=1, vocab=vocab).collect()

    # complete vocab with no unk_id still works unchanged
    ok = sampling.materialize_packed(
        df.where(F.col("doc_id") == 2), ctx_len=4, n_shards=1,
        vocab=vocab).collect()
    assert sum(r["n_real"] for r in ok) == 2


def test_packing_null_token_rows_do_not_corrupt_offsets(spark):
    """F.size(NULL)=-1 must not decrement running offsets (r08 ADVICE
    fix): a null-tokens document contributes 0 slots in
    materialize_packed, and a null text contributes 0 tokens in
    pack_sequences — offsets stay non-negative and monotone."""
    from physioview_spark.llm import sampling

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, None), (3, ["c"])],
        "doc_id long, bpe_tokens array<string>")
    grid = sampling.materialize_packed(
        df, ctx_len=4, n_shards=1, pad_id=0).collect()
    assert sum(r["n_real"] for r in grid) == 3
    for r in grid:
        assert len(r["token_ids"]) == 4

    txt = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "c")], "doc_id long, text string")
    addr = sampling.pack_sequences(txt, ctx_len=4, n_shards=1).collect()
    by_id = {r["doc_id"]: r for r in addr}
    assert by_id[2]["n_tokens"] == 0
    assert all(r["start_offset"] >= 0 for r in addr)
    assert sum(r["n_tokens"] for r in addr) == 3


class TestWeightedSample:
    """llm/sampling.weighted_sample — Efraimidis-Spirakis A-Res."""

    def _df(self, spark, weights):
        return spark.createDataFrame(
            [(i, w) for i, w in enumerate(weights)],
            "doc_id long, w double")

    def test_matches_python_reference(self, spark):
        """The key is a pure function of (seed, id, weight): recompute
        u^(1/w) in python (hashlib md5, same hex-prefix u) and the
        selected top-quota set must match exactly."""
        import hashlib

        from physioview_spark.llm import sampling
        weights = [(i % 7) + 0.5 for i in range(60)]
        got = sorted(r.doc_id for r in sampling.weighted_sample(
            self._df(spark, weights), "w", 10, seed=3).collect())

        def key(i):
            h = hashlib.md5(f"3|{i}".encode()).hexdigest()
            u = (int(h[:15], 16) + 1.0) / float(1 << 60)
            return u ** (1.0 / weights[i])

        want = sorted(sorted(range(60), key=lambda i: (-key(i), i))[:10])
        assert got == want

    def test_huge_weights_no_saturation(self, spark):
        """r09 advisor fix: the ranking key is ln(u)/w (same descending
        order as the textbook u^(1/w) — log is monotonic), because
        pow saturates to exactly 1.0 in double precision for
        w >~ 1e16, collapsing selection into the id tie-break. The
        selection must follow the A-Res order, not ascending ids."""
        import hashlib
        import math

        from physioview_spark.llm import sampling
        weights = [1e18 if i % 2 == 0 else 1e17 for i in range(40)]
        got = [(r.doc_id, r.sample_rank) for r in sampling.weighted_sample(
            self._df(spark, weights), "w", 8, seed=5).collect()]

        def key(i):
            h = hashlib.md5(f"5|{i}".encode()).hexdigest()
            u = (int(h[:15], 16) + 1.0) / float(1 << 60)
            return math.log(u) / weights[i]

        order = sorted(range(40), key=lambda i: (-key(i), i))[:8]
        assert [d for d, _ in sorted(got, key=lambda t: t[1])] == order
        # a saturated key (all 1.0) would have degraded to the id
        # tie-break — the lowest 8 ids — which is NOT the A-Res order
        assert sorted(order) != list(range(8))
        # sanity: pow really does saturate at these weights
        assert 0.5 ** (1.0 / 1e18) == 1.0

    def test_heavier_weights_sampled_more(self, spark):
        """Statistical sanity: weight-10 docs (half the corpus) should
        dominate a quota-20 sample over several seeds."""
        from physioview_spark.llm import sampling
        weights = [10.0 if i < 50 else 1.0 for i in range(100)]
        df = self._df(spark, weights)
        heavy = 0
        for seed in range(4):
            ids = [r.doc_id for r in sampling.weighted_sample(
                df, "w", 20, seed=seed).collect()]
            heavy += sum(1 for i in ids if i < 50)
        assert heavy / (4 * 20) > 0.7  # E ~ 0.85 at w-ratio 10

    def test_null_and_nonpositive_excluded_and_strata(self, spark):
        from physioview_spark.llm import sampling
        df = spark.createDataFrame(
            [(0, None, "a"), (1, 0.0, "a"), (2, -1.0, "a"),
             (3, 2.0, "a"), (4, 1.0, "a"), (5, 3.0, "b")],
            "doc_id long, w double, dom string")
        out = sampling.weighted_sample(
            df, "w", 5, strata_cols=["dom"]).collect()
        assert sorted(r.doc_id for r in out) == [3, 4, 5]
        # per-stratum ranks are dense from 1
        assert {(r.dom, r.sample_rank) for r in out} == {
            ("a", 1), ("a", 2), ("b", 1)}

    def test_plans(self, spark):
        from physioview_spark.llm import sampling
        df = self._df(spark, [1.0] * 1000)
        plan = sampling.weighted_sample(df, "w", 5) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan  # no global sort
        plan_s = sampling.weighted_sample(
            df.withColumn("s", F.col("doc_id") % 4), "w", 5,
            strata_cols=["s"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan_s


class TestTemperatureWeights:
    """llm/sampling.temperature_weights — p^alpha domain balancing."""

    def _df(self, spark):
        rows = ([(i, "en", 10) for i in range(80)]
                + [(100 + i, "de", 10) for i in range(16)]
                + [(200 + i, "sw", 10) for i in range(4)])
        return spark.createDataFrame(
            rows, "doc_id long, lang string, n_tokens long")

    def test_matches_python_reference_and_limits(self, spark):
        from physioview_spark.llm import sampling
        df = self._df(spark)
        w = sampling.temperature_weights(df, "lang", alpha=0.5)
        z = 80 ** 0.5 + 16 ** 0.5 + 4 ** 0.5
        assert abs(w["en"] - 80 ** 0.5 / z) < 1e-12
        assert abs(w["sw"] - 4 ** 0.5 / z) < 1e-12
        assert abs(sum(w.values()) - 1.0) < 1e-12
        # alpha=1 reproduces the natural mixture; alpha=0 is uniform
        nat = sampling.temperature_weights(df, "lang", alpha=1.0)
        assert abs(nat["en"] - 0.8) < 1e-12
        uni = sampling.temperature_weights(df, "lang", alpha=0.0)
        assert all(abs(v - 1 / 3) < 1e-12 for v in uni.values())
        # tail share strictly grows as alpha falls
        assert uni["sw"] > w["sw"] > nat["sw"]
        with pytest.raises(ValueError):
            sampling.temperature_weights(df, "lang", alpha=-0.1)

    def test_token_mass_nulls_and_mixture_composition(self, spark):
        from physioview_spark.llm import sampling
        df = self._df(spark)
        # token mass = 10x row mass here -> identical shares
        wt = sampling.temperature_weights(
            df, "lang", alpha=0.5, weight_col="n_tokens")
        wr = sampling.temperature_weights(df, "lang", alpha=0.5)
        assert all(abs(wt[k] - wr[k]) < 1e-12 for k in wr)
        # NULL domains are excluded, not a dict key
        withnull = df.unionByName(spark.createDataFrame(
            [(999, None, 10)], "doc_id long, lang string, n_tokens long"))
        assert set(sampling.temperature_weights(
            withnull, "lang", 0.5)) == {"en", "de", "sw"}
        assert sampling.temperature_weights(
            df.where("lang = 'xx'"), "lang") == {}
        # feeds mixture_sample: output composition matches the
        # temperature target exactly at the water-filling optimum
        out = sampling.mixture_sample(df, "lang", wr)
        got = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
        # sw (the binding tail domain) keeps everything
        assert got["sw"] == 4
        t = 4 / wr["sw"]
        for lang in ("en", "de"):
            # Bernoulli hash gate: expected T*w_d with binomial noise
            # (std ~3.7 at n=80) — bound at ~3 std, not exactness
            assert abs(got[lang] - t * wr[lang]) <= 11

    def test_single_bounded_aggregate(self, spark):
        """One aggregate over one scan — a per-domain fan-out
        (filter+count per domain) would cost >= n_domains jobs; the
        single groupBy stays O(1) in domains (AQE materializes the
        shuffle stage as its own job, hence <= 4, not == 1)."""
        from physioview_spark.llm import sampling
        df = spark.range(5000).selectExpr(
            "id as doc_id", "concat('d', id % 20) as lang")
        tracker = df.sparkSession.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        w = sampling.temperature_weights(df, "lang", 0.3)
        assert len(w) == 20
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after - before <= 4

    def test_max_domains_guard(self, spark):
        """r09 verdict nit: a hostile domain_col (raw URL/id) must fail
        loudly instead of collecting unbounded rows to the driver. The
        LIMIT sits above the aggregate, so only max_domains+1 rows can
        ever ship."""
        from physioview_spark.llm import sampling
        df = spark.range(500).selectExpr(
            "id as doc_id", "concat('u', id) as url")
        with pytest.raises(ValueError, match="distinct domains"):
            sampling.temperature_weights(df, "url", 0.3, max_domains=100)
        # at-the-cap cardinality passes; weights intact
        w = sampling.temperature_weights(df, "url", 0.3, max_domains=500)
        assert len(w) == 500
        assert abs(sum(w.values()) - 1.0) < 1e-9
        with pytest.raises(ValueError):
            sampling.temperature_weights(df, "url", 0.3, max_domains=0)


class TestHashSplit:
    """llm/sampling.hash_split / leakage_safe_split — deterministic
    dataset splits with the near-dup leakage guard."""

    FR = {"train": 0.5, "val": 0.25, "test": 0.25}  # exact binary cums

    def test_matches_duckdb_and_partition_invariance(self, spark, sf_dir):
        import duckdb

        from physioview_spark.llm import sampling
        from physioview_spark.plans.common import read
        d = read(spark, sf_dir, "documents")
        got = {r.doc_id: r.split for r in sampling.hash_split(
            d, self.FR).select("doc_id", "split").collect()}
        want = dict(duckdb.sql(f"""
            SELECT doc_id,
                   CASE WHEN u <= 0.5 THEN 'train'
                        WHEN u <= 0.75 THEN 'val'
                        ELSE 'test' END
            FROM (SELECT doc_id,
                   (('0x' || substring(md5('42|' ||
                        CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1.0)
                   / 1152921504606846976.0 AS u
                  FROM '{sf_dir}/documents.parquet')""").fetchall())
        assert got == want and len(got) > 0
        # pure function of (key, seed): identical under repartitioning
        # (randomSplit, the thing this replaces, is not)
        rep = {r.doc_id: r.split for r in sampling.hash_split(
            d.repartition(7), self.FR).select("doc_id", "split")
            .collect()}
        assert rep == got
        from collections import Counter
        c = Counter(got.values())
        n = len(got)
        assert abs(c["train"] / n - 0.5) < 0.08
        assert abs((c["val"] + c["test"]) / n - 0.5) < 0.08

    def test_equal_keys_same_split_and_zero_shuffle(self, spark):
        from physioview_spark.llm import sampling
        df = spark.range(2000).selectExpr(
            "id as doc_id", "id % 100 as grp")
        out = sampling.hash_split(df, self.FR, key_col="grp")
        assert (out.groupBy("grp")
                .agg(F.count_distinct("split").alias("k"))
                .where(F.col("k") > 1).count()) == 0
        plan = sampling.hash_split(df, self.FR) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure projection

    def test_validation(self, spark):
        from physioview_spark.llm import sampling
        df = spark.range(1).selectExpr("id as doc_id")
        with pytest.raises(ValueError):
            sampling.hash_split(df, {})
        with pytest.raises(ValueError):
            sampling.hash_split(df, {"a": 0.5, "b": 0.6})
        with pytest.raises(ValueError):
            sampling.hash_split(df, {"a": 1.5, "b": -0.5})

    def test_leakage_safe_no_straddled_pairs(self, spark, docs):
        """The guard's whole point: every near-dup pair lands on one
        side. The plain doc-id split DOES straddle a pair on this
        fixture (asserted, so the test would catch a vacuous guard)."""
        from physioview_spark.llm import dedup, sampling
        pairs = dedup.minhash_lsh_candidates(
            docs, k=3, num_hashes=8, band_size=2)
        assert pairs.count() > 0
        clusters = dedup.cluster_decisions(pairs, docs)
        fr = {"train": 0.5, "val": 0.5}

        def straddled(split_df):
            sp = split_df.select("doc_id", "split")
            a = sp.selectExpr("doc_id as id_a", "split as sa")
            b = sp.selectExpr("doc_id as id_b", "split as sb")
            return (pairs.join(a, "id_a").join(b, "id_b")
                    .where(F.col("sa") != F.col("sb")).count())

        assert straddled(sampling.leakage_safe_split(
            docs, fr, clusters=clusters)) == 0
        # seed 3: doc 0 and its near-copies 1/3 hash apart by doc id
        assert straddled(sampling.hash_split(docs, fr, seed=3)) > 0
        # df already carrying the cluster column (clusters=None path)
        carried = docs.join(
            clusters.select("doc_id", "cluster_id"), "doc_id")
        assert straddled(sampling.leakage_safe_split(
            carried, fr, clusters=None)) == 0
        # split assignment equals hashing the cluster id directly
        direct = {r.doc_id: r.split for r in sampling.hash_split(
            carried.withColumn(
                "__k", F.col("cluster_id").cast("string")),
            fr, key_col="__k").select("doc_id", "split").collect()}
        viaop = {r.doc_id: r.split for r in sampling.leakage_safe_split(
            docs, fr, clusters=clusters).select("doc_id", "split")
            .collect()}
        assert direct == viaop
