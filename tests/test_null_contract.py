"""Pins for the r18 TOKEN CONTRACT (llm/text.py module docstring) and
STRATUM CONTRACT (llm/sampling.py module docstring).

The r17 null-heavy hostile axis found 12 engine/oracle divergences all
rooted in undefined NULL/empty-text token semantics (VERDICT r17 item
1). The contract is now defined once; these tests pin each tier on the
exact degenerate inputs the sf corpora never contain — so a future edit
that forks the semantics fails HERE, not at the next hostile sweep.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from physioview_spark.llm import sampling, text


@pytest.fixture(scope="module")
def docs(spark):
    """Four-class corpus: normal, empty, whitespace-only, NULL text —
    plus a NULL-lang row for the stratum contract."""
    return spark.createDataFrame(
        [
            (0, "the cat sat on the mat", "en"),
            (1, "", "en"),
            (2, "   ", "de"),
            (3, None, "de"),
            (4, "ein hund und eine katze", None),
        ],
        "doc_id long, text string, lang string",
    )


class TestTokensTier1:
    """tokens(): NULL -> NULL array; empty/whitespace-only -> []."""

    def test_tokens_edge_inputs(self, docs):
        rows = {
            r["doc_id"]: r["t"]
            for r in docs.select(
                "doc_id", text.tokens("text").alias("t")).collect()
        }
        assert rows[0] == ["the", "cat", "sat", "on", "the", "mat"]
        assert rows[1] == []
        assert rows[2] == []
        assert rows[3] is None


class TestCountsTier2:
    """Counts keep every doc row; NULL text counts 0."""

    def test_token_count_clamps(self, docs):
        rows = {
            r["doc_id"]: r["n_tokens"]
            for r in text.token_count(docs).collect()
        }
        assert rows == {0: 6, 1: 0, 2: 0, 3: 0, 4: 5}

    def test_bpe_token_count_clamps(self, docs):
        rows = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in text.bpe_token_count(docs).collect()
        }
        assert rows[1] == 0 and rows[2] == 0 and rows[3] == 0
        assert rows[0] > 0

    def test_pack_sequences_keeps_degenerate_rows_at_zero(self, docs):
        out = sampling.pack_sequences(docs, ctx_len=8, n_shards=1,
                                      seed=42).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert set(by_id) == {0, 1, 2, 3, 4}  # every doc keeps its row
        assert {by_id[i]["n_tokens"] for i in (1, 2, 3)} == {0}
        # zero-token docs cannot advance the running offset
        total = sum(r["n_tokens"] for r in out)
        assert total == 11

    def test_token_budget_exact_keeps_zero_cost_rows(self, docs):
        out = sampling.token_budget_sample(
            docs, ["lang"], budget_tokens=100, seed=42).collect()
        ids = {r["doc_id"] for r in out}
        # NULL-lang doc 4 excluded (stratum contract); the zero-token
        # docs 1-3 are kept at zero budget cost
        assert ids == {0, 1, 2, 3}
        assert all(r["n_tokens"] == 0 for r in out
                   if r["doc_id"] in (1, 2, 3))


class TestDerivedFramesTier3:
    """Token-derived exploded frames: NULL text contributes no rows."""

    def test_chunks_drop_null_keep_empty(self, docs):
        out = text.token_chunks(docs, chunk_size=4, stride=3).collect()
        ids = {r["doc_id"] for r in out}
        assert 3 not in ids            # NULL doc: no chunk rows
        empty = [r for r in out if r["doc_id"] == 1]
        assert len(empty) == 1         # empty doc: one empty chunk
        assert empty[0]["chunk_tokens"] == 0
        assert empty[0]["chunk_text"] == ""

    def test_repetition_drops_null_docs(self, docs):
        ids = {r["doc_id"]
               for r in text.repetition_stats(docs).collect()}
        assert ids == {0, 1, 2, 4}


class TestHashingTier4:
    """Dedup tier: empty docs collapse to ONE whole-text ('') gram so
    they stay representable and cluster with each other."""

    def test_word_shingles_whole_text_fallback(self, docs):
        rows = {
            r["doc_id"]: r["sh"]
            for r in docs.select(
                "doc_id",
                text.word_shingles("text", 3).alias("sh")).collect()
        }
        assert rows[1] == [""] and rows[2] == [""]
        assert rows[3] is None
        assert len(rows[0]) == 4       # 6 tokens -> 4 trigram shingles

    def test_simhash_empty_docs_share_signature(self, docs):
        from physioview_spark.llm import dedup

        sigs = {r["doc_id"]: r["simhash"]
                for r in dedup.simhash(docs).collect()}
        assert 3 not in sigs           # NULL text: no signature row
        assert sigs[1] == sigs[2]      # empty docs are mutual dups


class TestQualityTier5:
    """Quality metrics NULL on NULL/empty text."""

    METRICS = ["mean_word_len", "punct_ratio", "digit_ratio",
               "stopword_ratio", "quality_score"]

    def test_metrics_null_on_degenerate(self, docs):
        rows = {r["doc_id"]: r
                for r in text.quality_score(docs).collect()}
        for i in (1, 2, 3):
            for m in self.METRICS:
                assert rows[i][m] is None, (i, m)
        for m in self.METRICS:
            assert rows[0][m] is not None, m
        # counts stay factual/clamped, not gated
        assert rows[1]["n_tokens"] == 0 and rows[1]["n_chars_calc"] == 0
        assert rows[3]["n_tokens"] == 0
        assert rows[3]["n_chars_calc"] is None


class TestSeedCodebook:
    """ADVICE r17 items 1+4: the vector-family seed codebook filters
    NULL embeddings, raises on a rows-but-no-seed-ids slice, and sizes
    its empty-corpus dummy to the real 64 dims."""

    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_null_seed_embeddings_excluded(self, spark):
        from physioview_spark.plans.queries_llm import _seed_codebook

        emb = self._emb(spark, [
            (0, None), (2, [1.0, 2.0]), (4, [3.0, 4.0]), (6, None)])
        assert _seed_codebook(emb) == [[1.0, 2.0], [3.0, 4.0]]

    def test_seedless_nonempty_corpus_raises(self, spark):
        from physioview_spark.plans.queries_llm import _seed_codebook

        emb = self._emb(spark, [(17, [1.0, 2.0]), (19, [3.0, 4.0])])
        with pytest.raises(ValueError, match="none at the seed ids"):
            _seed_codebook(emb)

    def test_empty_corpus_dummy_is_64_dim(self, spark):
        from physioview_spark.plans.queries_llm import _seed_codebook

        emb = self._emb(spark, []).where(F.lit(False))
        out = _seed_codebook(emb)
        assert len(out) == 1 and len(out[0]) == 64
        # all-NULL embeddings count as an empty corpus too
        emb2 = self._emb(spark, [(0, None), (2, None)])
        assert _seed_codebook(emb2) == out


class TestStratumContract:
    """NULL strata are excluded from every stratum-keyed sampler."""

    def test_stratified_excludes_null_stratum(self, docs):
        out = sampling.stratified_sample(docs, ["lang"], quota=10,
                                         seed=42).collect()
        assert {r["doc_id"] for r in out} == {0, 1, 2, 3}

    def test_weighted_excludes_null_stratum(self, docs):
        weighted = docs.withColumn(
            "w", F.lit(1.0) + F.col("doc_id"))
        out = sampling.weighted_sample(
            weighted, "w", quota=10, strata_cols=["lang"],
            seed=42).collect()
        assert {r["doc_id"] for r in out} == {0, 1, 2, 3}

    def test_budget_rate_excludes_null_stratum(self, docs):
        out = sampling.token_budget_sample(
            docs, ["lang"], budget_tokens=100, seed=42,
            mode="rate").collect()
        assert all(r["lang"] is not None for r in out)
