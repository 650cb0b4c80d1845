r"""Unicode/hostile-whitespace axis pins (r18, token-contract tiers 0/6).

The r18 probe of Spark-vs-DuckDB string semantics found exactly two
cross-engine divergence classes on hostile text:

1. The ``\s`` SHORTHAND: Java's (non-UNICODE_CHARACTER_CLASS) ``\s``
   matches ``[ \t\n\x0B\f\r]``; RE2's matches ``[ \t\n\f\r]`` — no
   vertical tab. Any document containing \x0B (routine in HTML/crawl
   text) tokenized differently in the engine and the oracle. The fix
   is contract tier 0: BOTH engines spell the class out (TOKEN_WS);
   neither may write ``\s``.
2. CONTEXTUAL/FULL case mappings: Java lowercases U+0130 to
   'i' + COMBINING DOT ABOVE and word-final capital sigma to U+03C2;
   utf8proc (DuckDB) applies the simple per-codepoint mapping. This is
   platform-divergent by construction — contract tier 6 pins the
   ENGINE's (Java's) behavior here and excludes those code points from
   oracle-parity corpora.

Everything else agrees and is pinned below as the contract's verified
classes: code-point (not code-unit, not byte) semantics for length/
split('')/substring even on supplementary-plane emoji; NBSP/ZWJ are
NOT token whitespace; combining marks count as their own characters.

The /tmp/pv_unicode corpus (tools/make_axis_corpora.py) drives the
same facts through all 101 declared queries against DuckDB oracles.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from physioview_spark.llm import dedup, text
from physioview_spark.llm.bpe import _split_like_tokens

EMOJI = "\U0001F600"          # 😀 — supplementary plane, surrogate pair
NBSP = " "
ZWJ = "‍"
COMB = "́"               # combining acute


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "plain ascii text"),
            (1, f"a{EMOJI}b 漢字 ok"),              # CJK + emoji
            (2, f"x{NBSP}y a{ZWJ}b e{COMB}e{COMB}"),  # NBSP/ZWJ/combining
            (3, "\tfoo\x0bbar\t"),                  # vtab + tab padding
            (4, "\t\x0b \f\r"),                     # whitespace-only
            (5, ""),
            (6, None),
            (7, "l1\r\nl2"),                        # CRLF
        ],
        "doc_id long, text string",
    )


class TestTier0Whitespace:
    def test_vtab_and_tab_padding_tokenize_clean(self, docs):
        rows = {r["doc_id"]: r["t"] for r in docs.select(
            "doc_id", text.tokens("text").alias("t")).collect()}
        assert rows[3] == ["foo", "bar"]       # \x0B splits, no phantoms
        assert rows[4] == []                   # tokenless non-empty
        assert rows[5] == []
        assert rows[6] is None

    def test_unicode_spaces_are_not_token_whitespace(self, docs):
        rows = {r["doc_id"]: r["t"] for r in docs.select(
            "doc_id", text.tokens("text").alias("t")).collect()}
        assert rows[2] == [f"x{NBSP}y", f"a{ZWJ}b", f"e{COMB}e{COMB}"]

    def test_engine_matches_bpe_python_twin(self, docs):
        # training (Spark tokens) and encoding (_split_like_tokens)
        # must segment identically — including on hostile whitespace
        for r in docs.select("text", text.tokens("text").alias("t")) \
                     .collect():
            if r["text"] is None:
                assert r["t"] is None
            else:
                assert r["t"] == _split_like_tokens(r["text"])

    def test_bpe_pretokenizer_vtab_is_whitespace_not_punct(self, spark):
        df = spark.createDataFrame([("x\x0by",), ("a.b",)], "text string")
        out = {r["text"]: r["n_bpe_tokens"]
               for r in text.bpe_token_count(df).collect()}
        assert out["x\x0by"] == 2   # not 3: \x0B is whitespace, no punct run
        assert out["a.b"] == 3


class TestTier5TokenlessQuality:
    def test_whitespace_only_doc_has_null_metrics(self, docs):
        row = {r["doc_id"]: r for r in text.quality_score(docs).collect()}[4]
        assert row["n_tokens"] == 0
        assert row["n_chars_calc"] == 5
        for c in ("mean_word_len", "punct_ratio", "digit_ratio",
                  "stopword_ratio", "quality_score"):
            assert row[c] is None, c


class TestTier4SimhashCollapse:
    def test_tokenless_docs_share_a_signature(self, docs):
        sig = {r["doc_id"]: r["simhash"]
               for r in dedup.simhash(docs).collect()}
        assert 6 not in sig                      # NULL text drops out
        assert sig[4] == sig[5]                  # tokenless == empty: dups
        assert sig[0] != sig[4]


class TestCodePointSemantics:
    def test_char_entropy_counts_code_points(self, spark):
        df = spark.createDataFrame(
            [(0, f"a{EMOJI}b"), (1, f"e{COMB}e{COMB}")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in text.char_entropy(df).collect()}
        assert rows[0]["n_chars"] == 3           # not 4 UTF-16 units
        assert rows[0]["n_distinct_chars"] == 3
        assert rows[1]["n_chars"] == 4           # combining mark = own char
        assert rows[1]["n_distinct_chars"] == 2

    def test_crlf_lines(self, docs):
        out = text.strip_boilerplate_lines(
            docs.where(F.col("doc_id") == 7)).collect()
        # '\n'-split: the \r stays attached to its line on both engines
        assert out[0]["n_lines"] == 2
        assert "\r" in out[0]["text_clean"]


class TestTier6CaseFoldBoundary:
    """The engine's (Java's) full case mapping IS the contract; these
    code points are excluded from oracle-parity corpora because
    utf8proc maps them differently (simple mapping)."""

    def test_java_full_case_mapping_pinned(self, spark):
        df = spark.createDataFrame(
            [("İstanbul",), ("ΣΣ",)], "t string")
        out = {r["t"]: r["l"] for r in
               df.select("t", F.lower("t").alias("l")).collect()}
        assert out["İstanbul"] == "i̇stanbul"  # İ -> i + dot
        assert out["ΣΣ"] == "σς"     # final sigma
