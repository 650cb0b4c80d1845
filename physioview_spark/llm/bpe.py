"""Byte-pair-encoding tokenizer: distributed corpus statistics, bounded
driver-side merge training, distributed application.

The training split follows how production tokenizers are actually
built (HF tokenizers, SentencePiece): the CORPUS-sized work — word
frequency aggregation — is distributed (one explode + one map-side
combined count), and the merge loop runs on the bounded word-frequency
table that survives ``max_word_types`` (the IVF-codebook pattern:
a deliberately bounded driver collect, not a corpus collect; 30k word
types x ~20 B is sub-MB). Application is the reverse: the learned merge
list broadcasts to executors and encodes arbitrarily many documents in
Arrow-batched pandas UDFs with a per-batch word cache — each distinct
word is encoded once per batch regardless of its frequency, so the hot
path cost is bounded by the batch VOCABULARY, not its token count.

No counterpart in the reference (physioview is a physiological-signal
engine); this rounds out the training-data suite's tokenizer-sizing
precursor (text.vocabulary_topk) into an actual tokenizer.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from physioview_spark.llm.text import tokens

END = "</w>"

# Python-side twin of text.tokens(): Python's str.split()/\s are
# Unicode-aware — a U+00A0 non-breaking space (ubiquitous in
# HTML-derived crawl text) would make the encoder split words the
# frequency aggregate counted as one type. Training and encoding must
# segment identically, so the encoder splits on exactly the contract's
# TOKEN_WS class and drops phantom '' entries — as of r18 this is
# character-for-character the same definition tokens() itself uses
# (llm/text.py contract tier 0), not merely an equivalent one.
_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _split_like_tokens(text: str) -> list[str]:
    return [w for w in _ASCII_WS.split(text) if w]


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_word_types: int = 30000,
    lowercase: bool = True,
) -> list[tuple[str, int]]:
    """Distributed word-frequency table, bounded to the
    ``max_word_types`` most frequent types (ties broken on the word so
    the collect is deterministic), as driver-side (word, freq) pairs.

    The aggregate is map-side combinable and the bound applies via
    TakeOrderedAndProject — the full vocabulary never crosses a single
    partition, and only the bounded head reaches the driver.
    """
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    rows = (
        df.select(F.explode(tokens(col)).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(int(max_word_types))
        .collect()
    )
    return [(r["word"], r["freq"]) for r in rows]


def train_bpe(
    df: DataFrame,
    num_merges: int = 1000,
    text_col: str = "text",
    max_word_types: int = 30000,
    min_pair_freq: int = 2,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn a BPE merge list (Sennrich et al. 2016) from the corpus.

    Returns up to ``num_merges`` merges ``(left, right)`` in learned
    order. Words are character sequences with a ``</w>`` end marker;
    each step merges the most frequent adjacent symbol pair, ties
    broken lexicographically on the pair so training is deterministic
    for a given frequency table (and the frequency table itself is
    deterministic, see :func:`word_frequencies`). Stops early when no
    pair reaches ``min_pair_freq``.

    The loop is driver-side ON PURPOSE: its input is the bounded
    word-type table, so cost is O(max_word_types * avg_word_len) per
    merge — independent of corpus size. The corpus-sized pass is the
    distributed frequency aggregate.
    """
    vocab = {}
    for word, freq in word_frequencies(df, text_col, max_word_types,
                                       lowercase):
        vocab[tuple(word) + (END,)] = freq

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pairs: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        merged = a + b
        out = {}
        for syms, freq in vocab.items():
            res, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out[tuple(res)] = out.get(tuple(res), 0) + freq
        vocab = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a merge-rank table (lowest rank first —
    identical to applying the merges in learned order)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Distributed BPE encoding: adds ``out_col`` (array<string> of
    subword tokens, ``</w>``-terminated per word) to each document.

    The merge list rides the closure (broadcast by Spark with the
    task binary — a few hundred KB at vocab scale); encoding runs in
    an Arrow-batched pandas UDF with a per-batch word→tokens cache, so
    per-batch cost is bounded by the batch's distinct-word count, not
    its length. No shuffle: one projection over the scan.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_doc(t):
            if t is None:
                return []
            if lowercase:
                t = t.lower()
            res = []
            for w in _split_like_tokens(t):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                res.extend(got)
            return res

        return texts.map(enc_doc)

    return df.withColumn(out_col, _encode(F.col(text_col)))
