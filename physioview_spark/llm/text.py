"""Text-analysis operators for training-data pipelines.

All JVM-side (built-in pyspark.sql.functions, whole-stage codegen): token
counting, quality scoring, n-gram language ID, document fingerprinting.
Designed so every expression has an exact ANSI-SQL twin for the DuckDB
oracle (same regexes, same tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword inventories for the heuristic language ID.
# Deliberately small + common so the heuristic is cheap and deterministic.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "por"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "de", "et", "est", "une", "pour"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text (empty text -> empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(df: DataFrame, text_col: str = "text",
                out_col: str = "n_tokens") -> DataFrame:
    return df.withColumn(out_col, F.size(tokens(text_col)).cast("long"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    heuristics + a composite [0,1] quality score."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tok = F.size(tokens(text_col)).cast("long")
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    sw = LANG_STOPWORDS["en"]
    n_stop = F.size(
        F.filter(tokens(text_col), lambda w: F.lower(w).isin(sw))
    ).cast("long")
    safe = lambda num, den: num / F.nullif(den, F.lit(0))  # noqa: E731
    df = (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("mean_word_len", F.round(safe(n_alpha, n_tok), 4))
        .withColumn("punct_ratio", F.round(safe(n_punct, n_chars), 4))
        .withColumn("digit_ratio", F.round(safe(n_digit, n_chars), 4))
        .withColumn("stopword_ratio", F.round(safe(n_stop, n_tok), 4))
    )
    score = (
        F.least(safe(F.col("n_tokens"), F.lit(50.0)), F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) * 0.15
        + (1.0 - F.least(F.col("digit_ratio") * 5.0, F.lit(1.0))) * 0.15
    )
    return df.withColumn("quality_score", F.round(score, 4))


def detect_language(df: DataFrame, text_col: str = "text",
                    out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID; ties break to the alphabetically first
    language (deterministic, oracle-reproducible)."""
    toks = F.transform(tokens(text_col), lambda w: F.lower(w))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in LANG_STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.withColumn(out_col, pred)


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles as strings ('w1 w2 w3'); fewer than k words -> the
    whole text as one shingle."""
    toks = tokens(col)
    n = F.size(toks)
    joined = F.array_join(toks, " ")
    idx = F.sequence(F.lit(0), n - k)
    mk = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
    )
    return F.when(n <= k, F.array(joined)).otherwise(mk)


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 3,
                out_col: str = "fingerprint") -> DataFrame:
    """Order-invariant document fingerprint: lexicographic min of the md5s
    of the k-word shingles (a 1-permutation MinHash)."""
    sh = word_shingles(text_col, k)
    return df.withColumn(
        out_col, F.array_min(F.transform(sh, lambda s: F.md5(s)))
    )


# GPT-2-style pretokenizer pattern (public pattern family: optional space
# + word | number | punctuation run) — no lookaheads, works in both
# Spark's and DuckDB's regex engines.
BPE_PRETOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(df: DataFrame, text_col: str = "text",
                    out_col: str = "n_bpe_tokens") -> DataFrame:
    """BPE-ish token counting: pretokenize with the word/number/punct
    regex, then charge ceil(len/4) subword tokens per long word (the
    classic ~4-chars-per-token heuristic) and 1 per number/punct run.
    JVM-side `regexp_extract_all` + array math, exact SQL twin."""
    pieces = F.regexp_extract_all(F.col(text_col),
                                  F.lit(BPE_PRETOKEN_PATTERN), 0)
    per_piece = F.transform(
        pieces,
        lambda p: F.when(p.rlike("^[A-Za-z]+$"),
                         F.ceil(F.length(p) / 4.0))
        .otherwise(F.lit(1)).cast("long"),
    )
    return df.withColumn(
        out_col,
        F.coalesce(F.aggregate(per_piece, F.lit(0).cast("long"),
                               lambda acc, v: acc + v), F.lit(0)))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash winnowing fingerprints (Schleimer/Wilkerson/Aiken
    MOSS scheme): hash every k-char gram of the lowercased text, slide a
    ``window``-gram window, keep each window's minimum hash — the
    selected set is the document's fingerprint sketch.

    Relational throughout: positions via ``sequence`` + ``transform``,
    the k-gram hash is the first 8 hex chars of md5 (engine-portable),
    window minima via one more ``transform`` + ``slice``/``array_min``,
    then ``explode`` + ``distinct``. Matching fingerprints across docs
    indicate shared substrings (plagiarism/near-dup detection at scale).
    """
    t = F.lower(F.col(text_col))
    n = F.length(t)
    n_grams = F.greatest(n - k + 1, F.lit(0))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.substring(F.md5(F.substring(t, i, k)), 1, 8),
    )
    n_windows = F.greatest(F.size(hashes) - window + 1, F.lit(0))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda w: F.array_min(F.slice(hashes, w, window)),
    )
    out = df.select(
        id_col,
        F.explode(
            F.when(n_grams <= 0, F.array().cast("array<string>"))
            .when(F.size(hashes) < window, F.array(F.array_min(hashes)))
            .otherwise(mins)
        ).alias("fp"),
    )
    return out.distinct()
