r"""Text-analysis operators for training-data pipelines.

All JVM-side (built-in pyspark.sql.functions, whole-stage codegen): token
counting, quality scoring, n-gram language ID, document fingerprinting.
Designed so every expression has an exact ANSI-SQL twin for the DuckDB
oracle (same regexes, same tie-breaks).

TOKEN CONTRACT (r18 — the NULL/empty-text semantics, defined ONCE here;
every operator and every DuckDB oracle in plans/queries_llm.py follows
it, and tests/test_null_contract.py + tests/test_unicode_axis.py pin
it):

0. TOKEN WHITESPACE is the explicit ASCII class ``[ \t\n\x0B\f\r]``
   (exactly Java's non-Unicode ``\s``, the class llm/bpe.py documented
   first). It is spelled out — never ``\s`` — in BOTH engines, because
   the shorthand diverges: Java's ``\s`` includes vertical tab \x0B,
   DuckDB/RE2's does not, so a ``\s``-split engine and a ``\s``-split
   oracle disagree on any document containing \x0B (routine in
   HTML/crawl-derived corpora). Unicode spaces (U+00A0 NBSP, U+2007,
   ZWJ, ...) are NOT token whitespace on either engine — a
   NBSP-joined pair is one token by contract.
1. :func:`tokens`: NULL text -> NULL array; empty or whitespace-only
   text -> empty array (0 tokens); leading/trailing/repeated
   whitespace never yields empty-string tokens. The exact DuckDB twin
   is ``list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
   x -> x <> '')`` (the raw split yields phantom '' entries for
   empty/padded text — 1 phantom token for '' — which is the
   divergence class this contract removes; pre-r18 the engine trimmed
   first, but trim() is SPACE-only on both engines, so tab/newline
   padding still produced phantom '' tokens on both sides).
2. Token COUNTS (token_count, bpe_token_count, and the n_tokens columns
   of the samplers/packers in llm/sampling.py): every document keeps
   its row; NULL text counts as 0 tokens (SQL:
   ``COALESCE(len(<tokens>), 0)``). A doc with no countable text
   contributes zero token mass but is never silently dropped from a
   budget/packing/sampling frame.
3. Token-DERIVED exploded frames (shingles, minhash signatures,
   vocabulary, TF-IDF, trigram occurrences, repetition grams, token
   chunks, passages, materialized token grids): NULL text contributes
   NO rows (exploding the NULL token array is empty on both engines).
4. HASHING/dedup tier (:func:`word_shingles`, and simhash's inline
   split in llm/dedup.py): a non-NULL document with fewer tokens than
   the gram size — including 0 — collapses to ONE whole-text gram
   (the empty string for empty text), so empty documents stay
   representable in dedup frames and cluster with each other (they ARE
   exact duplicates of one another).
5. QUALITY metrics (:func:`quality_score`'s mean_word_len, punct_ratio,
   digit_ratio, stopword_ratio, quality_score): NULL on TOKENLESS text
   (NULL, empty, or whitespace-only — n_tokens = 0 is the gate, on
   both engines) — a document with no prose has no prose quality.
   Consumers that need a total ordering coalesce explicitly
   (stratified_sample's bucket 0, score_linear's nulls-read-as-0
   features).
6. CASE FOLDING (the ``lower()`` used by stopword matching, vocab/
   TF-IDF/trigram keys, fingerprints) is each platform's Unicode
   lowercase. The two platforms agree on every 1:1 context-free
   mapping (ASCII, Latin-1, Greek non-final, Cyrillic, CJK no-ops —
   pinned by tests/test_unicode_axis.py), and differ only on full/
   contextual case mappings (U+0130 Turkish İ, final-form sigma):
   Java applies the full mapping (İ -> i + combining dot, Σ -> ς
   word-finally), utf8proc the simple one (İ -> i, Σ -> σ always).
   That boundary is platform-divergent by construction and excluded
   from oracle-parity corpora; the engine's (Java's) behavior is the
   contract and is pinned engine-side.
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


# Token whitespace, spelled explicitly (contract tier 0): Java's \s and
# RE2's \s disagree on \x0B, so neither engine may use the shorthand.
TOKEN_WS = "[ \t\n\x0B\f\r]+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (contract tiers 0-1): split on the
    explicit ASCII class, drop phantom '' entries from leading/trailing
    whitespace. NULL text -> NULL; empty/whitespace-only -> []."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, TOKEN_WS), lambda w: w != "")


def token_count(df: DataFrame, text_col: str = "text",
                out_col: str = "n_tokens") -> DataFrame:
    # Clamp: F.size on a NULL text's (null) token array yields -1 under
    # legacy spark.sql.legacy.sizeOfNull=true and NULL under the modern
    # default; greatest() covers BOTH because it skips NULL operands
    # (greatest(NULL, 0) = 0) and lifts -1 to 0. Without the clamp the
    # legacy -1 would SUM into domain token masses (temperature_weights)
    # and the modern NULL would diverge from a SQL oracle's CASE-NULL
    # exclusion. 0 tokens for NULL text keeps both sides identical
    # (same convention as pack_sequences / materialize_packed).
    return df.withColumn(
        out_col,
        F.greatest(F.size(tokens(text_col)), F.lit(0)).cast("long"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    heuristics + a composite [0,1] quality score.

    Token contract tiers 2 and 5 (module docstring): ``n_chars_calc``
    is the factual length (NULL for NULL text), ``n_tokens`` is the
    clamped count (0 for NULL/empty), and every METRIC column —
    mean_word_len, punct_ratio, digit_ratio, stopword_ratio,
    quality_score — is NULL on TOKENLESS text (n_tokens = 0: NULL,
    empty, or whitespace-only). Pre-r18, Spark's null-skipping
    ``least`` silently scored an empty doc 0.3 (the NULL stopword term
    collapsed to its 1.0 cap) — a nonsense number the contract
    replaces with an honest NULL."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tok = F.coalesce(F.size(tokens(text_col)), F.lit(0)).cast("long")
    degenerate = n_tok == 0  # NULL text coalesces to 0 -> gated too
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    sw = LANG_STOPWORDS["en"]
    n_stop = F.size(
        F.filter(tokens(text_col), lambda w: F.lower(w).isin(sw))
    ).cast("long")
    safe = lambda num, den: num / F.nullif(den, F.lit(0))  # noqa: E731
    gated = lambda c: F.when(~degenerate, c)  # noqa: E731
    df = (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("mean_word_len",
                    gated(F.round(safe(n_alpha, n_tok), 4)))
        .withColumn("punct_ratio",
                    gated(F.round(safe(n_punct, n_chars), 4)))
        .withColumn("digit_ratio",
                    gated(F.round(safe(n_digit, n_chars), 4)))
        .withColumn("stopword_ratio",
                    gated(F.round(safe(n_stop, n_tok), 4)))
    )
    score = (
        F.least(safe(F.col("n_tokens"), F.lit(50.0)), F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) * 0.15
        + (1.0 - F.least(F.col("digit_ratio") * 5.0, F.lit(1.0))) * 0.15
    )
    return df.withColumn("quality_score", gated(F.round(score, 4)))


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


def word_shingles_of(toks: Column, k: int = 3) -> Column:
    """k-word shingles from an ALREADY-MATERIALIZED token-array column.

    Frame-level callers must project :func:`tokens` into a column first
    and pass the attribute: the per-position lambda below references
    ``toks``, and interpreted higher-order functions have NO
    subexpression elimination — passing the raw ``tokens()`` expression
    re-tokenizes the whole text once per shingle position (measured
    8.5x on shingle_frame: 3.08 s -> 0.36 s at sf0.1, r18)."""
    n = F.size(toks)
    joined = F.array_join(toks, " ")
    idx = F.sequence(F.lit(0), n - k)
    mk = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
    )
    return F.when(n <= k, F.array(joined)).otherwise(mk)


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles as strings ('w1 w2 w3'); fewer than k words -> the
    whole text as one shingle. Column-expression form — prefer
    :func:`word_shingles_of` over a materialized token column at frame
    level (see its docstring for the re-tokenization hazard)."""
    return word_shingles_of(tokens(col), k)


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 3,
                out_col: str = "fingerprint") -> DataFrame:
    """Order-invariant document fingerprint: lexicographic min of the md5s
    of the k-word shingles (a 1-permutation MinHash)."""
    # token array materialized so the shingle lambda reads a field, not
    # a re-tokenization (see word_shingles_of)
    return (
        df.withColumn("__fp_toks", tokens(text_col))
        .withColumn(
            out_col,
            F.array_min(F.transform(
                word_shingles_of(F.col("__fp_toks"), k),
                lambda s: F.md5(s))),
        )
        .drop("__fp_toks")
    )


# GPT-2-style pretokenizer pattern (public pattern family: optional space
# + word | number | punctuation run) — no lookaheads, works in both
# Spark's and DuckDB's regex engines. The whitespace exclusion is the
# explicit TOKEN_WS class, not \s (contract tier 0): under Java's \s a
# vertical tab is whitespace (no punct run), under RE2's it is not (a
# 1-token punct run) — the explicit class makes both engines agree.
BPE_PRETOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]+"


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
    # Two-step materialization: the lowered text and the gram-hash
    # array become COLUMNS before any lambda references them —
    # interpreted HOFs have no subexpression elimination, so the
    # original single-expression form re-lowered the whole text per
    # gram and re-hashed the whole gram array per window position
    # (O(len^2) per doc; measured 12.8 s -> ~1 s at sf0.1, r18).
    lowered = (
        df.select(id_col, F.lower(F.col(text_col)).alias("__t"))
    )
    t = F.col("__t")
    n = F.length(t)
    n_grams = F.greatest(n - k + 1, F.lit(0))
    hashed = lowered.select(
        id_col,
        n_grams.alias("__ng"),
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.substring(F.md5(F.substring(t, i, k)), 1, 8),
        ).alias("__hashes"),
    )
    hashes = F.col("__hashes")
    n_windows = F.greatest(F.size(hashes) - window + 1, F.lit(0))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda w: F.array_min(F.slice(hashes, w, window)),
    )
    out = hashed.select(
        id_col,
        F.explode(
            F.when(F.col("__ng") <= 0, F.array().cast("array<string>"))
            .when(F.size(hashes) < window, F.array(F.array_min(hashes)))
            .otherwise(mins)
        ).alias("fp"),
    )
    return out.distinct()


# --- repetition / chunking / PII -------------------------------------------

#: Conservative, RE2-and-Java-compatible patterns so the DuckDB oracle can
#: run the identical regexes (no lookaround, no backrefs).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``top_2gram_frac``: occurrences of the most frequent word 2-gram
      over total 2-grams (boilerplate/listicle detector).
    - ``dup_3gram_frac``: fraction of 3-gram occurrences that are
      repeats, ``(total - distinct) / total`` (internal copy-paste).

    Shape: two explode + partial-aggregable groupBys keyed by the doc id
    — linear, map-side combinable, no self-joins. Short texts (fewer
    tokens than the gram size) collapse to one whole-text gram, giving
    frac 1.0 / 0.0 — filter on ``n_tokens`` first if that matters."""
    # token array materialized once; the per-position shingle lambdas
    # read the field instead of re-tokenizing (see word_shingles_of)
    toks = df.select(id_col, tokens(text_col).alias("__rep_toks"))
    g2 = toks.select(
        id_col,
        F.explode(word_shingles_of(F.col("__rep_toks"), 2)).alias("g"),
    ).groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    s2 = g2.groupBy(id_col).agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_2gram_frac")
    )
    g3 = toks.select(
        id_col,
        F.explode(word_shingles_of(F.col("__rep_toks"), 3)).alias("g"),
    ).groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    s3 = g3.groupBy(id_col).agg(
        F.round(
            (F.sum("c") - F.count(F.lit(1))) / F.sum("c"), 6
        ).alias("dup_3gram_frac")
    )
    return s2.join(s3, id_col)


def token_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap
    (``stride < chunk_size``) — the context-window packing precursor.
    1-to-N explode, no shuffle at all: chunk boundaries are computed from
    the token array in place, so this pipelines into whatever follows.

    Output: ``(id, chunk_id, chunk_text, chunk_tokens)``; the last chunk
    may be short; a document shorter than ``chunk_size`` yields exactly
    one chunk."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_size)) / F.lit(float(stride))) + 1
    )
    base = df.select(
        id_col, toks.alias("__toks"), n_chunks.alias("__nc")
    ).select(
        id_col,
        "__toks",
        F.explode(F.sequence(F.lit(0).cast("long"),
                             F.col("__nc").cast("long") - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("__toks"), (F.col("chunk_id") * stride + 1).cast("int"),
        chunk_size,
    )
    return base.select(
        id_col,
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("chunk_tokens"),
    )


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str | None = None,
    out_col: str = "text_scrubbed",
) -> DataFrame:
    """Redact emails / NANP phones / IPv4 addresses with typed tags and
    count what was removed. Pure JVM regex (whole-stage codegen) — no
    Python in the path. Patterns are deliberately RE2-compatible so the
    oracle runs them verbatim; swap in stricter ones per deployment."""
    t = F.col(text_col)
    counts = {
        "n_emails": PII_EMAIL, "n_phones": PII_PHONE, "n_ips": PII_IPV4,
    }
    for name, pat in counts.items():
        df = df.withColumn(
            name,
            F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("long"),
        )
    scrubbed = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, PII_PHONE, "<PHONE>")
    scrubbed = F.regexp_replace(scrubbed, PII_IPV4, "<IP>")
    return df.withColumn(out_col, scrubbed)


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy (bits/char) of the character
    distribution — the curation signal that catches gibberish, encoded
    blobs, and single-char floods that token-level heuristics miss
    (natural prose runs ~4-4.5 bits/char; base64 ~6; "aaaa..." ~0).

    Relational form: explode to (doc, char) counts, then
    ``log2(N) - sum(c*log2(c))/N`` from exact integer counts. Both
    group-bys partial-aggregate map-side, and the first shuffle carries
    at most (docs x alphabet) rows — bounded per doc by the alphabet,
    not the text length, so the plan is linear at any corpus size.

    Output: ``(id_col, n_chars, n_distinct_chars, entropy_bits)``;
    empty text yields null entropy.
    """
    chars = df.select(
        id_col,
        F.explode(F.split(F.col(text_col), "")).alias("__ch"),
    ).where(F.col("__ch") != "")
    counts = chars.groupBy(id_col, "__ch").agg(
        F.count(F.lit(1)).cast("double").alias("__c"))
    log2 = lambda c: F.log(2.0, c)  # noqa: E731
    per_doc = counts.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        F.sum(F.col("__c") * log2(F.col("__c"))).alias("__clogc"),
    )
    n = F.col("n_chars").cast("double")
    ent = log2(n) - F.col("__clogc") / n
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
            F.coalesce("n_distinct_chars", F.lit(0))
            .alias("n_distinct_chars"),
            F.round(ent, 6).alias("entropy_bits"),
        )
    )


def score_linear(
    df: DataFrame,
    weights: dict[str, float],
    intercept: float = 0.0,
    out_prefix: str = "model_",
) -> DataFrame:
    """Linear-model inference as pure column arithmetic — the serving
    pattern for fastText-style logistic quality classifiers in curation
    pipelines: ``logit = b + sum(w_i * x_i)`` over feature columns
    (nulls read as 0), ``prob = sigmoid(logit)``.

    Weights are plan literals: no UDF, no broadcast, one projection that
    fuses into whole-stage codegen with whatever scan or join computes
    the features — at 100 TB the classifier adds zero shuffles. The
    sigmoid is applied to the ROUNDED logit so an engine-dependent
    last-ulp in exp() cannot flip the rounded probability (keeps the
    operator oracle-reproducible).
    """
    logit = F.lit(float(intercept))
    for c, w in sorted(weights.items()):
        logit = logit + F.lit(float(w)) * F.coalesce(
            F.col(c).cast("double"), F.lit(0.0))
    df = df.withColumn(out_prefix + "logit", F.round(logit, 6))
    prob = 1.0 / (1.0 + F.exp(-F.col(out_prefix + "logit")))
    return df.withColumn(out_prefix + "prob", F.round(prob, 6))


def strip_boilerplate_lines(
    df: DataFrame,
    min_repeats: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "text_clean",
) -> DataFrame:
    """C4-style corpus-level line dedup: remove every line that occurs
    at least ``min_repeats`` times ACROSS the corpus (cookie banners,
    nav menus, license headers), preserving the order of surviving
    lines.

    Output: ``(id_col, out_col, n_lines, n_boilerplate)`` — a document
    whose every line is boilerplate keeps an empty string.

    Scale shape: lines explode linearly; both the frequency aggregate
    and the anti-join key on ``xxhash64(line)`` — an 8-byte key, so the
    count shuffle and any fallback shuffle anti-join move hashes, never
    the line strings. No broadcast hint is forced: at web scale the
    "hot" set (every line repeated >= min_repeats times — empty lines,
    boilerplate variants) is unbounded, so AQE must stay free to pick a
    broadcast when the set is actually small and a shuffled anti-join on
    the 8-byte key when it is not. xxhash64 collisions (~n^2/2^64)
    would strip an innocent line; at any realistic distinct-line count
    this is below measurement. Reassembly sorts each doc's surviving
    (pos, line) pairs inside one aggregate row (array_sort on structs),
    not with a window.
    """
    lines = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    ).withColumn("__lh", F.xxhash64("__line"))
    hot = (
        lines.groupBy("__lh")
        .agg(F.count(F.lit(1)).alias("__freq"))
        .where(F.col("__freq") >= min_repeats)
        .select("__lh")
    )
    kept = lines.join(hot, "__lh", "left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("__pos"), F.col("__line")))),
                    lambda s: s["__line"],
                ),
            ).alias(out_col),
            F.count(F.lit(1)).alias("__n_kept"),
        )
    )
    totals = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(out_col, F.lit("")).alias(out_col),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            (F.coalesce("n_lines", F.lit(0))
             - F.coalesce("__n_kept", F.lit(0))).alias("n_boilerplate"),
        )
    )


def trigram_typicality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 65536,
) -> DataFrame:
    """CCNet-shaped LM quality signal without an external model: score
    each document by the mean negative log2-probability of its character
    trigrams under the CORPUS trigram distribution. Typical prose scores
    low; gibberish, encoded blobs, and off-distribution text score high.

    Scale shape — three bounded steps, no corpus-sized shuffle on the
    (Zipfian-skewed) trigram key:

    1. Per-(doc, trigram) multiplicities — one shuffle keyed on the
       composite (doc, trigram), which is NOT skewed (the hottest
       trigram splits across every doc). The join input is now bounded
       by docs x distinct-trigrams-per-doc, sub-linear in text length.
    2. Corpus counts reduce FROM the multiplicities (map-side combined)
       and are then BOUNDED: the ``top_k`` most frequent trigrams keep
       exact counts (deterministic tie-break on the trigram string, via
       TakeOrderedAndProject — no single-partition window); every tail
       trigram scores through one residual probability, the MEAN tail
       count (tail mass / distinct tail types) — a per-trigram
       estimate, unlike the whole tail mass, which would overestimate
       rare-gram probability and invert the typicality ordering on
       flat distributions. Under a Zipfian corpus top-K covers ~all
       occurrences, so scores barely move; when distinct trigrams
       <= top_k the semantics are exact.
    3. The bounded (<= top_k rows) table and the 1-row totals frame are
       explicitly broadcast — the scoring join is map-side, immune to
       trigram skew at any corpus size.

    Output: ``(id_col, n_trigrams, avg_neg_log2p)``; docs shorter than
    3 chars yield null.
    """
    # lowered text materialized as a column: the per-position lambda
    # below references it, and interpreted HOFs have no subexpression
    # elimination — the single-expression form re-lowered the whole
    # text once per trigram position (same hazard as word_shingles_of)
    t = F.col("__t")
    # NB: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty — the
    # short-text case needs an explicit guard
    grams = F.when(
        F.length(t) < 3, F.array().cast("array<string>")
    ).otherwise(F.transform(
        F.sequence(F.lit(1), F.length(t) - 2),
        lambda i: F.substring(t, i, 3),
    ))
    occ = (df.select(id_col, F.lower(F.col(text_col)).alias("__t"))
           .select(id_col, F.explode(grams).alias("__g")))
    dg = occ.groupBy(id_col, "__g").agg(
        F.count(F.lit(1)).cast("double").alias("__m"))
    # three downstream lineages (counts -> topk / totals, and the
    # scoring join) re-expand dg's corpus explode without this persist
    # (same spill-safe pattern as get_missing's shared beat frame);
    # release via physioview_spark.llm.release_cached_frames
    from physioview_spark import cache as _cache
    dg = _cache.pin(dg)
    counts = dg.groupBy("__g").agg(F.sum("__m").alias("__c"))
    topk = counts.orderBy(F.col("__c").desc(), F.col("__g").asc()) \
        .limit(int(top_k))
    # 1-row totals frame: corpus mass/types + top-K mass/types (the
    # residual = mean tail count derives from the four). No driver
    # action, no extra corpus pass — both reduce from counts.
    glob = counts.agg(
        F.sum("__c").alias("__tot"),
        F.count(F.lit(1)).cast("double").alias("__nd"),
    ).crossJoin(topk.agg(
        F.sum("__c").alias("__topm"),
        F.count(F.lit(1)).cast("double").alias("__nk"),
    ))
    log2 = lambda c: F.log(2.0, c)  # noqa: E731
    rare = (F.col("__tot") - F.col("__topm")) / F.greatest(
        F.col("__nd") - F.col("__nk"), F.lit(1.0))
    ceff = F.coalesce(F.col("__c"), rare)
    scored = (
        dg.join(F.broadcast(topk), "__g", "left")
        .crossJoin(F.broadcast(glob))
        .groupBy(id_col)
        .agg(
            F.sum("__m").cast("long").alias("n_trigrams"),
            F.round(
                -(F.sum(F.col("__m") * log2(ceff / F.col("__tot")))
                  / F.sum("__m")), 6)
            .alias("avg_neg_log2p"),
        )
    )
    return (
        df.select(id_col).join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            "avg_neg_log2p",
        )
    )


def vocabulary_topk(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary head: the ``k`` most frequent whitespace tokens
    with rank and cumulative corpus-coverage fraction — the
    tokenizer-training precursor (vocab sizing: "how many types cover
    95% of tokens?") and the quickest corpus-drift fingerprint.

    Output: ``(word, freq, rank, cum_frac)``; rank 1-based by
    ``(freq DESC, word)`` so ties are deterministic; ``cum_frac`` is the
    running token-coverage of ranks ``1..rank`` over the WHOLE corpus
    (not just the head), rounded to 6.

    Scale shape: one explode + one map-side-combinable count per type
    (stopword skew collapses in the partial aggregate), then a global
    top-k via ``row_number <= k`` — Spark rewrites it to
    WindowGroupLimit, so each mapper forwards at most ``k`` candidate
    types and the single-partition rank window sees
    O(partitions * k) rows, never the vocabulary. The running coverage
    sum windows over the ``k``-row head only; the corpus total arrives
    as a broadcast 1-row aggregate.
    """
    from pyspark.sql import Window

    words = df.select(
        F.explode(tokens(text_col)).alias("word"))
    counts = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"))
    total = counts.agg(F.sum("freq").alias("__total"))
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    head = (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    # order the coverage window by the COMPUTED rank, not by the
    # (freq, word) spec again: with an identical spec the optimizer
    # collapses both into one Window node, placing the rank filter
    # above the combined window and defeating the WindowGroupLimit
    # rewrite (the whole vocabulary would cross the shuffle)
    wc = (
        Window.orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        head.crossJoin(F.broadcast(total))
        .withColumn(
            "cum_frac",
            F.round(F.sum("freq").over(wc)
                    / F.col("__total").cast("double"), 6))
        .select("word", "freq", "rank", "cum_frac")
    )


def script_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Unicode-script composition: fractions of characters
    that are Latin letters, CJK ideographs, Cyrillic, or digits, plus
    the dominant script — the mixed-script spam/encoding-mojibake
    signal (a "German" doc that is 40% CJK is mislabeled or garbage)
    and the cheap prior for routing to script-specific tokenizers.

    Counts are ``length(regexp_replace(text, '[^range]', ''))`` — pure
    JVM regex in whole-stage codegen, one projection, no shuffle, no
    UDF. Fractions are over total characters (rounded to 6); an empty
    text profiles as all-zero with dominant 'none'. Dominant breaks
    ties in fixed order latin > cjk > cyrillic (deterministic and
    SQL-reproducible).
    """
    n = F.length(F.col(text_col))

    def count_of(rng: str) -> F.Column:
        return F.length(F.regexp_replace(F.col(text_col),
                                         f"[^{rng}]", ""))

    lat = count_of("A-Za-z")
    cjk = count_of("一-鿿")
    cyr = count_of("Ѐ-ӿ")
    dig = count_of("0-9")

    def frac(c: F.Column) -> F.Column:
        return F.round(c / F.nullif(n, F.lit(0)).cast("double"), 6)

    dominant = (
        F.when(n == 0, "none")
        .when((lat >= cjk) & (lat >= cyr), "latin")
        .when(cjk >= cyr, "cjk")
        .otherwise("cyrillic")
    )
    return df.select(
        id_col,
        F.coalesce(frac(lat), F.lit(0.0)).alias("frac_latin"),
        F.coalesce(frac(cjk), F.lit(0.0)).alias("frac_cjk"),
        F.coalesce(frac(cyr), F.lit(0.0)).alias("frac_cyrillic"),
        F.coalesce(frac(dig), F.lit(0.0)).alias("frac_digit"),
        dominant.alias("dominant_script"),
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    top_vocab: int = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the classic keyword /
    topic-drift signal for corpus curation (and the cheap feature
    source for clustering and near-dup triage when no embedding model
    is in the loop).

    ``tf`` is the raw in-document term count; ``idf = ln(N / df)`` with
    ``N`` = documents containing at least one token and ``df`` = docs
    containing the term; ``score = round(tf * idf, 6)``. Per-doc
    ranking by ``(score DESC, word ASC)`` so ties are deterministic.

    Scale shape — no corpus-sized shuffle on the Zipf-skewed word key
    (same bounding as :func:`trigram_typicality`):

    1. Per-(doc, word) counts shuffle once on the COMPOSITE key, which
       is not skewed (the hottest word splits across every doc); the
       scoring input is bounded by docs x distinct-words-per-doc.
    2. The document-frequency table reduces from those counts
       (map-side combined) and is then BOUNDED: the ``top_vocab``
       highest-df words keep exact df (deterministic tie-break on the
       word, via TakeOrderedAndProject — no single-partition window);
       every tail word scores through the MEAN tail df. Under a Zipfian
       vocabulary the head covers ~all occurrences; when distinct words
       <= top_vocab the semantics are exact (no tail rows exist).
    3. The scoring join broadcasts the bounded (<= top_vocab rows) head
       and the 1-row totals frame — the per-(doc, word) frame never
       re-shuffles.
    4. The per-doc top-k is a rank-filter window partitioned by doc —
       Spark rewrites it to WindowGroupLimit, so each mapper forwards
       at most ``k`` rows per doc into the final shuffle.

    Output: ``(id_col, word, tf, score, rank)``.
    """
    from pyspark.sql import Window

    from physioview_spark import cache as _cache

    words = df.select(id_col, F.explode(tokens(text_col)).alias("word"))
    tf = words.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).cast("long").alias("tf"))
    # two downstream lineages (df-counts and the scoring join) re-expand
    # the corpus explode without this persist; release via
    # physioview_spark.llm.release_cached_frames
    tf = _cache.pin(tf)
    dfc = tf.groupBy("word").agg(F.count(F.lit(1)).cast("double")
                                 .alias("__df"))
    head = dfc.orderBy(F.col("__df").desc(), F.col("word").asc()) \
        .limit(int(top_vocab))
    glob = dfc.agg(
        F.sum("__df").alias("__dfall"),
        F.count(F.lit(1)).cast("double").alias("__ntypes"),
    ).crossJoin(head.agg(
        F.sum("__df").alias("__dfhead"),
        F.count(F.lit(1)).cast("double").alias("__nhead"),
    )).crossJoin(
        tf.select(id_col).distinct()
        .agg(F.count(F.lit(1)).cast("double").alias("__ndocs"))
    )
    rare_df = (F.col("__dfall") - F.col("__dfhead")) / F.greatest(
        F.col("__ntypes") - F.col("__nhead"), F.lit(1.0))
    df_eff = F.coalesce(F.col("__df"), rare_df)
    scored = (
        tf.join(F.broadcast(head), "word", "left")
        .crossJoin(F.broadcast(glob))
        .select(
            id_col, "word", "tf",
            F.round(F.col("tf") * F.log(F.col("__ndocs") / df_eff), 6)
            .alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("word").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "word", "tf", "score", "rank")
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    reg_param: float = 0.0,
    max_iter: int = 50,
) -> tuple[dict[str, float], float]:
    """Distributed training for the fastText-style quality gate that
    :func:`score_linear` serves: fits a pyspark.ml logistic regression
    on numeric feature columns (nulls read as 0, matching serving) and
    returns ``(weights, intercept)`` in exactly the shape
    ``score_linear`` consumes — train distributed, serve as fused
    column arithmetic with zero per-row Python and zero shuffles.

    The returned weights are plain floats (bounded by the feature
    count), so the model ships inside the query plan as literals; at
    100 TB, scoring cost is the projection the features already paid.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = df.select(
        F.col(label_col).cast("double").alias("label"),
        *[F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c)
          for c in feature_cols],
    )
    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features",
    ).transform(feats)
    model = LogisticRegression(
        featuresCol="features", labelCol="label",
        regParam=reg_param, maxIter=max_iter,
    ).fit(assembled)
    weights = {c: float(w) for c, w in
               zip(feature_cols, model.coefficients)}
    return weights, float(model.intercept)
