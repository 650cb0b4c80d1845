"""Deterministic stratified sampling for corpus curation.

A 100 TB curation pipeline rarely takes everything it crawled: it fills
per-stratum quotas (language x quality bucket, domain mixing weights,
dedup-cluster caps). The operators here are deterministic — the "random"
order is a seeded hash of the document id, so the same corpus + seed
always yields the same sample, independent of partitioning — and every
expression has an exact ANSI-SQL twin for the DuckDB oracle.

STRATUM CONTRACT (r18): a NULL stratum value is NOT a stratum — rows
whose strata/domain columns are NULL are excluded from every
stratum-keyed sampler (stratified_sample, weighted_sample,
token_budget_sample, mixture_sample, temperature_weights). Pre-r18 this
was inconsistent: window-based samplers kept a NULL-keyed partition
while join-based ones dropped it as a join miss (the r17 null axis
surfaced a 36-row engine/oracle gap in token_budget_sample's exact
mode from exactly this). A pipeline that wants unknown-language docs
sampled tags them explicitly (e.g. coalesce(lang, 'und')) — an
explicit domain, not an accidental NULL key.

Scale design: per-stratum top-k uses ``row_number`` over
``Window.partitionBy(strata)``. Spark >= 3.5 rewrites the ``rank <= k``
filter into a ``WindowGroupLimit`` physical node, which applies a partial
per-mapper limit BEFORE the shuffle — each map task forwards at most
``k`` rows per stratum it sees, so the exchange carries
O(num_partitions * strata * k) rows, not the corpus. Verified in the plan
audit (PLANS.md). Strata counts are small (languages x buckets), so
stratum skew is bounded by the same partial limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sample_order(id_col: str = "doc_id", seed: int = 42) -> F.Column:
    """Deterministic pseudo-random sort key: ``md5(seed || '|' || id)``.

    Stable across runs, partitionings, and engines (DuckDB computes the
    identical digest), unlike ``F.rand`` which is per-partition-seeded.
    """
    return F.md5(
        F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))
    )


def _non_null_strata(df: DataFrame, strata_cols) -> DataFrame:
    """Stratum contract (module docstring): NULL strata are excluded."""
    for c in strata_cols or []:
        df = df.where(F.col(c).isNotNull())
    return df


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    quota: int | dict[tuple, int],
    id_col: str = "doc_id",
    seed: int = 42,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Take up to ``quota`` rows per stratum, deterministically.

    ``quota`` is either one int for every stratum or a dict mapping a
    stratum key tuple (values of ``strata_cols``, in order) to its own
    quota — the domain-mixing-weights use case. Unlisted strata get no
    rows. The per-stratum quota table is tiny and broadcast.

    Output: input columns + ``rank_col`` (1-based position in the
    stratum's hash order). Ties in the hash (practically impossible for
    md5) break on ``id_col``.
    """
    df = _non_null_strata(df, strata_cols)
    w = (
        Window.partitionBy(*strata_cols)
        .orderBy(sample_order(id_col, seed), F.col(id_col))
    )
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    if isinstance(quota, int):
        return ranked.where(F.col(rank_col) <= quota)
    spark = df.sparkSession
    rows = [(*k, v) for k, v in quota.items()]
    schema_cols = [df.schema[c] for c in strata_cols]
    quotas = spark.createDataFrame(
        rows, ", ".join(
            [f"{f.name} {f.dataType.simpleString()}" for f in schema_cols]
            + ["__quota bigint"]
        ),
    )
    return (
        ranked.join(F.broadcast(quotas), strata_cols)
        .where(F.col(rank_col) <= F.col("__quota"))
        .drop("__quota")
    )


def quality_bucket(
    score_col: str = "quality_score",
    n_buckets: int = 5,
    out_col: str = "q_bucket",
) -> F.Column:
    """Equal-width bucket of a [0, 1] score into ``0..n_buckets-1``
    (score 1.0 clamps into the top bucket)."""
    return F.least(
        F.floor(F.col(score_col) * n_buckets), F.lit(n_buckets - 1)
    ).cast("int").alias(out_col)


def token_budget_sample(
    df: DataFrame,
    strata_cols: list[str],
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    mode: str = "exact",
    n_blocks: int = 256,
) -> DataFrame:
    """Fill a per-stratum TOKEN budget (not a row quota), deterministically
    — the domain-mixing primitive: "x billion tokens of lang=de", not
    "x documents".

    Documents are taken in seeded-hash order until the stratum's
    cumulative token count reaches ``budget_tokens``; the document that
    crosses the budget is included (budgets are approximate by one doc).
    Output: input id/strata + ``n_tokens`` + ``tokens_before`` (the
    stratum's running total before this doc).

    ``mode='exact'`` computes the hash-ordered running sum as a
    TWO-LEVEL prefix scan (the ``pack_sequences`` sub-shard +
    offset-merge trick): the seeded-hash order is cut into ``n_blocks``
    order-contiguous blocks by hash PREFIX (a prefix range is a
    contiguous slice of the hash order, so block boundaries respect the
    global order — a modulo would not), per-(stratum, block) sums merge
    into block offsets with a window over at most ``n_blocks`` rows per
    stratum, and the heavy running sum windows on (stratum, block) —
    per-task input is stratum/n_blocks, not the whole stratum. Blocks
    whose offset already exceeds the budget are pruned BEFORE the heavy
    window, so its input is ~budget-sized however large the stratum is.
    ``mode='rate'`` is the cheapest corpus-scale path: one tiny
    per-stratum total-token aggregate sets a keep-rate, then a stateless
    hash-threshold filter keeps ~budget tokens per stratum with NO
    window — the standard deterministic sampling trade (expected
    budget, not exact) at 100 TB.
    """
    from physioview_spark.llm.text import tokens

    h = sample_order(id_col, seed)
    # stratum contract: NULL strata carry no budget (explicit here —
    # pre-r18 both modes dropped them only as inner-join misses, while
    # the exact-mode oracle's window kept them: a real divergence)
    df = _non_null_strata(df, strata_cols)
    # token-contract tier 2 (llm/text.py): a NULL-text doc keeps its
    # row at 0 tokens — it costs the budget nothing, but dropping it
    # here would silently fork the semantics from pack_sequences (same
    # clamp) and from the rate mode's pre-r18 keep-with-NULL behavior
    base = df.select(
        *strata_cols, id_col,
        F.greatest(F.size(tokens(text_col)), F.lit(0))
        .cast("long").alias("n_tokens"),
        h.alias("__h"),
    )
    if mode == "exact":
        # order-contiguous block id from the first 16 bits of the hash:
        # p * n_blocks <= 2^32, exact in a double, /2^16 exact -> the
        # floor is the precise range split for any n_blocks <= 65536
        p = F.conv(F.substring("__h", 1, 4), 16, 10).cast("long")
        blocked = base.withColumn(
            "__blk",
            F.floor((p * F.lit(int(n_blocks))) / F.lit(65536)).cast("long"))
        bsums = blocked.groupBy(*strata_cols, "__blk").agg(
            F.sum("n_tokens").alias("__bsum"))
        wb = (
            Window.partitionBy(*strata_cols).orderBy("__blk")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        boffs = (
            bsums.withColumn(
                "__boff", F.sum("__bsum").over(wb) - F.col("__bsum"))
            # blocks starting past the budget cannot contribute rows —
            # prune them before the per-block window AND its join
            .where(F.col("__boff") < budget_tokens)
            .select(*strata_cols, "__blk", "__boff")
        )
        ww = (
            Window.partitionBy(*strata_cols, "__blk")
            .orderBy("__h", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            blocked.join(boffs, [*strata_cols, "__blk"])
            .withColumn(
                "tokens_before",
                F.col("__boff")
                + F.sum("n_tokens").over(ww) - F.col("n_tokens"))
            .where(F.col("tokens_before") < budget_tokens)
            .select(*strata_cols, id_col, "n_tokens", "tokens_before")
        )
    if mode != "rate":
        raise ValueError(f"mode must be 'exact' or 'rate', got {mode!r}")
    totals = base.groupBy(*strata_cols).agg(
        F.sum("n_tokens").alias("__total"))
    frac = (
        F.conv(F.substring("__h", 1, 8), 16, 10).cast("double")
        / F.lit(float(1 << 32))
    )
    # a ZERO-mass stratum (every doc empty/NULL text — legal after the
    # token contract's 0-token clamp) keeps rate 1.0: its docs cost the
    # budget nothing, matching exact mode (tokens_before 0 < budget
    # keeps them all) and the SQL oracle's IEEE budget/0 = inf ->
    # LEAST(1, inf) = 1. Unguarded, ANSI mode raises DIVIDE_BY_ZERO
    # (found by tests/test_null_contract.py, r18).
    return (
        base.join(F.broadcast(totals), strata_cols)
        .withColumn("__rate", F.when(
            F.col("__total") > 0,
            F.least(F.lit(1.0),
                    F.lit(float(budget_tokens)) / F.col("__total")))
            .otherwise(F.lit(1.0)))
        .where(frac < F.col("__rate"))
        .select(*strata_cols, id_col, "n_tokens")
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    target_weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    weight_col: str | None = None,
) -> DataFrame:
    """Water-filling mixture sampling: the largest corpus whose domain
    composition matches ``target_weights`` exactly, taken with a
    stateless seeded-hash gate (the DoReMi / Pile-style "reweight the
    crawl to a target domain mixture" curation primitive).

    With per-domain mass ``m_d`` (row count, or ``sum(weight_col)`` —
    e.g. tokens) and target share ``w_d`` (must sum to ~1 over the
    domains the caller wants), the largest total ``T`` satisfying
    ``T * w_d <= m_d`` for every targeted domain is
    ``T = min_d(m_d / w_d)``; each domain then keeps rate
    ``T * w_d / m_d`` (== 1 for the binding domain) of its mass via
    ``md5(seed|id) < rate``. Domains absent from ``target_weights`` are
    dropped; targeted domains absent from the corpus are skipped in the
    min (an infeasible mixture degrades to the feasible sub-mixture
    rather than emptying the output).

    Scale shape: one tiny per-domain aggregate (map-side partial, rows
    bounded by distinct domains), a 1-row global min, and a broadcast
    rate join back onto the corpus — no window, no per-domain scan, no
    corpus shuffle beyond the aggregate. The hash fraction and the rate
    arithmetic (``(T * w) / m`` in that association) are bit-identical
    doubles in Spark and DuckDB, so the gate is engine-portable.

    Contract: ``target_weights`` keys are STRING domain values (the
    broadcast target table is built as ``string``) and should sum to
    ~1; ``weight_col`` masses are cast to long (use integral masses —
    token or byte counts, not fractions).
    """
    mass = (F.count(F.lit(1)) if weight_col is None
            else F.sum(F.col(weight_col).cast("long"))).alias("__m")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        sorted(target_weights.items()),
        f"{domain_col} string, __w double")
    per = (
        df.groupBy(domain_col).agg(mass)
        # zero-mass domains (present but contributing nothing, e.g. all
        # empty docs under a token mass) must be skipped like absent
        # ones: a 0 in the min would force T=0 and empty the WHOLE
        # output; with no rate row their rows drop in the gate join
        .where(F.col("__m") > 0)
        .join(F.broadcast(wdf), domain_col)
    )
    t = per.agg(F.min(F.col("__m") / F.col("__w")).alias("__T"))
    rates = (
        per.crossJoin(F.broadcast(t))
        .select(domain_col,
                ((F.col("__T") * F.col("__w")) / F.col("__m"))
                .alias("__rate"))
    )
    h = sample_order(id_col, seed)
    frac = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
        / F.lit(float(1 << 32))
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(frac < F.col("__rate"))
        .drop("__rate")
    )


def temperature_weights(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.3,
    weight_col: str | None = None,
    max_domains: int = 10_000,
) -> dict[str, float]:
    """Temperature-resampled domain mixture (the multilingual-LLM
    language-balancing knob, Conneau et al. 2020 / mT5 — public
    method): from the corpus's OWN domain masses ``m_d``, target
    shares ``w_d = m_d^alpha / sum_d m_d^alpha``. ``alpha=1``
    reproduces the natural mixture, ``alpha=0`` is uniform;
    intermediate values up-sample tail domains (low-resource
    languages, rare sources) without flattening the head. The result
    feeds :func:`mixture_sample` directly::

        w = temperature_weights(docs, "lang", alpha=0.3)
        balanced = mixture_sample(docs, "lang", w)

    ``weight_col`` switches the mass from row count to an integral
    column sum (token counts — the usual definition). NULL domains
    and zero-mass domains are excluded (they cannot carry shares;
    mixture_sample's string target-table contract excludes NULL keys
    anyway).

    Scale shape: ONE map-side-combinable per-domain aggregate whose
    output is bounded by the distinct domain count — domains are
    codebook-bounded by contract (languages, sources), never
    corpus-cardinality. ``max_domains`` enforces that contract: the
    driver collects at most ``max_domains + 1`` rows (a LIMIT above
    the aggregate, so the excess never ships) and raises if the cap
    is exceeded — a hostile ``domain_col`` (raw URLs, doc ids) fails
    loudly instead of flooding the driver.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if max_domains < 1:
        raise ValueError(f"max_domains must be >= 1, got {max_domains}")
    mass = (F.count(F.lit(1)) if weight_col is None
            else F.sum(F.col(weight_col).cast("long"))).alias("__m")
    rows = (
        df.where(F.col(domain_col).isNotNull())
        .groupBy(domain_col).agg(mass)
        .where(F.col("__m") > 0)
        .limit(max_domains + 1)
        .collect()
    )
    if len(rows) > max_domains:
        raise ValueError(
            f"temperature_weights: {domain_col!r} has more than "
            f"{max_domains} distinct domains — not a codebook-bounded "
            f"domain column (raw URL/id?); raise max_domains only if "
            f"the cardinality is genuinely intended")
    if not rows:
        return {}
    # sorted-key accumulation: float addition is order-sensitive, and
    # collect order is not deterministic — summing in sorted domain
    # order makes the weights a pure function of (corpus, alpha), and
    # gives the normalizer an exact SQL twin (SUM(p ORDER BY domain))
    powered = dict(sorted(
        (str(r[domain_col]), float(r["__m"]) ** alpha) for r in rows))
    z = sum(powered.values())
    return {d: p / z for d, p in powered.items()}


# Rough chars-per-whitespace-token ratio used only to SIZE the packing
# grid (never to compute offsets): English prose runs ~5-6 chars/token
# including the separator; erring low just adds shards.
_CHARS_PER_TOKEN = 5.0


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ctx_len: int = 2048,
    n_shards: int | None = None,
    seed: int = 42,
    tokens_per_shard: int = 50_000_000,
) -> DataFrame:
    """Deterministic sequence packing: assign every document a position
    in a (shard, context-window) grid, the concat-then-chunk layout used
    to build pretraining batches.

    Documents are sharded by leading md5 hex digits of their seeded hash
    (so shard membership is reproducible in any engine), ordered within
    the shard by the same hash, and laid head-to-tail: a document's
    ``start_offset`` is the running token count before it, and its
    ``seq_id`` is ``floor(start_offset / ctx_len)`` — the context window
    its first token lands in. Documents longer than ``ctx_len`` span
    windows; run :func:`physioview_spark.llm.text.token_chunks` first if
    hard boundaries are required.

    Scale shape: one shuffle on ``shard`` + a per-shard running-sum
    window; no global sort (the cross-shard order is never needed). Each
    shard's running sum executes in ONE task, so the shard count must
    grow with the corpus: with ``n_shards=None`` (default) it is derived
    as ``ceil(estimated_tokens / tokens_per_shard)`` from a one-column
    ``sum(length(text))`` pre-aggregation — a cheap columnar scan, no
    tokenization — keeping per-task input bounded at any corpus size
    (the r04/r05 audit flagged a fixed default of 64 as ~1.5 TB/task at
    100 TB). Pass an explicit ``n_shards`` to pin the grid (as the
    oracle-checked query does); results stay deterministic for a given
    (corpus, seed, grid)."""
    from physioview_spark.llm.text import tokens

    if n_shards is None:
        total_chars = (
            df.agg(F.sum(F.length(text_col))).first()[0] or 0
        )  # 1-row driver agg, same class as an AQE size estimate
        est_tokens = total_chars / _CHARS_PER_TOKEN
        n_shards = max(1, -(-int(est_tokens) // tokens_per_shard))
    # two hex digits address 256 shards; auto-scaled grids may need
    # more -> widen to 13 digits (52 bits, still exact in a long)
    digits = 2 if n_shards <= 256 else 13
    h = sample_order(id_col, seed)
    # F.size() is -1 on a NULL array; clamp so a null-text document
    # cannot decrement the running offsets (double-booked slots,
    # windows longer than ctx_len after padding)
    base = df.select(
        id_col,
        F.greatest(F.size(tokens(text_col)), F.lit(0))
        .cast("long").alias("n_tokens"),
        h.alias("__h"),
    ).withColumn(
        "shard",
        F.conv(F.substring("__h", 1, digits), 16, 10).cast("long")
        % n_shards,
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    ).withColumn(
        "seq_id", F.floor(F.col("start_offset") / ctx_len).cast("long")
    )


def materialize_packed(
    df: DataFrame,
    tokens_col: str = "bpe_tokens",
    ctx_len: int = 2048,
    id_col: str = "doc_id",
    n_shards: int = 4,
    seed: int = 42,
    vocab: dict[str, int] | None = None,
    pad_id: int = 0,
    unk_id: int | None = None,
) -> DataFrame:
    """The pipeline's terminal artifact: fixed-length rows of token IDS
    — what a pretraining dataloader actually reads. Where
    :func:`pack_sequences` computes each document's (shard, offset,
    seq) ADDRESS, this materializes the grid itself: documents lay
    head-to-tail in their shard (same md5 order), spanning context
    windows; every row is ``(shard, seq_id, token_ids, n_real)`` with
    ``token_ids`` exactly ``ctx_len`` long (the final window per shard
    right-padded with ``pad_id``; ``n_real`` counts the un-padded
    slots).

    ``vocab`` maps token string -> id; None derives a deterministic
    vocabulary from the corpus (ids = 1-based alphabetical rank, so 0
    and negative ``pad_id`` values never collide with real tokens). The
    vocabulary is BOUNDED for subword tokens by construction (BPE
    merges + alphabet), so its rank window and broadcast are
    codebook-class, never corpus-class. An EXPLICIT vocab need not
    cover the corpus: out-of-vocabulary tokens map to ``unk_id`` when
    given, else the job fails loudly — their grid slots are already
    counted in the running offsets, so silently dropping them (the
    pre-r08 inner-join behavior) compacted later tokens left within
    the window and corrupted the artifact with no error.

    Scale shape: the document-address layout is the pack_sequences
    shape (one shuffle on shard + per-shard running sum); tokens then
    posexplode ONCE — linear in corpus tokens — into (shard, seq, slot,
    id) and reassemble with a map-side-combinable collect_list keyed on
    the unskewed composite (shard, seq_id); per-group size is bounded
    by ``ctx_len``. No global sort anywhere.
    """
    digits = 2 if n_shards <= 256 else 13
    h = sample_order(id_col, seed)
    # clamp F.size's -1-on-NULL so a null-tokens document cannot
    # decrement the running offsets (see pack_sequences)
    base = df.select(
        id_col, tokens_col,
        F.greatest(F.size(tokens_col), F.lit(0))
        .cast("long").alias("__nt"),
        h.alias("__h"),
    ).withColumn(
        "shard",
        F.conv(F.substring("__h", 1, digits), 16, 10).cast("long")
        % n_shards,
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = base.withColumn(
        "__off", F.sum("__nt").over(w) - F.col("__nt"))
    toks = base.select(
        "shard", "__off",
        F.posexplode(tokens_col).alias("__pos", "__tok"),
    ).select(
        "shard", "__tok",
        (F.col("__off") + F.col("__pos")).alias("__g"),
    )
    if vocab is None:
        # auto ids are 1..V (alphabetical), reserving 0 and negatives
        # for padding; an explicit vocab owns its own id space
        wv = Window.orderBy("__tok")  # bounded: the subword vocabulary
        vf = (toks.select("__tok").distinct()
              .withColumn("__tid", F.row_number().over(wv)))
        joined = toks.join(F.broadcast(vf), "__tok")
        tid = F.col("__tid")
    else:
        spark = df.sparkSession
        vf = spark.createDataFrame(
            list(vocab.items()), "__tok string, __tid int")
        # left join: an OOV token's slot is already booked in __off, so
        # dropping the row (inner join) would shift every later token
        # left within its window — map to unk_id or fail loudly instead
        joined = toks.join(F.broadcast(vf), "__tok", "left")
        if unk_id is None:
            tid = F.when(
                F.col("__tid").isNull(),
                F.raise_error(F.concat(
                    F.lit("materialize_packed: token not in vocab "
                          "(pass unk_id to map OOV): "),
                    F.col("__tok"))).cast("int"),
            ).otherwise(F.col("__tid"))
        else:
            tid = F.coalesce(F.col("__tid"), F.lit(int(unk_id)))
    ids = joined.select(
        "shard",
        F.floor(F.col("__g") / ctx_len).cast("long").alias("seq_id"),
        (F.col("__g") % ctx_len).cast("int").alias("__slot"),
        tid.cast("int").alias("__tid"),
    )
    assembled = ids.groupBy("shard", "seq_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__slot", "__tid"))),
            lambda s: s["__tid"],
        ).alias("__real"),
        F.count(F.lit(1)).cast("int").alias("n_real"),
    )
    padded = F.concat(
        F.col("__real"),
        F.array_repeat(F.lit(int(pad_id)),
                       ctx_len - F.col("n_real")),
    )
    return assembled.select(
        "shard", "seq_id", padded.alias("token_ids"), "n_real")


def epoch_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
    epoch: int = 0,
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment — the dataloader
    handoff: every row lands in exactly one of ``n_shards`` shards with
    a 1-based position, and both the assignment and the within-shard
    order re-randomize per ``epoch`` (the "reshuffle each epoch"
    contract of training loops) while staying a pure function of
    ``(seed, epoch, id)`` — reproducible across runs, partitionings,
    and cluster sizes.

    Shard and order both derive from ``md5(seed|epoch|id)`` (the
    :func:`sample_order` construction, engine-independent): the shard
    is the top 60 bits mod ``n_shards`` (multinomially balanced), the
    position is ``row_number`` over the hash order within the shard.

    Scale shape: ONE shuffle (the window exchange on ``shard_col``).
    There is deliberately NO global sort — a total-order permutation
    would range-partition the corpus for no training benefit; hash
    order within hash-assigned shards is the standard shuffle quality
    a dataloader needs. To write one file per shard::

        epoch_shards(df, 1024).repartition(1024, "shard") \\
            .sortWithinPartitions("shard_pos") \\
            .write.partitionBy("shard").parquet(out)
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.md5(F.concat_ws(
        "|", F.lit(str(seed)), F.lit(str(epoch)),
        F.col(id_col).cast("string")))
    tagged = df.withColumn("__h", h).withColumn(
        shard_col,
        F.pmod(F.conv(F.substring("__h", 1, 15), 16, 10).cast("long"),
               F.lit(n_shards)).cast("int"))
    w = Window.partitionBy(shard_col).orderBy("__h", F.col(id_col))
    return (
        tagged.withColumn(pos_col, F.row_number().over(w))
        .drop("__h")
    )


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic multi-way dataset split (train/val/test): adds
    ``out_col`` assigning each row to a named band by hashing
    ``key_col`` — a pure function of (key, seed), so the split is
    stable across runs, partitionings, engines, and corpus growth
    (a new row never moves an old row between splits, unlike
    ``randomSplit``, which is per-partition-seeded and reshuffles
    membership whenever the input partitioning changes).

    Rows with EQUAL keys always land in the same split — pass a group
    key (session id, near-dup cluster id) to keep correlated rows on
    one side; :func:`leakage_safe_split` wires the near-dup case.

    ``fractions`` maps split name -> fraction (non-negative, summing
    to 1); bands are laid out in dict order over the md5-derived
    ``u in (0, 1]`` (the :func:`sample_order` construction, so the
    assignment has an exact ANSI-SQL twin).

    Scale shape: a pure projection — zero shuffle, zero Python; the
    split column fuses into whole-stage codegen and writes prune by
    it when used as a partition column.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    vals = list(fractions.values())
    if any(v < 0 for v in vals) or abs(sum(vals) - 1.0) > 1e-9:
        raise ValueError(
            f"fractions must be non-negative and sum to 1, got {fractions}")
    u = (
        (F.conv(F.substring(sample_order(key_col, seed), 1, 15), 16, 10)
         .cast("double") + F.lit(1.0))
        / F.lit(float(1 << 60))
    )
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        expr = (F.when(u <= F.lit(cum), F.lit(name)) if expr is None
                else expr.when(u <= F.lit(cum), F.lit(name)))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn(out_col, expr)


def leakage_safe_split(
    df: DataFrame,
    fractions: dict[str, float],
    clusters: DataFrame | None = None,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test split that near-duplicates cannot straddle — the
    standard leakage guard for training corpora: a document and its
    near-copies must land on the SAME side, or the held-out split
    leaks training text and evaluation numbers inflate.

    The split key is the near-dup CLUSTER id rather than the document
    id: ``clusters`` is any ``(id_col, cluster_col)`` frame — e.g.
    :func:`physioview_spark.llm.dedup.cluster_decisions` output from
    ANY pair producer (MinHash-LSH, SimHash, semantic pairs);
    documents absent from it hash their own id (consistent with
    cluster_decisions' singleton convention, where a singleton's
    cluster id IS its id). Pass ``clusters=None`` when ``df`` already
    carries ``cluster_col``.

    Scale shape: one equi-join on the id (broadcast it when the pair
    graph is small — near-dup cluster tables are usually a small
    fraction of the corpus; wrap with ``F.broadcast`` at the call
    site), then the zero-shuffle hash projection of
    :func:`hash_split`.
    """
    if clusters is None:
        keyed = df.withColumn(
            "__skey",
            F.coalesce(F.col(cluster_col).cast("string"),
                       F.col(id_col).cast("string")))
    else:
        c = clusters.select(
            F.col(id_col), F.col(cluster_col).alias("__cid"))
        keyed = (
            df.join(c, id_col, "left")
            .withColumn(
                "__skey",
                F.coalesce(F.col("__cid").cast("string"),
                           F.col(id_col).cast("string")))
            .drop("__cid")
        )
    return hash_split(keyed, fractions, key_col="__skey", seed=seed,
                      out_col=out_col).drop("__skey")


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    quota: int,
    strata_cols: list[str] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — inclusion
    probability proportional to ``weight_col`` (quality-weighted
    curation: sample good documents more often without hard
    thresholds). The uniform gear is :func:`stratified_sample`; this is
    its weighted sibling.

    Method: Efraimidis-Spirakis A-Res keys (public algorithm, 2006) —
    each row draws ``u in (0, 1]`` and ranks by ``u^(1/w)`` descending;
    the top ``quota`` is exactly a weighted sample without replacement.
    The ranking uses the numerically equivalent ``ln(u)/w`` (log is
    monotonic on ``(0, 1]``, so the descending order is identical):
    ``pow(u, 1/w)`` saturates to exactly 1.0 in double precision once
    ``w >~ 1e16``, collapsing all heavy rows into an id tie-break,
    while ``ln(u)/w`` stays distinct at any weight magnitude.
    ``u`` derives from ``md5(seed|id)`` (the :func:`sample_order`
    construction), so the sample is a pure function of (corpus, seed)
    and the whole expression has an exact ANSI-SQL twin
    (``ln(u)/w`` — see the ``doc_weighted_sample`` declared oracle).
    Rows with NULL or non-positive weight are excluded (they cannot
    carry sampling mass).

    Scale shape: with ``strata_cols``, per-stratum ``row_number`` with
    the ``rank <= quota`` filter rewriting to WindowGroupLimit (partial
    per-mapper limits before the exchange, as in
    :func:`stratified_sample`); without strata, a global
    ``ORDER BY ... LIMIT`` that compiles to TakeOrderedAndProject — a
    per-partition top-``quota`` then one ``quota``-row reduce, never a
    single-partition global sort.
    """
    u = (
        (F.conv(F.substring(sample_order(id_col, seed), 1, 15), 16, 10)
         .cast("double") + F.lit(1.0))
        / F.lit(float(1 << 60))
    )
    w = F.col(weight_col).cast("double")
    # ln(u)/w, not pow(u, 1/w): same descending order (log monotonic),
    # immune to the w >~ 1e16 saturation where every key rounds to 1.0
    key = F.log(u) / w
    eligible = _non_null_strata(df, strata_cols) \
        .where(w.isNotNull() & (w > 0)) \
        .withColumn("__wkey", key)
    if strata_cols:
        win = Window.partitionBy(*strata_cols).orderBy(
            F.desc("__wkey"), F.col(id_col))
        return (
            eligible.withColumn(rank_col, F.row_number().over(win))
            .where(F.col(rank_col) <= quota)
            .drop("__wkey")
        )
    out = (
        eligible.orderBy(F.desc("__wkey"), F.col(id_col))
        .limit(quota)
        # partition-less row_number is the classic single-partition
        # killer on an unbounded input; here it ranks AFTER the
        # TakeOrderedAndProject limit, so its input is exactly `quota`
        # rows regardless of corpus size
        .withColumn(
            rank_col,
            F.row_number().over(
                Window.orderBy(F.desc("__wkey"), F.col(id_col))))
        .drop("__wkey")
    )
    return out
