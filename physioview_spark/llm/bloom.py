"""Distributed Bloom filter for prune-only runtime prefilters.

Spark's own ``bloom_filter_agg`` / ``might_contain`` expressions are
optimizer-internal (not on the SQL function search path), so this is a
from-scratch Bloom filter expressed entirely in DataFrame operators:

* **build** — bit positions are ``pmod(xxhash64(key..., seed_i), m)``
  columns (pure JVM), exploded to ``(word_idx, mask)`` and folded with a
  ``bit_or`` aggregate into a SPARSE word table ``(word_idx: long,
  bits: long)`` of at most ``m/64`` rows. One shuffle, map-side
  combinable, output bounded by the filter size — not the key count.
* **probe (jvm gear, auto-default up to 2^23 bits)** — the word table
  densifies into a
  bitmap shipped as a ONE-ROW ``array<bigint>`` broadcast, and
  membership is pure JVM ``element_at``/``shiftright`` arithmetic in
  codegen over the same JVM-computed position columns. Zero shuffle,
  zero Python on the probed frame.
* **probe (pandas gear)** — the bitmap as a numpy ``uint64`` array
  (TorrentBroadcast) with membership in one Arrow-batched pandas UDF
  (``(bitmap[pos >> 6] >> (pos & 63)) & 1`` via ``numpy.take``). For
  very large bitmaps, and the parity witness for the jvm gear.
* **probe (join gear)** — per-distinct-key verdicts via explode +
  broadcast-hash-join of the word table, joined back null-safely on
  the key columns. For Python-worker-free plans with filters past the
  local bound.

Hash parity between build and probe is free because BOTH sides compute
positions with the same JVM ``xxhash64`` expression — nothing in Python
ever hashes, so there is no cross-language hash-compatibility surface.

Why a Bloom gear at all, when ``dedup_delta``-style operators already
prefilter with EXACT broadcast semi-joins: the exact gear broadcasts the
full distinct key set (16-byte md5 rows plus JVM hashmap overhead); at
~1% FPP a Bloom costs ~9.6 BITS per key — roughly 15-20x smaller — so
the "broadcast the delta" regime survives deltas an order of magnitude
larger before the broadcast itself becomes the bottleneck. The trade is
false positives, which prune-only consumers absorb by construction: an
FP lets an extra corpus row through the prefilter, and the downstream
exact join/verify then rejects it, so results are bit-identical. Bloom
filters have NO false negatives, so no genuine match is ever pruned.

No reference counterpart (cbslneu/physioview has no incremental-corpus
surface); the design follows the classic runtime-filter pattern that
engines inject automatically (Spark's own InjectRuntimeFilter rule).
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "bloom_parameters",
    "bit_positions",
    "bloom_build",
    "bloom_to_bitmap",
    "bloom_probe",
    "bloom_probe_join",
]

# The local gear collects the sparse word table and broadcasts a dense
# bitmap; cap it well under typical driver/broadcast budgets. 2**30 bits
# = 128 MiB dense, ~110M keys at 1% FPP.
_MAX_LOCAL_BITS = 1 << 30

# The jvm probe gear round-trips the bitmap through a Python int list
# into a one-row local-relation plan node; past ~1 MiB of words that
# transient list + plan-attached literal dominates, and the numpy
# TorrentBroadcast of the pandas gear is the right transport. 2**23
# bits = 128 Ki words = 1 MiB dense.
_JVM_PROBE_MAX_BITS = 1 << 23


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: ``m = -n ln p / (ln 2)^2`` bits rounded up to a
    multiple of 64, ``k = round(m/n ln 2)`` hashes (clamped to [1, 16])."""
    if n_items <= 0:
        return 64, 1
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, min(16, round(m / n_items * math.log(2))))
    return m, k


def bit_positions(
    key_cols: Sequence, num_bits: int, num_hashes: int
) -> list:
    """The ``k`` JVM-side position columns for a (possibly composite)
    key: ``pmod(xxhash64(key..., seed_i), m)``. Seeding via an extra
    hashed literal keeps all k probes on the built-in xxhash64 — no UDF,
    and build/probe parity is automatic because both call this."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return [
        F.pmod(F.xxhash64(*cols, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key_cols: Sequence,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Sparse word table ``(word_idx: long, bits: long)`` with every
    key's ``k`` bits set. One map-side-combinable ``bit_or`` shuffle
    whose output is bounded by ``num_bits/64`` rows regardless of input
    size; absent words mean all-zero bits."""
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    pos = F.explode(F.array(*bit_positions(key_cols, num_bits, num_hashes)))
    return (
        df.select(pos.alias("__pos"))
        .select(
            F.shiftright(F.col("__pos"), 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))")
            .alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_to_bitmap(bloom_words: DataFrame, num_bits: int) -> np.ndarray:
    """Densify the sparse word table into a ``uint64[num_bits/64]``
    bitmap on the driver. Bounded collect: at most ``num_bits/64`` rows,
    enforced against ``_MAX_LOCAL_BITS`` (128 MiB dense)."""
    if num_bits > _MAX_LOCAL_BITS:
        raise ValueError(
            f"num_bits={num_bits} exceeds the local-gear bound "
            f"{_MAX_LOCAL_BITS}; use bloom_probe_join for larger filters")
    bitmap = np.zeros(num_bits // 64, dtype=np.uint64)
    for row in bloom_words.select("word_idx", "bits").collect():
        bitmap[row.word_idx] = np.uint64(row.bits & 0xFFFFFFFFFFFFFFFF)
    return bitmap


def bloom_probe(
    df: DataFrame,
    key_cols: Sequence,
    bitmap: np.ndarray,
    num_bits: int,
    num_hashes: int,
    keep: str = "maybe",
    gear: str = "auto",
) -> DataFrame:
    """Filter ``df`` to rows the Bloom filter says MAY be members
    (``keep="maybe"``) or are DEFINITELY not (``keep="definitely_not"``).
    FPs only ever enlarge the "maybe" side — callers must treat "maybe"
    as a candidate set, never as confirmed members.

    Zero-shuffle either way; the gears differ in where the bit test
    runs. ``"auto"`` (default) picks jvm up to ``_JVM_PROBE_MAX_BITS``
    (2^23 bits = 1 MiB dense) and pandas above — the jvm gear ships the
    bitmap as a Python int list inside a one-row local relation, which
    at the 2^30-bit cap would mean a 16.7M-element list and a GB-scale
    transient plan literal; large bitmaps belong on the numpy
    TorrentBroadcast path.

    * ``"jvm"`` (auto's pick for small bitmaps) — the bitmap ships as
      a ONE-ROW
      ``array<bigint>`` broadcast (the pq.py LUT pattern: a broadcast
      nested-loop join against a single row), and membership is pure
      JVM ``element_at``/``shiftright`` arithmetic inside codegen. No
      Python hop at all — this is the gear for probing the BIG side.
      MEASURED (PLANS.md round 8): the pandas gear's Arrow hop over the
      corpus-side rows made the whole bloom prefilter 3x slower than
      the exact semi-join; the jvm gear removes that hop.
    * ``"pandas"`` — one Arrow-batched pandas UDF over the ``k``
      JVM-computed position columns against a TorrentBroadcast numpy
      bitmap (vectorized ``take``). Kept for very large bitmaps, where
      a Python broadcast round-trips cheaper than a plan-attached
      array, and as the parity witness for the jvm gear.
    """
    if keep not in ("maybe", "definitely_not"):
        raise ValueError(f"keep must be 'maybe' or 'definitely_not', got {keep!r}")
    if gear not in ("auto", "jvm", "pandas"):
        raise ValueError(f"gear must be 'auto', 'jvm' or 'pandas', got {gear!r}")
    if gear == "auto":
        gear = "jvm" if num_bits <= _JVM_PROBE_MAX_BITS else "pandas"
    spark = df.sparkSession
    if gear == "jvm":
        words = [int(x) for x in bitmap.view(np.int64)]
        bf = spark.createDataFrame([(words,)], "__bf array<bigint>")
        tagged = df
        for i, p in enumerate(bit_positions(key_cols, num_bits, num_hashes)):
            tagged = tagged.withColumn(f"__bp{i}", p)
        tagged = tagged.join(F.broadcast(bf), how="cross")
        hit = None
        for i in range(num_hashes):
            t = F.expr(
                f"(shiftright(element_at(__bf, "
                f"CAST(shiftright(__bp{i}, 6) + 1 AS INT)), "
                f"CAST(__bp{i} % 64 AS INT)) & 1) = 1")
            hit = t if hit is None else (hit & t)
        out = tagged.where(hit if keep == "maybe" else ~hit)
        return out.drop("__bf", *[f"__bp{i}" for i in range(num_hashes)])
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def _maybe(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        bits = bc.value
        for pdf in it:
            hit = np.ones(len(pdf), dtype=bool)
            for c in pdf.columns:
                pos = pdf[c].to_numpy(dtype=np.int64)
                word = bits.take(pos >> 6)
                hit &= ((word >> (pos & 63).astype(np.uint64))
                        & np.uint64(1)).astype(bool)
            yield pd.Series(hit)

    pos_struct = F.struct(*[
        p.alias(f"p{i}")
        for i, p in enumerate(bit_positions(key_cols, num_bits, num_hashes))
    ])
    flag = _maybe(pos_struct)
    return df.where(flag if keep == "maybe" else ~flag)


def bloom_probe_join(
    df: DataFrame,
    key_cols: Sequence,
    bloom_words: DataFrame,
    num_bits: int,
    num_hashes: int,
    keep: str = "maybe",
) -> DataFrame:
    """JVM-only probe gear: per DISTINCT key, explode the ``k``
    positions, broadcast-join the word table, reduce to one
    maybe/not verdict, and join the verdicts back on the key columns
    (null-safe, so null keys keep their — consistent — verdict). Key
    duplicates survive unchanged and the verdict table is bounded by
    the distinct key count. Joining on the KEYS rather than a row id
    matters for correctness, not just size: a
    ``monotonically_increasing_id`` self-join is nondeterministic
    across plan re-instantiations. Use this gear when Python workers
    are unavailable or the bitmap exceeds the local gear's bound."""
    if keep not in ("maybe", "definitely_not"):
        raise ValueError(f"keep must be 'maybe' or 'definitely_not', got {keep!r}")
    names = [c if isinstance(c, str) else df.select(c).columns[0]
             for c in key_cols]
    # word table under reserved names so a probe key may itself be
    # called "bits" or "word_idx" without an ambiguous reference
    words = bloom_words.select(
        F.col("word_idx").alias("__bw_idx"), F.col("bits").alias("__bw_bits"))
    verdicts = (
        df.select(*names).distinct()
        .select(
            *names,
            F.explode(F.array(*bit_positions(names, num_bits, num_hashes))
                      ).alias("__pos"))
        .select(
            *names,
            F.shiftright(F.col("__pos"), 6).alias("__bw_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))")
            .alias("__mask"),
        )
        .join(F.broadcast(words), "__bw_idx", "left")
        .withColumn(
            "__hit",
            (F.coalesce(F.col("__bw_bits"), F.lit(0))
             .bitwiseAND(F.col("__mask")) != 0).cast("int"))
        .groupBy(*names)
        .agg((F.sum("__hit") == F.lit(num_hashes)).alias("__maybe"))
    )
    # alias BOTH sides: verdicts derives from df, so unqualified key
    # references are ambiguous self-join columns to the analyzer
    d = df.alias("__bd")
    v = verdicts.alias("__bv")
    cond = None
    for n in names:
        eq = F.col(f"__bd.{n}").eqNullSafe(F.col(f"__bv.{n}"))
        cond = eq if cond is None else (cond & eq)
    flag = F.coalesce(F.col("__bv.__maybe"), F.lit(False))
    return (
        d.join(v, cond, "left")
        .where(flag if keep == "maybe" else ~flag)
        .select(*[F.col(f"__bd.{c}") for c in df.columns])
    )
