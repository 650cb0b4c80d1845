"""Above-crossover receipt for hamming_banded_pairs(blocks="auto").

The r13 auto gear is parity-pinned in pytest at fixture scale and its
selection model is calibrated on the r11 receipt — this runner attests
the remaining claim: on a REAL corpus above the crossover, "auto" (no
hints beyond the data) actually engages the grown key, returns the
exact pair table of the default gear, and the candidate mass it avoids
is what the model predicts. Two signature families:

    python tools/bench_auto_gear.py [--mult 300]
        64-bit phash / max_hamming=6 (~216k signatures; crossover
        ~158k) — the r13 receipt
    python tools/bench_auto_gear.py --family simhash [--mult 25]
        32-bit SimHash / max_hamming=3 over a replicated text corpus
        (sf0.1 documents x mult, every word prefix-mutated per replica
        like tools/bench_scale.py build_corpus; ~125k docs; model
        crossover ~45k) — the r14 receipt (VERDICT r13 item 5)

Reuses tools/bench_scale.py's distributed image-corpus synthesizer.
Candidate mass per gear is computed exactly from bucket occupancies
(sum over buckets of n*(n-1)/2 across the gear's tables) — one cheap
aggregate per gear instead of materializing the join. The default-gear
near-dup run is the CONTRAST row (it pays its candidates for real).
Results go to PLANS.md by hand, like every other scale receipt.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

WORK = "/tmp/pv_auto_gear"


def candidate_mass(sig, gear, bits=64, max_hamming=6,
                   sig_col="phash") -> int:
    """Exact unordered candidate-pair count the banded self-join would
    emit under ``gear`` (before cross-table dedup and the popcount
    filter): sum of n*(n-1)/2 over every (table, key) bucket."""
    # same key arithmetic as hamming_banded_pairs, stopped at the
    # (table, key) frame the self-join would consume
    if gear is None:
        chunk_bits = bits // (max_hamming + 1)
        keyed = sig.select(
            F.explode(F.sequence(F.lit(0), F.lit(max_hamming))).alias("c"),
            F.col(sig_col).alias("s"),
        ).withColumn(
            "k",
            F.expr(f"shiftright(s, CAST(c * {chunk_bits} AS INT))")
            .bitwiseAND(F.lit((1 << chunk_bits) - 1)))
    else:
        import itertools
        from functools import reduce

        b, q = gear
        chunk_bits = bits // b

        def chunk(blk):
            return F.expr(f"shiftright(s, {blk * chunk_bits})") \
                .bitwiseAND(F.lit((1 << chunk_bits) - 1))

        combos = list(itertools.combinations(range(b), q))
        keys = F.array(*[
            F.struct(F.lit(t).alias("c"), reduce(
                lambda acc, jb: acc + F.shiftleft(
                    chunk(jb[1]), jb[0] * chunk_bits),
                enumerate(combo[1:], start=1), chunk(combo[0])).alias("k"))
            for t, combo in enumerate(combos)])
        keyed = (sig.select(F.col(sig_col).alias("s"))
                 .select(F.explode(keys).alias("kk"))
                 .select(F.col("kk.c").alias("c"), F.col("kk.k").alias("k")))
    return (keyed.groupBy("c", "k").agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.expr("n * (n - 1) / 2")).cast("long")
                 .alias("cands")).collect()[0]["cands"]) or 0


def _contrast_runs(spark, run_near_dups) -> None:
    """Default-gear vs blocks='auto' near-dup runs; assert the pair
    tables are identical (count + order-insensitive hash)."""
    results = {}
    for label, kw in (("default", {}), ("auto", {"blocks": "auto"})):
        spark.catalog.clearCache()  # near-dup runs rebuild lineage cold
        t0 = time.time()
        pairs = run_near_dups(**kw)
        h = (pairs.agg(F.count(F.lit(1)).alias("n"),
                       F.sum(F.expr("hash(id_a, id_b, hamming)"))
                       .alias("h")).collect()[0])
        results[label] = (h["n"], h["h"], time.time() - t0)
        print(f"{label}: {h['n']:,} verified pairs, table hash {h['h']}, "
              f"wall {results[label][2]:.1f}s")
    assert results["default"][:2] == results["auto"][:2], \
        "pair-table mismatch between gears"
    print("pair tables IDENTICAL (count + order-insensitive hash)")


def run_simhash(spark, mult: int) -> None:
    """32-bit SimHash / max_hamming=3 receipt over a real text corpus:
    sf0.1 documents replicated `mult`x, every word prefix-mutated per
    replica (the tools/bench_scale.py build_corpus scheme — replicas
    share no tokens with their base, so they add corpus mass without
    fake dup structure)."""
    from physioview_spark.llm import dedup as D
    from physioview_spark.llm.dedup import auto_blocks

    d = f"{WORK}/docs_x{mult}"
    path = f"{d}/documents.parquet"
    if not os.path.isdir(path):
        os.makedirs(d, exist_ok=True)
        t0 = time.time()
        base = spark.read.parquet(
            "/root/testdata/sf0.1/documents.parquet").select(
            "doc_id", "text")
        parts = [base]
        for k in range(1, mult):
            parts.append(base.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.regexp_replace("text", r"(^|\s)", f"$1k{k}x")
                .alias("text")))
        docs = parts[0]
        for p in parts[1:]:
            docs = docs.unionByName(p)
        docs.repartition(32).write.mode("overwrite").parquet(path)
        print(f"corpus written in {time.time() - t0:.1f}s",
              file=sys.stderr)
    docs = spark.read.parquet(path)

    t0 = time.time()
    sig = D.simhash(docs, bits=32)
    sig.cache()
    n = sig.count()
    print(f"hashed in {time.time() - t0:.1f}s; N={n} signatures",
          file=sys.stderr)
    picked = auto_blocks(n, bits=32, max_hamming=3)
    print(f"auto_blocks({n}, bits=32, max_hamming=3) -> {picked}")
    for gear in (None, picked):
        t0 = time.time()
        cm = candidate_mass(sig, gear, bits=32, max_hamming=3,
                            sig_col="simhash")
        print(f"gear={gear}: candidate mass {cm:,} "
              f"[{time.time() - t0:.1f}s to census]")
    sig.unpersist()
    _contrast_runs(spark, lambda **kw: D.simhash_near_dups(
        docs, bits=32, max_hamming=3, **kw))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=None)
    ap.add_argument("--family", choices=("phash", "simhash"),
                    default="phash")
    args = ap.parse_args()

    from physioview_spark.session import get_spark

    spark = get_spark("auto-gear-receipt",
                      extra_conf={"spark.driver.memory": "16g",
                                  "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    if args.family == "simhash":
        run_simhash(spark, args.mult or 25)
        return

    from physioview_spark.llm import multimodal as M
    from physioview_spark.llm.dedup import auto_blocks

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    from bench_scale import _ensure_images

    mult = args.mult or 300
    d = f"{WORK}/x{mult}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    t0 = time.time()
    imgs = spark.read.parquet(_ensure_images(spark, d, mult))
    sig = M.image_phash(imgs).where("valid")
    sig.cache()
    n = sig.count()
    print(f"corpus built+hashed in {time.time() - t0:.1f}s; "
          f"N={n} valid signatures", file=sys.stderr)

    picked = auto_blocks(n, bits=64, max_hamming=6)
    print(f"auto_blocks({n}) -> {picked}")

    for gear in (None, picked):
        t0 = time.time()
        cm = candidate_mass(sig, gear)
        print(f"gear={gear}: candidate mass {cm:,} "
              f"[{time.time() - t0:.1f}s to census]")
    sig.unpersist()
    _contrast_runs(spark, lambda **kw: M.image_near_dups(
        imgs, max_hamming=6, **kw))


if __name__ == "__main__":
    main()
