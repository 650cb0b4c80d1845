"""Wall-time scaling evidence: run the heaviest queries at 1x and Nx the
bench corpus (sf0.1) and report the scaling exponent of each.

A plan audit can claim "linear"; this measures it. Usage:

    python tools/bench_scale.py [--mult 10] [--runs 1]

The Nx corpus is a REPRESENTATIVE enlargement, not a naive replication —
naive copies are pathological for dedup-shaped queries (every doc gains
N-1 exact duplicates; every embedding N-1 cosine-1 twins; candidate
pairs grow quadratically in N by construction, which measures the data,
not the plan). Each copy k is therefore transformed to look like fresh
data with the same per-row profile:

- events: id/user offsets per copy (new subjects, same per-subject
  series shape) — the SQA plans' per-subject work replicates cleanly.
- documents: every token prefixed with a copy tag (regexp, one pass at
  generation) — new shingles/lines/trigram mass per copy, identical
  length profile; within-copy near-dup structure preserved exactly.
- embeddings: a per-copy component PERMUTATION — cosine geometry within
  a copy is preserved EXACTLY (near-dup pairs scale linearly), while
  cross-copy vectors decorrelate.

semantic_dedup is measured through the operator with the codebook grown
proportionally to the corpus (the SemDeDup contract: buckets stay
constant-sized as N grows; a fixed codebook at 10x data is a 10x bucket
size = quadratic pair scoring by design, not a plan property).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from physioview_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/pv_scale"


def build_corpus(spark, mult: int, out_dir: str) -> None:
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])

    parts_ev, parts_do, parts_em = [], [], []
    for k in range(mult):
        parts_ev.append(ev.select(
            (F.col("event_id") + k * 1_000_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + k * 1_000_000).alias("user_id"),
            "event_type", "value", "props"))
        if k == 0:
            parts_do.append(docs)
        else:
            parts_do.append(docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.regexp_replace("text", r"(^|\s)", f"$1k{k}x")
                .alias("text"),
                "lang", "source", "n_chars"))
        perm = list(map(int, np.random.RandomState(k).permutation(dim))) \
            if k else list(range(dim))
        parts_em.append(emb.select(
            (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
            F.array(*[F.col("embedding")[i] for i in perm])
            .alias("embedding"),
            "label"))

    def union_all(ps):
        out = ps[0]
        for p in ps[1:]:
            out = out.unionByName(p)
        return out

    union_all(parts_ev).write.mode("overwrite") \
        .parquet(f"{out_dir}/events.parquet")
    union_all(parts_do).write.mode("overwrite") \
        .parquet(f"{out_dir}/documents.parquet")
    union_all(parts_em).write.mode("overwrite") \
        .parquet(f"{out_dir}/embeddings.parquet")


def run_semantic_dedup(spark, sf_dir: str, mult: int):
    """semantic_dedup with the codebook grown as sqrt(N) — the flat-IVF
    optimum (assignment costs N*k, pair scoring N*(N/k); k ~ sqrt(N)
    balances them at N^1.5 total, the operator's true cost model; a
    hierarchical quantizer would be the next gear, not a plan fix)."""
    from math import sqrt

    from physioview_spark.llm import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_cents = max(8, round(8 * sqrt(mult)))
    stride = max(1, (2000 * mult) // n_cents)
    cents_rows = (emb.where(F.col("vec_id") % stride == 0)
                  .orderBy("vec_id").select("embedding").collect())
    cents = [[float(x) for x in r["embedding"]] for r in cents_rows]
    # pinned pandas scoring at every scale: auto switches gears on the
    # k*dim threshold (expr at x1's k=8, pandas past ~x3), and a gear
    # switch inside the x1-vs-xN ratio would measure the switch, not
    # the operator's scaling
    return similarity.semantic_dedup(emb, cents, threshold=0.95,
                                     scoring="pandas")


def run_near_dup_pairs(spark, sf_dir: str, mult: int):
    """embedding_near_dups with hyperplanes grown ~log2(N) — the same
    per-bucket-size contract as knn_graph: p planes per band gives 2^p
    buckets, so constant bucket occupancy (and so linear candidate-pair
    mass) requires p ~ log2(N / target_bucket). The matmul gear keeps
    the grown plane set out of the plan as literal arrays (the
    assign_ivf_bucket auto-gear rule: >~1k literal floats costs MB-scale
    task binaries + codegen seconds)."""
    from math import ceil, log2

    from physioview_spark.llm import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()  # parquet-metadata count, cheap
    planes = max(3, ceil(log2(max(n, 80) / 40)))
    return similarity.embedding_near_dups(
        emb, threshold=0.35, n_planes=planes, dim=64, n_bands=4,
        method="matmul")


def run_ann_ivfpq(spark, sf_dir: str, mult: int):
    """ivfpq_topk with the coarse codebook grown ~sqrt(N) (the FAISS
    IVF sizing rule; same arithmetic as run_semantic_dedup) and the PQ
    codebooks held at 8 codes x 8 subspaces (PQ storage is per-VECTOR,
    not per-corpus — code count buys quantization quality, not scale).
    The timed region is index build (encode_pq + bucket assign, the
    honest O(N) term) plus a fixed 10-query probe whose scored mass
    grows only as N * n_probe / n_cells ~ sqrt(N)."""
    from math import sqrt

    from physioview_spark.llm import pq, similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_cells = max(8, round(8 * sqrt(mult)))
    stride = max(1, (2000 * mult) // n_cells)
    seed_rows = (emb.where(F.col("vec_id") % stride == 0)
                 .orderBy("vec_id").select("embedding").collect())
    seeds = [[float(x) for x in r["embedding"]] for r in seed_rows]
    d = len(seeds[0]) // 8
    pq_seeds = seeds[:8]  # fixed 8-code PQ books at every scale
    codebooks = [[s[j * d:(j + 1) * d] for s in pq_seeds]
                 for j in range(8)]
    # pin the pandas matmul gear at BOTH scales: auto would run expr at
    # x1 (8x64 literal floats) and pandas at x100 (>1024), and a gear
    # switch inside the ratio measures the switch, not the scaling
    codes = pq.encode_pq(emb, codebooks, method="pandas").withColumn(
        "bucket", similarity.assign_ivf_bucket(
            F.col("embedding"), seeds, method="pandas"))
    return pq.ivfpq_topk(
        codes, emb.where(F.col("vec_id") < 10), seeds, codebooks,
        k=5, n_probe=3)


def _ensure_images(spark, sf_dir: str, mult: int) -> str:
    """640*mult base binary payloads (the PVIM/PNM codec cycle of
    llm/multimodal.fake_image_table, synthesized DISTRIBUTED — the
    per-id generators are pure functions — with the same every-10th
    truncation) + 160*mult perturbed near-dups, written once per
    scale."""
    import os

    n_base, n_dups = 640 * mult, 160 * mult
    pq_path = f"{sf_dir}/images.parquet"
    if os.path.exists(pq_path):
        return pq_path

    def gen(batches):
        import pandas as _pd

        from physioview_spark.llm import multimodal as M

        def base_payload(i):
            w = 8 + (i % 5) * 4
            kind = i % 3
            if kind == 0:
                p, m = M.encode_ppm(i, w, 8), "image/x-portable-pixmap"
            elif kind == 1:
                p, m = (M.encode_ppm(i, w, 8, gray=True),
                        "image/x-portable-graymap")
            else:
                p, m = M.encode_fake_image(i, w, 8), "image/pvim"
            if i % 10 == 9:
                p = p[: len(p) // 2]
            return p, m

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i < n_base:
                    p, m = base_payload(i)
                else:
                    j = i - n_base
                    p, _ = base_payload(j)
                    p = M.perturb_payload(p, n_tweaks=16, seed=i,
                                          delta=40)
                    m = "image/near-dup"
                rows.append((i, m, len(p), bytearray(p)))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "mime", "n_bytes", "payload"])

    n = n_base + n_dups
    (spark.range(n).repartition(max(32, n // 4000))
     .mapInPandas(gen, "doc_id long, mime string, n_bytes long, "
                       "payload binary")
     .write.mode("overwrite").parquet(pq_path))
    return pq_path


def run_multimodal_near_dups(grow_keys: bool):
    """Image near-dup pairs at scale, the pigeonhole-Hamming leg of the
    dedup suite. The index contract under test: candidate keys must
    LENGTHEN with the corpus. The default single-chunk pigeonhole key
    is bits/(max_hamming+1) = 9 bits — a FIXED 512-value space whose
    per-bucket occupancy (and so random-collision candidate mass,
    sum n_b^2) grows with N; the grown gear keys on 2-block
    combinations (blocks=(8, 2), C(8,2)=28 tables, 16-bit keys — the
    Manku generalized pigeonhole in llm/dedup.py) so key length tracks
    ~2 log2 N and occupancy stays ~constant at 100% recall. The
    fixed-key runner exists as the CONTRAST row: it measures the
    defect the gear fixes."""
    def run(spark, sf_dir: str, mult: int):
        from physioview_spark.llm import multimodal as M

        imgs = spark.read.parquet(_ensure_images(spark, sf_dir, mult))
        # key-bits ~ 2 log2 N: 9 bits at N~700, 24 bits (blocks=(10,4),
        # C(10,4)=210 tables, q=4 <= b - max_hamming) at N~72k — the
        # largest admissible key under the 64-bit/max_hamming=6
        # pigeonhole constraint q <= b - 6 and the 256-table cap
        blocks = (10, 4) if grow_keys and mult > 1 else None
        return M.image_near_dups(imgs, max_hamming=6, blocks=blocks)
    return run


def run_knn_graph(spark, sf_dir: str, mult: int):
    """knn_graph with hyperplanes grown ~log2(N): a band of p planes
    yields 2^p buckets, so holding per-bucket size (and with it the
    candidate-pair count per node) constant as N grows requires
    p ~ log2(N / target_bucket) — the multi-band analogue of semantic
    dedup's sqrt(N) codebook contract. A fixed p at 10x data is a 10x
    bucket size = quadratic pair growth by design, not a plan property."""
    from math import ceil, log2

    from physioview_spark.llm import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()  # parquet-metadata count, cheap
    planes = max(4, ceil(log2(max(n, 80) / 40)))
    return similarity.knn_graph(
        emb, k=3, n_planes=planes, dim=64, n_bands=4, method="matmul")


def run_delta_grow_bloom(spark, sf_dir: str, mult: int):
    """doc_dedup_delta's growing %5 split with the Bloom prefilter —
    the regime the bloom gear exists for: the delta (and so the exact
    gear's broadcast key sets) grows with the corpus, while the Bloom
    bitmaps stay ~9.6 bits/key. Contrast against doc_dedup_delta
    (same split, exact gear). Timed end-to-end including the eager
    filter build (the runner re-invokes the operator per timing)."""
    from physioview_spark.llm import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    return dedup.dedup_delta(new, corpus, threshold=0.5,
                             prefilter="bloom")


def run_delta_fixed(prefilter: bool | str):
    """dedup_delta in its production regime: a FIXED 100-doc delta
    against the GROWING corpus (doc_dedup_delta's %5 split grows the
    delta with the corpus, which measures the verify leg, not the
    increment premise). Contrast prefilter gears: False pays three
    corpus-wide exchanges, True absorbs the delta probes map-side."""
    def run(spark, sf_dir: str, mult: int):
        from physioview_spark.llm import dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        new = docs.where(F.col("doc_id") % (5 * mult) == 0)
        corpus = docs.where(F.col("doc_id") % (5 * mult) != 0)
        return dedup.dedup_delta(new, corpus, threshold=0.5,
                                 prefilter=prefilter)
    return run


def _consumed_query(name: str, *agg_cols: str):
    """Scale-measure a declared query through a consuming aggregate:
    timing bare .count() on window/agg-shaped outputs lets Catalyst
    prune the very expressions under test (the r08 epoch_shards
    lesson), so every produced column of interest is folded into the
    result."""
    def run(spark, sf_dir: str, mult: int):
        from physioview_spark.plans import queries_llm, queries_relational
        q = {**queries_relational.QUERIES, **queries_llm.QUERIES}[name]
        out = q(spark, sf_dir)
        return out.agg(F.count(F.lit(1)),
                       *[F.sum(F.col(c)) for c in agg_cols])
    return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--targets", nargs="*", default=None,
                    help="subset of query/label names to measure "
                         "(default: all)")
    args = ap.parse_args()

    names = ["sqa_missing_segments", "doc_trigram_typicality",
             "doc_strip_boilerplate", "doc_curation_pipeline_v3",
             "doc_passage_dedup", "doc_mixture_sample",
             "doc_dedup_delta",
             # r10 (VERDICT r09 item 6): the banded-dedup family at
             # x100 — the one family whose shuffle mass should clear
             # the local job floor. .count() cannot prune these: the
             # pair/cluster cardinality IS the banding joins' output.
             "doc_minhash_lsh_candidates", "doc_dup_clusters"]
    labeled = (
        ("semantic_dedup_ksqrtN", run_semantic_dedup),
        # r11 (VERDICT r10 item 5): the vector/ANN family at x100 —
        # the banded TEXT dedup family cleared the job floor r10; these
        # put the embedding legs' scaling on the record with the same
        # grown-index contracts (planes ~ log2 N, cells ~ sqrt N)
        ("near_dup_pairs_plogN", run_near_dup_pairs),
        ("ann_ivfpq_csqrtN", run_ann_ivfpq),
        # r11: the multimodal pigeonhole-Hamming leg — grown
        # combination keys (the Manku gear) vs the fixed single-chunk
        # key as the defect contrast
        ("multimodal_near_dups_keygrow", run_multimodal_near_dups(True)),
        ("multimodal_near_dups_fixedkey",
         run_multimodal_near_dups(False)),
        ("knn_graph_plogN", run_knn_graph),
        ("delta_fixed_prefilter", run_delta_fixed(True)),
        ("delta_fixed_shuffle", run_delta_fixed(False)),
        ("delta_fixed_bloom", run_delta_fixed("bloom")),
        ("delta_grow_bloom", run_delta_grow_bloom),
        # r09 driver gates — consumed aggregates so the funnel chain /
        # rank window / retention grid cannot be pruned by the timer
        ("events_funnel", _consumed_query(
            "events_funnel", "steps_completed", "step_2_epoch")),
        ("events_retention", _consumed_query(
            "events_retention", "n_active", "period_n")),
        ("doc_weighted_sample", _consumed_query(
            "doc_weighted_sample", "sample_rank")),
    )
    if args.targets is not None:
        bad = set(args.targets) - set(names) - {l for l, _ in labeled}
        if bad or not args.targets:
            # a typo'd (or empty) --targets must fail BEFORE minutes of
            # corpus building, not silently measure nothing/everything
            raise SystemExit(
                f"unknown --targets {sorted(bad)}; choose from "
                f"{sorted(set(names) | {l for l, _ in labeled})}")

    # the x10 corpus emulates ten executors' data on ONE local JVM —
    # give that JVM the heap those executors would collectively have
    # (the engine itself keeps stock memory settings; PySpark's default
    # 1g driver heap is what bench.py and the driver gate run on)
    spark = get_spark(extra_conf={"spark.driver.memory": "16g"})
    import __spark_entry__ as entry

    qs = entry.queries()

    results: dict[str, dict[str, float]] = {}
    for mult in (1, args.mult):
        d = f"{WORK}/x{mult}"
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.time()
        build_corpus(spark, mult, d)
        print(f"built x{mult} in {time.time() - t0:.1f}s", file=sys.stderr)
        for name in names:
            if args.targets and name not in args.targets:
                continue
            qs[name](spark, d).count()  # warm: JIT/codegen/page cache
            best = min(
                _timed(lambda: qs[name](spark, d).count())
                for _ in range(args.runs))
            results.setdefault(name, {})[f"x{mult}"] = best
            # operators persist internal frames (shingles, beat frames)
            # and a measurement session runs dozens of invocations —
            # without dropping the accumulated storage blocks between
            # targets, execution memory starves and the heaviest
            # targets OOM the heap (observed at x10 with the four
            # dedup_delta gear runs). Within one target the warm run's
            # cache still serves the timed run (CacheManager matches
            # by plan, not by DataFrame object).
            spark.catalog.clearCache()
        for label, fn in labeled:
            if args.targets and label not in args.targets:
                continue
            fn(spark, d, mult).count()
            best = min(
                _timed(lambda: fn(spark, d, mult).count())
                for _ in range(args.runs))
            results.setdefault(label, {})[f"x{mult}"] = best
            spark.catalog.clearCache()
    for name, r in results.items():
        r["ratio"] = round(r[f"x{args.mult}"] / r["x1"], 2)
        r["per_row_ratio"] = round(r["ratio"] / args.mult, 2)
    # machine state at emit — scale receipts without it are
    # uninterpretable after the fact (VERDICT r15 item 4 / r16 item 7)
    print(json.dumps({"mult": args.mult, "results": results,
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


if __name__ == "__main__":
    main()
