"""Streaming dedup throughput vs accumulated state: the bucketed-state
claim, measured. Each micro-batch of a long-running
streaming_near_dup_lsh / streaming_semantic_dedup instance joins
against ALL prior batches' state — if that join shuffled the
accumulated side, per-batch wall time would grow with stream age. The
state tables are bucketed on the join key precisely so it does not.
This feeds B equal batches through the foreachBatch processors
directly (no running stream needed) and reports per-batch seconds;
the verdict is the slope from early to late batches.

Usage:

    python tools/bench_stream.py [--batches 8] [--docs 4000]
                                 [--vecs 2000] [--dim 64]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from physioview_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--docs", type=int, default=4000)
    ap.add_argument("--vecs", type=int, default=2000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--scoring", default="expr",
                    help="semantic gear: expr | pandas (per-bucket matmul)")
    args = ap.parse_args()

    from physioview_spark.streaming.documents import (
        drop_near_dup_state, near_dup_batch_processor,
    )
    from physioview_spark.streaming.embeddings import (
        drop_semantic_state, semantic_dedup_batch_processor,
    )

    spark = get_spark(extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.RandomState(17)
    words = [f"w{i:04d}" for i in range(800)]
    results: dict[str, list[float]] = {}

    # --- near-dup LSH stream: per-batch docs vs growing band table
    tmp = tempfile.mkdtemp(prefix="pv_bs_nd_")
    proc = near_dup_batch_processor(f"{tmp}/state")
    try:
        for b in range(args.batches):
            rows = []
            for i in range(args.docs):
                did = b * 10_000_000 + i
                toks = rng.choice(words, size=40)
                rows.append((did, " ".join(toks)))
            batch = spark.createDataFrame(rows, "doc_id long, text string")
            t0 = time.time()
            proc(batch, b)
            results.setdefault("near_dup_lsh", []).append(
                round(time.time() - t0, 2))
    finally:
        drop_near_dup_state(spark, f"{tmp}/state")
        shutil.rmtree(tmp, ignore_errors=True)

    # --- semantic stream: per-batch vectors vs growing vector table
    cents = [[float(x) for x in c]
             for c in rng.randn(8, args.dim)]
    tmp = tempfile.mkdtemp(prefix="pv_bs_sem_")
    sproc = semantic_dedup_batch_processor(f"{tmp}/state", cents,
                                           threshold=0.95,
                                           scoring=args.scoring)
    try:
        for b in range(args.batches):
            vs = rng.randn(args.vecs, args.dim)
            vs /= np.linalg.norm(vs, axis=1)[:, None]
            rows = [(b * 10_000_000 + i, [float(x) for x in v])
                    for i, v in enumerate(vs)]
            batch = spark.createDataFrame(
                rows, "vec_id long, embedding array<double>")
            t0 = time.time()
            sproc(batch, b)
            results.setdefault("semantic", []).append(
                round(time.time() - t0, 2))
    finally:
        drop_semantic_state(spark, f"{tmp}/state")
        shutil.rmtree(tmp, ignore_errors=True)

    summary = {}
    for name, ts in results.items():
        # slope proxy: mean of last 2 / mean of batches 2-3 (skip batch
        # 0-1 — empty-state fast path + JIT warmup)
        early = sum(ts[2:4]) / 2
        late = sum(ts[-2:]) / 2
        summary[name] = {
            "per_batch_sec": ts,
            "late_vs_early": round(late / early, 2) if early else None,
        }
    print(json.dumps({"batches": args.batches, "docs": args.docs,
                      "vecs": args.vecs, "results": summary,
                      "loadavg": [round(x, 2)
                                  for x in os.getloadavg()]}))


if __name__ == "__main__":
    main()
