"""ANN quality/latency tradeoff on structured data: recall@8 and wall
time for every ANN gear against brute-force cosine truth, on a
clustered corpus (the regime ANN serves; on near-orthogonal random
vectors no compact code can rank neighbors — see
tests/test_llm.py::TestProductQuantization for that negative control).

Usage:

    python tools/bench_ann.py [--clusters 2000] [--per 8] [--dim 64]
                              [--queries 50] [--runs 1]

Corpus: ``clusters`` well-separated unit centers x ``per`` members
(within-cluster cosine ~0.99). Truth = exact cosine top-8 per query.
Reports one JSON line: per-gear recall@8 (mean over queries) and
best-of-``runs`` wall seconds. Gears: brute-force (the baseline
itself, timed), LSH multi-band, IVF (trained centroids), PQ ADC,
IVF-PQ. Codebook sizes follow the operators' scale contracts
(sqrt(N) IVF cells, m=8 subspaces).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from physioview_spark.session import get_spark


def _timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=2000)
    ap.add_argument("--per", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from physioview_spark.llm import pq, similarity

    spark = get_spark(extra_conf={"spark.driver.memory": "8g"})
    rng = np.random.RandomState(13)
    centers = rng.randn(args.clusters, args.dim)
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    for c in range(args.clusters):
        for i in range(args.per):
            v = centers[c] + 0.05 * rng.randn(args.dim)
            v /= np.linalg.norm(v)
            rows.append((c * 100 + i, [float(x) for x in v]))
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").persist()
    n = corpus.count()
    queries = corpus.where(
        (F.col("vec_id") % 100 == 0)
        & (F.col("vec_id") < args.queries * 100))

    truth_df, t_brute = _timed(lambda: similarity.cosine_topk(
        queries, corpus, k=8, q_id="vec_id", c_id="vec_id").toPandas())
    truth = {q: set(g["match_id"])
             for q, g in truth_df.groupby("query_id")}

    def recall(df):
        pdf = df.toPandas()
        qcol = "query_id" if "query_id" in pdf.columns else "vec_id"
        mcol = "match_id" if "match_id" in pdf.columns else "neighbor_id"
        rs = []
        for q, want in truth.items():
            got = set(pdf[pdf[qcol] == q][mcol])
            rs.append(len(want & got) / len(want))
        return round(float(np.mean(rs)), 3)

    n_cells = max(8, round(np.sqrt(n)))
    cents = similarity.train_ivf_centroids(corpus, n_centroids=n_cells)
    books = pq.train_pq(corpus, m=8, n_codes=16)
    enc = pq.encode_pq(corpus, books).withColumn(
        "bucket", similarity.assign_ivf_bucket(
            F.col("embedding"), cents)).persist()
    enc.count()

    gears = {
        "lsh_4x4": lambda: similarity.lsh_topk(
            queries, corpus, k=8, n_planes=4, dim=args.dim, n_bands=4),
        "ivf_probe4": lambda: similarity.ivf_topk(
            queries, corpus, cents, k=8, n_probe=4),
        "pq_adc": lambda: pq.pq_topk(enc, queries, books, k=8),
        "pq_refined_x4": lambda: pq.pq_topk_refined(
            enc, corpus, queries, books, k=8, refine=4),
        "ivfpq_probe4": lambda: pq.ivfpq_topk(
            enc, queries, cents, books, k=8, n_probe=4),
    }
    results = {"brute_force": {"recall_at_8": 1.0, "sec": t_brute}}
    for name, fn in gears.items():
        fn().count()  # warm
        best_t, rec = None, None
        for _ in range(args.runs):
            df, t = _timed(lambda: fn().toPandas())
            if best_t is None or t < best_t:
                best_t = t
            rec = recall(fn())
        results[name] = {"recall_at_8": rec, "sec": best_t}
    print(json.dumps({
        "n_corpus": n, "n_queries": len(truth), "dim": args.dim,
        "ivf_cells": n_cells, "results": results,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
