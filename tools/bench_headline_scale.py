"""Headline-suite scaling evidence (VERDICT r14 item 8): run bench.py's
12 HEADLINE queries at 1x and Nx the bench corpus (sf0.1; x10 = an
sf1-equivalent row count) and report per-query wall ratios.

The bench gate has only ever run at sf0.1 — one 10x point pins that the
headline ratio vs BASELINE.md is not a fixed-overhead artifact and that
no headline query hides a superlinear term. The Nx corpus grows the
PARALLEL units (subjects / customers / orders), not the per-unit series:

- events: user_id offset per copy (new subjects, identical per-subject
  time profile) — the SQA family's per-subject work replicates cleanly.
- orders + lineitem: o_orderkey/l_orderkey offset by k*1e9 and
  o_custkey by the SAME k*1e6 as events.user_id, so the as-of and
  interval joins keep their per-copy match structure exactly.
- customer: c_custkey offset in step with o_custkey; c_nationkey kept,
  so the nation/region dims stay fixed broadcast-sized (dims do not
  grow with fact data at scale).

Timing uses bench.py's own drain semantics (collect for small outputs,
count otherwise) and its best-of-N rule. Usage:

    python tools/bench_headline_scale.py [--mult 10] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from physioview_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/pv_hscale"


def build_corpus(spark, mult: int, out_dir: str) -> None:
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    cust = spark.read.parquet(f"{BASE}/customer.parquet")

    def union_all(ps):
        out = ps[0]
        for p in ps[1:]:
            out = out.unionByName(p)
        return out

    pe, po, pl, pc = [], [], [], []
    for k in range(mult):
        pe.append(ev.select(
            (F.col("event_id") + k * 1_000_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + k * 1_000_000).alias("user_id"),
            "event_type", "value", "props"))
        po.append(orders.select(
            (F.col("o_orderkey") + k * 1_000_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + k * 1_000_000).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority"))
        pl.append(li.select(
            (F.col("l_orderkey") + k * 1_000_000_000).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate"))
        pc.append(cust.select(
            (F.col("c_custkey") + k * 1_000_000).alias("c_custkey"),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))

    union_all(pe).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    union_all(po).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    union_all(pl).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet")
    union_all(pc).write.mode("overwrite").parquet(
        f"{out_dir}/customer.parquet")
    # fixed dims: broadcast-sized regardless of fact scale
    for dim in ("nation", "region", "part", "supplier"):
        src = f"{BASE}/{dim}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{out_dir}/{dim}.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--reuse", action="store_true",
                    help="reuse an existing corpus dir instead of "
                    "rebuilding — the build itself drives loadavg past "
                    "10 and contaminates the timed pass that follows "
                    "(r16 measurement-hygiene note in PLANS.md)")
    args = ap.parse_args()

    # the xN corpus emulates N executors' data on ONE local JVM — give
    # it the heap those executors would collectively have (bench.py and
    # the driver gate keep PySpark's stock 1g)
    spark = get_spark(extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry
    from bench import HEADLINE, SMALL_OUTPUT

    qs = entry.queries()
    results: dict[str, dict[str, float]] = {}
    for mult in (1, args.mult):
        d = f"{WORK}/x{mult}"
        if not (args.reuse and os.path.isdir(f"{d}/lineitem.parquet")):
            shutil.rmtree(d, ignore_errors=True)
            t0 = time.time()
            build_corpus(spark, mult, d)
            print(f"built x{mult} in {time.time() - t0:.1f}s",
                  file=sys.stderr)
        for name in HEADLINE:
            drain = (lambda df: df.collect()) if name in SMALL_OUTPUT \
                else (lambda df: df.count())
            drain(qs[name](spark, d))  # warm: JIT/codegen/page cache
            best = None
            for _ in range(args.runs):
                t0 = time.perf_counter()
                drain(qs[name](spark, d))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[f"x{mult}"] = round(best, 3)
            spark.catalog.clearCache()
    for name, r in results.items():
        r["ratio"] = round(r[f"x{args.mult}"] / r["x1"], 2)
        r["per_row_ratio"] = round(r["ratio"] / args.mult, 2)
    total1 = round(sum(r["x1"] for r in results.values()), 3)
    totaln = round(sum(r[f"x{args.mult}"] for r in results.values()), 3)
    # Load averages at emit time: the r15 first x100 pass showed phantom
    # 8-15x ratios under load that vanished quiet — receipts must carry
    # the machine state they were taken under (VERDICT r15 item 4).
    print(json.dumps({"mult": args.mult, "total_x1": total1,
                      f"total_x{args.mult}": totaln,
                      "results": results,
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))


if __name__ == "__main__":
    main()
