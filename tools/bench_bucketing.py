"""Storage-layout receipt for the x100 fact-fact joins (VERDICT r15
item 7; extended to order_priority_counts per VERDICT r16 item 4).

`top_revenue_nations` and `order_priority_counts` are the headline
queries whose x100 wall is dominated by shuffle exchanges that no PLAN
change can remove: the lineitem pre-aggregation shuffles on
l_orderkey, the orders join shuffles both sides on the order key, and
(for top_revenue_nations) the customer join shuffles on the cust key.
At 100 TB the lever is STORAGE — bucket the fact tables on their join
keys so the exchanges never happen:

- lineitem  bucketed+sorted by l_orderkey  -> groupBy(l_orderkey) needs
  no exchange, and the orders join reads both sides pre-partitioned;
- orders    bucketed+sorted by o_orderkey  -> zero-exchange SMJ with
  the pre-aggregated lineitem stream;
- customer  bucketed+sorted by c_custkey   -> the custkey join only
  shuffles the (already tiny) per-customer aggregate to the bucket
  count; the big scan side stays in place.

This tool builds the same xN corpus as tools/bench_headline_scale.py,
writes bucketed copies via saveAsTable (bucketing metadata lives in the
catalog, so the bucketed variant reads spark.table(...)), runs the SAME
logical query body against flat parquet and against the bucketed
tables, and reports wall times plus the shuffle-exchange count of each
physical plan. Usage:

    python tools/bench_bucketing.py [--mult 100] [--runs 2] [--buckets 32]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from physioview_spark.session import get_spark
from physioview_spark.plans.queries_relational import (
    order_priority_counts_body, top_revenue_nations_body,
)

# query name -> body(tabs) over a {table: DataFrame} dict; bodies are
# IMPORTED from the engine so the receipt cannot drift from the query
QUERIES = {
    "top_revenue_nations": lambda tt: top_revenue_nations_body(
        tt["lineitem"], tt["orders"], tt["customer"], tt["nation"]),
    "order_priority_counts": lambda tt: order_priority_counts_body(
        tt["orders"], tt["lineitem"]),
}

WORK = "/tmp/pv_bucket"


def time_best(df_fn, runs: int) -> float:
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        df_fn().collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(extra_conf={
        "spark.driver.memory": "16g",
        "spark.sql.warehouse.dir": f"{WORK}/warehouse",
    })
    spark.sparkContext.setLogLevel("ERROR")

    from tools.bench_headline_scale import build_corpus

    corpus = f"{WORK}/x{args.mult}"
    if not os.path.exists(f"{corpus}/lineitem.parquet"):
        t0 = time.time()
        build_corpus(spark, args.mult, corpus)
        print(f"built x{args.mult} corpus in {time.time() - t0:.1f}s",
              file=sys.stderr)

    flat = {t: spark.read.parquet(f"{corpus}/{t}.parquet")
            for t in ("lineitem", "orders", "customer", "nation")}

    # bucketed copies: saveAsTable is required — bucketing metadata lives
    # in the catalog, not in the parquet footers
    keys = {"lineitem": "l_orderkey", "orders": "o_orderkey",
            "customer": "c_custkey"}
    for t, key in keys.items():
        name = f"{t}_b{args.buckets}"
        if not spark.catalog.tableExists(name):
            # the catalog is in-memory per process but the warehouse dir
            # persists — clear a stale location from a previous run
            import shutil
            shutil.rmtree(f"{WORK}/warehouse/{name}", ignore_errors=True)
            t0 = time.time()
            (flat[t].write.bucketBy(args.buckets, key).sortBy(key)
             .mode("overwrite").saveAsTable(name))
            print(f"bucketed {t} ({args.buckets} buckets, sorted by {key}) "
                  f"in {time.time() - t0:.1f}s", file=sys.stderr)
    bucketed = {t: spark.table(f"{t}_b{args.buckets}") for t in keys}
    bucketed["nation"] = flat["nation"]

    report: dict[str, dict] = {}
    for qname, body in QUERIES.items():
        out: dict[str, dict] = {}
        for label, tabs in (("flat", flat), ("bucketed", bucketed)):
            mk = lambda tt=tabs, b=body: b(tt)
            warm = mk()
            warm.collect()  # warm: codegen + page cache (finalizes AQE)
            plan = warm._jdf.queryExecution().executedPlan().toString()
            print(f"--- {qname} {label} executed plan "
                  "(joins/exchanges) ---", file=sys.stderr)
            for line in plan.splitlines():
                if any(k in line for k in (
                        "Exchange", "SortMergeJoin", "BroadcastHashJoin",
                        "ShuffledHashJoin")):
                    print(line[:150], file=sys.stderr)
            out[label] = {
                "best_sec": time_best(mk, args.runs),
                "exchanges": len(re.findall(
                    r"\bExchange hashpartitioning", plan)),
            }

        # results must agree bit-for-bit on the sorted tuple set
        a = sorted(map(tuple, body(flat).collect()))
        b = sorted(map(tuple, body(bucketed).collect()))
        out["rows"] = len(a)
        out["results_match"] = a == b
        out["speedup"] = round(out["flat"]["best_sec"]
                               / out["bucketed"]["best_sec"], 2)
        report[qname] = out

    print(json.dumps({
        "mult": args.mult, "buckets": args.buckets, "runs": args.runs,
        **report,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
