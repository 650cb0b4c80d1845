"""Time EVERY declared query individually with the noop sink (guide §1.4).

The bench gate times only the 12 HEADLINE queries with collect()/count()
drain; this tool sweeps the full registry so an optimization round can
rank ALL operators by measured cost, not by plan shape alone. The noop
sink computes every column of every row and discards it — no driver
materialization, no column-pruned count() shortcut — so the number is
the computation itself.

    python tools/bench_all_queries.py [sf_dir] [--runs 2] [--out FILE]
                                      [query ...]

One JSON line: {"sf_dir": ..., "runs": N, "queries": {name: best_sec},
"loadavg": [...]}. Queries are labelled via setJobDescription so the UI
maps jobs back to registry names (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from physioview_spark.session import get_spark
    from physioview_spark import cache
    import __spark_entry__ as e

    spark = get_spark("bench-all-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = args.queries or sorted(qs)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        if name not in qs:
            errors[name] = "unknown query"
            continue
        best = None
        try:
            for _ in range(args.runs):
                # fresh plan each pass; pins released between passes so a
                # pass never reads the previous pass's materialized blocks
                with cache.pinned_frames():
                    spark.sparkContext.setJobDescription(f"bench-all: {name}")
                    t0 = time.perf_counter()
                    df = qs[name](spark, args.sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                spark.sparkContext.setJobDescription(None)
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001 - survey tool: record and move on
            errors[name] = f"{type(ex).__name__}: {ex}"[:300]
        print(f"{timings.get(name, 'ERR'):>8}  {name}", file=sys.stderr)

    out = {
        "sf_dir": args.sf_dir,
        "runs": args.runs,
        "total": round(sum(timings.values()), 3),
        "queries": timings,
        "errors": errors,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
