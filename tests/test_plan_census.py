"""Plan-shape regression pin: the committed tools/plan_census.json must
match a recomputation, and two invariants hold unconditionally — no
row-at-a-time Python UDF (BatchEvalPython) and no CartesianProduct in
any declared query's physical plan. See tools/plan_census.py."""

from __future__ import annotations

import json
import os
import sys

import pytest

import __spark_entry__ as entry

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))

from plan_census import CENSUS_PATH, census_of  # noqa: E402

QUERIES, _ = entry._registry()
with open(CENSUS_PATH) as _f:
    COMMITTED = json.load(_f)


def test_census_covers_registry():
    """Every declared query is pinned; retired pins are pruned."""
    assert set(COMMITTED) == set(QUERIES), (
        "tools/plan_census.json is out of sync with the registry — "
        "regenerate: python tools/plan_census.py --write")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_census(spark, sf_dir, name):
    # fresh-session plan shape: operators pin() reused sub-frames at
    # plan-construction time via physioview_spark.cache, and the
    # CacheManager would otherwise substitute InMemoryRelation into
    # equal subtrees pinned by whatever test module ran earlier in the
    # shared session, making node counts order-dependent. Release
    # session pins, then scope this query's own pins — same discipline
    # as tools/plan_census.py when generating the committed file.
    from physioview_spark import cache

    cache.release_pinned()
    with cache.pinned_frames():
        got = census_of(QUERIES[name](spark, sf_dir))
    # hard invariants, independent of the committed file
    assert got["batch_udf"] == 0, (
        f"{name}: BatchEvalPython (per-row Python UDF) in the plan — "
        "use Arrow (pandas_udf / mapInPandas) instead")
    assert got["cartesian"] == 0, (
        f"{name}: CartesianProduct in the plan — broadcast the bounded "
        "side (the audited crossJoin sites are all BroadcastNestedLoop)")
    assert got == COMMITTED.get(name), (
        f"{name}: plan shape drifted from the committed census "
        f"(committed {COMMITTED.get(name)}, current {got}). If the "
        "change is intentional, regenerate: python tools/plan_census.py "
        "--write — and justify the new shuffle/join mix in the commit.")
