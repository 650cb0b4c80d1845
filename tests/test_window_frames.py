"""Pin the r18 window-frame optimization: no [current row, UNBOUNDED
FOLLOWING] frames on any forward-carry path.

Spark's UnboundedFollowingWindowFunctionFrame re-scans the partition
tail for every row — O(n^2) per window group (measured: a 28.9 s
single-task straggler on sqa_missing_segments' 553k-row spine at
sf0.1). The engine therefore expresses every forward carry as a
running last(ignorenulls) frame over the fully reversed sort order,
which is incremental O(n). These tests pin (a) the plan shape — no
UNBOUNDED FOLLOWING frame end anywhere in the optimized plans — and
(b) value equivalence of the reversed form on a tie-bearing input.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from physioview_spark.operators.asof import asof_join, interp_join
from physioview_spark.operators.metrics import get_missing


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_forward_plan_has_no_unbounded_following(spark):
    left = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0)], "k string, t double")
    right = spark.createDataFrame(
        [("a", 2.0, 10.0), ("a", 6.0, 20.0)], "k string, t double, v double")
    for direction in ("forward", "nearest"):
        out = asof_join(left, right, on="t", by="k", direction=direction)
        assert "UNBOUNDED FOLLOWING" not in _plan(out)


def test_interp_join_plan_has_no_unbounded_following(spark):
    left = spark.createDataFrame([("a", 1.0)], "k string, t double")
    right = spark.createDataFrame(
        [("a", 0.0, 1.0), ("a", 2.0, 3.0)], "k string, t double, v double")
    out = interp_join(left, right, on="t", value_col="v", by="k")
    assert "UNBOUNDED FOLLOWING" not in _plan(out)


def test_get_missing_plan_has_no_unbounded_following(spark):
    samples = spark.createDataFrame(
        [("s", i * 3, 1.0, None) for i in range(20)],
        "subject_id string, sample_idx long, beat double, artifact double")
    out = get_missing(samples, fs=1.0, seg_size=10, with_ts=False)
    assert "UNBOUNDED FOLLOWING" not in _plan(out)


def test_reversed_backfill_matches_direct_frame(spark):
    """last(ignorenulls) over the reversed running frame must equal
    first(ignorenulls) over [current, unbounded following] — checked
    directly on a null-gapped series (unique order key, like the
    segment spine)."""
    rows = [("s", i, None if i % 3 else float(i)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "k string, seg int, v double")
    fwd = (
        Window.partitionBy("k").orderBy("seg")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    rev = (
        Window.partitionBy("k").orderBy(F.desc("seg"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = df.select(
        "seg",
        F.first("v", ignorenulls=True).over(fwd).alias("direct"),
        F.last("v", ignorenulls=True).over(rev).alias("reversed"),
    ).collect()
    for r in got:
        assert r.direct == r.reversed, r


def test_asof_forward_ties_break_toward_largest_tuple(spark):
    """Duplicate right keys at the matched timestamp: the reversed
    forward pass must still pick the largest orderable carried tuple
    (the documented tie contract)."""
    left = spark.createDataFrame([("a", 5.0)], "k string, t double")
    right = spark.createDataFrame(
        [("a", 7.0, 1.0), ("a", 7.0, 9.0), ("a", 7.0, 4.0)],
        "k string, t double, v double")
    out = asof_join(left, right, on="t", by="k", direction="forward")
    assert out.collect()[0].v_r == 9.0
