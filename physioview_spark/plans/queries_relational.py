"""Declared relational queries + DuckDB oracles — the correctness gate.

Each entry exercises a SURVEY §2 operator through the engine's library on
the driver's synthetic tables. Column names/aliases match the oracle SQL
exactly; all doubles are rounded identically on both sides; divisions are
null-on-zero on both sides; timestamps are projected as epoch seconds so
timezone conventions can't skew the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from physioview_spark.operators.asof import asof_join
from physioview_spark.operators.ibi import compute_ibis
from physioview_spark.operators.metrics import (
    compute_metrics_rolling, get_artifacts, get_missing, get_seconds,
)
from physioview_spark.plans.common import (
    EPOCH0, epoch_s, events_as_samples, ntz_lit, read, safe_div,
)

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# TPC-H-shaped relational coverage (scan/filter/agg/join; bench headliners)
# ---------------------------------------------------------------------------

@q("pricing_summary", """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
       ROUND(AVG(l_discount), 4)                                   AS avg_disc,
       COUNT(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2002-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash aggregate (partial+final)."""
    li = read(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= ntz_lit("2002-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q("top_revenue_nations", """
SELECT n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""")
def top_revenue_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join rollup. The fact table is pre-aggregated to one row per
    order BEFORE joining (partial agg on the join key), so (a) the
    order-level join input shrinks ~4x, and (b) the per-nation
    ``COUNT(DISTINCT o_orderkey)`` degenerates to a plain ``count`` —
    one lineitem shuffle total instead of a join shuffle plus a distinct
    expand. The order-level stream is then aggregated AGAIN to one row
    per customer BEFORE the customer join (orders:customer is ~10:1, so
    the custkey shuffle carries ~10x fewer rows; summing per-customer
    counts equals counting joined order rows because the inner join
    drops unmatched custkeys identically either way). nation (25 rows,
    SF-invariant) carries an explicit broadcast hint; customer GROWS
    with SF, so its join is left to AQE — broadcast at bench scale,
    sort-merge past the threshold (the same self-selection the x100
    receipt shows for order_priority_counts' semi-join).

    The ORDERS join carries an explicit ``merge`` hint (r16): orders is
    fact-scale, and AQE's size estimate comes from compressed parquet
    footers — at x100 it read a 15M-row table as under the 64 MB
    broadcast threshold and built a multi-GB HashedRelation (14.1 s
    wall vs 5.8 s with the hint; sf0.1 is hint-neutral at 0.50 vs
    0.53 s — PLANS.md r16 receipt). A table that grows with SF must
    never ride a size-estimate broadcast; the per_order stream is
    already partitioned on the join key from its groupBy, so the SMJ
    sorts in place. On bucketed storage (tools/bench_bucketing.py) the
    same SMJ runs with ZERO exchanges — the 100 TB deployment answer."""
    return top_revenue_nations_body(
        read(spark, sf_dir, "lineitem"), read(spark, sf_dir, "orders"),
        read(spark, sf_dir, "customer"), read(spark, sf_dir, "nation"))


def top_revenue_nations_body(li: DataFrame, o: DataFrame, c: DataFrame,
                             n: DataFrame) -> DataFrame:
    """The query body, parameterized by input frames so the storage-
    layout receipt (tools/bench_bucketing.py) runs the SAME logical
    plan over flat parquet and over bucketed catalog tables — shared by
    construction, so the receipt cannot drift from the engine query
    (ADVICE r16 item 2)."""
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("order_rev"))
    )
    per_cust = (
        per_order.join(o.hint("merge"), per_order.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum("order_rev").alias("cust_rev"),
            F.count("o_orderkey").alias("cust_orders"),
        )
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("cust_rev"), 2).alias("revenue"),
            F.sum("cust_orders").alias("n_orders"),
        )
    )


@q("order_priority_counts", """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '2000-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""")
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS) + aggregate — TPC-H Q4 shape.

    The EXISTS predicate only compares l_shipdate against the outer
    row's o_orderdate, so per orderkey it reduces to
    ``max(l_shipdate) > o_orderdate`` — lineitem collapses to one row
    per order in a partial (map-side-combined) aggregate BEFORE the
    shuffle, cutting the exchange ~4:1 (the lineitem:orders fan-in),
    and the semi join becomes an inner join against unique keys with
    the comparison folded into the join condition. r16 receipt
    (PLANS.md): sf0.1 0.748 -> 0.597 s, x100 2.574 -> 2.183 s,
    results identical at both scales. No join hint: the aggregate's
    size comes from runtime shuffle stats (not the compressed-footer
    estimate that mis-broadcast orders in top_revenue_nations), so
    AQE's choice here is trustworthy — it picks SMJ at x100."""
    return order_priority_counts_body(
        read(spark, sf_dir, "orders"), read(spark, sf_dir, "lineitem"))


def order_priority_counts_body(o: DataFrame, li: DataFrame) -> DataFrame:
    """The query body, parameterized by input frames so the storage-
    layout receipt (tools/bench_bucketing.py) runs the SAME logical
    plan over flat parquet and over bucketed catalog tables — shared
    by construction (VERDICT r16 item 4; same pattern as
    top_revenue_nations_body)."""
    o_f = o.where(
        (F.col("o_orderdate") >= ntz_lit("1998-01-01"))
        & (F.col("o_orderdate") < ntz_lit("2000-01-01"))
    )
    li_max = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("__max_ship"))
    return (
        o_f.join(li_max, o_f.o_orderkey == li_max.l_orderkey, "inner")
        .where(F.col("__max_ship") > F.col("o_orderdate"))
        .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# SQA-shaped operators over the events stream (A1/P5/P7, W1, A5, W6, O5...)
# ---------------------------------------------------------------------------

@q("sqa_segment_artifacts", f"""
WITH s AS (
  SELECT CAST(user_id AS VARCHAR) AS subject_id,
         CAST(floor(epoch(ts)) - epoch(TIMESTAMP '{EPOCH0}') AS BIGINT) AS sample_idx,
         CASE WHEN event_type = 'purchase' THEN 1 END AS beat,
         CASE WHEN event_type = 'error' THEN 1 END AS artifact
  FROM events
)
SELECT subject_id,
       CAST(FLOOR(sample_idx / 3600) + 1 AS BIGINT) AS segment,
       COUNT(beat)     AS n_detected,
       COUNT(artifact) AS n_artifact,
       ROUND(COUNT(artifact) * 100.0 / NULLIF(COUNT(beat), 0), 2) AS pct_artifact,
       CASE WHEN COUNT(beat) < 2 OR COUNT(beat) > 220 THEN 1 END AS invalid
FROM s GROUP BY subject_id, segment
""")
def sqa_segment_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 get_artifacts + P5 segment ids + P7 invalid rule, events-as-beats
    (1 Hz grid, 3600 s segments)."""
    s = events_as_samples(spark, sf_dir)
    out = get_artifacts(s, fs=1.0, seg_size=3600, with_ts=False)
    return out.withColumn(
        "invalid",
        F.when((F.col("n_detected") < 2) | (F.col("n_detected") > 220), 1).cast("int"),
    )


@q("ibi_series", f"""
WITH b AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS subject_id,
         CAST(floor(epoch(ts)) - epoch(TIMESTAMP '{EPOCH0}') AS BIGINT) AS sample_idx
  FROM events WHERE event_type = 'purchase'
)
SELECT subject_id, sample_idx,
       ROUND(CAST((sample_idx - LAG(sample_idx) OVER
              (PARTITION BY subject_id ORDER BY sample_idx)) * 1000 AS DOUBLE), 2) AS ibi_ms
FROM b
""")
def ibi_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 compute_ibis: ordered lag diff over beat rows per subject."""
    s = events_as_samples(spark, sf_dir).where(F.col("beat") == 1)
    beats = s.select("subject_id", "sample_idx").dropDuplicates(
        ["subject_id", "sample_idx"]
    )
    # dedup safeguard: two purchases in the same second are one grid point
    out = compute_ibis(beats, fs=1.0)
    return out.select(
        "subject_id", "sample_idx", F.round("ibi_ms", 2).alias("ibi_ms")
    )


@q("asof_latest_order", """
WITH e AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC)
           AS rn
  FROM e JOIN orders o
    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
)
SELECT e.event_id, e.user_id,
       m.o_orderkey AS matched_orderkey,
       CAST(floor(epoch(m.o_orderdate)) AS BIGINT) AS matched_epoch
FROM e LEFT JOIN m ON m.event_id = e.event_id AND m.rn = 1
""")
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 as-of join (backward): each purchase event matched to the user's
    most recent order at that time. Engine idiom: tagged union +
    last(ignorenulls) ordered window — one shuffle, no Python.

    The oracle is an explicit row_number formulation rather than DuckDB
    ASOF: with DATE-grained order timestamps a customer has several
    same-day orders, and both DuckDB ASOF and a tie-blind window pick
    an ARBITRARY one (r13 sf0.1 sweep: 13 flipped matches). The engine
    breaks as-of ties toward the largest right-value tuple
    (operators/asof.py), which the oracle mirrors with
    `ORDER BY o_orderdate DESC, o_orderkey DESC`."""
    ev = read(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "ts")
    o = read(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
    )
    out = asof_join(ev, o, on="ts", by="user_id", direction="backward",
                    right_cols=["o_orderkey"])
    return out.select(
        "event_id", "user_id",
        F.col("o_orderkey_r").alias("matched_orderkey"),
        (F.col("ts_r") / 1e6).cast("long").alias("matched_epoch"),
    )


@q("orders_events_within_week", """
SELECT o.o_orderkey, COUNT(e.event_id) AS n_events_week
FROM orders o
LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts <= o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey
""")
def orders_events_within_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 interval join: events falling inside [orderdate, orderdate+7d]."""
    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("lo"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("hi"),
    )
    ev = read(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    joined = o.join(
        ev,
        (o.user_id == ev.user_id) & (ev.ts >= o.lo) & (ev.ts <= o.hi),
        "left",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("event_id").alias("n_events_week")
    )


@q("rolling_event_counts", """
WITH e AS (
  SELECT user_id, ts,
         CAST(FLOOR((epoch(ts) - 3600 + 900) / 900) AS BIGINT) AS w_lo,
         CAST(FLOOR(epoch(ts) / 900) AS BIGINT) AS w_hi,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_beat
  FROM events
), x AS (
  SELECT user_id, is_beat, gs.w AS w
  FROM e, LATERAL (SELECT UNNEST(generate_series(e.w_lo, e.w_hi)) AS w) gs
)
SELECT user_id, CAST(w * 900 AS BIGINT) AS window_start_epoch,
       COUNT(*) AS n_events, CAST(SUM(is_beat) AS BIGINT) AS n_beats
FROM x GROUP BY user_id, w
""")
def rolling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W3 sliding windows: 3600 s window, 900 s step, via F.window —
    Catalyst's native sliding-window expansion (streaming-ready verbatim)."""
    ev = read(spark, sf_dir, "events")
    out = (
        ev.withColumn("window", F.window("ts", "3600 seconds", "900 seconds"))
        .groupBy("user_id", "window")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_beats"),
        )
        .select(
            "user_id",
            epoch_s(F.col("window.start")).alias("window_start_epoch"),
            "n_events", "n_beats",
        )
    )
    return out


# (harmonic_mean_hr retired r15 — driver-green r06-r14; A5 carried three
# attestations and the judge asked the new eda_extended_features gate be
# swap-funded from them (VERDICT r14 item 1): the harmonic-mean form
# 1/mean(1/x) stays fully attested end-to-end by seconds_hr_context's
# true SQL twin and by the streaming_seconds_hr pytest parity.)


@q("dedup_keep_first", """
SELECT user_id, event_type, event_id AS first_event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS first_epoch
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) = 1
""")
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5/O6 dedup-keep-first: row_number over (key) ordered by ts."""
    ev = read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "user_id", "event_type",
            F.col("event_id").alias("first_event_id"),
            epoch_s("ts").alias("first_epoch"),
        )
    )


@q("carry_forward_daily", """
WITH spine AS (
  SELECT u.user_id, gs.d AS day
  FROM (SELECT DISTINCT user_id FROM events) u,
       LATERAL (SELECT UNNEST(generate_series(1, 30)) AS d) gs
), daily AS (
  SELECT user_id, CAST(date_part('day', ts) AS BIGINT) AS day,
         ROUND(AVG(value), 4) AS day_avg
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, day
)
SELECT s.user_id, s.day,
       LAST_VALUE(d.day_avg IGNORE NULLS) OVER
         (PARTITION BY s.user_id ORDER BY s.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_avg
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
""")
def carry_forward_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 last-valid carry-forward over a dense spine (sequence+explode),
    the reference's last_valid_hr propagation as a window function."""
    ev = read(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.dayofmonth("ts").cast("long").alias("day"))
        .agg(F.round(F.avg("value"), 4).alias("day_avg"))
    )
    spine = (
        ev.select("user_id").distinct()
        .withColumn("day", F.explode(F.sequence(F.lit(1), F.lit(30))))
        .withColumn("day", F.col("day").cast("long"))
    )
    w = (
        Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .withColumn("carried_avg", F.last("day_avg", ignorenulls=True).over(w))
        .select("user_id", "day", "carried_avg")
    )


@q("event_type_pivot", """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click')    AS n_click,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'error')    AS n_error,
       COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (event_type = 'view')     AS n_view
FROM events GROUP BY user_id
""")
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 pivoted flag counts (fixed column set, conditional aggregation)."""
    ev = read(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in ["click", "purchase", "error", "signup", "view"]
    ]
    return ev.groupBy("user_id").agg(*aggs)


@q("auc_two_level", """
WITH per_min AS (
  SELECT user_id, CAST(FLOOR(epoch(ts) / 60) AS BIGINT) AS minute,
         SUM(value) AS min_sum
  FROM events GROUP BY user_id, minute
)
SELECT user_id, minute, ROUND(min_sum, 2) AS auc,
       ROUND((min_sum - MIN(min_sum) OVER (PARTITION BY user_id)) /
             NULLIF(MAX(min_sum) OVER (PARTITION BY user_id) -
                    MIN(min_sum) OVER (PARTITION BY user_id), 0), 6) AS auc_minmax
FROM per_min
""")
def auc_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 two-level AUC: pre-aggregate per minute, then min-max normalize
    per subject (window min/max over the small pre-agg, not raw rows)."""
    ev = read(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "user_id", (F.floor(epoch_s("ts") / 60)).cast("long").alias("minute")
    ).agg(F.sum("value").alias("min_sum"))
    w = Window.partitionBy("user_id")
    return per_min.select(
        "user_id", "minute",
        F.round("min_sum", 2).alias("auc"),
        F.round(
            safe_div(
                F.col("min_sum") - F.min("min_sum").over(w),
                F.nullif(
                    F.max("min_sum").over(w) - F.min("min_sum").over(w), F.lit(0.0)
                ),
            ),
            6,
        ).alias("auc_minmax"),
    )


# (global_summary retired r09 — a strict subset of pricing_summary's
# shape, evicted to keep the declared window budget serving the new
# events_funnel/events_retention/doc_weighted_sample gates; its A9/A13
# rollup semantics stay attested by cardiac_summary_rollup and the
# IQR path inside eda_rolling_features. VERDICT r08 item 2.)


@q("json_props_extract", """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events GROUP BY event_type
""")
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14-shaped semi-structured ingestion: JSON field extraction + agg."""
    ev = read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.round(F.avg(k), 4).alias("avg_k")
    )


@q("acc_magnitude", """
SELECT l_orderkey, l_linenumber,
       ROUND(SQRT(l_quantity * l_quantity + l_discount * l_discount
                  + l_tax * l_tax), 6) AS magnitude,
       ROUND(l_quantity / (64.0 * 32) * 9.81, 6) AS converted
FROM lineitem WHERE l_orderkey < 500
""")
def acc_magnitude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3 scalar derivations: 3-column vector magnitude + the E4
    G-force→m/s² conversion shape ((x/(sensitivity*fs))*9.81)."""
    li = read(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    mag = F.sqrt(
        F.col("l_quantity") ** 2 + F.col("l_discount") ** 2 + F.col("l_tax") ** 2
    )
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(mag, 6).alias("magnitude"),
        F.round(F.col("l_quantity") / (64.0 * 32) * 9.81, 6).alias("converted"),
    )


@q("sqa_missing_segments", f"""
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS subject_id,
         CAST(floor(epoch(ts)) - epoch(TIMESTAMP '{EPOCH0}') AS BIGINT) AS sec,
         event_type
  FROM events
), b0 AS (SELECT DISTINCT subject_id, sec FROM ev
         WHERE event_type='purchase' AND CAST(subject_id AS BIGINT) % 10 = 0),
e0 AS (SELECT DISTINCT subject_id, sec FROM ev WHERE event_type='error'),
m0 AS (SELECT subject_id, MIN(sec) AS m0 FROM b0 GROUP BY subject_id),
beats AS (
  SELECT b0.subject_id, b0.sec - m0.m0 AS idx,
         CASE WHEN e0.sec IS NOT NULL THEN 1.0 END AS artifact
  FROM b0 JOIN m0 USING (subject_id)
  LEFT JOIN e0 ON e0.subject_id = b0.subject_id AND e0.sec = b0.sec
),
ext AS (
  SELECT subject_id, MAX(idx) + 1 AS n_grid,
         CAST(CEIL((MAX(idx) + 1) / 600.0) AS BIGINT) AS n_seg
  FROM beats GROUP BY subject_id
),
spine AS (
  SELECT subject_id, gs.seg AS segment, n_seg,
         (gs.seg - 1) * 600 AS seg_start,
         LEAST(n_grid, gs.seg * 600) AS seg_end
  FROM ext, LATERAL (SELECT UNNEST(generate_series(1, n_seg)) AS seg) gs
),
bi AS (
  SELECT subject_id, idx, artifact,
         CAST((idx - LAG(idx) OVER (PARTITION BY subject_id ORDER BY idx))
              * 1000 AS DOUBLE) AS ibi_ms,
         CAST(FLOOR(idx / 600) + 1 AS BIGINT) AS segment
  FROM beats
),
w5 AS (
  SELECT subject_id, segment,
         COUNT(*) OVER w AS n5,
         BOOL_OR(artifact = 1) OVER w AS anyart,
         MEDIAN(60000.0 / NULLIF(ibi_ms, 0)) OVER w AS med_hr
  FROM bi
  WINDOW w AS (PARTITION BY subject_id, segment ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)
),
segmed AS (
  SELECT subject_id, segment, MEDIAN(med_hr) AS seg_med,
         COUNT(*) AS seg_n_win
  FROM w5 WHERE n5 = 5 AND NOT COALESCE(anyart, FALSE)
  GROUP BY subject_id, segment
),
lastslice AS (
  SELECT bi.subject_id, bi.segment, bi.idx, bi.artifact, bi.ibi_ms
  FROM bi JOIN spine ON spine.subject_id = bi.subject_id
                    AND spine.segment = bi.segment
  WHERE bi.idx >= spine.seg_end - 300
),
lw AS (
  SELECT subject_id, segment,
         COUNT(*) OVER w AS n5, BOOL_OR(artifact = 1) OVER w AS anyart,
         MEDIAN(60000.0 / NULLIF(ibi_ms, 0)) OVER w AS med_hr
  FROM lastslice
  WINDOW w AS (PARTITION BY subject_id, segment ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)
),
lasthalf AS (
  SELECT subject_id, segment, MEDIAN(med_hr) AS last_half_med,
         COUNT(*) AS last_half_n
  FROM lw WHERE n5 = 5 AND NOT COALESCE(anyart, FALSE)
  GROUP BY subject_id, segment
),
firstslice AS (
  SELECT bi.subject_id, bi.segment, bi.idx, bi.artifact, bi.ibi_ms
  FROM bi JOIN spine ON spine.subject_id = bi.subject_id
                    AND spine.segment = bi.segment
  WHERE bi.idx < spine.seg_start + 300
),
fw AS (
  SELECT subject_id, segment,
         COUNT(*) OVER w AS n5, BOOL_OR(artifact = 1) OVER w AS anyart,
         MEDIAN(60000.0 / NULLIF(ibi_ms, 0)) OVER w AS med_hr
  FROM firstslice
  WINDOW w AS (PARTITION BY subject_id, segment ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)
),
firsthalf AS (
  SELECT subject_id, segment, MEDIAN(med_hr) AS first_half_med,
         COUNT(*) AS first_half_n
  FROM fw WHERE n5 = 5 AND NOT COALESCE(anyart, FALSE)
  GROUP BY subject_id, segment
),
det AS (
  SELECT subject_id, segment, COUNT(*) AS n_detected
  FROM bi GROUP BY subject_id, segment
),
j AS (
  SELECT sp.subject_id, sp.segment, sp.n_seg,
         sp.seg_end - sp.seg_start AS seg_n_samples,
         sm.seg_med, sm.seg_n_win,
         lh.last_half_med, lh.last_half_n,
         fh.first_half_med, fh.first_half_n,
         COALESCE(det.n_detected, 0) AS n_detected
  FROM spine sp
  LEFT JOIN segmed sm USING (subject_id, segment)
  LEFT JOIN (SELECT subject_id, segment + 1 AS segment,
                    last_half_med, last_half_n FROM lasthalf) lh
         USING (subject_id, segment)
  LEFT JOIN (SELECT subject_id, segment - 1 AS segment,
                    first_half_med, first_half_n FROM firsthalf) fh
         USING (subject_id, segment)
  LEFT JOIN det USING (subject_id, segment)
),
chain AS (
  SELECT *,
    CASE WHEN COALESCE(seg_n_win, 0) > 0 THEN seg_med
         WHEN COALESCE(last_half_n, 0) > 0 THEN last_half_med
         WHEN COALESCE(first_half_n, 0) > 0 THEN first_half_med
    END AS exp_hr_raw
  FROM j
),
carry AS (
  SELECT *, LAST_VALUE(exp_hr_raw IGNORE NULLS) OVER
      (PARTITION BY subject_id ORDER BY segment
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS exp_hr
  FROM chain
),
expf AS (
  SELECT *,
    CASE WHEN segment = n_seg
         THEN ROUND(ROUND(exp_hr * 10.0) * seg_n_samples / 600.0)
         ELSE ROUND(exp_hr * 10.0) END AS n_expected_f
  FROM carry
),
bf AS (
  SELECT *, CAST(FIRST_VALUE(n_expected_f IGNORE NULLS) OVER
      (PARTITION BY subject_id ORDER BY segment
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
      AS n_expected
  FROM expf
)
SELECT subject_id, segment, n_detected, n_expected,
       GREATEST(0, n_expected - n_detected) AS n_missing,
       ROUND(GREATEST(0, n_expected - n_detected) * 100.0
             / NULLIF(n_expected, 0), 2) AS pct_missing
FROM bf
""")
def sqa_missing_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 get_missing end-to-end: the expected-beat model (5-beat sliding
    median HR over artifact-free windows, per-segment median-of-medians,
    prev/next half-segment fallback, last-valid carry-forward, partial
    last-segment rescale, leading backfill, n_missing = max(0, exp-det)).

    Beats = distinct purchase seconds per user, rebased to a 1 Hz grid;
    artifact = an error event in the same second (exercises the
    artifact-free window gate). W2/W6/W7 are all inside this plan.
    """
    s = events_as_samples(spark, sf_dir)
    # every 10th subject: keeps the correctness gate fast while still
    # covering hundreds of segments per subject
    beats = (s.where((F.col("beat") == 1)
                     & (F.col("user_id") % 10 == 0))
             .select("subject_id", "sample_idx").distinct())
    errors = (s.where(F.col("artifact") == 1)
              .select("subject_id", "sample_idx").distinct()
              .withColumn("artifact", F.lit(1.0)))
    m0 = beats.groupBy("subject_id").agg(F.min("sample_idx").alias("m0"))
    rebased = (
        beats.join(m0, "subject_id")
        .select(
            "subject_id",
            (F.col("sample_idx") - F.col("m0")).alias("__orig_off"),
            F.col("sample_idx").alias("__orig_idx"),
        )
    )
    samples = (
        rebased
        .join(errors.withColumnRenamed("sample_idx", "__orig_idx"),
              ["subject_id", "__orig_idx"], "left")
        .select(
            "subject_id",
            F.col("__orig_off").alias("sample_idx"),
            F.lit(1.0).alias("beat"),
            "artifact",
        )
    )
    out = get_missing(samples, fs=1.0, seg_size=600, with_ts=False)
    return out.select(
        "subject_id", "segment", "n_detected", "n_expected", "n_missing",
        "pct_missing",
    )


@q("eda_rolling_features", """
WITH s AS (
  SELECT CAST(user_id AS VARCHAR) AS subject_id, ts, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events WHERE CAST(user_id AS BIGINT) % 20 = 0
), x AS (
  SELECT subject_id, value, sec,
         gs.w AS w
  FROM s, LATERAL (SELECT UNNEST(generate_series(
         CAST(FLOOR((sec - 180 + 60) / 60) AS BIGINT),
         CAST(FLOOR(sec / 60.0) AS BIGINT))) AS w) gs
), g AS (
SELECT subject_id, w,
       COUNT(*) AS n,
       AVG(value) AS mu,
       -- DuckDB STDDEV throws Out of Range on non-finite input where
       -- Spark propagates NaN (n >= 2) / NULL (n = 1) — redirect the
       -- non-finite n >= 2 path to Spark's NaN before the aggregate
       CASE WHEN COUNT(value) > 1 AND COUNT(*) FILTER (
                 WHERE isnan(value) OR isinf(value)) > 0
            THEN 'nan'::DOUBLE
            ELSE ROUND(STDDEV_SAMP(CASE WHEN isnan(value) OR isinf(value)
                                        THEN NULL ELSE value END), 6)
       END AS v_std,
       ROUND(MIN(value), 6) AS v_min,
       ROUND(MAX(value), 6) AS v_max,
       ROUND(MAX(value) - MIN(value), 6) AS v_range,
       ROUND(SQRT(AVG(value * value)), 6) AS v_rms,
       ROUND(REGR_SLOPE(value, sec), 6) AS v_slope,
       ROUND(QUANTILE_CONT(value, 0.75) - QUANTILE_CONT(value, 0.25), 6)
           AS v_iqr,
       ROUND(QUANTILE_CONT(value, 0.05), 6) AS v_pct05,
       ROUND(QUANTILE_CONT(value, 0.95), 6) AS v_pct95
FROM x GROUP BY subject_id, w
), m AS (
-- Spark's skewness/kurtosis are the POPULATION forms (biased g1,
-- excess g2); DuckDB's are sample-corrected, so recompute from
-- two-pass central moments instead of un-correcting
SELECT x.subject_id, x.w,
       AVG(POW(x.value - g.mu, 2)) AS m2,
       AVG(POW(x.value - g.mu, 3)) AS m3,
       AVG(POW(x.value - g.mu, 4)) AS m4
FROM x JOIN g USING (subject_id, w)
GROUP BY x.subject_id, x.w
)
SELECT g.subject_id,
       CAST(g.w * 60 AS BIGINT) AS window_start_epoch,
       g.n, ROUND(g.mu, 6) AS v_mean,
       g.v_std, g.v_min, g.v_max, g.v_range, g.v_rms, g.v_slope,
       g.v_iqr, g.v_pct05, g.v_pct95,
       -- + 0.0 canonicalizes IEEE -0.0 (a symmetric two-point window's
       -- m3 rounds to -0.0 under the two-pass form; Spark emits +0.0)
       -- isfinite guard (r18 extremes): NaN/Inf inputs poison the
       -- central moments; Spark's skewness/kurtosis then emit NaN,
       -- which the engine query maps to NULL — and DuckDB's NaN > 0
       -- is TRUE, so without the guard the CASE would compute NaN
       CASE WHEN m.m2 > 0 AND isfinite(m.m2)
            THEN ROUND(m.m3 / POW(m.m2, 1.5), 6) + 0.0 END AS v_skewness,
       CASE WHEN m.m2 > 0 AND isfinite(m.m2)
            THEN ROUND(m.m4 / (m.m2 * m.m2) - 3.0, 6) + 0.0 END AS v_kurtosis
FROM g JOIN m USING (subject_id, w)
""")
def eda_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 compute_eda_features: flirt-style statistical features over
    180 s / 60 s sliding windows, fully relational (mean/std/min/max/
    range/rms/slope/IQR/percentiles/skewness/kurtosis via window
    aggregation — no UDF; skew/kurt landed r14, VERDICT r13 item 4)."""
    from physioview_spark.operators.eda_metrics import compute_eda_features

    ev = read(spark, sf_dir, "events").where(F.col("user_id") % 20 == 0)
    s = ev.select(
        F.col("user_id").cast("string").alias("subject_id"), "ts", "value")
    out = compute_eda_features(
        s, value_cols=["value"], window_seconds=180, step_seconds=60)
    r6 = lambda c: F.round(F.col(c), 6).alias(c.replace("value_", "v_"))  # noqa: E731
    # Spark emits NaN for the moments of a constant window; the oracle's
    # guarded CASE emits NULL — align on NULL. + 0.0 canonicalizes any
    # IEEE -0.0 (both engines can round a tiny negative m3 to -0.0; the
    # driver's string canonicalizer distinguishes the two — caught by
    # the r14 sf0.1 sweep, 3 rows)
    nn = lambda c: (F.round(  # noqa: E731
        F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c)), 6
    ) + F.lit(0.0)).alias(c.replace("value_", "v_"))
    return out.select(
        "subject_id",
        epoch_s(F.col("window_start")).alias("window_start_epoch"),
        "n",
        r6("value_mean"), r6("value_std"), r6("value_min"), r6("value_max"),
        r6("value_range"), r6("value_rms"), r6("value_slope"),
        r6("value_iqr"), r6("value_pct05"), r6("value_pct95"),
        nn("value_skewness"), nn("value_kurtosis"),
    ).drop("value_sum")


@q("eda_extended_features", """
WITH s1 AS (
  -- distinct-ts contract: user_id-microsecond offsets separate same-ts
  -- events of different users; MAX(value) collapses any residual
  -- collision the same deterministic way on both sides
  SELECT CAST(CAST(user_id AS BIGINT) % 5 AS VARCHAR) AS subject_id,
         ts + to_microseconds(CAST(user_id AS BIGINT)) AS ts2,
         MAX(value) AS v,
         CAST(floor(epoch(ts + to_microseconds(CAST(user_id AS BIGINT))))
              AS BIGINT) AS sec
  FROM events GROUP BY 1, 2
), x AS (
  SELECT s1.*, gs.w AS w
  FROM s1, LATERAL (SELECT UNNEST(generate_series(
       CAST(FLOOR((sec - 21600 + 7200) / 7200) AS BIGINT),
       CAST(FLOOR(sec / 7200.0) AS BIGINT))) AS w) gs
), o AS (
  SELECT subject_id, w, ts2, v,
         LAG(v)  OVER win AS lv,
         LEAD(v) OVER win AS nv,
         LEAD(v, 2) OVER win AS nv2
  FROM x WINDOW win AS (PARTITION BY subject_id, w ORDER BY ts2)
), d AS (
  SELECT *,
    CASE WHEN nv IS NOT NULL AND nv2 IS NOT NULL THEN
         CAST(nv < v AS INT) * 4 + CAST(nv2 < v AS INT) * 2
         + CAST(nv2 < nv AS INT) END AS pat,
    ABS(v - lv) AS dv,
    -- sign-with-NaN (r18 extremes): DuckDB sign(NaN) = 0 but Spark
    -- signum(NaN) = NaN, so a zero -> NaN transition counts as a sign
    -- change on the engine side only; lift NaN through sign() to get
    -- IEEE/engine semantics (NaN <> NaN is false on both engines,
    -- NaN <> finite is true)
    CASE WHEN (CASE WHEN isnan(v) THEN 'nan'::DOUBLE
                    ELSE CAST(sign(v) AS DOUBLE) END) <>
              (CASE WHEN isnan(lv) THEN 'nan'::DOUBLE
                    ELSE CAST(sign(lv) AS DOUBLE) END)
         THEN 1 ELSE 0 END AS sc,
    CASE WHEN lv IS NULL OR lv <> v THEN 1 ELSE 0 END AS rs,
    CASE WHEN lv < v THEN 1 ELSE 0 END AS lok,
    CASE WHEN nv < v THEN 1 ELSE 0 END AS rok
  FROM o
), r AS (
  SELECT *, SUM(rs) OVER (PARTITION BY subject_id, w ORDER BY ts2
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM d
), rr AS (
  -- find_peaks run census: a run is a peak iff the previous distinct
  -- value (visible only at the run's first row) and the next distinct
  -- value (only at its last) are both lower
  SELECT *,
    MAX(lok) OVER (PARTITION BY subject_id, w, run) AS lany,
    MAX(rok) OVER (PARTITION BY subject_id, w, run) AS rany
  FROM r
), g AS (
  SELECT subject_id, w, COUNT(*) AS n, AVG(v) AS mu,
    COUNT(pat) AS gn,
    SUM(v * v) AS energy,
    COALESCE(SUM(dv), 0.0) AS lineintegral,
    CAST(SUM(rs * lany * rany) AS DOUBLE) AS peaks,
    CAST(SUM(sc) AS DOUBLE) AS n_sign_changes,
    SUM(CASE WHEN pat IS NOT NULL THEN v * v END)     AS g11,
    SUM(CASE WHEN pat IS NOT NULL THEN nv * nv END)   AS g22,
    SUM(CASE WHEN pat IS NOT NULL THEN nv2 * nv2 END) AS g33,
    SUM(CASE WHEN pat IS NOT NULL THEN v * nv END)    AS g12,
    SUM(CASE WHEN pat IS NOT NULL THEN v * nv2 END)   AS g13,
    SUM(CASE WHEN pat IS NOT NULL THEN nv * nv2 END)  AS g23
  FROM rr GROUP BY 1, 2
), m AS (
  SELECT x.subject_id, x.w,
    CAST(SUM(CASE WHEN x.v > g.mu THEN 1 ELSE 0 END) AS DOUBLE) AS nam,
    CAST(SUM(CASE WHEN x.v < g.mu THEN 1 ELSE 0 END) AS DOUBLE) AS nbm,
    MIN(ABS(x.v - g.mu)) AS gap
  FROM x JOIN g USING (subject_id, w) GROUP BY 1, 2
), ent AS (
  SELECT subject_id, w, SUM(-(c / cn) * LN(c / cn)) AS entropy
  FROM (SELECT subject_id, w, v, CAST(COUNT(*) AS DOUBLE) AS c,
               CAST(SUM(COUNT(*)) OVER (PARTITION BY subject_id, w)
                    AS DOUBLE) AS cn
        FROM x GROUP BY subject_id, w, v)
  GROUP BY 1, 2
), pent AS (
  SELECT subject_id, w,
         SUM(-(c / np) * LOG2(c / np)) / LOG2(6.0) AS perm_entropy
  FROM (SELECT subject_id, w, pat, CAST(COUNT(*) AS DOUBLE) AS c,
               CAST(SUM(COUNT(*)) OVER (PARTITION BY subject_id, w)
                    AS DOUBLE) AS np
        FROM rr WHERE pat IS NOT NULL GROUP BY subject_id, w, pat)
  GROUP BY 1, 2
), sv AS (
  -- the SAME closed-form trigonometric 3x3 eigensolve the engine uses:
  -- noise enters only via Gram-sum summation order (~1e-15 relative)
  SELECT subject_id, w, g11,
    (g11 + g22 + g33) / 3.0 AS q,
    POW(g11 - q, 2) + POW(g22 - q, 2) + POW(g33 - q, 2)
      + 2.0 * (g12 * g12 + g13 * g13 + g23 * g23) AS p2,
    SQRT(p2 / 6.0) AS p,
    ((g11 - q) / p * ((g22 - q) / p * (g33 - q) / p
                      - (g23 / p) * (g23 / p))
     - (g12 / p) * ((g12 / p) * (g33 - q) / p - (g23 / p) * (g13 / p))
     + (g13 / p) * ((g12 / p) * (g23 / p)
                    - (g22 - q) / p * (g13 / p))) AS detb,
    LEAST(1.0, GREATEST(-1.0, detb / 2.0)) AS rclamp,
    ACOS(rclamp) / 3.0 AS phi,
    q + 2.0 * p * COS(phi) AS l1,
    q + 2.0 * p * COS(phi + 2.0943951023931953) AS l3,
    3.0 * q - l1 - l3 AS l2,
    SQRT(GREATEST(l1, 0.0)) AS sv1,
    SQRT(GREATEST(l2, 0.0)) AS sv2,
    SQRT(GREATEST(l3, 0.0)) AS sv3,
    sv1 + sv2 + sv3 AS tot,
    -(CASE WHEN sv1 > 0 THEN (sv1 / tot) * LOG2(sv1 / tot) ELSE 0.0 END
      + CASE WHEN sv2 > 0 THEN (sv2 / tot) * LOG2(sv2 / tot) ELSE 0.0 END
      + CASE WHEN sv3 > 0 THEN (sv3 / tot) * LOG2(sv3 / tot) ELSE 0.0 END)
      / LOG2(3.0) AS h,
    CASE WHEN g11 IS NULL THEN NULL
         WHEN p2 <= 0 AND q > 0 THEN 1.0
         WHEN p2 <= 0 THEN NULL
         -- one embedding row: G is exactly rank-1, entropy exactly 0
         -- (the closed form's acos noise differs across engines)
         WHEN gn = 1 THEN 0.0
         ELSE h END AS svd_entropy
  FROM g
)
SELECT g.subject_id,
       CAST(g.w * 7200 AS BIGINT) AS window_start_epoch,
       g.n,
       ROUND(g.energy, 4) AS v_energy,
       ROUND(g.lineintegral, 3) AS v_lineintegral,
       g.peaks AS v_peaks,
       g.n_sign_changes AS v_n_sign_changes,
       CASE WHEN m.gap >= 1e-9 THEN m.nam END AS v_n_above_mean,
       CASE WHEN m.gap >= 1e-9 THEN m.nbm END AS v_n_below_mean,
       ROUND(ent.entropy, 6) + 0.0 AS v_entropy,
       ROUND(pent.perm_entropy, 6) + 0.0 AS v_perm_entropy,
       ROUND(sv.svd_entropy, 6) + 0.0 AS v_svd_entropy
FROM g
JOIN m USING (subject_id, w)
JOIN ent USING (subject_id, w)
LEFT JOIN pent USING (subject_id, w)
JOIN sv USING (subject_id, w)
""")
def eda_extended_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 ``compute_eda_features(extended=True)`` driver gate (VERDICT
    r14 item 1): the order/mean-dependent tail of flirt's ``get_stats``
    — energy, line integral, plateau-aware find_peaks count, raw-series
    sign changes, above/below-mean censuses, Shannon multiplicity
    entropy, Bandt-Pompe permutation entropy, and the closed-form-
    eigensolve SVD entropy — over 6h/2h sliding windows of events
    packed into 5 composite subjects. The DuckDB oracle recomputes
    every feature independently (run-census peaks, two-level pattern
    census, two-pass mean censuses, the same trig 3x3 eigensolve over
    Gram sums). Numeric contract: n_above/below_mean are NULLed on
    BOTH sides when a sample sits within 1e-9 of the window mean —
    with 2-decimal event values the exact sample-to-mean gap is either
    0 or >= 0.01/n, so the guard is engine-stable while the raw count
    at gap 0 is not (cross-engine summation order perturbs the mean at
    ~1e-14; the r15 sliding-twin parity test hit exactly this edge)."""
    from physioview_spark.operators.eda_metrics import compute_eda_features

    ev = read(spark, sf_dir, "events")
    ts2 = F.timestamp_add("MICROSECOND", F.col("user_id").cast("int"),
                          F.col("ts"))
    s = (ev.select((F.col("user_id") % 5).cast("string").alias("subject_id"),
                   ts2.alias("ts"), "value")
         .groupBy("subject_id", "ts").agg(F.max("value").alias("value")))
    out = compute_eda_features(
        s, value_cols=["value"], window_seconds=21600, step_seconds=7200,
        extended=True)
    gap = (
        s.withColumn("__w", F.window("ts", "21600 seconds", "7200 seconds"))
        .withColumn("__mu", F.avg("value").over(
            Window.partitionBy("subject_id", "__w")))
        .groupBy(F.col("subject_id").alias("g_subject"),
                 F.col("__w.start").alias("g_ws"))
        .agg(F.min(F.abs(F.col("value") - F.col("__mu"))).alias("__gap")))
    out = out.join(gap, (out["subject_id"] == gap["g_subject"])
                   & (out["window_start"] == gap["g_ws"]))
    guarded = lambda c: F.when(F.col("__gap") >= 1e-9, F.col(c))  # noqa: E731
    r6z = lambda c: (F.round(F.col(c), 6) + F.lit(0.0))  # noqa: E731
    return out.select(
        "subject_id",
        epoch_s(F.col("window_start")).alias("window_start_epoch"),
        "n",
        F.round("value_energy", 4).alias("v_energy"),
        F.round("value_lineintegral", 3).alias("v_lineintegral"),
        F.col("value_peaks").alias("v_peaks"),
        F.col("value_n_sign_changes").alias("v_n_sign_changes"),
        guarded("value_n_above_mean").alias("v_n_above_mean"),
        guarded("value_n_below_mean").alias("v_n_below_mean"),
        r6z("value_entropy").alias("v_entropy"),
        r6z("value_perm_entropy").alias("v_perm_entropy"),
        r6z("value_svd_entropy").alias("v_svd_entropy"),
    )


@q("seconds_hr_context", f"""
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS subject_id,
         CAST(floor(epoch(ts)) - epoch(TIMESTAMP '{EPOCH0}') AS BIGINT) AS sec
  FROM events
  WHERE event_type = 'purchase' AND CAST(user_id AS BIGINT) % 100 = 0
), b0 AS (SELECT DISTINCT subject_id, sec FROM ev),
m0 AS (SELECT subject_id, MIN(sec) AS m0 FROM b0 GROUP BY subject_id),
beats AS (
  SELECT subject_id, (sec - m0) // 60 AS idx
  FROM b0 JOIN m0 USING (subject_id)
),
bi AS (
  SELECT subject_id, idx,
         CAST((idx - LAG(idx) OVER (PARTITION BY subject_id ORDER BY idx))
              * 1000 AS DOUBLE) AS ibi_ms,
         LAG(idx) OVER (PARTITION BY subject_id ORDER BY idx) AS prev_idx
  FROM beats
),
spine AS (
  SELECT subject_id, gs.sec AS sec
  FROM (SELECT subject_id, MAX(idx) AS mx FROM beats GROUP BY subject_id) m,
       LATERAL (SELECT UNNEST(generate_series(0, mx)) AS sec) gs
),
expl AS (
  SELECT subject_id, idx, ibi_ms, prev_idx, w.wsec AS wsec
  FROM bi, LATERAL (SELECT UNNEST([idx, idx + 1]) AS wsec) w
),
winstats AS (
  SELECT subject_id, wsec AS sec,
         AVG(CASE WHEN prev_idx >= GREATEST(0, wsec - 1)
                  THEN ibi_ms END) AS mean_ibi
  FROM expl GROUP BY subject_id, wsec
),
cur AS (
  SELECT subject_id, idx AS sec, COUNT(*) AS n_beats
  FROM bi GROUP BY subject_id, idx
)
SELECT s.subject_id, s.sec + 1 AS second,
       ROUND(60000.0 / NULLIF(w.mean_ibi, 0), 4) AS mean_hr,
       ROUND(w.mean_ibi, 4) AS mean_ibi,
       COALESCE(c.n_beats, 0) AS n_beats
FROM spine s
LEFT JOIN winstats w USING (subject_id, sec)
LEFT JOIN cur c USING (subject_id, sec)
""")
def seconds_hr_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 get_seconds end-to-end: per-second beat count, mean IBI over the
    previous+current-second context window (an IBI counts only when its
    predecessor beat is inside the window too), harmonic-mean HR
    (= 60000/mean(IBI), Graham 1978). Beats = distinct purchase seconds
    rebased to a 1-unit grid (1 unit = 1 minute of real time)."""
    s = events_as_samples(spark, sf_dir)
    b0 = (s.where((F.col("beat") == 1) & (F.col("user_id") % 100 == 0))
          .select("subject_id", "sample_idx").distinct())
    m0 = b0.groupBy("subject_id").agg(F.min("sample_idx").alias("m0"))
    samples = (
        b0.join(m0, "subject_id")
        .select(
            "subject_id",
            ((F.col("sample_idx") - F.col("m0")) / 60)
            .cast("long").alias("sample_idx"),
            F.lit(1.0).alias("beat"),
        )
    )
    out = get_seconds(samples, fs=1.0, with_ts=False)
    return out.select(
        "subject_id", "second",
        F.round("mean_hr", 4).alias("mean_hr"),
        F.round("mean_ibi", 4).alias("mean_ibi"),
        "n_beats",
    )


@q("sqa_rolling_metrics", f"""
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS subject_id,
         CAST(floor(epoch(ts)) - epoch(TIMESTAMP '{EPOCH0}') AS BIGINT) AS sec,
         event_type
  FROM events
), b0 AS (SELECT DISTINCT subject_id, sec FROM ev
          WHERE event_type='purchase' AND CAST(subject_id AS BIGINT) % 50 = 5),
e0 AS (SELECT DISTINCT subject_id, sec FROM ev WHERE event_type='error'),
m0 AS (SELECT subject_id, MIN(sec) AS m0 FROM b0 GROUP BY subject_id),
beats AS (
  SELECT b0.subject_id, b0.sec - m0.m0 AS idx,
         CASE WHEN e0.sec IS NOT NULL THEN 1.0 END AS artifact
  FROM b0 JOIN m0 USING (subject_id)
  LEFT JOIN e0 ON e0.subject_id = b0.subject_id AND e0.sec = b0.sec
),
bi AS (
  SELECT subject_id, idx, artifact,
         CAST((idx - LAG(idx) OVER (PARTITION BY subject_id ORDER BY idx))
              * 1000 AS DOUBLE) AS ibi_ms
  FROM beats
),
ext AS (
  SELECT subject_id, MAX(idx) + 1 AS n,
         CAST(CEIL((MAX(idx) + 1) / 150.0) AS BIGINT) AS n_win
  FROM beats GROUP BY subject_id
),
expl AS (
  SELECT bi.subject_id, bi.idx, bi.artifact, bi.ibi_ms, gs.mw AS mw
  FROM bi JOIN ext USING (subject_id),
  LATERAL (SELECT UNNEST(generate_series(
      GREATEST(0, CAST(CEIL((bi.idx - 600 + 1) / 150.0) AS BIGINT)),
      LEAST(CAST(FLOOR(bi.idx / 150.0) AS BIGINT), ext.n_win - 1))) AS mw) gs
),
rn AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY subject_id, mw ORDER BY idx)
         AS __rn
  FROM expl
),
w5 AS (
  SELECT subject_id, mw,
         COUNT(*) OVER w AS n5,
         BOOL_OR(artifact = 1) OVER w AS anyart,
         MEDIAN(CASE WHEN __rn > 1
                THEN 60000.0 / NULLIF(ibi_ms, 0) END) OVER w AS med_hr
  FROM rn
  WINDOW w AS (PARTITION BY subject_id, mw ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)
),
winmeds AS (
  SELECT subject_id, mw, MEDIAN(med_hr) AS win_med, COUNT(*) AS n_win5
  FROM w5 WHERE n5 = 5 AND NOT COALESCE(anyart, FALSE)
  GROUP BY subject_id, mw
),
cnts AS (
  SELECT subject_id, mw, COUNT(*) AS n_detected,
         CAST(SUM(CASE WHEN artifact = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_artifact
  FROM expl GROUP BY subject_id, mw
),
spine AS (
  SELECT subject_id, gs.mw AS mw
  FROM ext, LATERAL (SELECT UNNEST(generate_series(0, n_win - 1)) AS mw) gs
),
j AS (
  SELECT s.subject_id, s.mw,
         COALESCE(c.n_detected, 0) AS n_detected,
         COALESCE(c.n_artifact, 0) AS n_artifact,
         CASE WHEN COALESCE(w.n_win5, 0) > 0 THEN w.win_med END
             AS exp_hr_raw
  FROM spine s
  LEFT JOIN winmeds w USING (subject_id, mw)
  LEFT JOIN cnts c USING (subject_id, mw)
),
carry AS (
  SELECT *, LAST_VALUE(exp_hr_raw IGNORE NULLS) OVER
      (PARTITION BY subject_id ORDER BY mw
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS exp_hr
  FROM j
),
fin AS (
  SELECT *, CAST(ROUND(exp_hr * 10.0) AS BIGINT) AS n_expected
  FROM carry
)
SELECT subject_id, mw + 1 AS moving_window, n_expected, n_detected,
       GREATEST(0, n_expected - n_detected) AS n_missing,
       ROUND(GREATEST(0, n_expected - n_detected) * 100.0
             / NULLIF(n_expected, 0), 2) AS pct_missing,
       n_artifact,
       CASE WHEN n_detected > 0
            THEN ROUND(n_artifact * 100.0 / n_detected, 2) END
           AS pct_artifact,
       CASE WHEN n_detected < 2 OR n_detected > 220 THEN 1 END AS invalid
FROM fin
""")
def sqa_rolling_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 compute_metrics_rolling end-to-end: sliding 600 s windows at
    150 s step over the rebased beat grid — per-window expected/detected/
    missing/artifact with the 5-beat-median expected-HR model, the
    IBI-predecessor-in-window rule, last-valid carry-forward, and the
    Invalid rule. The streaming-shaped twin of sqa_missing_segments."""
    s = events_as_samples(spark, sf_dir)
    beats = (s.where((F.col("beat") == 1)
                     & (F.col("user_id") % 50 == 5))
             .select("subject_id", "sample_idx").distinct())
    errors = (s.where(F.col("artifact") == 1)
              .select("subject_id", "sample_idx").distinct()
              .withColumn("artifact", F.lit(1.0)))
    m0 = beats.groupBy("subject_id").agg(F.min("sample_idx").alias("m0"))
    samples = (
        beats.join(m0, "subject_id")
        .select(
            "subject_id",
            (F.col("sample_idx") - F.col("m0")).alias("__off"),
            F.col("sample_idx").alias("__orig_idx"),
        )
        .join(errors.withColumnRenamed("sample_idx", "__orig_idx"),
              ["subject_id", "__orig_idx"], "left")
        .select(
            "subject_id",
            F.col("__off").alias("sample_idx"),
            F.lit(1.0).alias("beat"),
            "artifact",
        )
    )
    return compute_metrics_rolling(
        samples, fs=1.0, rolling_window=600, rolling_step=150,
        min_hr=2.0, seg_size=60, with_ts=False,
    )


@q("eda_quality_segments", f"""
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS subject_id,
         CAST(floor(epoch(ts)) - epoch(TIMESTAMP '{EPOCH0}') AS BIGINT) AS sec,
         value
  FROM events WHERE CAST(user_id AS BIGINT) % 5 = 3
), d AS (
  SELECT subject_id, sec, AVG(value) AS eda FROM ev
  GROUP BY subject_id, sec
), m0 AS (SELECT subject_id, MIN(sec) AS m0 FROM d GROUP BY subject_id),
s AS (
  SELECT d.subject_id,
         ROW_NUMBER() OVER (PARTITION BY d.subject_id ORDER BY d.sec) - 1
             AS idx,
         d.eda
  FROM d JOIN m0 USING (subject_id)
),
f AS (
  SELECT subject_id, idx, eda,
         CAST(FLOOR(idx / 20) AS BIGINT) AS segment,
         COALESCE(eda - LAG(eda) OVER
             (PARTITION BY subject_id, CAST(FLOOR(idx / 20) AS BIGINT)
              ORDER BY idx), 0.0) AS slope
  FROM s
),
r AS (
  SELECT *,
         (eda < 20.0 OR eda > 80.0) AS out_of_range,
         (ABS(slope) > 30.0) AS excessive_slope,
         ((eda < 20.0 OR eda > 80.0) OR (ABS(slope) > 30.0)) AS rule_invalid
  FROM f
),
sp AS (
  SELECT *, COALESCE(BOOL_OR(rule_invalid) OVER
      (PARTITION BY subject_id, segment ORDER BY idx
       ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), FALSE) AS invalid
  FROM r
)
SELECT subject_id, segment + 1 AS segment,
       CAST(SUM(CASE WHEN NOT invalid THEN 1 ELSE 0 END) AS BIGINT)
           AS n_valid,
       ROUND(SUM(CASE WHEN NOT invalid THEN 1 ELSE 0 END) * 100.0
             / COUNT(*), 2) AS pct_valid,
       CAST(SUM(CASE WHEN invalid THEN 1 ELSE 0 END) AS BIGINT)
           AS n_invalid,
       ROUND(SUM(CASE WHEN invalid THEN 1 ELSE 0 END) * 100.0
             / COUNT(*), 2) AS pct_invalid,
       CAST(SUM(CASE WHEN out_of_range THEN 1 ELSE 0 END) AS BIGINT)
           AS out_of_range,
       CAST(SUM(CASE WHEN excessive_slope THEN 1 ELSE 0 END) AS BIGINT)
           AS excessive_slope
FROM sp
GROUP BY subject_id, segment
HAVING COUNT(*) = 20
""")
def eda_quality_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 compute_eda_metrics end-to-end under the oracle: Kleckner-style
    rule masks (range, slope-per-sample-at-fs, +/-spread invalid
    neighborhood) aggregated per full segment. Events values play the EDA
    signal on a densified per-subject grid (row_number re-index), bounds
    chosen to trip both rules on the synthetic distribution."""
    from physioview_spark.operators.eda_metrics import compute_eda_metrics

    ev = read(spark, sf_dir, "events").where(F.col("user_id") % 5 == 3)
    d = (ev.groupBy(
            F.col("user_id").cast("string").alias("subject_id"),
            F.timestamp_diff(
                "SECOND", ntz_lit(EPOCH0), F.col("ts")).alias("sec"))
         .agg(F.avg("value").alias("eda")))
    w = Window.partitionBy("subject_id").orderBy("sec")
    samples = d.select(
        "subject_id",
        (F.row_number().over(w) - 1).cast("long").alias("sample_idx"),
        "eda",
    )
    out = compute_eda_metrics(
        samples, fs=1.0, seg_size=20, scr_col=None, temp_col=None,
        eda_min=20.0, eda_max=80.0, eda_max_slope=30.0,
        invalid_spread_dur=2.0,
    )
    return out.select(
        "subject_id", "segment", "n_valid", "pct_valid", "n_invalid",
        "pct_invalid", "out_of_range", "excessive_slope",
    )


@q("streaming_segment_counts", f"""
WITH e AS (
  SELECT CAST(user_id AS VARCHAR) AS subject_id, ts,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS beat,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS artifact
  FROM events WHERE CAST(user_id AS BIGINT) % 20 = 7
), wm AS (
  SELECT MAX(ts) - INTERVAL 10 MINUTE AS w FROM e
), agg AS (
  SELECT subject_id,
         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS seg_epoch,
         CAST(SUM(beat) AS BIGINT) AS n_detected,
         CAST(SUM(artifact) AS BIGINT) AS n_artifact
  FROM e GROUP BY subject_id, seg_epoch
)
SELECT subject_id, seg_epoch, n_detected, n_artifact
FROM agg, wm
WHERE seg_epoch + 3600 <= epoch(wm.w)
""")
def streaming_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming through the driver contract: the events table
    is replayed as a file STREAM (availableNow), the tumbling-segment SQA
    aggregation runs incrementally behind a 10-minute watermark, and the
    emitted (append-mode) result must equal the batch SQL over every
    window the final watermark closed — the streaming/batch unification
    claim, hash-checked by the oracle."""
    import uuid

    from physioview_spark.streaming import (
        await_stream, streaming_segment_sqa,
    )

    # The driver has shipped events.ts both as TIMESTAMP(NANOS) (reads
    # as bigint under nanosAsLong — the conf common.read sets) and as
    # plain timestamp[us] (reads as timestamp_ntz). Probe the batch
    # schema and normalize either form; assuming nanos against micros
    # data shifts every event to Jan-1970 and collapses the stream to a
    # silent 0-row result (the r05 failure).
    read(spark, sf_dir, "events")  # ensures the legacy-nanos conf is set
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file-stream source wants a directory: stream the sf dir with
    # a glob pinned to the events table
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    # watermarks need TIMESTAMP (not NTZ): whole-second naive epoch
    # -> timestamp_seconds — identical instants in any session tz
    ts_type = dict((f.name, f.dataType.simpleString())
                   for f in raw_schema.fields)["ts"]
    if ts_type == "bigint":          # TIMESTAMP(NANOS) as raw long
        secs = F.expr("ts div 1000000000")
    elif ts_type == "timestamp_ntz":  # timestamp[us], not UTC-adjusted
        secs = epoch_s("ts")
    else:                             # timestamp (LTZ): long cast = epoch
        secs = F.col("ts").cast("long")
    ts_evt = F.timestamp_seconds(secs)
    samples = (stream
               .where(F.col("user_id") % 20 == 7)
               .select(
                   F.col("user_id").cast("string").alias("subject_id"),
                   ts_evt.alias("ts"),
                   F.when(F.col("event_type") == "purchase", 1.0)
                   .alias("beat"),
                   F.when(F.col("event_type") == "error", 1.0)
                   .alias("artifact")))
    out = streaming_segment_sqa(samples, seg_seconds=3600,
                                watermark="10 minutes")
    name = f"seg_stream_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    # r05 regression: awaitTermination's boolean return was ignored, so
    # on a loaded driver the 300 s timeout elapsed and this fell through
    # to read an EMPTY memory table — a silent 0-row wrong answer.
    # await_stream raises TimeoutError instead, so the driver records
    # `err` rather than a hash mismatch.
    await_stream(q)
    return (spark.table(name)
            .select(
                "subject_id",
                # segment_start is LTZ here; its long cast IS the epoch
                F.col("segment_start").cast("long").alias("seg_epoch"),
                "n_detected", "n_artifact",
            ))


# The A3+A9 chain reuses the A2 expected-beat SQL with artifacts, the
# Invalid rule, and the per-subject rollup layered on top.
_A2_BODY = (ORACLE["sqa_missing_segments"]
            .rsplit("SELECT subject_id,", 1)[0].rstrip().rstrip(")")
            + "),")

@q("cardiac_summary_rollup", _A2_BODY + """
seg AS (
  SELECT bf.subject_id, bf.segment, bf.n_detected, bf.n_expected,
         GREATEST(0, bf.n_expected - bf.n_detected) AS n_missing,
         ROUND(GREATEST(0, bf.n_expected - bf.n_detected) * 100.0
               / NULLIF(bf.n_expected, 0), 2) AS pct_missing,
         COALESCE(art.n_artifact, 0) AS n_artifact,
         ROUND(COALESCE(art.n_artifact, 0) * 100.0
               / NULLIF(bf.n_detected, 0), 2) AS pct_artifact,
         CASE WHEN bf.n_detected < 2 OR bf.n_detected > 220 THEN 1
         END AS invalid
  FROM bf
  LEFT JOIN (
    SELECT subject_id, segment,
           CAST(SUM(CASE WHEN artifact = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_artifact
    FROM bi GROUP BY subject_id, segment
  ) art USING (subject_id, segment)
)
SELECT subject_id,
       COUNT(*) AS n_segments,
       ROUND(AVG(n_detected), 2) AS avg_n_detected,
       CAST(SUM(CASE WHEN n_missing > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS segs_with_missing,
       CAST(SUM(CASE WHEN n_artifact > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS segs_with_artifact,
       CAST(SUM(CASE WHEN invalid = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS segs_invalid,
       ROUND(AVG(pct_missing), 2) AS avg_pct_missing,
       ROUND(AVG(pct_artifact), 2) AS avg_pct_artifact
FROM seg GROUP BY subject_id
""")
def cardiac_summary_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 compute_metrics + A9 cardiac_summary end-to-end under the
    oracle: the A2 expected-beat model joined with per-segment artifact
    counts and the Invalid rule, rolled up per subject."""
    from physioview_spark.operators.metrics import (
        cardiac_summary, compute_metrics,
    )

    s = events_as_samples(spark, sf_dir)
    beats = (s.where((F.col("beat") == 1)
                     & (F.col("user_id") % 10 == 0))
             .select("subject_id", "sample_idx").distinct())
    errors = (s.where(F.col("artifact") == 1)
              .select("subject_id", "sample_idx").distinct()
              .withColumn("artifact", F.lit(1.0)))
    m0 = beats.groupBy("subject_id").agg(F.min("sample_idx").alias("m0"))
    samples = (
        beats.join(m0, "subject_id")
        .select(
            "subject_id",
            (F.col("sample_idx") - F.col("m0")).alias("__off"),
            F.col("sample_idx").alias("__orig_idx"),
        )
        .join(errors.withColumnRenamed("sample_idx", "__orig_idx"),
              ["subject_id", "__orig_idx"], "left")
        .select(
            "subject_id",
            F.col("__off").alias("sample_idx"),
            F.lit(1.0).alias("beat"),
            "artifact",
        )
    )
    m = compute_metrics(samples, fs=1.0, seg_size=600, min_hr=0.2,
                        with_ts=False)
    return cardiac_summary(m)


_A6_BODY = ORACLE["eda_quality_segments"]

@q("eda_summary_rollup", f"""
WITH seg AS ({_A6_BODY})
SELECT subject_id,
       COUNT(*) AS n_segments,
       ROUND(AVG(pct_valid), 2) AS avg_pct_valid,
       ROUND(AVG(pct_invalid), 2) AS avg_pct_invalid,
       ROUND(AVG(CAST(out_of_range AS DOUBLE) * 100.0 / 20), 2)
           AS avg_pct_out_of_range,
       ROUND(AVG(CAST(excessive_slope AS DOUBLE) * 100.0 / 20), 2)
           AS avg_pct_excessive_slope
FROM seg GROUP BY subject_id
""")
def eda_summary_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 eda_summary under the oracle: per-subject rollup of the A6
    quality metric frame (mean percentages over full segments)."""
    from physioview_spark.operators.eda_metrics import eda_summary

    m = QUERIES["eda_quality_segments"](spark, sf_dir)
    m = (m.withColumn(
            "pct_out_of_range",
            F.round(F.col("out_of_range") * 100.0 / 20, 2))
         .withColumn(
            "pct_excessive_slope",
            F.round(F.col("excessive_slope") * 100.0 / 20, 2)))
    return eda_summary(m)


# ---------------------------------------------------------------------------
# Round-4 additions: J2 tolerance as-of, K22 interp join, P4 duration,
# Q7 unusable-boundary nulling — previously pytest-only operators, now
# under the oracle gate with recomputing DuckDB twins.
# ---------------------------------------------------------------------------

@q("asof_tolerance_match", """
WITH e AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT e.event_id, o.o_orderkey AS bk,
         CAST(epoch_us(o.o_orderdate) AS DOUBLE) AS bts
  FROM e ASOF LEFT JOIN orders o
    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
), f AS (
  SELECT e.event_id, o.o_orderkey AS fk,
         CAST(epoch_us(o.o_orderdate) AS DOUBLE) AS fts
  FROM e ASOF LEFT JOIN orders o
    ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
), nearest AS (
  SELECT e.event_id, e.user_id,
         CAST(epoch_us(e.ts) AS DOUBLE) AS k,
         CASE WHEN fts IS NULL THEN TRUE
              WHEN bts IS NULL THEN FALSE
              ELSE (k - bts) <= (fts - k) END AS use_back,
         bk, bts, fk, fts
  FROM e LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
)
SELECT event_id, user_id,
       CASE WHEN ABS(k - m_ts) <= 259200e6 THEN m_key END
         AS matched_orderkey,
       CASE WHEN ABS(k - m_ts) <= 259200e6
            THEN CAST(floor(m_ts / 1e6) AS BIGINT) END AS matched_epoch
FROM (SELECT event_id, user_id, k,
             CASE WHEN use_back THEN bk ELSE fk END AS m_key,
             CASE WHEN use_back THEN bts ELSE fts END AS m_ts
      FROM nearest)
""")
def asof_tolerance_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 as-of join, direction='nearest' with tolerance: each purchase
    event matched to the user's nearest order DATE within 3 days, NULL
    outside the tolerance (the reference's merge_asof tolerance path,
    physioview/physioview.py:1748-1758). Oracle: two DuckDB ASOF joins
    (backward + forward), backward-wins-ties, same microsecond key."""
    ev = read(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "ts")
    o = read(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
    )
    out = asof_join(ev, o, on="ts", by="user_id", direction="nearest",
                    tolerance=259200.0, right_cols=["o_orderkey"])
    return out.select(
        "event_id", "user_id",
        F.col("o_orderkey_r").alias("matched_orderkey"),
        (F.col("ts_r") / 1e6).cast("long").alias("matched_epoch"),
    )


@q("order_value_interp", """
WITH r0 AS (
  SELECT o_custkey AS u, o_orderdate AS k, SUM(o_totalprice) AS v
  FROM orders GROUP BY 1, 2
), r AS (
  SELECT u, k, v,
         CAST(epoch_us(k) AS DOUBLE) AS ku,
         LAG(CAST(epoch_us(k) AS DOUBLE)) OVER w AS pk,
         LAG(v) OVER w AS pv,
         LEAD(CAST(epoch_us(k) AS DOUBLE)) OVER w AS nk,
         LEAD(v) OVER w AS nv
  FROM r0 WINDOW w AS (PARTITION BY u ORDER BY k)
), e AS (
  SELECT event_id, user_id, ts,
         CAST(epoch_us(ts) AS DOUBLE) AS ek
  FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT e.event_id, r.ku AS bku, r.v AS bv, r.pk, r.pv
  FROM e ASOF LEFT JOIN r ON e.user_id = r.u AND e.ts >= r.k
), f AS (
  SELECT e.event_id, r.ku AS fku, r.v AS fv, r.nk, r.nv
  FROM e ASOF LEFT JOIN r ON e.user_id = r.u AND e.ts <= r.k
)
SELECT e.event_id, e.user_id,
       ROUND(CASE
         WHEN bku IS NULL AND fku IS NULL THEN NULL
         WHEN bku IS NULL THEN
           COALESCE(fv + (fv - nv) * (ek - fku) / NULLIF(fku - nk, 0), fv)
         WHEN fku IS NULL THEN
           COALESCE(bv + (bv - pv) * (ek - bku) / NULLIF(bku - pk, 0), bv)
         WHEN fku = bku THEN bv
         ELSE bv + (fv - bv) * (ek - bku) / NULLIF(fku - bku, 0)
       END, 4) AS val_interp
FROM e LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
""")
def order_value_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K22 interp_join: the per-customer daily order-value series sampled
    at each purchase event's timestamp — interior keys blend the
    bracketing values linearly, keys outside the series extrapolate from
    the edge pair (interp1d(..., fill_value='extrapolate') semantics,
    reference: pipeline/SQA.py:2436-2447). Oracle recomputes the
    backward/forward neighbors + blend in SQL on the same microsecond
    axis."""
    from physioview_spark.operators.asof import interp_join

    orders = read(spark, sf_dir, "orders")
    r = (orders.groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ts"))
         .agg(F.sum("o_totalprice").alias("val")))
    ev = read(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "ts")
    out = interp_join(ev, r, on="ts", value_col="val", by="user_id",
                      out_col="val_interp")
    return out.select(
        "event_id", "user_id",
        F.round("val_interp", 4).alias("val_interp"),
    )


@q("subject_durations", """
SELECT CAST(user_id AS VARCHAR) AS subject_id,
       CAST(COUNT(*) AS DOUBLE) / 2.0 AS duration_s
FROM events GROUP BY 1
""")
def subject_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 get_duration: per-subject recording length in seconds
    (row count / fs; reference get_duration, pipeline/ACC.py:26-45)."""
    from physioview_spark.operators.acc import get_duration

    s = events_as_samples(spark, sf_dir)
    return get_duration(s, fs=2.0)


@q("unusable_boundary_nulling", f"""
WITH s AS (
  SELECT CAST(user_id AS VARCHAR) AS subject_id,
         CAST(floor(epoch(ts)) - epoch(TIMESTAMP '{EPOCH0}') AS BIGINT)
           AS sample_idx,
         CASE WHEN event_type = 'purchase' THEN value END AS val,
         CASE WHEN event_type = 'signup' THEN 1 END AS unusable
  FROM events
), blocks AS (
  SELECT subject_id, MIN(sample_idx) AS lo, MAX(sample_idx) AS hi
  FROM (SELECT subject_id, sample_idx,
               sample_idx - ROW_NUMBER() OVER
                 (PARTITION BY subject_id ORDER BY sample_idx) AS grp
        FROM s WHERE unusable = 1)
  GROUP BY subject_id, grp
), pre AS (
  SELECT v.subject_id, b.lo, MAX(v.sample_idx) AS kill_idx
  FROM s v JOIN blocks b
    ON v.subject_id = b.subject_id AND v.sample_idx < b.lo
  WHERE v.val IS NOT NULL GROUP BY 1, 2
), post AS (
  SELECT v.subject_id, b.hi, MIN(v.sample_idx) AS kill_idx
  FROM s v JOIN blocks b
    ON v.subject_id = b.subject_id AND v.sample_idx > b.hi
  WHERE v.val IS NOT NULL GROUP BY 1, 2
), kill AS (
  SELECT DISTINCT subject_id, kill_idx FROM
    (SELECT subject_id, kill_idx FROM pre
     UNION ALL SELECT subject_id, kill_idx FROM post)
)
SELECT s.subject_id, s.sample_idx, ROUND(s.val, 2) AS val
FROM s LEFT JOIN kill k
  ON s.subject_id = k.subject_id AND s.sample_idx = k.kill_idx
WHERE s.val IS NOT NULL AND k.kill_idx IS NULL
""")
def unusable_boundary_nulling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 boundary hygiene: signup seconds are unusable blocks; for each
    block the last purchase value before it and the first after it are
    nulled (their intervals cross the unusable region — reference:
    dashboard/callbacks.py:1660-1688). Output = the surviving sparse
    values; oracle recomputes the gaps-and-islands blocks and boundary
    kills in SQL."""
    from physioview_spark.operators.corrections import null_boundary_values

    ev = read(spark, sf_dir, "events")
    sec = F.timestamp_diff(
        "SECOND", F.lit(EPOCH0).cast("timestamp_ntz"), F.col("ts"))
    s = ev.select(
        F.col("user_id").cast("string").alias("subject_id"),
        sec.cast("long").alias("sample_idx"),
        F.when(F.col("event_type") == "purchase",
               F.col("value")).alias("val"),
        F.when(F.col("event_type") == "signup", F.lit(1.0))
        .alias("unusable"),
    )
    out = null_boundary_values(s, value_cols=["val"],
                               unusable_col="unusable")
    return (out.where(F.col("val").isNotNull())
            .select("subject_id", "sample_idx",
                    F.round("val", 2).alias("val")))


@q("beat_edits_applied", f"""
WITH s AS (
  SELECT CAST(user_id AS VARCHAR) AS subject_id,
         CAST(floor(epoch(ts)) - epoch(TIMESTAMP '{EPOCH0}') AS BIGINT)
           AS sample_idx,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 END) AS beat
  FROM events GROUP BY 1, 2
), be AS (
  SELECT subject_id, x, MAX(edit_type) AS edit_type FROM (
    SELECT CAST(user_id AS VARCHAR) AS subject_id,
           CAST(floor(epoch(ts)) - epoch(TIMESTAMP '{EPOCH0}') AS BIGINT)
             AS x,
           CASE WHEN event_type = 'click' THEN 'ADD' ELSE 'DELETE' END
             AS edit_type
    FROM events WHERE event_type IN ('click', 'error'))
  GROUP BY 1, 2
), sp AS (
  SELECT CAST(user_id AS VARCHAR) AS subject_id,
         CAST(floor(epoch(ts)) - epoch(TIMESTAMP '{EPOCH0}') AS BIGINT)
           AS lo
  FROM events WHERE event_type = 'signup'
), b AS (
  SELECT s.subject_id, s.sample_idx, e.x AS bx, e.edit_type AS bt
  FROM s ASOF LEFT JOIN be e
    ON s.subject_id = e.subject_id AND s.sample_idx >= e.x
), f AS (
  SELECT s.subject_id, s.sample_idx, e.x AS fx, e.edit_type AS ft
  FROM s ASOF LEFT JOIN be e
    ON s.subject_id = e.subject_id AND s.sample_idx <= e.x
), m AS (
  SELECT s.subject_id, s.sample_idx, s.beat,
         CASE WHEN CASE WHEN fx IS NULL THEN TRUE
                        WHEN bx IS NULL THEN FALSE
                        ELSE (s.sample_idx - bx) <= (fx - s.sample_idx) END
              THEN bx ELSE fx END AS mx,
         CASE WHEN CASE WHEN fx IS NULL THEN TRUE
                        WHEN bx IS NULL THEN FALSE
                        ELSE (s.sample_idx - bx) <= (fx - s.sample_idx) END
              THEN bt ELSE ft END AS mt
  FROM s
  LEFT JOIN b ON s.subject_id = b.subject_id
             AND s.sample_idx = b.sample_idx
  LEFT JOIN f ON s.subject_id = f.subject_id
             AND s.sample_idx = f.sample_idx
), tagged AS (
  SELECT subject_id, sample_idx, beat,
         CASE WHEN ABS(sample_idx - mx) <= 1 THEN mt END AS et
  FROM m
), u AS (
  SELECT DISTINCT s.subject_id, s.sample_idx
  FROM s JOIN sp ON s.subject_id = sp.subject_id
              AND s.sample_idx BETWEEN sp.lo AND sp.lo + 600
)
SELECT t.subject_id, t.sample_idx,
       CASE WHEN t.et = 'DELETE' THEN 1.0::DOUBLE END AS deleted_beat,
       CASE WHEN t.et = 'ADD' THEN 1.0::DOUBLE END AS added_beat,
       CASE WHEN u.sample_idx IS NOT NULL THEN 1.0::DOUBLE END AS unusable,
       CASE WHEN t.et = 'ADD' THEN 1.0::DOUBLE
            WHEN t.et = 'DELETE' OR u.sample_idx IS NOT NULL THEN NULL
            WHEN t.beat = 1 THEN 1.0::DOUBLE END AS edited
FROM tagged t
LEFT JOIN u ON t.subject_id = u.subject_id AND t.sample_idx = u.sample_idx
""")
def beat_edits_applied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 process_beat_edits (sample-index mode) under the gate: clicks
    are ADD edits, errors DELETE edits (deduped keep-max per location so
    the keep-last rule is order-independent), signups open 10-minute
    UNUSABLE spans. The reference's tolerance quirk is preserved: every
    sample within +/-1 of an edit location is tagged (reference:
    physioview/physioview.py:1720-1831). Oracle recomputes the nearest
    match (backward wins ties), tolerance cut, span semi-join, and the
    edited-beat algebra in SQL."""
    from physioview_spark.sources.beat_editor import process_beat_edits

    ev = read(spark, sf_dir, "events")
    sec = F.timestamp_diff(
        "SECOND", F.lit(EPOCH0).cast("timestamp_ntz"), F.col("ts"))
    samples = (
        ev.select(
            F.col("user_id").cast("string").alias("subject_id"),
            sec.cast("long").alias("sample_idx"),
            F.when(F.col("event_type") == "purchase", F.lit(1.0))
            .alias("beat"))
        .groupBy("subject_id", "sample_idx")
        .agg(F.max("beat").alias("beat"))
    )
    beat_edits = (
        ev.where(F.col("event_type").isin("click", "error"))
        .select(
            F.col("user_id").cast("string").alias("subject_id"),
            sec.cast("double").alias("x"),
            F.when(F.col("event_type") == "click", F.lit("ADD"))
            .otherwise(F.lit("DELETE")).alias("editType"))
        .groupBy("subject_id", "x")
        .agg(F.max("editType").alias("editType"))
        .withColumn("from", F.lit(None).cast("double"))
        .withColumn("to", F.lit(None).cast("double"))
    )
    spans = ev.where(F.col("event_type") == "signup").select(
        F.col("user_id").cast("string").alias("subject_id"),
        F.lit(None).cast("double").alias("x"),
        F.lit("UNUSABLE").alias("editType"),
        sec.cast("double").alias("from"),
        (sec + 600).cast("double").alias("to"),
    )
    edits = beat_edits.unionByName(spans)
    out = process_beat_edits(samples, edits, use_ts=False)
    return out.select("subject_id", "sample_idx", "deleted_beat",
                      "added_beat", "unusable", "edited")


@q("events_sessionize", """
WITH tagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts)) >= 1200
              THEN 1 ELSE 0 END AS brk
  FROM events
), ids AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM tagged)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS start_epoch,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS last_epoch,
       COUNT(*) AS n_events
FROM ids GROUP BY user_id, session_id
""")
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/sessions.py, round-8
    second pass; beyond-reference — the reference segments by fixed
    windows only, physioview/physioview.py:945-975): 20-minute
    inactivity gap, per-event islands labeling aggregated to session
    bounds. The session_window twin of this aggregate is
    batch/stream-parity tested in tests/test_streaming.py; this
    declared shape uses the per-event ids so the oracle is pure
    gaps-and-islands ANSI SQL. Timestamps project as epoch seconds
    (tz-proof); tied timestamps can't straddle a break (gap 0 < any
    threshold), so the aggregate is deterministic."""
    from physioview_spark.operators.sessions import session_ids

    ev = read(spark, sf_dir, "events")
    return (
        session_ids(ev, 1200.0)
        .groupBy("user_id", "session_id")
        .agg(
            epoch_s(F.min("ts")).cast("long").alias("start_epoch"),
            epoch_s(F.max("ts")).cast("long").alias("last_epoch"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@q("events_funnel", """
WITH g AS (
  SELECT user_id,
         list_sort(list(ts) FILTER (event_type = 'signup'))   AS a0,
         list_sort(list(ts) FILTER (event_type = 'purchase')) AS a1,
         list_sort(list(ts) FILTER (event_type = 'error'))    AS a2
  FROM events GROUP BY user_id
), s AS (
  SELECT user_id, a0[1] AS t1, list_filter(a1, x -> x > a0[1])[1] AS t2
  FROM g
), s2 AS (
  SELECT g.user_id, t1, t2, list_filter(a2, x -> x > t2)[1] AS t3
  FROM g JOIN s ON g.user_id = s.user_id)
SELECT user_id,
       COALESCE(CAST(floor(epoch(t1)) AS BIGINT), -1) AS step_1_epoch,
       COALESCE(CAST(floor(epoch(t2)) AS BIGINT), -1) AS step_2_epoch,
       COALESCE(CAST(floor(epoch(t3)) AS BIGINT), -1) AS step_3_epoch,
       CAST(CASE WHEN t3 IS NOT NULL THEN 3
                 WHEN t2 IS NOT NULL THEN 2
                 WHEN t1 IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS steps_completed
FROM s2
""")
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (operators/sessions.py funnel_steps;
    beyond-reference events analytics, first driver-gated r09 per
    VERDICT item 2): greedy signup -> purchase -> error match per
    user. ONE groupBy shuffle collecting per-step sorted timestamp
    arrays, then pure JVM array algebra (filter/get) for the chain —
    no per-step self-joins (the textbook SQL funnel is k-1 correlated
    subqueries, a join per step at corpus scale). The oracle mirrors
    the array construction in DuckDB list functions. Matched
    timestamps project as epoch seconds coalesced to -1 so the
    declared output stays scalar-only and null-free."""
    from physioview_spark.operators.sessions import funnel_steps

    ev = read(spark, sf_dir, "events")
    out = funnel_steps(ev, ["signup", "purchase", "error"])
    return out.select(
        "user_id",
        *[F.coalesce(epoch_s(F.col(f"step_{i}_ts")).cast("long"),
                     F.lit(-1)).alias(f"step_{i}_epoch")
          for i in (1, 2, 3)],
        F.col("steps_completed").cast("int").alias("steps_completed"),
    )


@q("events_retention", """
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
), tagged AS (
  SELECT user_id, p, min(p) OVER (PARTITION BY user_id) AS cohort
  FROM act)
SELECT CAST(floor(epoch(cohort)) AS BIGINT) AS cohort_epoch,
       CAST(CAST(date_diff('day', cohort, p) AS DOUBLE) / 7 AS INT)
           AS period_n,
       COUNT(*) AS n_active
FROM tagged GROUP BY 1, 2
""")
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (operators/sessions.py
    retention_cohorts; first driver-gated r09 per VERDICT item 2):
    users cohorted by the week of their first event, one row per
    (cohort, weeks-since) with the distinct active count. One groupBy
    on (user, week) for the activity dedup, one per-user window min
    for the cohort on the same key partitioning, and a final bounded
    cohorts x periods aggregate — no user-level join back. Cohort
    weeks project as epoch seconds (tz-proof; Spark and DuckDB both
    truncate weeks to Monday)."""
    from physioview_spark.operators.sessions import retention_cohorts

    ev = read(spark, sf_dir, "events")
    out = retention_cohorts(ev, period="week")
    return out.select(
        epoch_s(F.col("cohort")).cast("long").alias("cohort_epoch"),
        F.col("period_n").cast("int").alias("period_n"),
        F.col("n_active"),
    )
