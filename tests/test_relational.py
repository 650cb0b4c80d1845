"""Unit tests for the relational operator core on tiny synthetic frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from physioview_spark.operators.segment import segment_data
from physioview_spark.operators.ibi import compute_ibis, attach_ibis
from physioview_spark.operators.asof import asof_join
from physioview_spark.operators.spans import interval_join, expand_spans, flag_spans
from physioview_spark.operators.metrics import (
    compute_metrics, get_artifacts, get_missing, get_seconds,
)


def _samples(spark, beats, n=600, fs=10.0, artifacts=()):
    """Dense sample frame at fs with beat/artifact flags at given indices."""
    rows = [
        (
            "s1",
            i,
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i / fs),
            1.0 if i in set(beats) else None,
            1.0 if i in set(artifacts) else None,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "subject_id string, sample_idx long, ts timestamp, beat double, artifact double"
    )


def test_segment_data(spark):
    df = _samples(spark, beats=[], n=100, fs=10.0)
    out = segment_data(df, fs=10.0, seg_size=2)  # 20 samples per segment
    got = {r["sample_idx"]: r["segment"] for r in out.collect()}
    assert got[0] == 1 and got[19] == 1 and got[20] == 2 and got[99] == 5


def test_compute_ibis(spark):
    beats = [0, 10, 20, 35, 50]  # at fs=10: ibis = 1000,1000,1500,1500 ms
    df = _samples(spark, beats=beats, n=60, fs=10.0)
    b = df.where(F.col("beat") == 1).select("subject_id", "sample_idx")
    out = compute_ibis(b, fs=10.0).orderBy("sample_idx").collect()
    assert [r["ibi_ms"] for r in out] == [None, 1000.0, 1000.0, 1500.0, 1500.0]
    full = attach_ibis(df, fs=10.0)
    assert full.where(F.col("ibi_ms").isNotNull()).count() == 4


def test_asof_join_directions(spark):
    left = spark.createDataFrame(
        [("a", 5.0), ("a", 10.0), ("a", 99.0)], "k string, t double"
    )
    right = spark.createDataFrame(
        [("a", 4.0, "w"), ("a", 9.0, "x"), ("a", 11.0, "y")], "k string, t double, v string"
    )
    back = {
        r["t"]: r["v_r"]
        for r in asof_join(left, right, on="t", by="k", direction="backward").collect()
    }
    assert back == {5.0: "w", 10.0: "x", 99.0: "y"}
    fwd = {
        r["t"]: r["v_r"]
        for r in asof_join(left, right, on="t", by="k", direction="forward").collect()
    }
    assert fwd == {5.0: "x", 10.0: "y", 99.0: None}
    near = {
        r["t"]: r["v_r"]
        for r in asof_join(left, right, on="t", by="k", direction="nearest").collect()
    }
    assert near == {5.0: "w", 10.0: "x", 99.0: "y"}
    # tolerance clips far matches
    tol = {
        r["t"]: r["v_r"]
        for r in asof_join(
            left, right, on="t", by="k", direction="nearest", tolerance=2.0
        ).collect()
    }
    assert tol == {5.0: "w", 10.0: "x", 99.0: None}


def test_asof_join_tie_break_deterministic(spark):
    """Duplicate right timestamps inside a `by` group (routine at scale:
    DATE-grained order stamps give one customer several same-day orders)
    must resolve to the LARGEST right-value tuple in every direction —
    without the r13 tie keys the winner was partition-order arbitrary
    (caught by the sf0.1 oracle sweep: 13 flipped matches)."""
    left = spark.createDataFrame(
        [("a", 10.0), ("a", 3.0)], "k string, t double")
    right = spark.createDataFrame(
        [("a", 4.0, "m"), ("a", 4.0, "z"), ("a", 4.0, "a"),
         ("a", 12.0, "q"), ("a", 12.0, "b")],
        "k string, t double, v string")
    # shuffle the right side hard so partition order cannot fake a pass
    right = right.repartition(7)
    for _ in range(3):  # re-plan a few times: must be stable run-to-run
        back = {r["t"]: r["v_r"] for r in asof_join(
            left, right, on="t", by="k", direction="backward").collect()}
        assert back == {10.0: "z", 3.0: None}
        fwd = {r["t"]: r["v_r"] for r in asof_join(
            left, right, on="t", by="k", direction="forward").collect()}
        assert fwd == {10.0: "q", 3.0: "z"}
        near = {r["t"]: r["v_r"] for r in asof_join(
            left, right, on="t", by="k", direction="nearest").collect()}
        assert near == {10.0: "q", 3.0: "z"}  # 12 is nearer 10 than 4


def test_asof_join_map_typed_carried(spark):
    """A map-typed carried column (Spark can't sort maps) must ride along
    in the payload without joining the tie sort key — the r13 per-column
    tie keys raised AnalysisException here (ADVICE r13)."""
    left = spark.createDataFrame([("a", 10.0)], "k string, t double")
    right = spark.createDataFrame(
        [("a", 4.0, "x", {"s": 1}), ("a", 4.0, "y", {"s": 2})],
        "k string, t double, v string, m map<string,int>")
    row = asof_join(left, right.repartition(5), on="t", by="k",
                    direction="backward").collect()[0]
    # tie resolves on the orderable columns (v desc-of-asc-last => 'y');
    # the map comes from the SAME winning row
    assert row["v_r"] == "y" and row["m_r"] == {"s": 2}


def test_asof_join_tied_nulls_row_consistent(spark):
    """Tied right rows containing NULLs: every carried column must come
    from the one winning row — NULLs included — not be mixed across tied
    rows by per-column ignorenulls (ADVICE r13)."""
    left = spark.createDataFrame([("a", 10.0)], "k string, t double")
    right = spark.createDataFrame(
        [("a", 4.0, "m", "filled"), ("a", 4.0, "z", None)],
        "k string, t double, v string, u string")
    for _ in range(3):
        row = asof_join(left, right.repartition(7), on="t", by="k",
                        direction="backward").collect()[0]
        # winner is the largest orderable tuple ('z', NULL); its NULL u
        # must NOT be backfilled from the losing ('m', 'filled') row
        assert row["v_r"] == "z" and row["u_r"] is None


def test_interval_and_spans(spark):
    pts = spark.createDataFrame(
        [("s1", i) for i in range(10)], "subject_id string, sample_idx long"
    )
    spans = spark.createDataFrame(
        [("s1", 2, 4), ("s1", 7, 8)], "subject_id string, `from` long, `to` long"
    )
    joined = interval_join(pts, spans, "sample_idx", by=["subject_id"])
    assert joined.count() == 5  # 2,3,4,7,8
    expanded = expand_spans(spans)
    assert expanded.count() == 5
    flagged = flag_spans(pts, spans)
    flagged_ix = sorted(
        r["sample_idx"] for r in flagged.where(F.col("unusable") == 1).collect()
    )
    assert flagged_ix == [2, 3, 4, 7, 8]


def test_get_artifacts_counts(spark):
    # fs=10, seg=2s => 20-sample segments; beats every 10 samples
    beats = list(range(0, 600, 10))
    arts = [100, 110, 305]
    df = _samples(spark, beats=beats, n=600, fs=10.0, artifacts=arts)
    out = {r["segment"]: r for r in get_artifacts(df, 10.0, 2).collect()}
    assert all(out[s]["n_detected"] == 2 for s in out)
    assert out[6]["n_artifact"] == 2 and out[16]["n_artifact"] == 1
    assert out[6]["pct_artifact"] == 100.0


def test_get_missing_regular_rhythm(spark):
    # Perfectly regular beats at 2 Hz (every 5 samples at fs=10): HR=120 bpm.
    beats = list(range(0, 600, 5))
    df = _samples(spark, beats=beats, n=600, fs=10.0)
    out = {r["segment"]: r for r in get_missing(df, 10.0, 10).collect()}
    # 60s of data in 10s segments: 6 segments, 20 beats each, HR 120
    assert len(out) == 6
    for s, r in out.items():
        assert r["n_detected"] == 20
        assert r["n_expected"] == 20  # 120 bpm * (10/60)
        assert r["n_missing"] == 0
    m = compute_metrics(df, 10.0, 10, min_hr=40.0)
    rows = {r["segment"]: r for r in m.collect()}
    assert rows[1]["invalid"] is None or rows[1]["invalid"] != 1


def test_get_missing_gap_detected(spark):
    # Regular 1 Hz beats but a dead zone in segment 2 (samples 100-199).
    beats = [i for i in range(0, 600, 10) if not (100 <= i < 200)]
    df = _samples(spark, beats=beats, n=600, fs=10.0)
    out = {r["segment"]: r for r in get_missing(df, 10.0, 10).collect()}
    assert out[2]["n_detected"] == 0
    assert out[2]["n_expected"] == 10  # carried from segment 1 (HR 60)
    assert out[2]["n_missing"] == 10
    assert out[2]["pct_missing"] == 100.0


def test_get_seconds_harmonic(spark):
    # Beats every 5 samples at fs=10 → IBI 500 ms everywhere.
    beats = list(range(0, 100, 5))
    df = _samples(spark, beats=beats, n=100, fs=10.0)
    out = {r["second"]: r for r in get_seconds(df, 10.0).collect()}
    assert len(out) == 10
    # second 1 window = second 0 only: beats 0,5 -> one IBI of 500ms
    assert out[1]["mean_ibi"] == 500.0
    assert out[1]["mean_hr"] == 120.0
    assert out[1]["n_beats"] == 2
    # middle seconds: window = prev+current
    assert out[5]["mean_ibi"] == 500.0 and out[5]["n_beats"] == 2


def test_entry_smoke(spark, sf_dir):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 15


class TestSaltedJoin:
    def test_salted_equals_plain_join(self, spark):
        from physioview_spark.operators.spans import salted_join

        import pandas as pd
        import numpy as np
        rng = np.random.default_rng(0)
        # heavy skew: 80% of left rows share one key
        keys = np.where(rng.random(5000) < 0.8, 7,
                        rng.integers(0, 50, 5000))
        left = spark.createDataFrame(
            pd.DataFrame({"k": keys, "v": np.arange(5000)}))
        right = spark.createDataFrame(
            pd.DataFrame({"k": np.arange(50), "name": [f"n{i}" for i in range(50)]}))
        plain = left.join(right, "k").groupBy("k").count()
        salted = salted_join(left, right, "k", salt_buckets=8) \
            .groupBy("k").count()
        a = {(r["k"], r["count"]) for r in plain.collect()}
        b = {(r["k"], r["count"]) for r in salted.collect()}
        assert a == b


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        """Both sides bucketed on the join key -> sort-merge join with no
        shuffle in the physical plan (the co-location scale path)."""
        import pandas as pd
        import numpy as np

        from physioview_spark.sources.csv import write_bucketed_table

        rng = np.random.default_rng(1)
        n = 20_000
        left = pd.DataFrame({
            "subject_id": (rng.integers(0, 200, n)).astype(str),
            "sample_idx": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
        })
        right = pd.DataFrame({
            "subject_id": np.arange(200).astype(str),
            "fs": np.full(200, 250.0),
        })
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        try:
            write_bucketed_table(
                spark.createDataFrame(left), "b_samples",
                "subject_id", n_buckets=8)
            write_bucketed_table(
                spark.createDataFrame(right), "b_meta",
                "subject_id", n_buckets=8)
            # disable auto-broadcast so the join is genuinely SMJ-shaped,
            # then verify bucketing removed the shuffles
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = spark.table("b_samples").join(
                spark.table("b_meta"), "subject_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == n
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
            spark.sql("DROP TABLE IF EXISTS b_samples")
            spark.sql("DROP TABLE IF EXISTS b_meta")

    def test_storage_contract_fact_fact_zero_orderkey_exchange(
            self, spark, sf_dir):
        """The README storage contract, pinned in the suite at test
        scale (the x100 wall receipt lives in tools/bench_bucketing.py
        / PLANS.md r17): with lineitem and orders bucket+sorted on the
        order key, BOTH fact-fact query bodies plan their orderkey SMJ
        and the per-orderkey aggregate with zero exchanges — the only
        hashpartitioning left is the output-sized final aggregate."""
        from physioview_spark.plans.common import read
        from physioview_spark.plans.queries_relational import (
            order_priority_counts_body, top_revenue_nations_body,
        )
        from physioview_spark.sources.csv import write_bucketed_table

        def exchanges(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            return [ln.strip() for ln in plan.splitlines()
                    if "Exchange hashpartitioning" in ln]

        try:
            write_bucketed_table(
                read(spark, sf_dir, "lineitem"), "sc_lineitem",
                "l_orderkey", n_buckets=4, sort_cols="l_orderkey")
            write_bucketed_table(
                read(spark, sf_dir, "orders"), "sc_orders",
                "o_orderkey", n_buckets=4, sort_cols="o_orderkey")
            li, o = spark.table("sc_lineitem"), spark.table("sc_orders")

            ex = exchanges(order_priority_counts_body(o, li))
            assert not any("orderkey" in ln for ln in ex), ex
            assert all("o_orderpriority" in ln for ln in ex), ex
            out = order_priority_counts_body(o, li)
            flat = order_priority_counts_body(
                read(spark, sf_dir, "orders"),
                read(spark, sf_dir, "lineitem"))
            assert sorted(map(tuple, out.collect())) == \
                sorted(map(tuple, flat.collect()))

            c = read(spark, sf_dir, "customer")
            n = read(spark, sf_dir, "nation")
            ex = exchanges(top_revenue_nations_body(li, o, c, n))
            assert not any("orderkey" in ln for ln in ex), ex
        finally:
            spark.sql("DROP TABLE IF EXISTS sc_lineitem")
            spark.sql("DROP TABLE IF EXISTS sc_orders")


class TestPlanContracts:
    """Regression guards on physical-plan properties the engine promises:
    pushdown reaching the scan, dimension broadcasts, bounded shuffle
    counts. A logic change that silently loses one of these properties
    would still be CORRECT but would not survive 100x data."""

    def _plan(self, spark, name, sf_dir):
        import __spark_entry__ as e

        df = e.queries()[name](spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()

    def test_pricing_summary_pushdown(self, spark, sf_dir):
        plan = self._plan(spark, "pricing_summary", sf_dir)
        assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
        # projection pruning: the scan must not read all 16 columns
        import re
        m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
        assert m and len(m.group(1).split(",")) <= 7, m.group(1)

    def test_top_revenue_nations_broadcasts(self, spark, sf_dir):
        plan = self._plan(spark, "top_revenue_nations", sf_dir)
        # nation is always broadcast; customer may be (AQE's call at
        # this scale). The ORDERS join must be the pinned SortMergeJoin
        # (r16): AQE's compressed-footer estimate broadcast the 15M-row
        # x100 orders table (14.1 s vs 5.8 s — PLANS.md r16 receipt),
        # and at cluster scale that broadcast is an OOM. The SMJ costs
        # one extra bench-scale exchange (orders' sort side; the
        # lineitem-agg side reuses its groupBy partitioning) — removed
        # entirely on bucketed storage (tools/bench_bucketing.py).
        assert plan.count("BroadcastExchange") >= 1
        # the ORDERS join specifically: an SMJ keyed on o_orderkey. A
        # generic "some SMJ exists" would still pass if the customer
        # join flipped to SMJ while orders regressed to a broadcast
        # (ADVICE r16 item 3).
        smj_lines = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln]
        assert any("o_orderkey" in ln for ln in smj_lines), plan
        # and orders must not ALSO ride a broadcast: no BroadcastHashJoin
        # keyed on the order key anywhere in the plan
        bhj_lines = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
        assert not any("o_orderkey" in ln for ln in bhj_lines), plan
        assert plan.count("Exchange hashpartitioning") <= 4, plan

    def test_bucketing_tool_body_in_sync(self, spark, sf_dir):
        """tools/bench_bucketing.py runs top_revenue_nations' body over
        bucketed tables. Since ADVICE r16 item 2 the tool IMPORTS the
        engine's body function, so drift is impossible by construction
        — the expensive collect-and-compare (which also float-flaked at
        round boundaries, ADVICE r16 item 1) collapses to an identity
        check plus a cheap columns/plan equivalence."""
        import __spark_entry__ as e
        import tools.bench_bucketing as bb
        from physioview_spark.plans.common import read
        from physioview_spark.plans.queries_relational import (
            order_priority_counts_body, top_revenue_nations_body,
        )

        assert bb.top_revenue_nations_body is top_revenue_nations_body
        assert bb.order_priority_counts_body is order_priority_counts_body
        engine = e.queries()["top_revenue_nations"](spark, sf_dir)
        tool = top_revenue_nations_body(
            read(spark, sf_dir, "lineitem"), read(spark, sf_dir, "orders"),
            read(spark, sf_dir, "customer"), read(spark, sf_dir, "nation"))
        assert engine.columns == tool.columns
        # analyzed plans are identical up to per-instantiation
        # expression IDs (#NNN)
        import re

        def norm(df):
            return re.sub(
                r"#\d+", "#", df._jdf.queryExecution().analyzed().toString())

        assert norm(engine) == norm(tool)

    def test_asof_join_single_shuffle(self, spark, sf_dir):
        plan = self._plan(spark, "asof_latest_order", sf_dir)
        # union-window as-of: partitions once on (user, key); no
        # nested-loop join anywhere
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_dedup_no_self_join(self, spark, sf_dir):
        plan = self._plan(spark, "dedup_keep_first", sf_dir)
        assert "SortMergeJoin" not in plan and "Join" not in plan, \
            "keep-first dedup must be a window, not a self-join"


class TestInputFixtures:
    """The committed input parquets (tests/fixtures/inputs/) must stay in
    lockstep with the synthesizers that generated them — a silent drift
    would let the kernel queries and their recomputing DuckDB twins agree
    on stale data."""

    def test_input_fixtures_match_synths(self):
        import pandas as pd

        from tools.make_input_fixtures import INPUTS
        from physioview_spark.plans.common import input_fixture

        for name, gen in INPUTS.items():
            on_disk = pd.read_parquet(input_fixture(name))
            fresh = gen()
            pd.testing.assert_frame_equal(on_disk, fresh)


class TestSessionTimezoneIndependence:
    """The driver runs a VANILLA session, so the host's local timezone
    sets spark.sql.session.timeZone — every timestamp-bearing query
    must produce identical results under any session tz (all parquet
    timestamps are NTZ; this probe caught real bugs per the project
    verify recipe)."""

    NAMES = ("carry_forward_daily", "orders_events_within_week",
             "seconds_hr_context", "rolling_event_counts")

    def test_results_identical_under_non_utc_tz(self, spark, sf_dir):
        from physioview_spark.plans import queries_relational as qr
        old = spark.conf.get("spark.sql.session.timeZone")
        try:
            for name in self.NAMES:
                outs = []
                for tz in ("UTC", "America/New_York"):
                    spark.conf.set("spark.sql.session.timeZone", tz)
                    outs.append(sorted(
                        map(tuple, qr.QUERIES[name](spark, sf_dir)
                            .collect())))
                assert outs[0] == outs[1], name
                assert len(outs[0]) > 0, name
        finally:
            spark.conf.set("spark.sql.session.timeZone", old)


class TestSessionization:
    """operators/sessions.py — gap-based sessions over the events table.
    The load-bearing parity: per-event islands labeling aggregated by
    (key, session_id) must reproduce the built-in session_window
    bounds, and both must match a DuckDB gaps-and-islands oracle."""

    GAP_S = 1200  # 20 min; the sf0.001 events cadence makes real gaps

    def _events(self, spark, sf_dir):
        from physioview_spark.plans.common import read
        return read(spark, sf_dir, "events")

    def test_ids_aggregate_to_bounds(self, spark, sf_dir):
        from physioview_spark.operators import sessions
        ev = self._events(spark, sf_dir)
        bounds = {
            (r.user_id, r.session_start): (r.session_end, r.n_events)
            for r in sessions.session_bounds(
                ev, f"{self.GAP_S} seconds").collect()}
        ids_agg = (
            sessions.session_ids(ev, self.GAP_S)
            .groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("start"), F.max("ts").alias("last"),
                 F.count(F.lit(1)).alias("n"))
            .collect())
        assert len(ids_agg) == len(bounds) > 0
        for r in ids_agg:
            end, n = bounds[(r.user_id, r.start)]
            assert n == r.n
            # session_window's end is half-open: last event + gap
            assert (end - r.last).total_seconds() == self.GAP_S

    def test_islands_match_duckdb_oracle(self, spark, sf_dir):
        import duckdb

        from physioview_spark.operators import sessions
        ev = self._events(spark, sf_dir)
        got = sorted(
            (r.event_id, r.session_id)
            for r in sessions.session_ids(ev, self.GAP_S).collect())
        want = sorted(map(tuple, duckdb.sql(f"""
            SELECT event_id,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
            FROM (
              SELECT event_id, user_id, ts,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id))
                               >= {self.GAP_S}
                          THEN 1 ELSE 0 END AS brk
              FROM '{sf_dir}/events.parquet')
            """).fetchall()))
        assert got == want

    def test_single_shuffle_each(self, spark, sf_dir):
        from physioview_spark.operators import sessions
        ev = self._events(spark, sf_dir)
        for frame in (sessions.session_bounds(ev, "20 minutes"),
                      sessions.session_ids(ev, 1200)):
            plan = frame._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Exchange hashpartitioning") <= 1


class TestFunnel:
    """operators/sessions.funnel_steps — greedy ordered funnels."""

    def test_greedy_semantics_hand_case(self, spark):
        import datetime as dt

        from physioview_spark.operators.sessions import funnel_steps
        t = lambda m: dt.datetime(2024, 1, 1, 0, m)
        rows = [
            # user 1 completes signup -> purchase -> error in order
            (1, t(1), "signup"), (1, t(2), "purchase"), (1, t(3), "error"),
            # user 2: purchase BEFORE signup doesn't count; no purchase after
            (2, t(1), "purchase"), (2, t(2), "signup"),
            # user 3: greedy takes the EARLIEST post-signup purchase (t4)
            (3, t(2), "signup"), (3, t(4), "purchase"), (3, t(6), "purchase"),
            # user 4: no funnel events at all
            (4, t(1), "click"),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        out = {r.user_id: r for r in funnel_steps(
            df, ["signup", "purchase", "error"]).collect()}
        assert out[1].steps_completed == 3
        assert out[2].steps_completed == 1 and out[2].step_2_ts is None
        assert out[3].steps_completed == 2 and out[3].step_2_ts == t(4)
        assert out[4].steps_completed == 0 and out[4].step_1_ts is None

    def test_matches_duckdb_oracle_on_events(self, spark, sf_dir):
        import duckdb

        from physioview_spark.operators.sessions import funnel_steps
        from physioview_spark.plans.common import read
        ev = read(spark, sf_dir, "events")
        got = sorted(
            (r.user_id, r.steps_completed)
            for r in funnel_steps(ev, ["signup", "purchase", "error"])
            .collect())
        want = sorted(map(tuple, duckdb.sql(f"""
            WITH g AS (
              SELECT user_id,
                list_sort(list(ts) FILTER (event_type = 'signup'))   a0,
                list_sort(list(ts) FILTER (event_type = 'purchase')) a1,
                list_sort(list(ts) FILTER (event_type = 'error'))    a2
              FROM '{sf_dir}/events.parquet' GROUP BY user_id),
            s AS (
              SELECT user_id, a0[1] t1,
                     list_filter(a1, x -> x > a0[1])[1] t2
              FROM g),
            s2 AS (
              SELECT g.user_id, t1, t2,
                     list_filter(a2, x -> x > t2)[1] t3
              FROM g JOIN s ON g.user_id = s.user_id)
            SELECT user_id, CASE WHEN t3 IS NOT NULL THEN 3
                                 WHEN t2 IS NOT NULL THEN 2
                                 WHEN t1 IS NOT NULL THEN 1
                                 ELSE 0 END
            FROM s2""").fetchall()))
        assert got == want and len(got) > 0

    def test_single_shuffle(self, spark, sf_dir):
        from physioview_spark.operators.sessions import funnel_steps
        from physioview_spark.plans.common import read
        ev = read(spark, sf_dir, "events")
        plan = funnel_steps(ev, ["signup", "purchase"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") <= 1

    def test_empty_steps_raises(self, spark):
        import pytest as _pt

        from physioview_spark.operators.sessions import funnel_steps
        with _pt.raises(ValueError):
            funnel_steps(spark.range(1), [])
        with _pt.raises(ValueError):
            funnel_steps(spark.range(1), ["a"], max_events_per_key=0)

    def test_max_events_per_key_cap(self, spark, sf_dir):
        """r09 (VERDICT item 5): the bot-key guard — per-(key, step)
        arrays are sliced to their earliest max_events_per_key
        timestamps. A cap at least as deep as any key's true per-step
        match depth is a pure no-op (greedy matching only consumes
        earliest events); an aggressive cap can only LOWER a key's
        funnel depth, never raise it or invent a timestamp."""
        import datetime as dt

        from physioview_spark.operators.sessions import funnel_steps
        from physioview_spark.plans.common import read
        ev = read(spark, sf_dir, "events")
        steps = ["signup", "purchase", "error"]
        uncapped = sorted(map(tuple, funnel_steps(ev, steps).collect()))
        generous = sorted(map(tuple, funnel_steps(
            ev, steps, max_events_per_key=10_000).collect()))
        assert uncapped == generous
        # aggressive cap: monotone degradation only
        base = {t[0]: t for t in uncapped}
        for t in funnel_steps(ev, steps, max_events_per_key=1).collect():
            b = base[t.user_id]
            assert t.steps_completed <= b[-1]
            for i in range(1, len(steps) + 1):
                got = getattr(t, f"step_{i}_ts")
                assert got is None or isinstance(got, dt.datetime)
        # hand case: cap=1 keeps only the earliest purchase, which
        # precedes the signup -> chain breaks at step 2
        t0 = lambda m: dt.datetime(2024, 1, 1, 0, m)
        df = spark.createDataFrame(
            [(1, t0(1), "purchase"), (1, t0(2), "signup"),
             (1, t0(3), "purchase")],
            "user_id long, ts timestamp, event_type string")
        r = funnel_steps(df, ["signup", "purchase"],
                         max_events_per_key=1).collect()[0]
        assert r.steps_completed == 1 and r.step_2_ts is None
        r2 = funnel_steps(df, ["signup", "purchase"]).collect()[0]
        assert r2.steps_completed == 2 and r2.step_2_ts == t0(3)


class TestRetention:
    """operators/sessions.retention_cohorts vs a DuckDB oracle."""

    def test_matches_duckdb_weekly(self, spark, sf_dir):
        import duckdb

        from physioview_spark.operators.sessions import retention_cohorts
        from physioview_spark.plans.common import read
        ev = read(spark, sf_dir, "events")
        got = sorted(
            (r.cohort.date(), r.period_n, r.n_active)
            for r in retention_cohorts(ev, period="week").collect())
        want = sorted(map(tuple, duckdb.sql(f"""
            WITH act AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS p
              FROM '{sf_dir}/events.parquet'),
            tagged AS (
              SELECT user_id, p,
                     min(p) OVER (PARTITION BY user_id) AS cohort
              FROM act)
            SELECT cohort,
                   CAST(date_diff('day', cohort, p) / 7 AS INT) period_n,
                   count(*) n_active
            FROM tagged GROUP BY 1, 2""").fetchall()))
        assert got == want and len(got) > 0
        # period 0 exists for every cohort (the cohort period itself)
        cohorts = {c for c, _, _ in got}
        assert all((c, 0) in {(c2, p) for c2, p, _ in got} for c in cohorts)

    def test_retained_never_exceeds_cohort_size(self, spark, sf_dir):
        from physioview_spark.operators.sessions import retention_cohorts
        from physioview_spark.plans.common import read
        ev = read(spark, sf_dir, "events")
        rows = retention_cohorts(ev, period="day").collect()
        base = {r.cohort: r.n_active for r in rows if r.period_n == 0}
        for r in rows:
            assert r.n_active <= base[r.cohort]

    def test_invalid_period(self, spark):
        import pytest as _pt

        from physioview_spark.operators.sessions import retention_cohorts
        with _pt.raises(ValueError):
            retention_cohorts(spark.range(1), period="fortnight")


class TestSessionFunnelComposition:
    def test_funnel_within_sessions(self, spark):
        """session_ids composes as a funnel key: key_cols=[user,
        session] restarts the funnel per session, so a purchase in
        session 1 cannot complete a signup from session 2."""
        import datetime as dt

        from physioview_spark.operators.sessions import (
            funnel_steps, session_ids,
        )
        t = lambda m: (dt.datetime(2024, 1, 1)
                       + dt.timedelta(minutes=m))
        rows = [
            # session 1: signup then purchase (complete)
            (1, t(0), "signup"), (1, t(5), "purchase"),
            # >30 min gap -> session 2: purchase only (incomplete: the
            # session-2 funnel never saw a signup)
            (1, t(60), "purchase"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string")
        sess = session_ids(df, 1800.0)
        out = {(r.user_id, r.session_id): r.steps_completed
               for r in funnel_steps(
                   sess, ["signup", "purchase"],
                   key_cols=["user_id", "session_id"]).collect()}
        assert out[(1, 1)] == 2
        assert out[(1, 2)] == 0

    def test_retention_python_reference(self, spark):
        """retention_cohorts vs a brute-force python reference on a
        hand-built activity pattern with gaps."""
        import datetime as dt

        from physioview_spark.operators.sessions import retention_cohorts
        rows = []
        # user 0: weeks 0,1,3; user 1: weeks 0,2; user 2: week 1 only
        base = dt.datetime(2024, 1, 1)  # a Monday
        for u, weeks in [(0, [0, 1, 3]), (1, [0, 2]), (2, [1])]:
            for wk in weeks:
                rows.append((u, base + dt.timedelta(weeks=wk, hours=u)))
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {(r.cohort.date(), r.period_n): r.n_active
               for r in retention_cohorts(df, period="week").collect()}
        w = lambda k: (base + dt.timedelta(weeks=k)).date()
        assert got == {
            (w(0), 0): 2,  # users 0,1 cohorted week 0
            (w(0), 1): 1,  # user 0 active week 1
            (w(0), 2): 1,  # user 1 active week 2
            (w(0), 3): 1,  # user 0 active week 3
            (w(1), 0): 1,  # user 2 cohorted week 1
        }
