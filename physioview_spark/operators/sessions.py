"""Gap-based sessionization over event streams.

Beyond-reference operator (cbslneu/physioview segments by fixed windows
only — physioview.py:945-975 — never by inactivity gaps); sessionization
is the standard events-analytics companion to those tumbling segments:
a session is a maximal run of a key's events where consecutive
timestamps are less than ``gap`` apart.

Two shapes, both one-shuffle-on-the-key:

* :func:`session_bounds` — per-session aggregates via the built-in
  ``F.session_window`` (Spark's native gap-window groupBy). This is the
  Structured-Streaming-ready form: the identical expression runs under
  ``readStream`` with a watermark, where Spark maintains and merges
  open sessions in the state store.
* :func:`session_ids` — per-EVENT session labels via gaps-and-islands
  (``lag`` + a running sum of gap-break flags over the key's time
  order). ``session_window`` only exists inside a groupBy, so labeling
  events requires the islands construction; it is also the exact
  ANSI-SQL twin a DuckDB oracle can run.

Parity contract (tested): aggregating :func:`session_ids` output by
``(key, session_id)`` reproduces :func:`session_bounds` row-for-row,
modulo ``session_window``'s half-open ``end = last_ts + gap`` bound.

Scale shape: both forms shuffle once on the key columns (window or
groupBy exchange); no self-joins, no per-key collect. Skewed keys are
bounded by AQE skew handling like every other keyed window in the
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def session_bounds(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """One row per session: ``key..., session_start, session_end,
    n_events`` — ``session_end`` is ``session_window``'s half-open
    bound (last event + gap).

    Streaming-ready: apply the same groupBy to a watermarked stream and
    Spark's session-window state merging takes over.
    """
    keys = key_cols if key_cols is not None else ["user_id"]
    return (
        df.groupBy(*keys, F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *keys,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def session_ids(
    df: DataFrame,
    gap_seconds: float = 1800.0,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Label every event with its 1-based session id within its key
    (gaps-and-islands: a session breaks where the gap to the previous
    event is >= ``gap_seconds``, matching ``session_window``'s
    exclusive merge bound).

    Use when downstream logic needs per-event session membership
    (funnels, per-session feature joins) rather than the aggregate
    bounds.
    """
    keys = key_cols if key_cols is not None else ["user_id"]
    order = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    # timestampdiff handles TIMESTAMP and TIMESTAMP_NTZ alike and is
    # session-timezone independent (unix_micros rejects NTZ, which is
    # what the parquet sources deliver)
    tagged = df.withColumn("__prev_ts", F.lag(F.col(ts_col)).over(order))
    brk = F.when(
        F.col("__prev_ts").isNull()
        | (F.expr(f"timestampdiff(MICROSECOND, __prev_ts, `{ts_col}`)")
           >= F.lit(int(gap_seconds * 1_000_000))),
        F.lit(1)).otherwise(F.lit(0))
    running = Window.partitionBy(*keys).orderBy(F.col(ts_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        tagged.withColumn(out_col, F.sum(brk).over(running).cast("long"))
        .drop("__prev_ts")
    )


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    type_col: str = "event_type",
    key_cols: list[str] | None = None,
    max_events_per_key: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: per key, the classic greedy match of
    ``steps`` — step i+1 counts only at the EARLIEST event of that type
    strictly after the matched step-i event. Output: key columns,
    ``step_1_ts .. step_k_ts`` (NULL once the chain breaks) and
    ``steps_completed``.

    Spark-first shape: ONE groupBy shuffle collecting a sorted
    timestamp array per (key, step) — conditional ``collect_list``
    keeps only the funnel's event types, so the arrays are bounded by
    a key's per-type event counts, not the corpus. The greedy chain is
    then pure JVM array algebra (``filter``/``element_at``), no second
    shuffle, no self-joins per step (the textbook SQL funnel is k-1
    correlated subqueries — a join per step at corpus scale).

    Skew note: a bot key with millions of step events makes one fat
    row, not a hot shuffle partition; ``max_events_per_key`` bounds
    that row by slicing each per-(key, step) array to its FIRST
    ``max_events_per_key`` timestamps after the sort (the LSH
    ``max_bucket_size`` pattern). The greedy chain only ever consumes
    the earliest post-predecessor event, so any cap at least as large
    as a key's true per-step match depth yields identical results
    (parity-tested); an aggressive cap can only under-report funnel
    depth for keys whose matches lie past the cap, never invent one.
    Alternatively cap upstream with per-key event limits.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if max_events_per_key is not None and max_events_per_key <= 0:
        raise ValueError(
            f"max_events_per_key must be positive, got {max_events_per_key}")
    keys = key_cols if key_cols is not None else ["user_id"]

    def arr(s: str):
        a = F.sort_array(F.collect_list(
            F.when(F.col(type_col) == F.lit(s), F.col(ts_col))))
        if max_events_per_key is not None:
            a = F.slice(a, 1, max_events_per_key)
        return a

    aggs = [arr(s).alias(f"__a{i}") for i, s in enumerate(steps)]
    g = df.groupBy(*keys).agg(*aggs)
    # greedy chain: t0 = first step-0 event; t_{i} = first step-i event
    # strictly after t_{i-1}
    # F.get (0-based) is null-on-missing under ANSI mode, unlike
    # element_at which throws on an empty array
    out = g.withColumn("step_1_ts", F.get("__a0", 0))
    for i in range(1, len(steps)):
        out = out.withColumn(
            f"step_{i + 1}_ts",
            F.get(F.expr(f"filter(__a{i}, x -> x > step_{i}_ts)"), 0))
    # build innermost-first so the OUTERMOST when tests the deepest
    # step (when-chains evaluate outside-in)
    completed = F.lit(0)
    for i in range(1, len(steps) + 1):
        completed = F.when(
            F.col(f"step_{i}_ts").isNotNull(), F.lit(i)).otherwise(completed)
    return out.select(
        *keys,
        *[F.col(f"step_{i + 1}_ts") for i in range(len(steps))],
        completed.cast("int").alias("steps_completed"),
    )


def retention_cohorts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event; each later period they appear in increments that
    cohort's retained count. Output: ``(cohort, period_n,
    n_active)`` where ``cohort`` is the cohort period start,
    ``period_n`` the whole periods since it (0 = the cohort period
    itself), ``n_active`` the distinct users from that cohort active
    then.

    Scale shape (3 exchanges, only the FIRST corpus-width): the
    ``(key, period)`` activity dedup shuffles the corpus once with
    map-side partial aggregation (each mapper sends unique user-period
    pairs, not raw events); the per-key cohort window then re-exchanges
    only the DEDUPLICATED user-period rows (hash(key, period) does not
    satisfy the window's partitionBy(key), so this exchange is real —
    but its input is already one row per user-period); the final
    ``(cohort, period_n)`` aggregate is a cohorts x periods grid, tiny
    by construction. No user-level join back, no distinct-count over
    the corpus.

    ``period``: ``day``, ``week`` or ``month`` (months use
    ``months_between`` on the truncated starts; days/weeks are day
    arithmetic).
    """
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day/week/month, got {period!r}")
    p = F.date_trunc(period, F.col(ts_col))
    activity = (
        df.select(F.col(key_col).alias("__k"), p.alias("__p"))
        .distinct()
    )
    w = Window.partitionBy("__k")
    tagged = activity.withColumn("__cohort", F.min("__p").over(w))
    if period == "month":
        delta = F.months_between("__p", "__cohort").cast("int")
    elif period == "week":
        delta = (F.datediff("__p", "__cohort") / 7).cast("int")
    else:
        delta = F.datediff("__p", "__cohort")
    return (
        tagged.groupBy(
            F.col("__cohort").alias("cohort"),
            delta.cast("int").alias("period_n"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
