"""Cardiac SQA metrics — A1-A5 of the operator inventory, fully relational.

Parity targets (behavior, not code):
- ``get_artifacts``  — per-segment beat/artifact counts
  (reference: pipeline/SQA.py:199-277)
- ``get_missing``    — per-segment expected-beat model with the median-of-
  5-beat-window-medians HR estimate, prev/next half-segment fallback,
  last-valid-HR carry-forward, last-partial-segment rescale, leading-segment
  backfill (reference: pipeline/SQA.py:503-629, _window_medians :1751-1764)
- ``compute_metrics``— A1 join A2 + Invalid rule (reference: SQA.py:177-197)
- rolling variant    — sliding size/step windows (reference: SQA.py:114-175)
- ``get_seconds``    — per-second harmonic-mean HR (Graham 1978)
  (reference: SQA.py:631-723)

Spark-first design: the reference's per-segment Python loop with mutable
``last_valid_hr`` state becomes a chain of window functions
(``last(ignorenulls)`` for carry-forward, ``first(ignorenulls)`` over the
following frame for backfill), so the whole computation is one shuffle on
``(subject_id, segment)`` plus ordered windows per subject — no Python, no
collect, scales per-subject to arbitrary cohort sizes. Only beat rows (a few
per second) enter the window stages; the dense sample frame is scanned once
and immediately collapsed map-side to a per-(subject, segment) aggregate
that feeds both the segment spine and the timestamp column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

B = "subject_id"


def _sdiv(num, den) -> Column:
    """ANSI-safe division (null on zero denominator)."""
    return num / F.nullif(den, F.lit(0))



def _arr_median(arr: Column) -> Column:
    """Exact median of a (null-free) array column; null for empty arrays.

    Spark disallows ``median`` over framed windows, so sliding medians are
    ``collect_list`` over the frame (nulls dropped) + this expression."""
    n = F.size(arr)
    srt = F.sort_array(arr)
    mid = F.element_at(srt, (n / 2 + 1).cast("int"))
    lo = F.element_at(srt, (n / 2).cast("int"))
    return (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, F.element_at(srt, ((n + 1) / 2).cast("int")))
        .otherwise((lo + mid) / 2.0)
    )


def _seg_samples(
    samples: DataFrame, fs: float, seg_size: int, with_ts: bool,
    with_artifacts: bool = False,
) -> DataFrame:
    """ONE partially-aggregated pass over the (potentially dense) sample
    frame: per-(subject, segment) max index and — when requested — first
    timestamp and artifact count.  Everything ``get_missing`` (and, with
    ``with_artifacts``, ``compute_metrics``) needs from the raw samples
    derives from this small frame, so the full-size input is scanned and
    shuffled once, after a map-side combine that collapses each scan
    partition to its distinct segments.

    Persist lifecycle: the returned frame is pinned via
    :func:`physioview_spark.cache.pin` at plan construction — the same
    registry the llm/ operators use. Release is EXPLICIT-ONLY: wrap
    invocations in ``cache.pinned_frames()`` (the pins drop on scope
    exit) or call ``cache.release_pinned()`` periodically; an unscoped
    pin lives in the session-global ``CacheManager`` until one of
    those runs or the session ends. (NOT until Python GC: Spark's
    CacheManager registers the InMemoryRelation by logical plan and
    holds it independently of any Python or JVM Dataset object, so
    dropping references never frees the blocks — which is also why
    ``cache._PINNED`` must hold strong references: a weakref registry
    would lose the only handle that can still unpersist. ADVICE r17
    item 2 corrected the old GC-fallback claim here.) Cost: one
    ~rows/seg_len cached frame per unscoped operator call.
    Plan-shape-sensitive tooling uses the scope so any later plan
    containing an EQUAL subtree is not silently rewritten to
    InMemoryRelation (tools/plan_census.py does exactly this per
    query).
    """
    seg_len = int(fs * seg_size)
    aggs = [F.max("sample_idx").alias("seg_max_idx")]
    if with_ts:
        # ts is monotone in sample_idx, so min(ts) = first-sample ts
        aggs.append(F.min("ts").alias("ts"))
    if with_artifacts:
        aggs.append(
            F.sum(F.when(F.col("artifact") == 1, 1).otherwise(0))
            .alias("n_artifact")
        )
    seg = (F.floor(F.col("sample_idx") / seg_len) + 1).cast("long").alias("segment")
    out = samples.groupBy(B, seg).agg(*aggs)
    # Downstream references prune different columns (spine wants
    # seg_max_idx, the ts join wants ts, compute_metrics wants
    # n_artifact), which defeats ReuseExchange — without a persist each
    # reference would re-expand the aggregate and re-scan the full
    # sample frame. The frame is ~rows/seg_len, trivially cacheable.
    from physioview_spark import cache

    return cache.pin(out)


def _segment_spine(seg_samples: DataFrame, seg_len: int) -> DataFrame:
    """Per-subject segment spine from the pre-aggregated segment frame.

    ``n_seg = ceil(n_samples / (fs*seg_size))`` — the reference's segment
    spine covers every segment, including beat-free ones
    (reference: pipeline/SQA.py:243-244).  Grid length from the max index,
    not the row count — identical on a dense frame, correct when the
    caller passes a sparse one; reads the tiny per-segment aggregate
    instead of re-scanning the sample frame.
    """
    return (
        seg_samples.groupBy(B)
        .agg((F.max("seg_max_idx") + 1).alias("n_samples"))
        .withColumn("n_seg", F.ceil(F.col("n_samples") / seg_len))
        .withColumn("segment", F.explode(F.sequence(F.lit(1), F.col("n_seg"))))
        .withColumn(
            "seg_n_samples",
            F.least(F.col("n_samples"), F.col("segment") * seg_len).cast("long")
            - ((F.col("segment") - 1) * seg_len),
        )
        .select(B, "segment", "n_seg", "seg_n_samples")
    )


def _beats_frame(samples: DataFrame, fs: float, seg_size: int) -> DataFrame:
    """Sparse beat rows with segment id, IBI (lag diff) and artifact flag."""
    seg_len = int(fs * seg_size)
    w = Window.partitionBy(B).orderBy("sample_idx")
    return (
        samples.where(F.col("beat") == 1)
        .select(B, "sample_idx", "artifact")
        .withColumn(
            "ibi_ms",
            (F.col("sample_idx") - F.lag("sample_idx").over(w)) / F.lit(fs) * 1000.0,
        )
        .withColumn(
            "segment", (F.floor(F.col("sample_idx") / seg_len) + 1).cast("long")
        )
    )


def get_artifacts(
    samples: DataFrame, fs: float, seg_size: int = 60, with_ts: bool = True
) -> DataFrame:
    """Per-segment N Artifact / % Artifact (+ first segment timestamp).

    One hash aggregation (partial+final via Catalyst); the first-timestamp
    column uses ``min(ts)`` because ts is monotone in sample_idx.
    """
    seg_len = int(fs * seg_size)
    seg = (F.floor(F.col("sample_idx") / seg_len) + 1).cast("long").alias("segment")
    aggs = [
        F.sum(F.when(F.col("beat") == 1, 1).otherwise(0)).alias("n_detected"),
        F.sum(F.when(F.col("artifact") == 1, 1).otherwise(0)).alias("n_artifact"),
    ]
    if with_ts:
        aggs.append(F.min("ts").alias("ts"))
    out = samples.groupBy(B, seg).agg(*aggs)
    out = out.withColumn(
        "pct_artifact",
        F.round(_sdiv(F.col("n_artifact"), F.col("n_detected")) * 100.0, 2),
    )
    cols = [B, "segment"] + (["ts"] if with_ts else []) + [
        "n_detected", "n_artifact", "pct_artifact"
    ]
    return out.select(*cols)


def _windowed_beats(
    beats: DataFrame, win_size: int = 5, keys: tuple[str, ...] = ("segment",)
) -> DataFrame:
    """Per-beat sliding 5-beat window median HR + validity columns.

    Mirrors ``_window_medians`` (reference: pipeline/SQA.py:1751-1764): a
    window is the beat and its next ``win_size-1`` beats *within the same
    (subject, keys) group*; windows containing any artifact are skipped;
    the median ignores null IBIs (the recording's first beat has none), so
    an all-null window yields a null median that still counts as "a window
    existed" — that distinction gates the reference's fallback chain.
    Returns every beat row with ``med_hr`` and a ``__valid`` flag rather
    than filtering, so callers can aggregate window medians AND raw beat
    counts in the same pass (one shuffle on ``(subject, keys)``).
    """
    w = (
        Window.partitionBy(B, *keys)
        .orderBy("sample_idx")
        .rowsBetween(0, win_size - 1)
    )
    return (
        beats.withColumn("__n", F.count(F.lit(1)).over(w))
        .withColumn("__any_art", F.max(F.col("artifact") == 1).over(w))
        .withColumn("med_hr", _arr_median(F.collect_list(_sdiv(F.lit(60000.0), F.col("ibi_ms"))).over(w)))
        .withColumn(
            "__valid",
            (F.col("__n") == win_size) & ~F.coalesce("__any_art", F.lit(False)),
        )
    )


def get_missing(
    samples: DataFrame, fs: float, seg_size: int = 60, with_ts: bool = True,
    seg_samples: DataFrame | None = None,
) -> DataFrame:
    """Per-segment N Detected / N Expected / N Missing / % Missing.

    The reference's sequential loop state becomes window functions:
    carry-forward = ``last(ignorenulls)`` over preceding segments, leading
    backfill = ``first(ignorenulls)`` over following segments (valid because
    after carry-forward the nulls form a prefix).

    Single-reference design: the sparse beat frame is consumed by exactly
    ONE downstream pipeline (each beat row explodes into its window tags,
    then one windowed aggregation produces every median family and the
    detected counts), so no persist is needed — Catalyst sees one lineage
    and the expensive beat extraction runs once by construction.  (The
    pre-r15 form referenced beats four times and needed a MEMORY_AND_DISK
    persist to avoid re-expansion.)

    The dense sample frame is read once and immediately collapsed to a
    per-(subject, segment) aggregate (``_seg_samples``) that feeds both
    the segment spine and the timestamp column — at corpus scale that is
    the only full-size shuffle, and it is map-side-combined down to
    ~rows/seg_len before crossing the wire.  ``compute_metrics`` passes a
    pre-built ``seg_samples`` (same keys, extra artifact sums) so ITS
    artifact counts ride the same single scan.
    """
    seg_len = int(fs * seg_size)
    beats = _beats_frame(samples, fs, seg_size)
    if seg_samples is None:
        seg_samples = _seg_samples(samples, fs, seg_size, with_ts)
    spine = _segment_spine(seg_samples, seg_len)

    # ONE window pass for all three median families. Each beat row
    # explodes into its window tags — tag 0 = the own-segment 5-beat
    # windows, and the reference's adjacent-segment fallback slices over
    # the last/first ``int(seg_size*0.5)`` *rows* of each segment
    # (reference: pipeline/SQA.py:560-570; tag 1 = last half, consumed
    # by segment+1; tag 2 = first half, consumed by segment-1) — so the
    # beats lineage is referenced ONCE and windowed on (subject,
    # segment, tag): one Exchange of <= 2x the beat rows instead of
    # three Exchanges plus three spine joins. A single groupBy on the
    # TARGET segment then pivots the tags into columns; ``__valid``
    # masks invalid windows out of the medians / window counts while
    # every tag-0 row still feeds ``n_detected``.
    #
    # Slice bounds are pure arithmetic — no join with an extents frame.
    # ``seg_start = (segment-1)*seg_len`` always; for ``seg_end`` the
    # nominal ``segment*seg_len`` equals the reference's
    # ``min(n_samples, ...)`` clamp on every segment except the final
    # one (``n_seg = ceil`` guarantees ``n_samples > (n_seg-1)*
    # seg_len``), and the final segment's "last half" windows land on
    # target ``n_seg + 1`` — outside the spine, dropped by the join —
    # so the clamp is unobservable. That shift contract is what makes
    # the join-free form exact.
    k = int(seg_size * 0.5)
    tagged = beats.withColumn(
        "tag",
        F.explode(F.array_compact(F.array(
            F.lit(0),
            F.when(
                F.col("sample_idx") >= F.col("segment") * seg_len - k,
                F.lit(1)),
            F.when(
                F.col("sample_idx") < (F.col("segment") - 1) * seg_len + k,
                F.lit(2)),
        ))),
    )
    wb = _windowed_beats(tagged, keys=("segment", "tag"))
    v = F.col("__valid")
    t0, t1, t2 = (F.col("tag") == i for i in (0, 1, 2))
    target = (
        F.col("segment")
        + F.when(t1, 1).when(t2, -1).otherwise(0)
    ).alias("segment")
    seg_agg = wb.groupBy(B, target).agg(
        F.median(F.when(v & t0, F.col("med_hr"))).alias("seg_med"),
        F.count(F.when(v & t0, F.lit(1))).alias("seg_n_win"),
        F.count(F.when(t0, F.lit(1))).alias("n_detected"),
        F.median(F.when(v & t1, F.col("med_hr"))).alias("last_half_med"),
        F.count(F.when(v & t1, F.lit(1))).alias("last_half_n"),
        F.median(F.when(v & t2, F.col("med_hr"))).alias("first_half_med"),
        F.count(F.when(v & t2, F.lit(1))).alias("first_half_n"),
    )

    m = (
        # JOIN CONTRACT (load-bearing): seg_agg contains out-of-spine
        # targets BY DESIGN — tag-1 rows of the final segment land on
        # target n_seg+1 and tag-2 rows of segment 1 land on target 0;
        # this left join from the spine is what discards them (and what
        # makes the unclamped seg_end bound above exact). If the join
        # type or the spine's coverage ever changes, add an explicit
        # ``target BETWEEN 1 AND n_seg`` filter on seg_agg first.
        spine.join(seg_agg, [B, "segment"], "left")
        .withColumn("n_detected", F.coalesce("n_detected", F.lit(0)))
    )
    # Fallback chain: own windows > prev-half windows > next-half windows;
    # "windows existed" (count > 0) gates each stage even if the median is
    # null (reference: SQA.py:561-572).
    m = m.withColumn(
        "exp_hr_raw",
        F.when(F.coalesce("seg_n_win", F.lit(0)) > 0, F.col("seg_med"))
        .when(F.coalesce("last_half_n", F.lit(0)) > 0, F.col("last_half_med"))
        .when(F.coalesce("first_half_n", F.lit(0)) > 0, F.col("first_half_med")),
    )
    w_carry = (
        Window.partitionBy(B).orderBy("segment")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = m.withColumn("exp_hr", F.last("exp_hr_raw", ignorenulls=True).over(w_carry))
    m = m.withColumn(
        "n_expected_f",
        F.round(F.col("exp_hr") * (F.lit(seg_size) / 60.0)).cast("double"),
    )
    # Last partial segment: rescale by actual/nominal duration
    # (reference: SQA.py:597-600).
    m = m.withColumn(
        "n_expected_f",
        F.when(
            F.col("segment") == F.col("n_seg"),
            F.round(
                F.col("n_expected_f")
                * (F.col("seg_n_samples") / F.lit(fs) / F.lit(seg_size))
            ),
        ).otherwise(F.col("n_expected_f")),
    )
    # Leading backfill as a RUNNING frame over the reversed order:
    # first(ignorenulls) over [current, unbounded following] makes Spark's
    # WindowExec re-scan the tail for every row — O(n^2) per subject
    # (measured: a single 28.9 s straggler task on the sf0.1 spine,
    # guide §1.1/§7.1) — while last(ignorenulls) over
    # [unbounded preceding, current] is the incremental running frame,
    # O(n). Identical values: segment is unique per subject, so the
    # reversed order has no ties.
    w_backfill = (
        Window.partitionBy(B).orderBy(F.desc("segment"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = m.withColumn(
        "n_expected",
        F.last("n_expected_f", ignorenulls=True).over(w_backfill).cast("long"),
    )
    m = m.withColumn(
        "n_missing",
        F.greatest(F.lit(0), F.col("n_expected") - F.col("n_detected")),
    ).withColumn(
        "pct_missing",
        F.round(_sdiv(F.col("n_missing"), F.col("n_expected")) * 100.0, 2),
    )
    cols = [B, "segment", "n_detected", "n_expected", "n_missing", "pct_missing"]
    if with_ts:
        # first-sample ts per segment rides the SAME _seg_samples pass
        # that built the spine — no second scan of the sample frame
        m = m.join(seg_samples.select(B, "segment", "ts"), [B, "segment"], "left")
        cols = [B, "segment", "ts"] + cols[2:]
    return m.select(*cols)


def compute_metrics(
    samples: DataFrame,
    fs: float,
    seg_size: int = 60,
    min_hr: float = 40.0,
    with_ts: bool = True,
) -> DataFrame:
    """Segmented SQA metric frame = get_missing + artifact counts + Invalid.

    Invalid: fewer detected beats than ``min_hr`` implies for the segment,
    or more than 220 (reference: pipeline/SQA.py:193-196).

    The artifact sums ride get_missing's single ``_seg_samples`` scan
    (``with_artifacts=True``) instead of a second ``get_artifacts`` pass
    over the full sample frame; ``pct_artifact`` is recomputed from
    get_missing's ``n_detected``, which equals get_artifacts' per-segment
    beat count by construction (both count ``beat == 1`` rows).  Segments
    on the spine with no sample rows keep null ``n_artifact``/
    ``pct_artifact``, matching the former left join.
    """
    ss = _seg_samples(samples, fs, seg_size, with_ts, with_artifacts=True)
    missing = get_missing(
        samples, fs, seg_size, with_ts=with_ts, seg_samples=ss
    )
    out = missing.join(
        ss.select(B, "segment", "n_artifact"), [B, "segment"], "left"
    ).withColumn(
        "pct_artifact",
        F.round(_sdiv(F.col("n_artifact"), F.col("n_detected")) * 100.0, 2),
    )
    out = out.withColumn(
        "invalid",
        F.when(
            (F.col("n_detected") < int(min_hr * (seg_size / 60.0)))
            | (F.col("n_detected") > 220),
            1,
        ).cast("int"),
    )
    return out


def compute_metrics_rolling(
    samples: DataFrame,
    fs: float,
    rolling_window: int = 60,
    rolling_step: int = 15,
    seg_size: int = 60,
    min_hr: float = 40.0,
    with_ts: bool = True,
) -> DataFrame:
    """Sliding-window SQA metrics (reference: pipeline/SQA.py:114-175).

    Windows start every ``rolling_step`` seconds and span
    ``rolling_window`` seconds of samples; each beat lands in
    ``window/step`` windows via ``sequence``+``explode`` (bounded fan-out),
    then the same median/carry machinery as the segmented path runs per
    (subject, moving_window). Streaming-shaped: identical semantics to
    ``F.window(ts, window, step)`` group-bys.
    """
    step_len = int(fs * rolling_step)
    win_len = int(fs * rolling_window)
    beats = _beats_frame(samples, fs, seg_size).drop("segment")
    extents = samples.groupBy(B).agg(
        # grid length from the index (see _segment_spine)
        (F.max("sample_idx") + 1).alias("n_samples"),
        *([F.min("ts").alias("__ts0")] if with_ts else []),
    ).withColumn("n_win", F.ceil(F.col("n_samples") / step_len))
    # referenced by both the fan-out join and the window spine, with
    # different column prunings — persist so the full sample frame is
    # scanned once for the per-subject extents (one row per subject).
    # Same lifecycle as _seg_samples: pinned via physioview_spark.cache
    # (release with pinned_frames()/release_pinned(), else GC) — see
    # the _seg_samples docstring.
    from physioview_spark import cache

    extents = cache.pin(extents)

    # windows containing sample i: s in [ceil((i-win_len+1)/step), floor(i/step)]
    lo = F.greatest(
        F.lit(0), F.ceil((F.col("sample_idx") - win_len + 1) / F.lit(step_len))
    )
    hi = F.floor(F.col("sample_idx") / F.lit(step_len))
    exploded = (
        beats.join(extents.select(B, "n_win"), B)
        .withColumn("mw", F.explode(F.sequence(lo, F.least(hi, F.col("n_win") - 1))))
        .withColumn("win_start", F.col("mw") * step_len)
    )

    w5 = Window.partitionBy(B, "mw").orderBy("sample_idx").rowsBetween(0, 4)
    # an IBI is only in-window if the previous beat is also in the window
    wprev = Window.partitionBy(B, "mw").orderBy("sample_idx")
    # window medians AND raw counts in ONE aggregation over the exploded
    # frame (one shuffle on (subject, mw) instead of two + a join):
    # ``__valid`` masks invalid windows out of the median / window count
    # while every exploded row still feeds n_detected / n_artifact
    meds = (
        exploded.withColumn("__rn", F.row_number().over(wprev))
        .withColumn("ibi_in", F.when(F.col("__rn") > 1, F.col("ibi_ms")))
        .withColumn("__n", F.count(F.lit(1)).over(w5))
        .withColumn("__any_art", F.max(F.col("artifact") == 1).over(w5))
        .withColumn("med_hr", _arr_median(F.collect_list(_sdiv(F.lit(60000.0), F.col("ibi_in"))).over(w5)))
        .withColumn(
            "__valid",
            (F.col("__n") == 5) & ~F.coalesce("__any_art", F.lit(False)),
        )
    )
    win_meds = meds.groupBy(B, "mw").agg(
        F.median(F.when(F.col("__valid"), F.col("med_hr"))).alias("win_med"),
        F.count(F.when(F.col("__valid"), F.lit(1))).alias("n_win5"),
        F.count(F.lit(1)).alias("n_detected"),
        F.sum(F.when(F.col("artifact") == 1, 1).otherwise(0)).alias("n_artifact"),
    )
    spine = extents.withColumn(
        "mw", F.explode(F.sequence(F.lit(0), F.col("n_win") - 1))
    ).select(B, "mw", *(["__ts0"] if with_ts else []))

    m = (
        spine.join(win_meds, [B, "mw"], "left")
        .withColumn("n_detected", F.coalesce("n_detected", F.lit(0)))
        .withColumn("n_artifact", F.coalesce("n_artifact", F.lit(0)))
        .withColumn(
            "exp_hr_raw",
            F.when(F.coalesce("n_win5", F.lit(0)) > 0, F.col("win_med")),
        )
    )
    w_carry = (
        Window.partitionBy(B).orderBy("mw")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = (
        m.withColumn("exp_hr", F.last("exp_hr_raw", ignorenulls=True).over(w_carry))
        .withColumn(
            "n_expected",
            F.round(F.col("exp_hr") * (F.lit(rolling_window) / 60.0)).cast("long"),
        )
        .withColumn(
            "n_missing",
            F.greatest(F.lit(0), F.col("n_expected") - F.col("n_detected")),
        )
        .withColumn(
            "pct_missing",
            F.round(_sdiv(F.col("n_missing"), F.col("n_expected")) * 100.0, 2),
        )
        .withColumn(
            "pct_artifact",
            F.when(
                F.col("n_detected") > 0,
                F.round(_sdiv(F.col("n_artifact"), F.col("n_detected")) * 100.0, 2),
            ),
        )
        .withColumn("moving_window", F.col("mw") + 1)
        .withColumn(
            "invalid",
            F.when(
                (F.col("n_detected") < int(min_hr * (seg_size / 60.0)))
                | (F.col("n_detected") > 220),
                1,
            ).cast("int"),
        )
    )
    cols = [B, "moving_window", "n_expected", "n_detected", "n_missing",
            "pct_missing", "n_artifact", "pct_artifact", "invalid"]
    if with_ts:
        ts = samples.groupBy(
            B, F.floor(F.col("sample_idx") / step_len).alias("mw")
        ).agg(F.min("ts").alias("ts"))
        m = m.join(ts, [B, "mw"], "left")
        cols = [B, "moving_window", "ts"] + cols[2:]
    return m.select(*cols)


def get_seconds(samples: DataFrame, fs: float, with_ts: bool = True) -> DataFrame:
    """Per-second mean IBI / harmonic-mean HR / beat count (Graham 1978).

    The reference evaluates each second against a context window of the
    previous+current second (reference: pipeline/SQA.py:683-689); the
    harmonic mean of HRs reduces to ``60000 / mean(IBI)``. A beat's IBI
    belongs to a window only when its predecessor beat is inside too.

    One partially-aggregated pass over the sample frame feeds the second
    spine AND the per-second timestamps (persisted — the two downstream
    references prune different columns), and the per-second beat counts
    ride the context-window aggregation via a ``wsec == sec`` mask (every
    beat appears in the exploded frame exactly once at its own second), so
    the beats fan-out shuffles once.
    """
    fs_i = int(fs)
    w = Window.partitionBy(B).orderBy("sample_idx")
    beats = (
        samples.where(F.col("beat") == 1)
        .select(B, "sample_idx")
        .withColumn(
            "ibi_ms",
            (F.col("sample_idx") - F.lag("sample_idx").over(w)) / F.lit(fs) * 1000.0,
        )
        .withColumn("prev_idx", F.lag("sample_idx").over(w))
        .withColumn("sec", F.floor(F.col("sample_idx") / fs_i))
    )
    sec_aggs = [F.max("sample_idx").alias("sec_max_idx")]
    if with_ts:
        sec_aggs.append(F.min("ts").alias("ts"))
    sec_samples = samples.groupBy(
        B, F.floor(F.col("sample_idx") / fs_i).alias("sec")
    ).agg(*sec_aggs)
    if with_ts:
        # Persist lifecycle: pinned via physioview_spark.cache (scope
        # or release_pinned, else GC) — see the _seg_samples docstring.
        from physioview_spark import cache

        sec_samples = cache.pin(sec_samples)
    spine = (
        sec_samples.groupBy(B)
        # grid length from the index (see _segment_spine)
        .agg((F.max("sec_max_idx") + 1).alias("n_samples"))
        .withColumn("n_sec", F.ceil(F.col("n_samples") / fs_i))
        .withColumn("sec", F.explode(F.sequence(F.lit(0), F.col("n_sec") - 1)))
        .select(B, "sec")
    )
    # each beat serves windows {sec, sec+1}; window s spans seconds {s-1, s}
    exploded = beats.withColumn(
        "wsec", F.explode(F.array(F.col("sec"), F.col("sec") + 1))
    ).withColumn("win_start_idx", F.greatest(F.lit(0), (F.col("wsec") - 1) * fs_i))
    window_stats = (
        exploded.withColumn(
            "ibi_in",
            F.when(F.col("prev_idx") >= F.col("win_start_idx"), F.col("ibi_ms")),
        )
        # A beat appears in the exploded frame exactly once at its OWN
        # second; materialize that mask before the groupBy — inside the
        # agg, "sec" would collide with the `wsec AS sec` grouping alias
        # and correctness would hinge on child-column resolution order.
        .withColumn("own_sec", F.col("wsec") == F.col("sec"))
        .groupBy(B, F.col("wsec").alias("sec"))
        .agg(
            F.avg("ibi_in").alias("mean_ibi"),
            F.count(F.when(F.col("own_sec"), F.lit(1))).alias("n_beats"),
        )
    )
    out = (
        spine.join(window_stats, [B, "sec"], "left")
        .withColumn("n_beats", F.coalesce("n_beats", F.lit(0)))
        .withColumn("mean_hr", _sdiv(F.lit(60000.0), F.col("mean_ibi")))
        .withColumn("second", F.col("sec") + 1)
    )
    cols = [B, "second", "mean_hr", "mean_ibi", "n_beats"]
    if with_ts:
        out = out.join(sec_samples.select(B, "sec", "ts"), [B, "sec"], "left")
        cols = [B, "second", "ts", "mean_hr", "mean_ibi", "n_beats"]
    return out.select(*cols)


def cardiac_summary(metrics: DataFrame) -> DataFrame:
    """A9 parity: whole-recording rollup of the segmented SQA metric frame
    (reference: dashboard/utils.py:584-631) — per subject: segment count,
    mean detected beats, segments with any missing / any artifact /
    invalid, and mean percentages. One tiny hash aggregation."""
    return metrics.groupBy(B).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.round(F.avg("n_detected"), 2).alias("avg_n_detected"),
        F.sum(F.when(F.col("n_missing") > 0, 1).otherwise(0))
        .alias("segs_with_missing"),
        F.sum(F.when(F.col("n_artifact") > 0, 1).otherwise(0))
        .alias("segs_with_artifact"),
        F.sum(F.when(F.col("invalid") == 1, 1).otherwise(0))
        .alias("segs_invalid"),
        F.round(F.avg("pct_missing"), 2).alias("avg_pct_missing"),
        F.round(F.avg("pct_artifact"), 2).alias("avg_pct_artifact"),
    )
