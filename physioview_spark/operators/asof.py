"""As-of (nearest) time-alignment join — the engine's J1/J2 operator.

Parity: the reference aligns streams at different rates with
``pd.merge_asof(..., direction='nearest')`` and a tolerance variant for beat
edits (reference: physioview/physioview.py:287-303, 1748-1758). It also has
an O(n*m) nested-loop nearest join (``get_e4_beats``, reference:
physioview/physioview.py:561-603) which this operator replaces outright.

Spark-first: no native as-of join, so: union the two sides tagged, run
``last(value, ignorenulls=True)`` over an ordered window per group
(backward pass), symmetric ``first`` over the following frame (forward
pass), and pick the nearer for ``nearest``. One shuffle on (by, on); no
Python boundary crossing. This beats ``applyInPandas(merge_asof)`` because
it stays in Tungsten and AQE can still split skewed subjects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort on this type (maps can't; containers are
    orderable iff their elements are)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Join each left row to the nearest right row on ``on`` within ``by``.

    ``tolerance`` is in the units of ``on`` (seconds if ``on`` is a
    timestamp). Matched right columns come back as ``<col><suffix>`` plus
    ``<on><suffix>`` (the matched key) — callers that need the reference's
    "un-fill" semantics (value only at the insertion row) can compare
    ``on`` equality afterwards.

    Ties among right rows (duplicate ``on`` within a ``by`` group) break
    deterministically toward the largest carried-value tuple, compared
    over the ORDERABLE carried columns only (map-typed columns — which
    Spark cannot sort — ride along in the payload but don't participate;
    rows identical on every orderable carried column remain arbitrary
    among themselves). All carried columns always come from the SAME
    winning right row — including its NULLs — because the match is
    carried as one struct, not per-column.
    """
    if isinstance(by, str):
        by = [by]
    by = by or []
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]

    # Numeric ordering key. Timestamps become epoch MICROSECONDS (exact in
    # a double up to ~2255 CE); NTZ goes through timestamp_diff so the key
    # is independent of the session timezone. ``tolerance`` for timestamp
    # keys is given in seconds and scaled here.
    on_dtype = dict(left.dtypes).get(on, "")
    if on_dtype == "timestamp_ntz":
        key = F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col(on),
        ).cast("double")
    elif on_dtype.startswith("timestamp"):
        key = F.col(on).cast("double") * 1e6
    else:
        key = F.col(on).cast("double")
    if tolerance is not None and on_dtype.startswith("timestamp"):
        tolerance = float(tolerance) * 1e6
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__k", key)
    rhs_proj = [F.col(on)] + [F.col(c) for c in by] + [
        F.col(c).alias(f"{c}{suffix}") for c in right_cols
    ]
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{on}{suffix}"]
    clash = [n for n in carried if n in left.columns]
    if clash:
        raise ValueError(
            f"asof_join output column(s) {clash} collide with left-side "
            f"columns; pass a different suffix= (got {suffix!r})")
    # Tie sort keys: only Spark-orderable carried types participate (a
    # map-typed carried column raised AnalysisException in the r13
    # per-column form — ADVICE r13); the matched-key column is a double,
    # so the sort struct is never empty.
    orderable_keys = [f"{c}{suffix}" for c in right_cols
                      if _orderable(right.schema[c].dataType)]
    orderable_keys.append(f"{on}{suffix}")
    rhs = (
        right.select(*rhs_proj)
        .withColumn("__side", F.lit(0))
        .withColumn("__k", key)
        .withColumn(f"{on}{suffix}", F.col("__k"))
        # The whole matched row travels as ONE struct so every carried
        # column — NULLs included — comes from the same winning right
        # row (the r13 per-column last/first(ignorenulls) could mix
        # tied rows when carried values were NULL — ADVICE r13).
        .withColumn("__p", F.struct(*carried))
        .withColumn("__s", F.struct(*orderable_keys))
        .drop(*carried)
    )
    p_t = rhs.schema["__p"].dataType
    s_t = rhs.schema["__s"].dataType
    lhs = (lhs.withColumn("__p", F.lit(None).cast(p_t))
              .withColumn("__s", F.lit(None).cast(s_t)))
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    # Right rows sort before left rows at equal keys so an exact-timestamp
    # match is visible to the backward pass (merge_asof includes equal keys).
    # Ties AMONG right rows (duplicate `on` within a `by` group — routine
    # at scale: DATE-grained order timestamps give one customer several
    # same-day orders) are broken deterministically toward the LARGEST
    # orderable-value tuple (struct comparison; NULL fields smallest):
    # without the extra sort key the winning tied row is whatever
    # task/partition order produced, and the same query can return
    # different matches run-to-run (found by the sf0.1 oracle sweep,
    # r13 — 13 flipped matches on 60k events).
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.col("__k"), F.col("__side"), F.col("__s").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Forward pass as a RUNNING frame over the fully REVERSED order:
    # first(ignorenulls) over [current, unbounded following] re-scans the
    # partition tail per row in Spark's WindowExec — O(n^2) per group —
    # while last(ignorenulls) over [unbounded preceding, current] is the
    # O(n) incremental frame. Every sort key's direction (and null
    # placement) flips, so the frame covers exactly the same row set and
    # the nearest tie-winner is unchanged: at equal __k the right rows
    # still sort adjacent to (now before) the left row, and within a
    # tied right group last() picks the largest __s, as first() did
    # under __s.desc.
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col("__k").desc(), F.col("__side"),
                 F.col("__s").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    if direction in ("backward", "nearest"):
        out = out.withColumn("__bp", F.last("__p", ignorenulls=True).over(w_back))
    if direction in ("forward", "nearest"):
        out = out.withColumn("__fp", F.last("__p", ignorenulls=True).over(w_fwd))
    out = out.where(F.col("__side") == 1)
    for c in carried:
        if direction in ("backward", "nearest"):
            out = out.withColumn(f"__b_{c}", F.col("__bp").getField(c))
        if direction in ("forward", "nearest"):
            out = out.withColumn(f"__f_{c}", F.col("__fp").getField(c))

    if direction == "nearest":
        d_back = F.col("__k") - F.col(f"__b_{on}{suffix}")
        d_fwd = F.col(f"__f_{on}{suffix}") - F.col("__k")
        # backward wins ties, matching merge_asof(direction='nearest')
        use_back = F.when(
            F.col(f"__f_{on}{suffix}").isNull(), F.lit(True)
        ).when(
            F.col(f"__b_{on}{suffix}").isNull(), F.lit(False)
        ).otherwise(d_back <= d_fwd)
        for c in carried:
            out = out.withColumn(
                c, F.when(use_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
            )
    elif direction == "backward":
        for c in carried:
            out = out.withColumn(c, F.col(f"__b_{c}"))
    else:
        for c in carried:
            out = out.withColumn(c, F.col(f"__f_{c}"))

    if tolerance is not None:
        within = F.abs(F.col("__k") - F.col(f"{on}{suffix}")) <= F.lit(float(tolerance))
        for c in carried:
            out = out.withColumn(c, F.when(within, F.col(c)))

    keep = [c for c in left.columns] + [f"{c}{suffix}" for c in right_cols] + [f"{on}{suffix}"]
    return out.select(*keep)


def interp_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    value_col: str,
    by: list[str] | str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Linear-interpolation alignment join (K22 parity — the reference
    resizes TEMP onto the EDA grid with ``interp1d(..., kind='linear',
    fill_value='extrapolate')``, reference: pipeline/SQA.py:2436-2447).

    For each left row, the right series is sampled at the left key:
    interior keys blend the bracketing right values linearly; keys outside
    the right range extrapolate from the edge pair (interp1d semantics).
    Implementation: ONE tagged union of both sides, then a backward and a
    forward carry window over the same partitioning — the right side (with
    its lagged/led neighbors riding along) is computed once and the union
    shuffles once, instead of the two sequential as-of passes this used to
    take. Fully relational, a single Exchange on ``by``, no Python.
    """
    from pyspark.sql import Window

    # PRECONDITION: right keys must be unique per `by` group (pre-
    # aggregate duplicates upstream, as order_value_interp does with its
    # per-(customer, day) SUM). Interpolation over duplicate x is
    # ill-posed — scipy's interp1d is implementation-defined there too —
    # and the lag/lead neighbor windows below would pick arbitrary tied
    # neighbors (the defect class the r13 sf0.1 sweep caught in
    # asof_join, where ties ARE meaningful and now break
    # deterministically).
    if isinstance(by, str):
        by = [by]
    by = by or []
    out_col = out_col or f"{value_col}_interp"
    if out_col in left.columns:
        raise ValueError(
            f"interp_join output column {out_col!r} collides with a "
            f"left-side column; pass out_col=")

    def _num_key(df: DataFrame) -> F.Column:
        # Numeric ordering axis: epoch microseconds for timestamps (NTZ via
        # timestamp_diff so the key ignores the session timezone).
        dt = dict(df.dtypes).get(on, "")
        if dt == "timestamp_ntz":
            return F.timestamp_diff(
                "MICROSECOND",
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), F.col(on),
            ).cast("double")
        if dt.startswith("timestamp"):
            return F.col(on).cast("double") * 1e6
        return F.col(on).cast("double")

    w = Window.partitionBy(*by).orderBy(on)
    rkey = _num_key(right)
    rhs = (
        right.select(*by, on, value_col)
        .withColumn("__k", rkey)
        .withColumn("__rk", rkey)
        .withColumn("__v", F.col(value_col).cast("double"))
        .withColumn("__pk", F.lag(rkey).over(w))
        .withColumn("__pv", F.lag(value_col).over(w))
        .withColumn("__nk", F.lead(rkey).over(w))
        .withColumn("__nv", F.lead(value_col).over(w))
        .withColumn("__side", F.lit(0))
        .drop(on, value_col)
    )
    lhs = left.withColumn("__k", _num_key(left)).withColumn("__side", F.lit(1))
    for c in ("__rk", "__v", "__pk", "__pv", "__nk", "__nv"):
        lhs = lhs.withColumn(c, F.lit(None).cast("double"))
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    # Right rows sort before left at equal keys (ascending __side) so an
    # exact-timestamp match is visible to the backward carry; the forward
    # carry orders __side descending for the symmetric reason.
    w_back = (
        Window.partitionBy(*by).orderBy("__k", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Reversed running frame instead of [current, unbounded following]
    # (same O(n^2) -> O(n) rewrite as asof_join's forward pass above;
    # right keys are unique per group here — callers pre-aggregate — so
    # the reversal cannot flip a tie).
    w_fwd = (
        Window.partitionBy(*by).orderBy(F.col("__k").desc(), "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry_b = {c: F.last(c, ignorenulls=True).over(w_back)
               for c in ("__rk", "__v", "__pk", "__pv")}
    carry_f = {c: F.last(c, ignorenulls=True).over(w_fwd)
               for c in ("__rk", "__v", "__nk", "__nv")}
    out = unioned.withColumns(
        {f"__b{c}": e for c, e in carry_b.items()}
        | {f"__f{c}": e for c, e in carry_f.items()}
    ).where(F.col("__side") == 1)

    k = F.col("__k")
    kb, vb = F.col("__b__rk"), F.col("__b__v")
    kf, vf = F.col("__f__rk"), F.col("__f__v")
    pk, pv = F.col("__b__pk"), F.col("__b__pv")
    nk, nv = F.col("__f__nk"), F.col("__f__nv")

    interior = vb + (vf - vb) * (k - kb) / F.nullif(kf - kb, F.lit(0.0))
    extrap_hi = vb + (vb - pv) * (k - kb) / F.nullif(kb - pk, F.lit(0.0))
    extrap_lo = vf + (vf - nv) * (k - kf) / F.nullif(kf - nk, F.lit(0.0))
    out = out.withColumn(
        out_col,
        F.when(kb.isNull() & kf.isNull(), F.lit(None).cast("double"))
        .when(kb.isNull(), F.coalesce(extrap_lo, vf))
        .when(kf.isNull(), F.coalesce(extrap_hi, vb))
        .when(kf == kb, vb)
        .otherwise(interior),
    )
    return out.select(*left.columns, out_col)
