"""Declarative data-quality expectations over any frame: single-pass
validation counts, row quarantine, column profiling, and hot-key skew
diagnostics.

The ingest-side complement of the source-specific header/schema checks
(sources/csv.py S8): rules are named boolean Columns ("ts_not_null",
"hr_in_range", ...), evaluated in ONE projection —

- :func:`validate` reduces them to a per-rule violation-count report
  via a map-side-combinable aggregate (one 1-row result, no shuffle of
  the data, safe at any corpus size);
- :func:`quarantine` splits the frame into (valid, rejected) where
  rejected rows carry the array of failed rule names — the JSONL
  corrupt-record quarantine generalized to semantic rules. Both
  outputs are projections + filters over the same scan; Catalyst
  shares the scan when both are written in one job.

Rules are ordinary Column expressions, so they push down, fuse into
whole-stage codegen, and never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row: ``n_rows`` plus ``<rule>_violations`` per rule (count of
    rows where the rule is NOT satisfied; nulls count as violations —
    an expectation that cannot be evaluated is not met). Counts are
    coalesced to 0 on an empty frame (F.sum is NULL over zero rows;
    a consumer checking ``violations == 0`` must not read an
    empty-but-clean dataset as failing)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, cond in sorted(rules.items()):
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.coalesce(cond, F.lit(False)), 0)
                      .otherwise(1)),
                F.lit(0))
            .alias(f"{name}_violations"))
    return df.agg(*aggs)


def quarantine(
    df: DataFrame,
    rules: dict[str, Column],
    reasons_col: str = "violations",
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejected): rejected rows carry ``reasons_col`` — the
    sorted array of failed rule names; valid rows are returned without
    the helper column. Null rule results read as failures."""
    reasons = F.filter(
        F.array(*[
            F.when(F.coalesce(cond, F.lit(False)), F.lit(None))
            .otherwise(F.lit(name))
            for name, cond in sorted(rules.items())
        ]),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn(reasons_col, reasons)
    valid = tagged.where(F.size(reasons_col) == 0).drop(reasons_col)
    rejected = tagged.where(F.size(reasons_col) > 0)
    return valid, rejected


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    distinct_rsd: float = 0.05,
) -> DataFrame:
    """Single-pass column profile — the dataset-shape companion to
    :func:`validate`'s rule counts: for every profiled column one row
    ``(column, dtype, n_nulls, n_distinct_approx, min_str, max_str,
    mean, stddev, q_...)``; numeric-only metrics are NULL elsewhere.

    Everything folds into ONE aggregate over one scan (no per-column
    jobs, no shuffle of the data — the exchange carries a single
    partial-aggregate row per task at any corpus size):

    - ``n_distinct_approx`` is HyperLogLog++
      (``approx_count_distinct``, relative error ``distinct_rsd``) —
      an exact distinct per column would be one corpus shuffle EACH;
    - quantiles are ``approx_percentile`` (Greenwald-Khanna), the same
      sketch Spark's own ANALYZE uses;
    - min/max are computed in the column's NATIVE type and stringified
      afterwards, so one long-format report covers mixed types without
      lexicographic artifacts ('9' > '10' string-compares true; the
      native min/max never sees strings unless the column is one).

    The wide 1-row aggregate is unpivoted driver-side into the
    long-format frame — bounded by the column count, never by rows.
    """
    cols = columns if columns is not None else df.columns
    qlabels = [
        f"q{int(q * 100)}" if float(q * 100).is_integer()
        else "q" + repr(float(q))[2:]
        for q in quantiles
    ]
    if len(set(qlabels)) != len(qlabels):
        raise ValueError(f"quantile labels collide: {qlabels}")
    numeric = {
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in
        ("tinyint", "smallint", "int", "bigint", "float", "double")
        or f.dataType.simpleString().startswith("decimal")
    }
    dtypes = dict(df.dtypes)
    # map-typed columns have no ordering (min/max reject them); profile
    # their nulls/distinct only, with min_str/max_str left NULL
    orderable = {
        f.name for f in df.schema.fields
        if not f.dataType.simpleString().startswith("map")
    }
    # exact-name resolution: a raw string through F.col/F.expr reads a
    # dot as a nested-field path and a backtick breaks the parse; quote
    # with doubled backticks so any physical column name profiles
    def qcol(c: str) -> Column:
        return F.col("`" + c.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.coalesce(
            F.sum(F.when(qcol(c).isNull(), 1).otherwise(0)), F.lit(0)
        ).alias(f"__nn_{c}"))
        aggs.append(F.approx_count_distinct(qcol(c), rsd=distinct_rsd)
                    .alias(f"__nd_{c}"))
        if c in orderable:
            aggs.append(F.min(qcol(c)).cast("string").alias(f"__mn_{c}"))
            aggs.append(F.max(qcol(c)).cast("string").alias(f"__mx_{c}"))
        if c in numeric:
            # cast: avg/stddev over decimals yield decimal.Decimal,
            # which the double output schema rejects
            aggs.append(F.avg(qcol(c)).cast("double").alias(f"__av_{c}"))
            aggs.append(F.stddev(qcol(c)).cast("double")
                        .alias(f"__sd_{c}"))
            esc = c.replace("`", "``")
            for q, ql in zip(quantiles, qlabels):
                aggs.append(
                    F.expr(f"approx_percentile(`{esc}`, {q})")
                    .cast("double").alias(f"__{ql}_{c}"))
    wide = df.agg(*aggs).collect()[0].asDict()
    spark = df.sparkSession
    out_rows = []
    for c in cols:
        row = {
            "column": c, "dtype": dtypes[c], "n_rows": wide["__n"],
            "n_nulls": wide[f"__nn_{c}"],
            "n_distinct_approx": wide[f"__nd_{c}"],
            "min_str": wide.get(f"__mn_{c}"),
            "max_str": wide.get(f"__mx_{c}"),
            "mean": wide.get(f"__av_{c}"),
            "stddev": wide.get(f"__sd_{c}"),
        }
        for ql in qlabels:
            row[ql] = wide.get(f"__{ql}_{c}")
        out_rows.append(row)
    qcols = ", ".join(f"{ql} double" for ql in qlabels)
    return spark.createDataFrame(
        out_rows,
        "column string, dtype string, n_rows bigint, n_nulls bigint, "
        "n_distinct_approx bigint, min_str string, max_str string, "
        f"mean double, stddev double, {qcols}")


def profile_diff(
    before: DataFrame,
    after: DataFrame,
    null_rate_tol: float = 0.01,
    distinct_rel_tol: float = 0.2,
    mean_sd_tol: float = 0.5,
) -> DataFrame:
    """Drift report between two :func:`profile` outputs — the
    snapshot-over-snapshot regression guard for a recurring pipeline
    (yesterday's corpus vs today's): one row per column with the
    before/after shape deltas and a ``flags`` summary of which moved
    beyond tolerance.

    Deltas per column: ``null_rate_delta`` (absolute),
    ``distinct_rel_delta`` (relative to before's HLL estimate),
    ``mean_shift_sds`` (mean movement in units of before's stddev —
    the scale-free location drift), plus dtype change and
    appeared/vanished columns (full outer join on column name).
    ``flags`` is a comma-joined summary ('' = no drift) so the report
    stays scalar-typed and one ``where(flags != '')`` isolates the
    regressions.

    Scale shape: both inputs are already profile() outputs — bounded
    by COLUMN count, never rows — so this is a tiny driver-light
    outer join; the corpus cost was paid by the two single-scan
    profiles."""
    # null RATE of a zero-row profile is undefined, not 0.0 — nullif
    # keeps the division ANSI-safe while emitting honest NULLs (the r17
    # empty-table sweep caught greatest(n_rows, 1) manufacturing a 0.0
    # delta on an empty slice where the SQL oracle says NULL)
    b = before.select(
        "column", F.col("dtype").alias("__bdt"),
        (F.col("n_nulls") / F.nullif(F.col("n_rows"), F.lit(0)))
        .alias("__bnull"),
        F.col("n_distinct_approx").alias("__bnd"),
        F.col("mean").alias("__bmean"), F.col("stddev").alias("__bsd"))
    a = after.select(
        "column", F.col("dtype").alias("__adt"),
        (F.col("n_nulls") / F.nullif(F.col("n_rows"), F.lit(0)))
        .alias("__anull"),
        F.col("n_distinct_approx").alias("__and"),
        F.col("mean").alias("__amean"))
    j = b.join(a, "column", "full_outer")
    null_delta = F.round(F.col("__anull") - F.col("__bnull"), 6)
    dist_delta = F.round(
        (F.col("__and") - F.col("__bnd"))
        / F.greatest(F.col("__bnd"), F.lit(1)).cast("double"), 6)
    mean_shift = F.round(
        (F.col("__amean") - F.col("__bmean"))
        / F.when(F.col("__bsd") > 0, F.col("__bsd")), 6)
    flags = F.array_join(F.array_compact(F.array(
        F.when(F.col("__bdt").isNull(), F.lit("appeared")),
        F.when(F.col("__adt").isNull(), F.lit("vanished")),
        F.when(F.col("__bdt").isNotNull() & F.col("__adt").isNotNull()
               & (F.col("__bdt") != F.col("__adt")),
               F.lit("dtype_changed")),
        F.when(F.abs(null_delta) > null_rate_tol, F.lit("null_rate")),
        F.when(F.abs(dist_delta) > distinct_rel_tol, F.lit("distinct")),
        F.when(F.abs(mean_shift) > mean_sd_tol, F.lit("mean_shift")),
        # mean_shift_sds is NULL when before-stddev is 0/NULL (constant
        # or all-null numeric column), so a location drift there would
        # otherwise pass silently — flag it unscaled instead. The
        # comparison carries a tiny tolerance (1e-9 relative with a
        # 1e-12 absolute floor): a zero-stddev column can still show
        # ULP-level mean scatter from aggregation order on a
        # near-constant column, which is noise, not drift.
        F.when((F.col("__bsd").isNull() | (F.col("__bsd") <= 0))
               & F.col("__bmean").isNotNull()
               & F.col("__amean").isNotNull()
               & (F.abs(F.col("__amean") - F.col("__bmean"))
                  > F.greatest(F.abs(F.col("__bmean")) * 1e-9,
                               F.lit(1e-12))),
               F.lit("mean_shift_unscaled")),
    )), ",")
    return j.select(
        "column",
        F.col("__bdt").alias("dtype_before"),
        F.col("__adt").alias("dtype_after"),
        null_delta.alias("null_rate_delta"),
        dist_delta.alias("distinct_rel_delta"),
        mean_shift.alias("mean_shift_sds"),
        flags.alias("flags"),
    )


def skew_report(
    df: DataFrame,
    columns: list[str],
    top: int = 10,
) -> DataFrame:
    """Hot-key diagnostics for join/groupBy key candidates — the
    measurement behind a salting decision: for each column, the ``top``
    most frequent keys with count and share of rows. Output (long
    format): ``(column, key_str, cnt, share, rank)``; NULL keys report
    as key_str NULL with their true count.

    Spark-first shape: ONE ``GROUPING SETS ((c1), (c2), ..., ())``
    aggregate computes every column's frequency table AND the grand
    total in a single pass and a single shuffle (vs one groupBy job
    per column plus a separate ``count()`` scan for the share
    denominator); ``grouping(c)`` flags — not NULL-ness, which a NULL
    key would fake — identify which set each row belongs to. The
    per-column top-k filter rewrites to WindowGroupLimit, so only ~top
    keys per column per mapper cross the final exchange. The
    grand-total row rides through that same window (it is rank 1 of
    its own NULL-column partition) and is attached to every output row
    by a second window over the ALREADY-BOUNDED top-k rows (at most
    ``len(columns) * top + 1``) — one lineage, one scan, no separate
    ``count()`` job (a split-branch design re-scans: the branch
    filters push through the aggregate into the Expand, so the two
    branches cannot share the exchange).
    """
    if not columns:
        raise ValueError("columns must be non-empty")

    # exact-name resolution (same contract as profile()): quote with
    # doubled backticks so dotted names stay physical columns; grouping
    # flags alias by POSITION so a hostile name can't corrupt the
    # helper-column lookups either
    def qcol(c: str) -> Column:
        return F.col("`" + c.replace("`", "``") + "`")

    g = df.groupingSets(
        [[qcol(c)] for c in columns] + [[]],
        *[qcol(c) for c in columns],
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.grouping(qcol(c)).alias(f"__g_{i}")
          for i, c in enumerate(columns)],
    )
    # every grouping-sets row belongs to exactly ONE single-column set
    # (its grouping flag is 0) — except the grand-total row, where all
    # flags are 1; a CASE projection recovers which — one lineage, one
    # Expand, rather than a union of per-column filters that would
    # re-expand the aggregate per branch
    col_expr = None
    key_expr = None
    for i, c in enumerate(columns):
        is_set = F.col(f"__g_{i}") == 0
        col_expr = (F.when(is_set, F.lit(c)) if col_expr is None
                    else col_expr.when(is_set, F.lit(c)))
        key_expr = (F.when(is_set, qcol(c).cast("string"))
                    if key_expr is None
                    else key_expr.when(is_set, qcol(c).cast("string")))
    out = g.select(col_expr.alias("column"),
                   key_expr.alias("key_str"), F.col("cnt"))
    w = Window.partitionBy("column").orderBy(
        F.desc("cnt"), F.asc_nulls_last("key_str"))
    # the total row survives the top-k filter as rank 1 of the
    # NULL-column partition; this window's input is therefore bounded
    # by len(columns) * top + 1 rows, so the partition-less max is safe
    wall = Window.partitionBy()
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top)
        .withColumn(
            "__n_rows",
            F.max(F.when(F.col("column").isNull(), F.col("cnt")))
            .over(wall))
        .where(F.col("column").isNotNull())
        .withColumn(
            "share",
            F.when(F.col("__n_rows") > 0,
                   F.round(F.col("cnt")
                           / F.col("__n_rows").cast("double"), 6))
            .otherwise(F.lit(None).cast("double")))
        .select("column", "key_str", "cnt", "share", "rank")
    )


def cvx_solver_rules(
    max_rel_residual: float | None = None,
) -> dict[str, Column]:
    """Expectation recipe for the cvxEDA chunked-solver diagnostics
    columns (``decompose_eda_chunked(..., max_matvecs=...)`` emits
    ``cvx_capped`` / ``cvx_rel_residual`` / ``cvx_matvecs`` per row) —
    closes the quarantine loop on the straggler ceiling (VERDICT r10
    item 6): a chunk that exhausted its deterministic work budget is
    FLAGGED by the solver, and this recipe is the downstream consumer
    that actually routes those rows out of the analytic frame.

    Use with :func:`quarantine` (rejected rows carry the failed rule
    names, so a capped chunk arrives with reason ``cvx_not_capped``)
    or :func:`validate` (one-row violation counts — the cheap health
    probe before deciding whether a re-solve pass is needed).

    ``max_rel_residual`` optionally adds a ``cvx_rel_residual_ok``
    rule. Leave it ``None`` unless you know your tolerance: under the
    deliberately tight ADMM stopping test (functions/cvxeda.py) a
    healthy natural max_iter exit commonly reports rel_residual > 1
    while the iterate is well inside every downstream parity contract,
    so a naive ``<= 1.0`` threshold would quarantine good chunks."""
    rules: dict[str, Column] = {"cvx_not_capped": F.col("cvx_capped") == 0}
    if max_rel_residual is not None:
        rules["cvx_rel_residual_ok"] = (
            F.col("cvx_rel_residual") <= max_rel_residual)
    return rules
