"""Declarative data-quality expectations over any frame: single-pass
validation counts and row quarantine.

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

from pyspark.sql import Column, DataFrame, functions as F


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
