"""Materialize a curated corpus: apply decision rows to documents and
write the kept set as an analysis-ready layout plus an audit manifest —
the sink side of the curation suite (ingest arrives via
``sources.jsonl``; decisions come from any ``(id, decision)`` producer,
e.g. the registered ``doc_curation_pipeline_v3`` plan or
``dedup.dedup_delta``).

Layout stances for 100 TB:
- **Partition by a LOW-cardinality routing column** (language): readers
  of one language prune whole directories; partitioning by source/domain
  (web-scale cardinality) would explode the file count.
- **The manifest is the aggregate, not the data**: decision counts and
  token totals come from one map-side-combinable aggregate and land in a
  single JSON next to the corpus — auditors never re-scan the output.
- **Decisions join on the id, broadcast-eligible**: the decision frame
  is one row per document (far narrower than the text), so AQE picks a
  broadcast when the curated slice is small and a hash join otherwise;
  nothing here forces a strategy.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F


def apply_decisions(
    docs: DataFrame,
    decisions: DataFrame,
    id_col: str = "doc_id",
    decision_col: str = "decision",
    keep_value: str = "keep",
) -> DataFrame:
    """Documents that the decision frame keeps. Documents with NO
    decision row are dropped (un-reviewed data never ships), which makes
    the join an inner equi-join on the id."""
    kept_ids = (
        decisions.where(F.col(decision_col) == keep_value)
        .select(id_col)
    )
    return docs.join(kept_ids, id_col)


def decision_manifest(
    decisions: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    decision_col: str = "decision",
    text_col: str = "text",
) -> dict:
    """Audit manifest: row count per decision, plus per-decision token
    totals when the documents frame is supplied. One aggregate each —
    collected rows are bounded by the decision vocabulary."""
    counts = {
        r[decision_col]: r["n"]
        for r in decisions.groupBy(decision_col)
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manifest: dict = {"decisions": counts,
                      "n_total": int(sum(counts.values()))}
    if docs is not None:
        from physioview_spark.llm.text import tokens

        tok = docs.select(
            id_col, F.size(tokens(text_col)).cast("long").alias("__nt"))
        per = (
            decisions.join(tok, id_col)
            .groupBy(decision_col)
            .agg(F.sum("__nt").alias("t"))
            .collect()
        )
        manifest["tokens"] = {r[decision_col]: int(r["t"]) for r in per}
    return manifest


def write_curated_corpus(
    docs: DataFrame,
    decisions: DataFrame,
    out_dir: str,
    partition_by: str = "lang",
    id_col: str = "doc_id",
    decision_col: str = "decision",
) -> dict:
    """Apply ``decisions`` to ``docs`` and write the kept set under
    ``out_dir/corpus`` as parquet partitioned by ``partition_by``, with
    the audit manifest at ``out_dir/manifest.json``. Returns the
    manifest. The manifest aggregate runs BEFORE the write so a failed
    write never leaves a manifest describing data that is not there."""
    manifest = decision_manifest(
        decisions, docs, id_col=id_col, decision_col=decision_col)
    kept = apply_decisions(docs, decisions, id_col, decision_col)
    (kept.write.mode("overwrite").partitionBy(partition_by)
     .parquet(f"{out_dir}/corpus"))
    spark = docs.sparkSession
    # write the 1-row manifest through the JVM-side text writer so the
    # function stays driver-filesystem-agnostic (works on any scheme
    # Spark can write, not just local paths)
    (spark.createDataFrame([(json.dumps(manifest, sort_keys=True),)],
                           "value string")
     .coalesce(1).write.mode("overwrite").text(f"{out_dir}/manifest"))
    return manifest
