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
