"""physioview_spark — a PySpark-native physiological signal-quality engine.

A ground-up re-expression of the capabilities of cbslneu/physioview
(reference surveyed in SURVEY.md) on Apache Spark: relational operators are
declared with the DataFrame API so Catalyst plans them; per-recording
SciPy-style kernels run as Arrow-batched ``applyInPandas`` stages; everything
is partitioned by ``subject_id`` so the engine scales horizontally over
cohorts instead of looping subject-by-subject like the reference
(reference: dashboard/callbacks.py:759).

Public API mirrors the composability of the reference's library surface
(reference: physioview/__init__.py:20-33) as DataFrame -> DataFrame
transformers.
"""

from physioview_spark.session import get_spark
from physioview_spark.config import PipelineConfig
from physioview_spark.pipeline import run_pipeline

__version__ = "0.1.0"

__all__ = ["get_spark", "PipelineConfig", "run_pipeline", "__version__"]
