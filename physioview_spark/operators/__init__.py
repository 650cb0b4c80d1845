from physioview_spark.operators.segment import segment_data, rolling_windows
from physioview_spark.operators.ibi import compute_ibis
from physioview_spark.operators.asof import asof_join, interp_join
from physioview_spark.operators.spans import (
    interval_join, expand_spans, flag_spans,
)
from physioview_spark.operators.metrics import (
    cardiac_summary, compute_metrics, compute_metrics_rolling,
    get_artifacts, get_missing, get_seconds,
)
from physioview_spark.operators.eda_metrics import (
    compute_eda_features, compute_eda_metrics, eda_quality_flags,
    eda_summary,
)
from physioview_spark.operators.acc import (
    compute_auc, compute_magnitude, convert_acc, get_duration,
)
from physioview_spark.operators.corrections import (
    accept_corrections, null_boundary_values, revert_corrections,
    unusable_blocks,
)

__all__ = [
    "segment_data", "rolling_windows", "compute_ibis",
    "asof_join", "interp_join",
    "interval_join", "expand_spans", "flag_spans",
    "cardiac_summary", "compute_metrics", "compute_metrics_rolling",
    "get_artifacts", "get_missing", "get_seconds",
    "compute_eda_features", "compute_eda_metrics", "eda_quality_flags",
    "eda_summary",
    "compute_auc", "compute_magnitude", "convert_acc", "get_duration",
    "accept_corrections", "null_boundary_values", "revert_corrections",
    "unusable_blocks",
]
