from physioview_spark.operators.segment import segment_data, rolling_windows
from physioview_spark.operators.ibi import compute_ibis
from physioview_spark.operators.asof import asof_join
from physioview_spark.operators.spans import interval_join, expand_spans

__all__ = [
    "segment_data",
    "rolling_windows",
    "compute_ibis",
    "asof_join",
    "interval_join",
    "expand_spans",
]
