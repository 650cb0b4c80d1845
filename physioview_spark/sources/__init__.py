"""Sources & sinks: generic CSV (S6/S7), EDF/Actiwave (S1/S2),
Empatica E4 ZIP (S3-S5), Beat Editor JSON (S13/S14 + Q5), staged
parquet sinks (S11), Excel/Zip summary export (S12)."""

from physioview_spark.sources.csv import (
    infer_unix_unit, load_signal_csv, write_stage,
)
from physioview_spark.sources.edf import (
    get_channel_fs, load_actiwave, load_annotations, parse_edf_header,
    probe_actiwave_fs, read_edf_annotations, read_edf_bytes,
    write_edf_bytes,
)
from physioview_spark.sources.empatica import (
    align_hrv, load_empatica, probe_empatica_fs, write_e4_zip,
)
from physioview_spark.sources.beat_editor import (
    EDIT_SCHEMA, process_beat_edits, read_beat_edits,
    write_beat_editor_json,
)
from physioview_spark.sources.export import export_excel, export_zip
from physioview_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA, load_jsonl, write_jsonl,
)

__all__ = [
    "infer_unix_unit", "load_signal_csv", "write_stage",
    "get_channel_fs", "load_actiwave", "load_annotations",
    "parse_edf_header", "probe_actiwave_fs", "read_edf_annotations",
    "read_edf_bytes", "write_edf_bytes",
    "align_hrv", "load_empatica", "probe_empatica_fs", "write_e4_zip",
    "EDIT_SCHEMA", "process_beat_edits", "read_beat_edits",
    "write_beat_editor_json",
    "DOCUMENTS_SCHEMA", "load_jsonl", "write_jsonl",
    "export_excel", "export_zip",
]
