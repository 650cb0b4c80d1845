"""Pipeline parameter object — parity with the reference's JSON configs.

The reference persists pipeline parameters (source, data type, fs, segment
size, filter choices, artifact method/tolerance, SCR params, EDA bounds,
CSV header map) as JSON and reloads them to re-run a pipeline
(reference: dashboard/utils.py:327-372, dashboard/callbacks.py:617-645).
Here the same surface is a dataclass that serializes to/from that JSON shape
and drives the Spark job.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict


@dataclass
class PipelineConfig:
    # ingest
    source: str = "csv"             # csv | e4 | actiwave
    dtype: str = "ECG"              # ECG | PPG | BVP | EDA
    fs: float = 500.0               # default fs (reference: dashboard/layout.py:100)
    headers: dict[str, str] = field(default_factory=dict)  # user header -> canonical
    # segmentation / windows
    seg_size: int = 60              # s; cardiac default (reference: callbacks.py:217-224)
    rolling_window: int | None = None   # s; sliding SQA window
    rolling_step: int = 15              # s (reference: pipeline/SQA.py:77)
    # cardiac
    filter_on: bool = True
    beat_detector: str = "manikandan"
    artifact_method: str = "cbd"    # hegarty | cbd | both (reference: layout.py:218-223)
    artifact_tol: float = 1.0
    initial_hr: str | float = "auto"
    min_hr: float = 40.0
    max_hr: float = 200.0
    # EDA (reference: layout.py:248-255; SQA.py Kleckner rules)
    eda_seg_size: int = 180
    scr_amp_min: float = 0.25       # µS minimum SCR amplitude
    eda_min: float = 0.2            # µS valid range lower bound
    eda_max: float = 40.0           # µS valid range upper bound
    eda_max_slope: float = 5.0      # µS/s
    temp_min: float = 20.0          # °C
    temp_max: float = 40.0          # °C
    # ACC
    acc_sensitivity: float = 64.0

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, payload: str) -> "PipelineConfig":
        data = json.loads(payload)
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in data.items() if k in known})

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "PipelineConfig":
        with open(path) as fh:
            return cls.from_json(fh.read())
