"""(Re)generate the deterministic INPUT fixtures under
tests/fixtures/inputs/.

These are the raw synthetic tables for the kernel queries whose math is
fully relational (two-level AUC, Kleckner EDA QA rules): the Spark query
and its DuckDB oracle both read the SAME committed parquet, and the
oracle recomputes the result in SQL — independent verification, unlike
the pinned OUTPUT fixtures used for SciPy-class kernels.

tests/test_relational.py guards that these files still match the
physioview_spark.testing synthesizers; regenerate intentionally after a
deliberate synthesizer change:

    python tools/make_input_fixtures.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, ".")


def acc_input() -> pd.DataFrame:
    from physioview_spark.testing import synth_acc

    x, y, z = synth_acc(fs=32.0, duration=300.0)
    return pd.DataFrame({
        "subject_id": np.repeat("s0", len(x)),
        "sample_idx": np.arange(len(x), dtype=np.int64),
        "x": x, "y": y, "z": z,
    })


def eda_input() -> pd.DataFrame:
    from physioview_spark.testing import synth_eda

    frames = []
    for s in range(2):
        x, _ = synth_eda(fs=4.0, duration=300.0, seed=11 + s)
        temp = np.full(len(x), 33.0)
        temp[100 * s: 100 * s + 20] = 15.0
        frames.append(pd.DataFrame({
            "subject_id": np.repeat(f"s{s}", len(x)),
            "sample_idx": np.arange(len(x), dtype=np.int64),
            "eda": x, "temp": temp,
        }))
    return pd.concat(frames, ignore_index=True)


INPUTS = {
    "kernel_acc_auc": acc_input,
    "kernel_eda_quality_metrics": eda_input,
}


def main():
    from physioview_spark.plans.common import INPUT_FIXTURE_DIR

    os.makedirs(INPUT_FIXTURE_DIR, exist_ok=True)
    for name, fn in INPUTS.items():
        out = os.path.join(INPUT_FIXTURE_DIR, f"{name}.parquet")
        fn().to_parquet(out, index=False)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
