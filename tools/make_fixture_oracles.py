"""(Re)generate pinned parquet fixture oracles.

Runs each listed query on a vanilla Spark session (same defaults the
driver uses) and writes its result to tests/fixtures/oracle/<name>/ as a
single parquet file. The driver's correctness gate then compares the
live query against the pinned result via DuckDB read_parquet — a hash
gate for kernels whose semantics have no SQL twin.

Only queries whose inputs are fully deterministic AND independent of the
sf_dir tables belong here (synthetic seeded signals, fake codecs);
regenerate intentionally after a deliberate kernel behavior change:

    python tools/make_fixture_oracles.py [name ...]
"""

from __future__ import annotations

import shutil
import sys

sys.path.insert(0, ".")

FIXTURE_QUERIES = [
    "kernel_cardiac_sqa_ecg",
    "kernel_cardiac_rolling_ppg",
    "kernel_eda_scr",
    # kernel_seconds_hr retired r15 (redundant A5 attestation)
    "kernel_beat_correction",
    "kernel_hrv_features",
    # kernel_eda_quality_metrics and kernel_acc_auc have TRUE DuckDB
    # twins over committed input fixtures (tools/make_input_fixtures.py)
    # — no pinned output needed.
    "e4_ingest_aligned",
    "edf_ingest_channels",
    "resample_grid_stats",
    "corrections_accept_revert",
    "multimodal_audio_features",
    "multimodal_video_frames",
    "multimodal_image_features",
    # near-dup pair outputs are integers (ids + Hamming distances) over
    # seeded fake tables: comparison margins sit orders above cross-host
    # float scatter, so they pin safely (cf. FIXTURES.md stability rule)
    "multimodal_image_near_dups",
    "multimodal_audio_near_dups",
    # multimodal_video_near_dups retired r12 (redundant third
    # attestation of the same hamming_banded_pairs engine path);
    # multimodal_blocks_near_dups pins the SAME pair table the r11
    # blocks=(8,2) scale gear must reproduce bit-for-bit
    "multimodal_blocks_near_dups",
    "multimodal_image_dedup_decisions",
    # BPE train+encode over a seeded sf-independent corpus: integers +
    # subword strings only, no floats — pins safely
    "doc_bpe_encode",
]


def main():
    import os

    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from physioview_spark.plans.common import FIXTURE_DIR

    only = set(sys.argv[1:]) or set(FIXTURE_QUERIES)
    spark = (SparkSession.builder.master("local[8]")
             .appName("make-fixtures").getOrCreate())
    qs = e.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for name in FIXTURE_QUERIES:
        if name not in only:
            continue
        out = os.path.join(FIXTURE_DIR, name)
        shutil.rmtree(out, ignore_errors=True)
        df = qs[name](spark, sf_dir)
        df.coalesce(1).write.mode("overwrite").parquet(out)
        # drop Spark's bookkeeping files; keep only the data file
        for f in os.listdir(out):
            if not f.endswith(".parquet"):
                os.remove(os.path.join(out, f))
        n = spark.read.parquet(out).count()
        print(f"pinned {name}: {n} rows -> {out}")
    write_versions()


def write_versions():
    """Record the generating environment next to the pinned fixtures:
    last-ulp float drift from a numpy/pyarrow upgrade can shift a
    round(...,4) boundary, and a recorded provenance makes such a
    mismatch point at regeneration instead of a kernel regression."""
    import json
    import os
    import platform

    import numpy
    import pandas
    import pyarrow
    import pyspark

    from physioview_spark.plans.common import FIXTURE_DIR

    meta = {
        "python": platform.python_version(),
        "numpy": numpy.__version__,
        "pandas": pandas.__version__,
        "pyarrow": pyarrow.__version__,
        "pyspark": pyspark.__version__,
    }
    path = os.path.join(FIXTURE_DIR, "VERSIONS.json")
    with open(path, "w") as fh:
        json.dump(meta, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print(f"recorded generating versions -> {path}")


if __name__ == "__main__":
    main()
