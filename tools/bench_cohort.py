"""Cohort-scale cardiac throughput: the §2 (physiological) side of the
scaling evidence in PLANS.md — the LLM operators have measured 10x
tables; this measures the filter -> detect -> artifacts -> segmented
metrics pipeline over a growing SUBJECT cohort, the §6 envelope claim
(partition-parallel amortization: per-subject kernels are independent,
so cohort wall time should flatten once subjects >> cores is reached
from below — sublinear in subjects until the cluster saturates).

Usage:

    python tools/bench_cohort.py [--subjects 5 50] [--duration 3600]
                                 [--fs 256] [--runs 1]

Synthesis is DISTRIBUTED (mapInPandas, one task per subject — never a
driver-side row list: 50 subjects x 1 h x 256 Hz is 46M rows) and
written to parquet once per cohort size; the timed region is the
pipeline over the parquet scan only. Reports one JSON line with wall
seconds per cohort size, the subjects-ratio, per-subject ratio, and
samples/sec throughput for both annotation gears (groupBy exchange vs
the assume_partitioned shuffle-free path over file-per-subject
layout).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from physioview_spark.session import get_spark

WORK = "/tmp/pv_cohort"


def build_cohort(spark, n_subjects: int, fs: float, duration: float,
                 out_dir: str) -> None:
    """File-per-subject parquet cohort, synthesized on the executors."""
    from physioview_spark.testing import synth_ecg

    base = spark.range(n_subjects).select(F.col("id").alias("sid"))

    def gen(batches):
        for pdf in batches:
            for sid in pdf["sid"]:
                x, _ = synth_ecg(fs=fs, duration=duration,
                                 seed=42 + int(sid))
                yield pd.DataFrame({
                    "subject_id": f"s{int(sid):04d}",
                    "sample_idx": np.arange(len(x), dtype=np.int64),
                    "ecg": x.astype(float),
                })

    (base.repartition(n_subjects, "sid")
     .mapInPandas(gen, "subject_id string, sample_idx long, ecg double")
     .write.mode("overwrite").partitionBy("subject_id").parquet(out_dir))


def annotate_only(spark, path: str, fs: float, assume_partitioned: bool):
    """The single-pass consumer (annotate -> sink). Measured at n=50
    (fresh session per gear): groupBy 10.5-13.2 s vs assume_partitioned
    19.1-19.3 s — on local[32] the exchange of the dense frame costs
    little next to the Python kernel, and the hash exchange balances 50
    subjects over 32 kernel tasks better than the 50 scan-aligned
    tasks. The shuffle-free gear's payoff is the avoided NETWORK
    exchange on a real cluster (and layouts where scan tasks already
    align with cores); its local wall-time is not the argument."""
    from physioview_spark.functions.spark_kernels import annotate_cardiac

    df = spark.read.parquet(path)
    return annotate_cardiac(df, fs=fs, detector="manikandan",
                            assume_partitioned=assume_partitioned)


def pipeline(spark, path: str, fs: float, assume_partitioned: bool):
    """The multi-reference consumer (annotate -> segmented SQA
    metrics): compute_metrics references the annotated frame from
    several lineages (beats, extents, half-slice medians). The groupBy
    gear's exchange doubles as a materialization point those references
    reuse; with the shuffle-free gear, any reference outside the
    persisted beats frame re-runs the Python kernel — checkpoint with
    sources.write_stage (the S11 pattern) between annotation and a
    multi-reference consumer if using that gear. Measured in PLANS.md
    (round 8)."""
    from physioview_spark.functions.spark_kernels import annotate_cardiac
    from physioview_spark.operators.metrics import compute_metrics

    df = spark.read.parquet(path)
    annotated = annotate_cardiac(
        df, fs=fs, detector="manikandan",
        assume_partitioned=assume_partitioned)
    return compute_metrics(annotated, fs=fs, seg_size=60, with_ts=False)


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, nargs="+", default=[5, 50])
    ap.add_argument("--duration", type=float, default=3600.0)
    ap.add_argument("--fs", type=float, default=256.0)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    spark = get_spark(extra_conf={"spark.driver.memory": "16g"})
    results: dict[str, dict] = {}
    for n in args.subjects:
        d = f"{WORK}/n{n}"
        if not os.path.exists(d):
            t0 = time.time()
            build_cohort(spark, n, args.fs, args.duration, d)
            print(f"built n{n} in {time.time() - t0:.1f}s",
                  file=sys.stderr)
        n_samples = int(n * args.fs * args.duration)
        for gear, part in (("groupby", False), ("partitioned", True)):
            for consumer, fn in (
                ("annotate", lambda p=part: annotate_only(
                    spark, d, args.fs, p).count()),
                ("metrics", lambda p=part: pipeline(
                    spark, d, args.fs, p).count()),
            ):
                label = f"{gear}_{consumer}"
                fn()  # warm JIT/codegen/page cache
                # compute_metrics persists its shared beats frame — a
                # warm timed run would hit that cache and skip the
                # kernel entirely; clear so the timed region is the
                # honest cold end-to-end cost including annotation
                spark.catalog.clearCache()
                best = min(
                    (spark.catalog.clearCache() or _timed(fn)
                     for _ in range(args.runs)))
                r = results.setdefault(label, {})
                r[f"n{n}"] = best
                r[f"n{n}_samples_per_sec"] = round(n_samples / best)
                spark.catalog.clearCache()
    lo, hi = min(args.subjects), max(args.subjects)
    for label, r in results.items():
        if f"n{lo}" in r and f"n{hi}" in r and lo != hi:
            r["ratio"] = round(r[f"n{hi}"] / r[f"n{lo}"], 2)
            r["per_subject_ratio"] = round(r["ratio"] / (hi / lo), 2)
    print(json.dumps({
        "fs": args.fs, "duration": args.duration,
        "subjects": args.subjects, "results": results,
    }))


if __name__ == "__main__":
    main()


def cleanup() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
