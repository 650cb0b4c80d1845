"""Spark transformers over the NumPy kernel library.

One ``applyInPandas`` pass per subject does filter -> detect -> artifact
flagging in a single Python crossing (Arrow in/out), because chaining three
separate grouped UDFs would shuffle and cross the boundary three times.
Everything downstream (IBIs, segments, metrics) is relational.

Scale note: the parallelism unit is the subject — a cohort of thousands of
recordings fans out across executors. Single recordings too long for one
task use ``apply_kernel_chunked`` ((subject, chunk) keys with
overlap-and-discard halos); pre-partitioned cohort layouts skip the
grouping shuffle entirely via ``annotate_cardiac(assume_partitioned=True)``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from physioview_spark.functions import kernels_cardiac as kc
from physioview_spark.functions.filters import ECGFilters, EDAFilters, PPGFilters
from physioview_spark.functions.kernels_artifacts import identify_artifacts

DETECTORS: dict[str, Callable] = {
    "pantompkins": kc.pantompkins,
    "manikandan": kc.manikandan,
    "nabian": kc.nabian,
    "engzee": kc.engzee,
    "adaptive_threshold": kc.ppg_adaptive_threshold,
    "erma": kc.ppg_erma,
}


def default_filter(dtype: str, fs: float) -> Callable[[np.ndarray], np.ndarray]:
    """The dashboard-default filter per data type (reference: §3.1 step 3)."""
    if dtype.upper() == "ECG":
        return ECGFilters(fs).filter_signal
    if dtype.upper() in ("PPG", "BVP"):
        return PPGFilters(fs).filter_signal
    if dtype.upper() == "EDA":
        return EDAFilters(fs).filter_signal
    raise ValueError(dtype)


def _fan_out_groups(df: DataFrame, *keys: str) -> DataFrame:
    """Explicit REPARTITION_BY_NUM before a compute-heavy grouped pandas
    kernel. The default groupBy exchange is ENSURE_REQUIREMENTS, so
    AQE's byte-based partition coalescing applies — and these groups
    are byte-TINY but compute-HUGE (measured r18: kernel_eda_scr's
    2-subject cvxEDA stage coalesced into ONE 5.2 s task with 31 cores
    idle; same hazard apply_kernel_chunked already documents for its
    chunk groups). A numbered repartition is never coalesced and its
    hash partitioning satisfies the groupBy's clustering requirement,
    so no second exchange is added. Scale-adaptive: the partition count
    is the session's defaultParallelism (cluster cores), not a local
    constant."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(k) for k in keys])


def apply_kernel(
    df: DataFrame,
    kernel: Callable[[np.ndarray], np.ndarray],
    value_col: str,
    out_col: str,
    by: str = "subject_id",
) -> DataFrame:
    """Apply an array->array kernel per subject, appending ``out_col``."""
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType(), True)]
    )
    cols = list(df.columns)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx").reset_index(drop=True)
        pdf[out_col] = kernel(pdf[value_col].to_numpy())
        return pdf[cols + [out_col]]

    return _fan_out_groups(df, by).groupBy(by).applyInPandas(
        run, schema=schema)


def annotate_cardiac(
    df: DataFrame,
    fs: float | None,
    dtype: str = "ECG",
    detector: str = "manikandan",
    filter_on: bool = True,
    artifact_method: str = "cbd",
    artifact_tol: float = 1.0,
    initial_hr: float | str = "auto",
    value_col: str = "ecg",
    by: str = "subject_id",
    assume_partitioned: bool = False,
) -> DataFrame:
    """Filter + detect beats + flag artifacts in ONE grouped pass.

    Input: sample frame (subject_id, sample_idx, ts?, <value_col>).
    Output: input + ``filtered``, ``beat`` (1/NULL), ``artifact`` (1/NULL)
    — the annotated frame the relational SQA metrics consume
    (mirrors reference _preprocess_cardiac, dashboard/utils.py:56-122).

    ``fs=None`` reads the rate from the frame's own ``fs`` column per
    subject (heterogeneous-rate cohorts, e.g. mixed-device EDF/E4
    ingests — SURVEY §1.4); a scalar pins one rate for the whole frame.
    """
    det = DETECTORS[detector]
    if fs is None and "fs" not in df.columns:
        raise ValueError("fs=None requires an 'fs' column on the frame")
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("filtered", T.DoubleType(), True),
            T.StructField("beat", T.DoubleType(), True),
            T.StructField("artifact", T.DoubleType(), True),
        ]
    )
    cols = list(df.columns)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx").reset_index(drop=True)
        g_fs = float(pdf["fs"].iloc[0]) if fs is None else fs
        filt = default_filter(dtype, g_fs) if filter_on else None
        x = pdf[value_col].to_numpy(dtype=float)
        xf = filt(x) if filt is not None else x
        beats = det(xf, g_fs)
        arts = identify_artifacts(
            beats, g_fs, method=artifact_method, tol=artifact_tol,
            initial_hr=initial_hr,
        )
        beat = np.full(len(pdf), np.nan)
        artifact = np.full(len(pdf), np.nan)
        beat[beats] = 1.0
        artifact[arts] = 1.0
        pdf["filtered"] = xf
        pdf["beat"] = beat
        pdf["artifact"] = artifact
        return pdf[cols + ["filtered", "beat", "artifact"]]

    if assume_partitioned:
        # Shuffle-free fast path: when every subject's rows already live
        # in one partition (file-per-subject CSV/parquet scans — the
        # standard cohort layout — or after an explicit repartition),
        # group inside the partition with mapInPandas instead of paying
        # the groupBy exchange of the full dense frame. At 100 TB the
        # avoided shuffle IS the dominant cost of annotation.
        def run_part(batches):
            parts = [p for p in batches if len(p)]
            if not parts:
                return
            whole = pd.concat(parts, ignore_index=True)
            for _, g in whole.groupby(by, sort=False):
                yield run(g.reset_index(drop=True))

        return df.mapInPandas(run_part, schema=schema)
    return _fan_out_groups(df, by).groupBy(by).applyInPandas(
        run, schema=schema)


def annotate_eda(
    df: DataFrame,
    fs: float,
    scr_amp_min: float = 0.25,
    value_col: str = "eda",
    by: str = "subject_id",
) -> DataFrame:
    """EDA path in one grouped pass: FIR filter -> decompose -> SCR peaks.

    Output adds ``filtered``, ``phasic``, ``tonic``, ``scr`` (1/NULL)
    (mirrors reference _preprocess_eda, dashboard/utils.py:187-277).
    """
    from physioview_spark.functions.kernels_eda import decompose_eda, detect_scr_peaks

    filt = EDAFilters(fs)
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("filtered", T.DoubleType(), True),
            T.StructField("phasic", T.DoubleType(), True),
            T.StructField("tonic", T.DoubleType(), True),
            T.StructField("scr", T.DoubleType(), True),
        ]
    )
    cols = list(df.columns)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=float)
        xf = filt.filter_signal(x)
        phasic, tonic = decompose_eda(xf, fs)
        peaks = detect_scr_peaks(phasic, min_peak_amp=scr_amp_min)
        scr = np.full(len(pdf), np.nan)
        if len(peaks):
            scr[peaks] = 1.0
        pdf["filtered"] = xf
        pdf["phasic"] = phasic
        pdf["tonic"] = tonic
        pdf["scr"] = scr
        return pdf[cols + ["filtered", "phasic", "tonic", "scr"]]

    return _fan_out_groups(df, by).groupBy(by).applyInPandas(
        run, schema=schema)


def decompose_eda_chunked(
    df: DataFrame,
    fs: float,
    value_col: str = "eda",
    by: str = "subject_id",
    chunk_seconds: float = 1200.0,
    halo_seconds: float = 60.0,
    method: str = "cvx",
    max_matvecs: int | None = None,
    diagnostics: bool | None = None,
    group_partitions: int | str | None = "auto",
) -> DataFrame:
    """K17 at scale: cvxEDA decomposition of arbitrarily long recordings
    through the halo-chunked applier — adds ``phasic``/``tonic``.

    The reference (and ``annotate_eda``) solves the QP over the whole
    recording in one group; a 24 h @ 32 Hz recording is ~2.8 M samples x
    ~120 ADMM iterations in a single task. Overlap-and-discard restores
    (subjects x chunks) parallelism: the QP's couplings are all local —
    Bateman smoother support ~10 s, spline bumps 4*delta_knot = 40 s,
    and the per-chunk drift re-estimate is absorbed by the spline — so
    boundary effects decay well inside the default 60 s halo
    (parity-tested against the whole-signal solve in
    tests/test_detectors.py).

    Straggler note (measured at 24 h @ 32 Hz; PLANS.md "cvxEDA
    straggler receipt (rounds 10-11)"): the
    r09 hypothesis that per-chunk ADMM iteration count varies ~100x
    with signal content was FALSIFIED by the ``cvx_matvecs``
    diagnostics — on the SURVEY §6 bench signal every chunk exhausts
    the same max_iter work (64,880 matvecs). The 2-of-72 "straggler
    chunks" that dominated the r09 46-minute run were task-placement
    skew: the groupBy exchange is byte-tiny (~300 KB/chunk) so AQE
    coalesced 72 multi-minute groups into 23-24 tasks, and whichever
    task drew 4-5 serial chunks set the wall. ``group_partitions``
    (default ``"auto"``) fixes the actual cause: it counts chunk
    groups with one column-pruned aggregate (noise next to minutes of
    ADMM per chunk) and spreads them over 2x-count REPARTITION_BY_NUM
    partitions, which AQE never coalesces, bounding worst task at 1-2
    chunks. Pass an int to pin the count, or ``None`` to keep the raw
    groupBy exchange (the pre-r10 behavior). ``"auto"`` resolves to
    ``None`` for ``method != "cvx"``: the fast smoother is byte-bound,
    so it keeps the AQE-coalesced exchange and skips the counting job
    (r10 advisor finding).

    ``max_matvecs`` (VERDICT r09 item 2) is the per-chunk work
    GUARDRAIL: a deterministic budget in CG operator applications
    (each costs the same O(n log n) on a fixed-length chunk — a
    wall-clock ceiling would make results machine-dependent). A chunk
    that exhausts the budget returns its best ADMM iterate FLAGGED,
    never silently wrong: with ``diagnostics`` on (default whenever a
    cap or non-None ``diagnostics`` is given) every output row
    carries ``cvx_capped`` (1.0 = budget exhausted — the quarantine
    flag), ``cvx_rel_residual`` (max scale-free primal/dual residual
    ratio at exit; <= 1.0 iff the formal stopping test passed) and
    ``cvx_matvecs`` — constant within a chunk, so downstream quality
    gates can quarantine or re-solve exactly the capped chunks
    (``WHERE cvx_capped = 1``). Do NOT run capped for wall time on a
    healthy signal: work is uniform there, so a cap truncates every
    chunk's optimization equally and the saved wall is paid in
    solution quality (measured cap-vs-parity curve in PLANS.md
    "cvxEDA straggler receipt" — chunk-halving phasic parity degrades from 0.044 uncapped to
    0.135 at max_matvecs=12_000 on the 24 h leg). The cap earns its
    keep against genuinely pathological chunks a production corpus
    may contain, where it converts an unbounded solve into a flagged,
    bounded one."""
    from physioview_spark.functions.kernels_eda import decompose_eda

    if diagnostics is None:
        diagnostics = max_matvecs is not None
    out_cols = ["phasic", "tonic"]
    if diagnostics:
        out_cols += ["cvx_capped", "cvx_rel_residual", "cvx_matvecs"]

    def kern(x: np.ndarray):
        if not diagnostics:
            return decompose_eda(x, fs, method=method,
                                 max_matvecs=max_matvecs)
        phasic, tonic, info = decompose_eda(
            x, fs, method=method, max_matvecs=max_matvecs,
            return_info=True)
        n = len(x)
        return (phasic, tonic,
                np.full(n, 1.0 if info["capped"] else 0.0),
                np.full(n, float(info["rel_residual"])),
                np.full(n, float(info["matvecs"])))

    chunk_len = int(chunk_seconds * fs)
    if group_partitions == "auto" and method != "cvx":
        # The spread exists for compute-heavy/byte-tiny cvx chunks; the
        # fast smoother is byte-bound, where apply_kernel_chunked's own
        # guidance says to keep the AQE-coalesced exchange. Resolving
        # "auto" to None here also avoids the eager counting job (the
        # aggregate below runs at plan-build time and re-scans the
        # input lineage) for the gear that never needed it.
        group_partitions = None
    if group_partitions == "auto":
        # One column-pruned aggregate: total chunk-group count =
        # sum over subjects of ceil((max_idx + 1) / chunk_len). NOTE:
        # this runs EAGERLY at plan-build time and scans the input
        # lineage a second time (uncached) — acceptable because it is
        # column-pruned to (by, sample_idx) and costs noise next to
        # minutes of ADMM per chunk; pass an int to skip it.
        n_groups = (
            df.groupBy(by)
            .agg(F.max("sample_idx").alias("__mx"))
            .agg(F.sum(F.floor(F.col("__mx") / chunk_len) + 1)
                 .alias("__g"))
            .first()["__g"]
        )
        group_partitions = max(2 * int(n_groups or 1), 1)

    return apply_kernel_chunked(
        df, kern, value_col, out_cols,
        chunk_len=chunk_len, halo=int(halo_seconds * fs),
        by=by, group_partitions=group_partitions,
    )


def compute_hrv(
    beats: DataFrame,
    fs: float,
    window_length: int = 60,
    window_step: int = 15,
    by: str = "subject_id",
) -> DataFrame:
    """A11: HRV features over sliding windows of the IBI series.

    Input: beat rows (subject_id, sample_idx). Each beat lands in
    ``window/step`` windows via sequence+explode (relational fan-out), then
    a grouped Arrow kernel computes the td/fd/nl feature set per
    (subject, window) — the classic grouped-aggregate pandas UDF shape
    (reference: physioview/physioview.py:1022-1089, via flirt).
    """
    from pyspark.sql import functions as F

    from physioview_spark.functions.kernels_hrv import FEATURE_NAMES, hrv_features

    step_len = int(fs * window_step)
    win_len = int(fs * window_length)
    lo = F.greatest(
        F.lit(0), F.ceil((F.col("sample_idx") - win_len + 1) / F.lit(step_len))
    )
    hi = F.floor(F.col("sample_idx") / F.lit(step_len))
    exploded = beats.select(by, "sample_idx").withColumn(
        "window_id", F.explode(F.sequence(lo, hi))
    )
    schema = T.StructType(
        [
            T.StructField(by, T.StringType(), False),
            T.StructField("window_id", T.LongType(), False),
        ]
        + [T.StructField(f, T.DoubleType(), True) for f in FEATURE_NAMES]
    )

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ix = np.sort(pdf["sample_idx"].to_numpy())
        nn = np.diff(ix) / fs * 1000.0
        feats = hrv_features(nn)
        row = {by: key[0], "window_id": key[1], **feats}
        return pd.DataFrame([row])

    return exploded.groupBy(by, "window_id").applyInPandas(run, schema=schema)


def correct_beats(
    beats: DataFrame,
    fs: float,
    by: str = "subject_id",
    **kwargs,
) -> DataFrame:
    """Q4: Hegarty-Craver correction per subject; returns the corrected
    beat rows with per-beat flag and IBI (sparse frame).
    """
    from physioview_spark.functions.kernels_correction import correct_interval

    schema = T.StructType([
        T.StructField(by, T.StringType(), False),
        T.StructField("sample_idx", T.LongType(), False),
        T.StructField("ibi_ms", T.DoubleType(), True),
        T.StructField("flag", T.StringType(), True),
    ])

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        ix = np.sort(pdf["sample_idx"].to_numpy())
        subject = pdf[by].iloc[0]
        _, _, corrected = correct_interval(ix, fs, **kwargs)
        return pd.DataFrame({
            by: subject,
            "sample_idx": corrected["beat"].astype(np.int64),
            "ibi_ms": corrected["ibi_ms"],
            "flag": [None if f is None else str(f) for f in corrected["flag"]],
        })

    return beats.select(by, "sample_idx").groupBy(by).applyInPandas(
        run, schema=schema
    )


def corrected_segment_summary(
    original_beats: DataFrame,
    fs: float,
    seg_size: int = 60,
    by: str = "subject_id",
    **kwargs,
) -> DataFrame:
    """A8 get_corrected rollup: per-segment corrections count/%, plus
    pivoted Correct/Short/Long/Extra Long flag counts
    (reference: pipeline/SQA.py:1417-1512). Relational after the per-
    subject correction kernel; segment = ceil(beat / (seg_size*fs)).
    """
    from pyspark.sql import functions as F

    from physioview_spark.functions.kernels_correction import correct_interval

    orig_schema = T.StructType([
        T.StructField(by, T.StringType(), False),
        T.StructField("sample_idx", T.LongType(), False),
        T.StructField("correction", T.IntegerType(), True),
    ])

    def run_orig(pdf: pd.DataFrame) -> pd.DataFrame:
        ix = np.sort(pdf["sample_idx"].to_numpy())
        subject = pdf[by].iloc[0]
        _, original, _ = correct_interval(ix, fs, **kwargs)
        return pd.DataFrame({
            by: subject,
            "sample_idx": original["beat"].astype(np.int64),
            "correction": original["correction"].astype(np.int32),
        })

    orig = original_beats.select(by, "sample_idx").groupBy(by).applyInPandas(
        run_orig, schema=orig_schema
    )
    corrected = correct_beats(original_beats, fs, by=by, **kwargs)

    seg_len = int(seg_size * fs)
    seg_of = lambda c: F.ceil(F.col(c) / seg_len).cast("long")  # noqa: E731
    o = orig.groupBy(by, seg_of("sample_idx").alias("segment")).agg(
        F.sum("correction").alias("n_corrected"),
        F.count(F.lit(1)).alias("__n"),
    ).withColumn(
        "pct_corrected",
        F.round(F.col("n_corrected") / F.nullif(F.col("__n"), F.lit(0)) * 100.0, 2),
    ).drop("__n")
    flag_counts = corrected.groupBy(
        by, seg_of("sample_idx").alias("segment")
    ).agg(*[
        F.sum(F.when(F.col("flag") == f, 1).otherwise(0)).alias(
            f.lower().replace(" ", "_"))
        for f in ["Correct", "Short", "Long", "Extra Long"]
    ])
    return flag_counts.join(o, [by, "segment"], "inner")


def apply_kernel_chunked(
    df: DataFrame,
    kernel: Callable[[np.ndarray], np.ndarray],
    value_col: str,
    out_col: str | list[str],
    chunk_len: int = 1 << 22,
    halo: int = 1 << 14,
    by: str = "subject_id",
    group_partitions: int | None = None,
) -> DataFrame:
    """Halo-chunked kernel application for recordings too long for one
    task (SURVEY §7.4: a 24 h @ 1024 Hz recording is ~88 M samples — one
    ``applyInPandas`` group would serialize it through a single worker).

    Overlap-and-discard: every row is exploded into its own chunk plus,
    within ``halo`` samples of a boundary, the adjacent chunk; the kernel
    runs per (subject, chunk) on core+halo and only core rows are kept.
    Exact for FIR/moving-average kernels with halo >= filter length; for
    zero-phase IIR (``filtfilt_fft``) the reflected-pad transient decays
    inside the halo, so choose halo >= several impulse-response lengths.
    Parallelism becomes (subjects x chunks) — a single 100 GB recording
    fans out across the cluster instead of pinning one executor.

    ``out_col`` may be a list, for kernels returning one array per output
    (tuple/list in the same order) — e.g. a phasic/tonic decomposition.

    ``group_partitions`` spreads chunk-groups across that many shuffle
    partitions via an explicit ``repartition(n, keys)``. This exists
    because the default ``groupBy`` exchange is ENSURE_REQUIREMENTS —
    AQE's byte-based partition coalescing applies, and a cvx-style
    kernel's groups are byte-TINY but compute-HUGE (a 1200 s EDA chunk
    is ~300 KB of Arrow yet minutes of ADMM), so AQE packs several
    multi-minute groups into one task and the cohort wall becomes
    whichever task drew the most groups (measured: 72 chunks coalesced
    into 23-24 tasks, 3-5 serial chunks each — PLANS.md "cvxEDA
    straggler receipt (rounds 10-11)"). An
    explicit numbered repartition is REPARTITION_BY_NUM, which AQE
    never coalesces, and its hash partitioning satisfies the groupBy's
    clustering requirement so NO second exchange is added (plan-
    asserted in tests). Set it to ~2x the expected group count so the
    balls-in-bins max load stays at 1-2 groups/task; leave ``None``
    for byte-heavy fast kernels (the filter family), where AQE's
    byte-based packing is the right call."""
    from pyspark.sql import functions as F

    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    schema = T.StructType(
        df.schema.fields
        + [T.StructField(c, T.DoubleType(), True) for c in out_cols]
    )
    cols = list(df.columns)

    pos = F.col("sample_idx") % chunk_len
    own = F.floor(F.col("sample_idx") / chunk_len).cast("long")
    chunk_sets = F.array_compact(
        F.array(
            own,
            F.when(pos < halo, own - 1),
            F.when(pos >= chunk_len - halo, own + 1),
        )
    )
    exploded = (
        df.withColumn("__chunk", F.explode(chunk_sets))
        .where(F.col("__chunk") >= 0)
    )
    if group_partitions is not None:
        exploded = exploded.repartition(
            group_partitions, F.col(by), F.col("__chunk"))

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        chunk = key[1]
        pdf = pdf.sort_values("sample_idx").reset_index(drop=True)
        res = kernel(pdf[value_col].to_numpy())
        if not isinstance(res, (tuple, list)):
            res = (res,)
        for c, arr in zip(out_cols, res):
            pdf[c] = arr
        core = pdf[(pdf["sample_idx"] // chunk_len) == chunk]
        return core[cols + out_cols]

    return (
        exploded.groupBy(by, "__chunk")
        .applyInPandas(run, schema=schema)
    )
