"""Empatica E4 ZIP source — S3/S4/S5 parity, Spark-first.

The reference opens one ZIP at a time and parses each member CSV with
pandas (``Empatica.get_acc/get_bvp/...``, reference:
physioview/physioview.py:337-559; micro-format parser `_get_e4_data`
at :860-907). The E4 CSV micro-format: line 0 = Unix start epoch,
line 1 = sampling rate (except IBI, which has no fs), data afterwards.
Unit conversions: ACC raw -> m/s^2 via ``/64*9.81`` (:370-372), IBI
seconds -> ms via ``*1000`` (:518).

Spark-first: a directory of E4 archives is ONE ``binaryFile`` scan; the
unzip + parse runs inside ``mapInPandas`` (Arrow out, no driver
materialization), so a 10k-subject batch fans out file-per-task instead
of the reference's sequential loop. Time alignment (``preprocess(
time_aligned=True)``, reference :287-318) is re-expressed as the engine's
relational as-of join (operators/asof.py) plus Fourier resampling
(dsp/apply.py:fourier_resample) — no O(n*m) nested-loop joins.
"""

from __future__ import annotations

import io
import zipfile

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

# stream -> (member name, value column names, unit conversion)
_STREAMS = {
    "acc": ("ACC.csv", ["x", "y", "z"], lambda v: v / 64.0 * 9.81),
    "bvp": ("BVP.csv", ["bvp"], None),
    "eda": ("EDA.csv", ["eda"], None),
    "hr": ("HR.csv", ["hr"], None),
    "temp": ("TEMP.csv", ["temp"], None),
}

_SCHEMAS = {
    "acc": ("subject_id string, sample_idx long, ts timestamp_ntz, "
            "x double, y double, z double, magnitude double, fs double"),
    "bvp": ("subject_id string, sample_idx long, ts timestamp_ntz, "
            "bvp double, fs double"),
    "eda": ("subject_id string, sample_idx long, ts timestamp_ntz, "
            "eda double, fs double"),
    "hr": ("subject_id string, sample_idx long, ts timestamp_ntz, "
           "hr double, fs double"),
    "temp": ("subject_id string, sample_idx long, ts timestamp_ntz, "
             "temp double, fs double"),
    "ibi": ("subject_id string, ts timestamp_ntz, seconds double, "
            "ibi double"),
}


def _parse_e4_member(payload: bytes):
    """Parse one E4 member CSV -> (start_epoch, fs, data ndarray).

    Line 0 = start epoch (repeated per column), line 1 = fs, data after —
    reference: physioview/physioview.py:888-907.
    """
    arr = np.loadtxt(io.BytesIO(payload), delimiter=",", ndmin=2)
    start = float(arr[0, 0])
    fs = float(arr[1, 0])
    return start, fs, arr[2:]


def _parse_ibi_member(payload: bytes):
    """IBI member: line 0 = 'start, IBI' header, rows = (sec offset, dur s)
    — reference: physioview/physioview.py:513-523."""
    text = payload.decode("utf-8", errors="replace").strip().splitlines()
    start = float(text[0].split(",")[0])
    if len(text) == 1:
        return start, np.empty((0, 2))
    rows = np.array(
        [[float(v) for v in ln.split(",")[:2]] for ln in text[1:]]
    )
    return start, rows


def _epoch_grid(start: float, n: int, fs: float) -> np.ndarray:
    """Uniform datetime64[us] grid from a Unix start epoch at fs."""
    base = np.int64(round(start * 1e6))
    return (base + (np.arange(n, dtype=np.int64) * np.int64(round(1e6 / fs)))
            ).astype("datetime64[us]")


def _make_stream_decoder(stream: str):
    member_key, cols, convert = _STREAMS[stream]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                subject = row["path"].rsplit("/", 1)[-1].rsplit(".", 1)[0]
                zf = zipfile.ZipFile(io.BytesIO(bytes(row["content"])))
                name = next((n for n in zf.namelist()
                             if member_key.split(".")[0] in n), None)
                if name is None:
                    continue
                start, fs, data = _parse_e4_member(zf.read(name))
                n = len(data)
                out = {
                    "subject_id": np.repeat(subject, n),
                    "sample_idx": np.arange(n, dtype=np.int64),
                    "ts": _epoch_grid(start, n, fs),
                }
                for j, c in enumerate(cols):
                    v = data[:, j] if data.ndim == 2 else data
                    out[c] = convert(v) if convert else v
                if stream == "acc":
                    out["magnitude"] = np.sqrt(
                        out["x"] ** 2 + out["y"] ** 2 + out["z"] ** 2)
                out["fs"] = np.repeat(fs, n)
                yield pd.DataFrame(out)

    return decode


def _decode_ibi(batches):
    import pandas as pd

    for pdf in batches:
        for _, row in pdf.iterrows():
            subject = row["path"].rsplit("/", 1)[-1].rsplit(".", 1)[0]
            zf = zipfile.ZipFile(io.BytesIO(bytes(row["content"])))
            name = next((n for n in zf.namelist() if "IBI" in n), None)
            if name is None:
                continue
            start, rows = _parse_ibi_member(zf.read(name))
            n = len(rows)
            sec = rows[:, 0] if n else np.empty(0)
            dur = rows[:, 1] if n else np.empty(0)
            yield pd.DataFrame({
                "subject_id": np.repeat(subject, n),
                "ts": ((np.int64(round(start * 1e6))
                        + (sec * 1e6).astype(np.int64))
                       .astype("datetime64[us]")),
                "seconds": sec,
                "ibi": dur * 1000.0,  # s -> ms, reference :518
            })


def load_empatica(spark: SparkSession, path: str,
                  streams: list[str] | None = None) -> dict[str, DataFrame]:
    """E4 archive(s) -> dict of canonical per-stream sample frames.

    ``path`` may be one ZIP or a glob/directory of ZIPs: either way it is
    one distributed ``binaryFile`` scan, subjects named from file names.
    """
    streams = streams or ["acc", "bvp", "eda", "hr", "temp", "ibi"]
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content")
    out: dict[str, DataFrame] = {}
    for s in streams:
        fn = _decode_ibi if s == "ibi" else _make_stream_decoder(s)
        out[s] = files.mapInPandas(fn, _SCHEMAS[s])
    return out


def probe_empatica_fs(
    spark: SparkSession, path: str, stream: str = "bvp",
) -> dict[str, float]:
    """Per-archive sampling rate of one E4 stream via bounded driver-side
    reads — NO Spark job, NO archive download.

    The fs sits on line 1 of the member CSV, so the probe opens each ZIP
    through a seekable bounded reader (fsio.open_seekable): zipfile
    fetches only the central directory (tail) plus the first ~512
    decompressed bytes of the one member. This is how ``run_pipeline``
    learns fs for E4 sources instead of decoding the whole corpus
    twice."""
    from physioview_spark.sources import fsio

    member_key = _STREAMS[stream][0].split(".")[0]
    rates: dict[str, float] = {}
    for uri in fsio.list_files(spark, path):
        with fsio.open_seekable(spark, uri) as fh:
            try:
                zf = zipfile.ZipFile(fh)
            except zipfile.BadZipFile:
                continue
            name = next(
                (n for n in zf.namelist() if member_key in n), None)
            if name is None:
                continue
            with zf.open(name) as member:
                head = member.read(512)
        lines = head.decode("utf-8", errors="replace").splitlines()
        if len(lines) >= 2:
            try:
                rates[uri] = float(lines[1].split(",")[0])
            except ValueError:
                continue
    return rates


def align_hrv(bvp: DataFrame, ibi: DataFrame, hr: DataFrame) -> DataFrame:
    """Time-aligned HRV frame: IBI and HR merged onto the BVP grid with
    "un-fill" semantics — each IBI/HR value appears at exactly ONE BVP row
    (its insertion point), NaN elsewhere (reference:
    physioview/physioview.py:287-303).

    Spark-first: as-of join (nearest) + keep-one-per-matched-key via a
    row_number over the matched right timestamp — equivalent to the
    reference's ``searchsorted`` un-fill without any driver array.
    """
    from pyspark.sql import Window

    from physioview_spark.operators.asof import asof_join

    out = asof_join(bvp, ibi.select("subject_id", "ts", "ibi"),
                    on="ts", by="subject_id", direction="nearest")
    out = asof_join(out, hr.select("subject_id", "ts", "hr"),
                    on="ts", by="subject_id", direction="nearest",
                    suffix="_h")
    # un-fill: among all BVP rows matched to the same right-side event,
    # keep the value only at the row nearest that event's timestamp.
    # (asof_join returns the matched key ts_r/ts_h as epoch microseconds.)
    left_us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col("ts"),
    ).cast("double")
    for val, key in (("ibi_r", "ts_r"), ("hr_h", "ts_h")):
        w = Window.partitionBy("subject_id", key).orderBy(
            F.abs(left_us - F.col(key)), "sample_idx")
        out = out.withColumn(
            val,
            F.when(F.row_number().over(w) == 1, F.col(val)))
    return (out
            .withColumnRenamed("ibi_r", "ibi")
            .withColumnRenamed("hr_h", "hr")
            .drop("ts_r", "ts_h"))


def write_e4_zip(path: str, start: float, *,
                 acc: np.ndarray | None = None, acc_fs: float = 32.0,
                 bvp: np.ndarray | None = None, bvp_fs: float = 64.0,
                 eda: np.ndarray | None = None, eda_fs: float = 4.0,
                 hr: np.ndarray | None = None, hr_fs: float = 1.0,
                 temp: np.ndarray | None = None, temp_fs: float = 4.0,
                 ibi: np.ndarray | None = None) -> str:
    """Test-fixture writer for the E4 archive micro-format."""
    def member(data, fs, ncols=1):
        lines = [",".join([f"{start:.6f}"] * ncols),
                 ",".join([f"{fs:.6f}"] * ncols)]
        data = np.atleast_2d(np.asarray(data, dtype=float))
        if data.shape[0] == ncols and ncols > 1:
            data = data.T
        if ncols == 1:
            data = data.reshape(-1, 1)
        lines += [",".join(f"{v:.6f}" for v in r) for r in data]
        return "\n".join(lines) + "\n"

    with zipfile.ZipFile(path, "w") as zf:
        if acc is not None:
            zf.writestr("ACC.csv", member(acc, acc_fs, ncols=3))
        if bvp is not None:
            zf.writestr("BVP.csv", member(bvp, bvp_fs))
        if eda is not None:
            zf.writestr("EDA.csv", member(eda, eda_fs))
        if hr is not None:
            zf.writestr("HR.csv", member(hr, hr_fs))
        if temp is not None:
            zf.writestr("TEMP.csv", member(temp, temp_fs))
        if ibi is not None:
            rows = "\n".join(f"{s:.6f},{d:.6f}" for s, d in ibi)
            zf.writestr("IBI.csv", f"{start:.6f}, IBI\n{rows}\n")
    return path
