"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio codecs are not present in this environment, so the decode
step is a deterministic fake behind the same interface a real decoder
would use (``mapInPandas`` over Arrow record batches, binary in /
feature-struct out). The Spark-side contract — schema, batch shape,
partition behavior, metadata columns — is real and tested; swapping in
PIL/ffmpeg later changes only the inner function.

Payload format of the deterministic fake ("PVIM" codec):
    bytes 0-3   magic  b"PVIM"
    bytes 4-5   width  (uint16 BE)
    bytes 6-7   height (uint16 BE)
    byte  8     channels
    bytes 9..   row-major uint8 pixels (possibly truncated = corrupt)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("valid", T.BooleanType(), False),
    T.StructField("mean_intensity", T.DoubleType(), True),
    T.StructField("std_intensity", T.DoubleType(), True),
    T.StructField("edge_density", T.DoubleType(), True),
])


def encode_fake_image(doc_id: int, width: int = 16, height: int = 16,
                      channels: int = 1) -> bytes:
    """Deterministic synthetic payload for tests/fixtures."""
    rng = np.random.RandomState(doc_id % (2 ** 31))
    pixels = rng.randint(0, 256, size=width * height * channels, dtype=np.uint8)
    return (
        b"PVIM" + struct.pack(">HHB", width, height, channels) + pixels.tobytes()
    )


def _decode(payload: bytes):
    """Parse the PVIM header + pixels; None on any corruption.

    A real implementation would call the image library here — the
    signature (bytes -> ndarray | None) is the stable seam.
    """
    if payload is None or len(payload) < 9 or payload[:4] != b"PVIM":
        return None
    w, h, c = struct.unpack(">HHB", payload[4:9])
    expected = w * h * c
    body = payload[9:]
    if len(body) != expected or expected == 0:
        return None
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w * c), w, h, c


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Binary -> feature struct via ``mapInPandas`` (Arrow batch stream).

    ``mapInPandas`` (not applyInPandas) because decode is row-local: no
    grouping, no shuffle — each scan partition streams through Python once.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                decoded = _decode(payload)
                if decoded is None:
                    out.append((int(doc_id), None, None, None, False,
                                None, None, None))
                    continue
                img, w, h, c = decoded
                gx = np.abs(np.diff(img.astype(np.int16), axis=1))
                out.append((
                    int(doc_id), int(w), int(h), int(c), True,
                    float(np.round(img.mean(), 4)),
                    float(np.round(img.std(), 4)),
                    float(np.round((gx > 32).mean(), 4)),
                ))
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


def fake_image_table(spark, n: int = 64, corrupt_every: int = 10) -> DataFrame:
    """Synthetic binary table with typed metadata; every ``corrupt_every``-th
    payload is truncated (exercises the invalid path)."""
    rows = []
    for i in range(n):
        payload = encode_fake_image(i, width=8 + (i % 5) * 4, height=8)
        if corrupt_every and i % corrupt_every == corrupt_every - 1:
            payload = payload[: len(payload) // 2]
        rows.append((i, "image/pvim", len(payload), bytearray(payload)))
    return spark.createDataFrame(
        rows, "doc_id long, mime string, n_bytes long, payload binary"
    )


# --------------------------------------------------------------- audio

AUDIO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("valid", T.BooleanType(), False),
    T.StructField("rms_loudness", T.DoubleType(), True),
    T.StructField("peak", T.DoubleType(), True),
    T.StructField("zero_crossing_rate", T.DoubleType(), True),
])


def encode_fake_audio(doc_id: int, sample_rate: int = 8000,
                      seconds: float = 1.0) -> bytes:
    """Deterministic "PVAU" payload: magic + rate (uint32 BE) + int16 PCM."""
    rng = np.random.RandomState(doc_id % (2 ** 31))
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    wave = (0.5 * np.sin(2 * np.pi * (100 + doc_id % 200) * t)
            + 0.05 * rng.standard_normal(n))
    pcm = np.clip(wave * 32767, -32768, 32767).astype(">i2")
    return b"PVAU" + struct.pack(">I", sample_rate) + pcm.tobytes()


def _decode_audio(payload: bytes):
    """bytes -> (float waveform, sample_rate) | None — the stable seam
    where a real codec (soundfile/ffmpeg) would plug in."""
    if payload is None or len(payload) < 8 or payload[:4] != b"PVAU":
        return None
    (rate,) = struct.unpack(">I", payload[4:8])
    body = payload[8:]
    if rate == 0 or len(body) < 2 or len(body) % 2:
        return None
    return np.frombuffer(body, dtype=">i2").astype(np.float64) / 32767.0, rate


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Binary audio -> loudness/duration/ZCR features, row-local
    ``mapInPandas`` (same no-shuffle contract as the image path)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                decoded = _decode_audio(payload)
                if decoded is None:
                    out.append((int(doc_id), None, None, None, False,
                                None, None, None))
                    continue
                wave, rate = decoded
                zc = np.mean(np.abs(np.diff(np.signbit(wave))))
                out.append((
                    int(doc_id), int(rate), int(len(wave)),
                    float(np.round(len(wave) / rate, 6)), True,
                    float(np.round(np.sqrt(np.mean(wave ** 2)), 6)),
                    float(np.round(np.abs(wave).max(), 6)),
                    float(np.round(zc, 6)),
                ))
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_SCHEMA)


# --------------------------------------------------------------- video

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("ts_s", T.DoubleType(), False),
    T.StructField("mean_intensity", T.DoubleType(), True),
    T.StructField("motion", T.DoubleType(), True),
])


def encode_fake_video(doc_id: int, n_frames: int = 24, width: int = 8,
                      height: int = 8, fps: float = 12.0) -> bytes:
    """Deterministic "PVVD" payload: magic + n_frames/width/height
    (uint16 BE each) + fps (float32 BE) + per-frame uint8 planes."""
    rng = np.random.RandomState(doc_id % (2 ** 31))
    frames = rng.randint(0, 256, size=(n_frames, height, width),
                         dtype=np.uint8)
    header = b"PVVD" + struct.pack(">HHHf", n_frames, width, height, fps)
    return header + frames.tobytes()


def sample_video_frames(
    df: DataFrame,
    every_k: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling: one input row -> one output row per sampled frame
    (the engine's UDTF-shaped multimodal op). ``mapInPandas`` naturally
    expresses 1->N: the yielded frame count is independent of the input
    batch size. ``motion`` = mean |frame - previous sampled frame|."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None or len(payload) < 14 \
                        or payload[:4] != b"PVVD":
                    continue
                nf, w, h, fps = struct.unpack(">HHHf", payload[4:14])
                body = payload[14:]
                if len(body) != nf * w * h or nf == 0 or fps <= 0:
                    continue
                frames = np.frombuffer(body, dtype=np.uint8) \
                    .reshape(nf, h, w)
                prev = None
                for i in range(0, nf, every_k):
                    f_i = frames[i].astype(np.float64)
                    motion = (float(np.round(np.abs(f_i - prev).mean(), 4))
                              if prev is not None else None)
                    out.append((int(doc_id), int(i),
                                float(np.round(i / fps, 6)),
                                float(np.round(f_i.mean(), 4)), motion))
                    prev = f_i
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)
