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
from pyspark.sql import functions as F, types as T

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
