"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode seam handles REAL container formats parseable with the
standard library — RIFF/WAVE PCM audio (via ``wave``) and binary PNM
images (P5 grayscale / P6 RGB) — next to the deterministic in-house
test codecs ("PVIM"/"PVAU"/"PVVD"), which remain as corrupt-path and
legacy fixtures. Rich codecs (JPEG/MP3/MP4) need libraries absent from
this environment; their payloads simply fail the magic sniff and
surface as ``valid=false`` rows, the same contract a real decoder error
would produce. The Spark side — ``mapInPandas`` over Arrow record
batches, binary in / feature-struct out, no shuffle — is identical for
every format; swapping in PIL/ffmpeg later changes only the inner
per-payload function.

Payload format of the deterministic fake ("PVIM" codec):
    bytes 0-3   magic  b"PVIM"
    bytes 4-5   width  (uint16 BE)
    bytes 6-7   height (uint16 BE)
    byte  8     channels
    bytes 9..   row-major uint8 pixels (possibly truncated = corrupt)
"""

from __future__ import annotations

import io
import struct
import wave as wave_mod
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


def encode_ppm(doc_id: int, width: int = 16, height: int = 16,
               gray: bool = False) -> bytes:
    """Deterministic REAL PNM image: binary P6 (RGB) or P5 (grayscale),
    maxval 255 — the stdlib-parseable netpbm container."""
    c = 1 if gray else 3
    rng = np.random.RandomState(doc_id % (2 ** 31))
    pixels = rng.randint(0, 256, size=width * height * c, dtype=np.uint8)
    magic = b"P5" if gray else b"P6"
    header = magic + b"\n# pv synthetic\n" + \
        f"{width} {height}\n255\n".encode()
    return header + pixels.tobytes()


def _parse_pnm(payload: bytes):
    """Binary netpbm (P5/P6, maxval <= 255) -> (pixels, w, h, c) | None.

    Full header grammar: any whitespace between tokens, ``#`` comments
    to end-of-line, exactly one whitespace byte after maxval, then the
    raster. Any malformation (short raster, 16-bit maxval, zero dims)
    returns None -> a ``valid=false`` row, never an exception.
    """
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        return None
    vals, i, n = [], 2, len(payload)
    while len(vals) < 3:
        while i < n and payload[i:i + 1].isspace():
            i += 1
        if i < n and payload[i:i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j:j + 1].isspace():
            j += 1
        if j == i or not payload[i:j].isdigit():
            return None
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace byte terminating the header
    w, h, maxval = vals
    c = 3 if magic == b"P6" else 1
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        return None
    body = payload[i:]
    if len(body) != w * h * c:
        return None
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w * c), w, h, c


def _decode(payload: bytes):
    """bytes -> (pixels as (h, w*c) uint8, w, h, c) | None.

    Sniffs the magic: real binary PNM (P5/P6) or the in-house PVIM test
    codec. Unknown or corrupt payloads return None (valid=false row).
    """
    if payload is None or len(payload) < 2:
        return None
    if payload[:2] in (b"P5", b"P6"):
        return _parse_pnm(payload)
    if len(payload) < 9 or payload[:4] != b"PVIM":
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


PHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("phash", T.LongType(), True),
    T.StructField("valid", T.BooleanType(), False),
])


def _fingerprint_frame(out, schema) -> pd.DataFrame:
    """(id, hash_or_None, valid) rows -> pandas frame whose hash column
    is an EXPLICIT nullable Int64 array. A plain ``pd.DataFrame(out)``
    leaves the mixed int/None column as object, and some session
    configurations coerce it through float64 on the Arrow boundary —
    which silently rounds 64-bit fingerprints above 2^53 (measured: a
    vanilla Spark 4 session flipped low phash bits for the SAME payload
    vs the tuned session, shifting Hamming distances and near-dup
    pairs). The typed array pins the exact-integer path everywhere."""
    cols = [f.name for f in schema.fields]
    pdf = pd.DataFrame(out, columns=cols)
    pdf[cols[1]] = pd.array([t[1] for t in out], dtype="Int64")
    return pdf


def _luma(img: np.ndarray, w: int, h: int, c: int) -> np.ndarray:
    """(h, w*c) uint8 -> (h, w) float64 luma plane (BT.601 weights for
    RGB; identity for grayscale)."""
    if c == 1:
        return img.astype(np.float64)
    rgb = img.reshape(h, w, c).astype(np.float64)
    return (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2])


def _average_hash(luma: np.ndarray, grid: int = 8) -> int | None:
    """Average-hash over the luma plane: block-average to a grid x grid
    mosaic (exact block partition via array_split — no interpolation
    dependency), threshold each cell at the mosaic mean. Returns the
    hash as a SIGNED 64-bit int (Spark LongType); None when the image
    is smaller than the grid."""
    h, w = luma.shape
    if h < grid or w < grid:
        return None
    cells = np.array(
        [[blk.mean() for blk in np.array_split(rows, grid, axis=1)]
         for rows in np.array_split(luma, grid, axis=0)])
    bits = (cells > cells.mean()).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the scipy-free 8-point building block
    of JPEG/pHash): D[k, m] = s_k cos(pi (m + 1/2) k / n)."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    d = np.cos(np.pi * (m + 0.5) * k / n)
    d[0] *= np.sqrt(1.0 / n)
    d[1:] *= np.sqrt(2.0 / n)
    return d


def _mosaic(luma: np.ndarray, n: int) -> np.ndarray:
    return np.array(
        [[blk.mean() for blk in np.array_split(rows, n, axis=1)]
         for rows in np.array_split(luma, n, axis=0)])


def _dct_hash(luma: np.ndarray, grid: int = 8) -> int | None:
    """pHash-style DCT hash: block-average to a ``2*grid`` mosaic when
    the image allows (else ``grid``), 2D DCT-II, keep the top-left
    ``grid x grid`` low-frequency block minus the DC term, threshold at
    the MEDIAN of those coefficients (a balanced hash: exactly half the
    bits set, invariant to global brightness AND contrast, and — unlike
    the average hash — driven by coarse spatial structure rather than
    per-cell levels, so localized edits flip fewer bits)."""
    h, w = luma.shape
    if h < grid or w < grid:
        return None
    n = 2 * grid if min(h, w) >= 2 * grid else grid
    m = _mosaic(luma, n)
    d = _dct_matrix(n)
    coef = (d @ m @ d.T)[:grid, :grid].flatten()[1:]  # drop DC
    med = np.median(coef)
    v = 0
    for i, c in enumerate(coef):
        if c > med:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def image_phash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 8,
    method: str = "avg",
) -> DataFrame:
    """Perceptual hash per image: decode -> luma plane -> ``grid^2``-bit
    hash, via the same shuffle-free ``mapInPandas`` seam as
    :func:`extract_image_features`. ``method='avg'`` is the average
    hash (cell mean vs mosaic mean); ``method='dct'`` is the
    pHash-style DCT hash (:func:`_dct_hash`). Corrupt or sub-grid
    payloads yield ``valid=false`` with a null hash."""
    if method not in ("avg", "dct"):
        raise ValueError(f"method must be avg|dct, got {method!r}")
    hasher = _average_hash if method == "avg" else _dct_hash

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                decoded = _decode(payload)
                ph = None
                if decoded is not None:
                    img, w, h, c = decoded
                    ph = hasher(_luma(img, w, h, c), grid)
                out.append((int(doc_id), ph, ph is not None))
            yield _fingerprint_frame(out, PHASH_SCHEMA)

    return df.select(id_col, payload_col).mapInPandas(run, PHASH_SCHEMA)


def image_near_dups(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    max_bucket_size: int | None = None,
    method: str = "avg",
    blocks: tuple[int, int] | str | None = None,
    approx_count: int | None = None,
) -> DataFrame:
    """Image near-duplicate pairs: perceptual hash (64-bit average-hash
    over the decoded luma plane) -> Hamming-banded candidate pairs
    through the shared pigeonhole engine
    (:func:`physioview_spark.llm.dedup.hamming_banded_pairs`) -> exact
    popcount verify. 100% recall at the given distance by the
    pigeonhole argument (max_hamming+1 disjoint chunks), 100% precision
    from the verify — parity with brute-force exact Hamming is asserted
    in tests. Scale shape is the SimHash path's: one mapInPandas decode
    pass (no shuffle), one equi-join on (chunk index, chunk value) with
    the shared quadratic bucket guard. Output: (id_a, id_b, hamming).
    """
    from physioview_spark.llm.dedup import hamming_banded_pairs

    sig = image_phash(df, payload_col, id_col, method=method).where("valid")
    return hamming_banded_pairs(
        sig, "phash", id_col, 64, max_hamming, max_bucket_size,
        blocks=blocks, approx_count=approx_count)


def perturb_payload(payload: bytes, n_tweaks: int = 4,
                    seed: int = 0, delta: int = 3) -> bytes:
    """Near-duplicate fixture generator: nudge ``n_tweaks`` raster bytes
    of a decodable image payload by ±``delta`` intensity steps (format
    untouched — the raster is the trailing w*h*c bytes for every codec
    this module decodes)."""
    decoded = _decode(payload)
    if decoded is None:
        return payload
    _, w, h, c = decoded
    raster_len = w * h * c
    head, raster = payload[:-raster_len], bytearray(payload[-raster_len:])
    rng = np.random.RandomState(seed)
    for pos in rng.choice(raster_len, size=min(n_tweaks, raster_len),
                          replace=False):
        raster[pos] = int(np.clip(raster[pos]
                                  + (delta if rng.rand() < 0.5 else -delta),
                                  0, 255))
    return bytes(head) + bytes(raster)


def fake_image_table(spark, n: int = 64, corrupt_every: int = 10) -> DataFrame:
    """Synthetic binary table with typed metadata, cycling REAL binary
    PNM payloads (P6 RGB, P5 grayscale) with the in-house PVIM test
    codec; every ``corrupt_every``-th payload is truncated (exercises
    the invalid path for each format)."""
    rows = []
    for i in range(n):
        w = 8 + (i % 5) * 4
        kind = i % 3
        if kind == 0:
            payload, mime = encode_ppm(i, w, 8), "image/x-portable-pixmap"
        elif kind == 1:
            payload, mime = (encode_ppm(i, w, 8, gray=True),
                             "image/x-portable-graymap")
        else:
            payload, mime = encode_fake_image(i, w, 8), "image/pvim"
        if corrupt_every and i % corrupt_every == corrupt_every - 1:
            payload = payload[: len(payload) // 2]
        rows.append((i, mime, len(payload), bytearray(payload)))
    return spark.createDataFrame(
        rows, "doc_id long, mime string, n_bytes long, payload binary"
    )


def fake_image_near_dup_table(
    spark, n_base: int = 48, n_dups: int = 16, corrupt_every: int = 10,
) -> DataFrame:
    """The :func:`fake_image_table` payload cycle plus ``n_dups``
    planted near-duplicates: ids ``n_base + j`` carry id ``j``'s payload
    with a few raster bytes nudged (:func:`perturb_payload`) — ground
    truth for the perceptual-hash near-dup path."""
    rows = []
    payloads: dict[int, bytes] = {}
    for i in range(n_base):
        w = 8 + (i % 5) * 4
        kind = i % 3
        if kind == 0:
            payload, mime = encode_ppm(i, w, 8), "image/x-portable-pixmap"
        elif kind == 1:
            payload, mime = (encode_ppm(i, w, 8, gray=True),
                             "image/x-portable-graymap")
        else:
            payload, mime = encode_fake_image(i, w, 8), "image/pvim"
        if corrupt_every and i % corrupt_every == corrupt_every - 1:
            payload = payload[: len(payload) // 2]
        payloads[i] = payload
        rows.append((i, mime, len(payload), bytearray(payload)))
    for j in range(n_dups):
        i = n_base + j
        # strong enough to spread planted pairs over Hamming 0..5 (the
        # banded path must catch nonzero distances, not just exact ties)
        payload = perturb_payload(payloads[j], n_tweaks=16, seed=i,
                                  delta=40)
        rows.append((i, "image/near-dup", len(payload), bytearray(payload)))
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


def _synth_pcm(doc_id: int, sample_rate: int, seconds: float) -> np.ndarray:
    """Deterministic test waveform (sine + seeded noise) as int16."""
    rng = np.random.RandomState(doc_id % (2 ** 31))
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    wav = (0.5 * np.sin(2 * np.pi * (100 + doc_id % 200) * t)
           + 0.05 * rng.standard_normal(n))
    return np.clip(wav * 32767, -32768, 32767).astype(np.int16)


def encode_fake_audio(doc_id: int, sample_rate: int = 8000,
                      seconds: float = 1.0) -> bytes:
    """Deterministic "PVAU" payload: magic + rate (uint32 BE) + int16 PCM."""
    pcm = _synth_pcm(doc_id, sample_rate, seconds).astype(">i2")
    return b"PVAU" + struct.pack(">I", sample_rate) + pcm.tobytes()


def encode_wav(doc_id: int, sample_rate: int = 8000, seconds: float = 1.0,
               channels: int = 1) -> bytes:
    """Deterministic REAL RIFF/WAVE file (PCM16 LE) via the stdlib
    ``wave`` writer — same synthetic waveform as the PVAU fixture."""
    pcm = _synth_pcm(doc_id, sample_rate, seconds)
    if channels > 1:
        pcm = np.repeat(pcm[:, None], channels, axis=1).reshape(-1)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.astype("<i2").tobytes())
    return buf.getvalue()


def _parse_wav(payload: bytes):
    """RIFF/WAVE -> (float mono waveform in [-1, 1], rate) | None.

    Stdlib ``wave`` handles the chunk walk; PCM 8-bit (unsigned) and
    16-bit (signed LE) are supported, multi-channel is averaged to mono.
    Malformed headers/raster return None (valid=false), not an error.
    """
    try:
        with wave_mod.open(io.BytesIO(bytes(payload))) as wf:
            rate = wf.getframerate()
            nch = wf.getnchannels()
            sw = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except (wave_mod.Error, EOFError, struct.error):
        return None
    if rate <= 0 or nch <= 0 or sw not in (1, 2) or len(raw) < sw * nch:
        return None
    if sw == 2:
        x = np.frombuffer(raw[: len(raw) // 2 * 2], "<i2")
        x = x.astype(np.float64) / 32767.0
    else:
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 127.0
    if nch > 1:
        x = x[: len(x) // nch * nch].reshape(-1, nch).mean(axis=1)
    if len(x) == 0:
        return None
    return x, rate


def _decode_audio(payload: bytes):
    """bytes -> (float waveform, sample_rate) | None — sniffs real
    RIFF/WAVE or the in-house PVAU test codec."""
    if payload is None or len(payload) < 8:
        return None
    if payload[:4] == b"RIFF":
        return _parse_wav(payload)
    if payload[:4] != b"PVAU":
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


AUDIO_FP_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("afp", T.LongType(), True),
    T.StructField("valid", T.BooleanType(), False),
])


def _energy_delta_fingerprint(x: np.ndarray, bits: int = 64) -> int | None:
    """64-bit audio fingerprint: sign of the energy delta between
    ``bits + 1`` equal time frames. Invariant to gain (energy scales
    uniformly, delta signs don't move) and DC offset is removed first;
    robust to light noise (frame energies integrate it away). None for
    clips shorter than one sample per frame."""
    if len(x) < bits + 1:
        return None
    x = x - x.mean()
    e = np.array([float((f * f).sum())
                  for f in np.array_split(x, bits + 1)])
    flags = np.diff(e) > 0
    v = 0
    for i, b in enumerate(flags):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Binary audio -> 64-bit energy-delta fingerprint, row-local
    ``mapInPandas`` (same no-shuffle contract as the feature path)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                decoded = _decode_audio(payload)
                fp = None
                if decoded is not None:
                    fp = _energy_delta_fingerprint(decoded[0])
                out.append((int(doc_id), fp, fp is not None))
            yield _fingerprint_frame(out, AUDIO_FP_SCHEMA)

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_FP_SCHEMA)


def audio_near_dups(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    max_bucket_size: int | None = None,
    blocks: tuple[int, int] | str | None = None,
    approx_count: int | None = None,
) -> DataFrame:
    """Audio near-duplicate pairs (re-encoded / gain-adjusted / lightly
    noised copies): energy-delta fingerprints through the shared
    pigeonhole Hamming engine — the audio leg of the multimodal dedup
    bridge, same 100%-recall/100%-precision contract, quadratic guard,
    and ``blocks``/``blocks="auto"`` scale gear as the image and
    SimHash paths."""
    from physioview_spark.llm.dedup import hamming_banded_pairs

    sig = audio_fingerprint(df, payload_col, id_col).where("valid")
    return hamming_banded_pairs(
        sig, "afp", id_col, 64, max_hamming, max_bucket_size,
        blocks=blocks, approx_count=approx_count)


def perturb_audio(payload: bytes, gain: float = 0.8,
                  noise: float = 0.002, seed: int = 0) -> bytes:
    """Near-duplicate audio fixture: decode, apply gain + light seeded
    noise, re-encode as RIFF/WAVE (codec conversion included — a PVAU
    source comes back as WAV, like a transcoded upload)."""
    decoded = _decode_audio(payload)
    if decoded is None:
        return payload
    x, rate = decoded
    rng = np.random.RandomState(seed)
    y = np.clip(x * gain + noise * rng.standard_normal(len(x)), -1.0, 1.0)
    pcm = np.round(y * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def fake_audio_near_dup_table(
    spark, n_base: int = 32, n_dups: int = 12, corrupt_every: int = 10,
) -> DataFrame:
    """WAV/PVAU clip cycle plus ``n_dups`` planted near-duplicates: ids
    ``n_base + j`` are id ``j``'s clip transcoded with gain 0.8 and
    light noise (:func:`perturb_audio`)."""
    rows = []
    payloads: dict[int, bytes] = {}
    for i in range(n_base):
        if i % 2 == 0:
            payload = encode_wav(i, seconds=0.5 + (i % 4) * 0.25)
        else:
            payload = encode_fake_audio(i, seconds=0.5 + (i % 4) * 0.25)
        if corrupt_every and i % corrupt_every == corrupt_every - 1:
            payload = payload[: len(payload) // 3]
        payloads[i] = payload
        rows.append((i, len(payload), bytearray(payload)))
    for j in range(n_dups):
        i = n_base + j
        # varied gain + audible noise floor: spreads planted pairs over
        # a few Hamming bits instead of all-exact matches
        payload = perturb_audio(payloads[j], gain=0.7 + 0.02 * j,
                                noise=0.01, seed=i)
        rows.append((i, len(payload), bytearray(payload)))
    return spark.createDataFrame(
        rows, "doc_id long, n_bytes long, payload binary")


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


def encode_y4m(doc_id: int, n_frames: int = 24, width: int = 8,
               height: int = 8, fps_num: int = 12, fps_den: int = 1) -> bytes:
    """Deterministic REAL YUV4MPEG2 (.y4m) stream: the uncompressed
    video container ffmpeg pipelines exchange — text header, then
    ``FRAME`` sections of raw 4:2:0 Y/U/V planes. Same luma content as
    the PVVD fixture for the same doc_id/dims."""
    rng = np.random.RandomState(doc_id % (2 ** 31))
    y = rng.randint(0, 256, size=(n_frames, height, width), dtype=np.uint8)
    cw, ch_ = (width + 1) // 2, (height + 1) // 2
    header = (f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} "
              f"Ip A1:1 C420jpeg\n").encode()
    out = [header]
    for i in range(n_frames):
        out.append(b"FRAME\n")
        out.append(y[i].tobytes())
        out.append(np.full(cw * ch_, 128, dtype=np.uint8).tobytes())  # U
        out.append(np.full(cw * ch_, 128, dtype=np.uint8).tobytes())  # V
    return b"".join(out)


def _parse_y4m(payload: bytes):
    """YUV4MPEG2 -> (luma frames (n, h, w) uint8, fps) | None.

    Header grammar: space-separated W/H/F (+ ignored Ip/A/C/X tags) up
    to the first newline; each frame is ``FRAME[ params]\\n`` + raw
    planes (4:2:0 assumed — the only layout the encoder above emits and
    by far the most common in the wild). Any malformation returns None.
    """
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    fps = 0.0
    for tag in payload[len(b"YUV4MPEG2"):nl].split(b" "):
        try:
            if tag[:1] == b"W":
                w = int(tag[1:])
            elif tag[:1] == b"H":
                h = int(tag[1:])
            elif tag[:1] == b"F":
                num, den = tag[1:].split(b":")
                fps = int(num) / int(den)
        except (ValueError, ZeroDivisionError):
            return None
    if not w or not h or w <= 0 or h <= 0 or fps <= 0:
        return None
    frame_len = w * h + 2 * (((w + 1) // 2) * ((h + 1) // 2))
    frames, i, n = [], nl + 1, len(payload)
    while i < n:
        fnl = payload.find(b"\n", i)
        if fnl < 0 or payload[i:i + 5] != b"FRAME":
            return None
        body = payload[fnl + 1: fnl + 1 + frame_len]
        if len(body) != frame_len:
            return None
        frames.append(np.frombuffer(body[: w * h], dtype=np.uint8)
                      .reshape(h, w))
        i = fnl + 1 + frame_len
    if not frames:
        return None
    return np.stack(frames), fps


def _parse_video(payload: bytes):
    """bytes -> (luma frames (n, h, w), fps) | None — sniffs real
    YUV4MPEG2 or the in-house PVVD test codec."""
    if payload is None or len(payload) < 10:
        return None
    if payload[:9] == b"YUV4MPEG2":
        return _parse_y4m(payload)
    if len(payload) < 14 or payload[:4] != b"PVVD":
        return None
    nf, w, h, fps = struct.unpack(">HHHf", payload[4:14])
    body = payload[14:]
    if len(body) != nf * w * h or nf == 0 or fps <= 0:
        return None
    return np.frombuffer(body, dtype=np.uint8).reshape(nf, h, w), fps


VIDEO_FP_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("vfp", T.LongType(), True),
    T.StructField("valid", T.BooleanType(), False),
])


def _video_signature(frames: np.ndarray, grid: int = 8) -> int | None:
    """64-bit video signature: average-hash each luma frame, then take
    the per-bit MAJORITY across frames — per-frame noise, a re-encode,
    or a few dropped frames flip few majority bits. None when frames
    are smaller than the hash grid."""
    votes = np.zeros(grid * grid, dtype=np.int64)
    n = 0
    for f in frames:
        h = _average_hash(f.astype(np.float64), grid)
        if h is None:
            return None
        u = h & ((1 << 64) - 1)
        votes += np.array([(u >> i) & 1 for i in range(grid * grid)],
                          dtype=np.int64)
        n += 1
    if n == 0:
        return None
    v = 0
    for i in range(grid * grid):
        if votes[i] * 2 > n:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def video_phash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Binary video -> 64-bit majority-vote perceptual signature,
    row-local ``mapInPandas`` (no shuffle)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                decoded = _parse_video(payload)
                fp = None
                if decoded is not None:
                    fp = _video_signature(decoded[0])
                out.append((int(doc_id), fp, fp is not None))
            yield _fingerprint_frame(out, VIDEO_FP_SCHEMA)

    return df.select(id_col, payload_col).mapInPandas(run, VIDEO_FP_SCHEMA)


def video_near_dups(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    max_bucket_size: int | None = None,
    blocks: tuple[int, int] | str | None = None,
    approx_count: int | None = None,
) -> DataFrame:
    """Video near-duplicate pairs (re-encodes, noised copies, few-frame
    trims) — the video leg of the multimodal dedup bridge, through the
    same pigeonhole Hamming engine, guards, and ``blocks`` scale gear
    as image/audio/SimHash."""
    from physioview_spark.llm.dedup import hamming_banded_pairs

    sig = video_phash(df, payload_col, id_col).where("valid")
    return hamming_banded_pairs(
        sig, "vfp", id_col, 64, max_hamming, max_bucket_size,
        blocks=blocks, approx_count=approx_count)


def perturb_video(payload: bytes, noise: int = 8, drop_first: bool = False,
                  seed: int = 0) -> bytes:
    """Near-duplicate video fixture: decode, add uint8 pixel noise
    (optionally drop the first frame — a trimmed re-upload), re-encode
    as Y4M (PVVD sources come back transcoded, like the audio twin)."""
    decoded = _parse_video(payload)
    if decoded is None:
        return payload
    frames, fps = decoded
    if drop_first and len(frames) > 1:
        frames = frames[1:]
    rng = np.random.RandomState(seed)
    noised = np.clip(
        frames.astype(np.int16)
        + rng.randint(-noise, noise + 1, size=frames.shape), 0, 255
    ).astype(np.uint8)
    n, h, w = noised.shape
    cw, ch_ = (w + 1) // 2, (h + 1) // 2
    out = [(f"YUV4MPEG2 W{w} H{h} F{max(1, round(fps))}:1 "
            f"Ip A1:1 C420jpeg\n").encode()]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(noised[i].tobytes())
        out.append(np.full(cw * ch_, 128, dtype=np.uint8).tobytes())
        out.append(np.full(cw * ch_, 128, dtype=np.uint8).tobytes())
    return b"".join(out)


def fake_video_near_dup_table(
    spark, n_base: int = 16, n_dups: int = 8, corrupt_every: int = 7,
) -> DataFrame:
    """Y4M/PVVD clip cycle plus ``n_dups`` planted near-duplicates:
    ids ``n_base + j`` are id ``j``'s clip re-encoded with pixel noise,
    half of them also missing the first frame."""
    rows = []
    payloads: dict[int, bytes] = {}
    for i in range(n_base):
        if i % 2 == 0:
            payload = encode_y4m(i, n_frames=24, width=16, height=16)
        else:
            payload = encode_fake_video(i, n_frames=24, width=16,
                                        height=16)
        if corrupt_every and i % corrupt_every == corrupt_every - 1:
            payload = payload[: len(payload) // 2]
        payloads[i] = payload
        rows.append((i, len(payload), bytearray(payload)))
    for j in range(n_dups):
        i = n_base + j
        payload = perturb_video(payloads[j], noise=8,
                                drop_first=(j % 2 == 1), seed=i)
        rows.append((i, len(payload), bytearray(payload)))
    return spark.createDataFrame(
        rows, "doc_id long, n_bytes long, payload binary")


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
                decoded = _parse_video(payload)
                if decoded is None:
                    continue
                frames, fps = decoded
                nf = len(frames)
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
