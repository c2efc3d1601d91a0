"""Synthetic audio/video sources + raw-container codecs (engine-added).

The sandbox ships no media codec libraries, but RAW formats need none:

- WAV (RIFF, 16-bit PCM) is a 44-byte header + little-endian samples —
  encoded/decoded here with struct + numpy, a REAL parser (validates
  magic, chunk layout, PCM format tag), not a fake.
- "rawv" is the engine's uncompressed multiframe video container:
  b"RAWV" + <u16 w, h, n_frames> + n_frames RGB24 frames.  This is the
  shape a frame-sampling pipeline sees after any real decoder; the
  container keeps the byte-plumbing honest (offsets, frame strides,
  truncation checks) without a codec dependency.

Compressed formats (mp3/aac/h264/...) stay behind NotImplementedError
in operators/multimodal.py — the dispatch, schemas, and batch shapes
are identical, only the inner decode differs.

Synthetic generators use pure INTEGER recurrences per (id, index), so
the DuckDB oracles reproduce every sample/pixel exactly — the decode
plumbing is verified end to end by value hash, not just by shape.

  audio sample  s(id, i) = ((id*2654435761 + i*40503 + 12345)
                            mod 65536) - 32768        (int16 noise)
  video pixel   p(id, f, y, x, c) = (id*7 + f*13 + y*3 + x*5 + c*11)
                                    mod 256
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

AUDIO_RATE = 8000
AUDIO_SAMPLES = 4000          # 0.5 s per clip
VIDEO_W = 16
VIDEO_H = 16
VIDEO_FRAMES = 8

AUDIO_SCHEMA = T.StructType([
    T.StructField("audio_id", T.LongType(), False),
    T.StructField("bytes", T.BinaryType(), False),
    T.StructField("sr", T.IntegerType(), False),
    T.StructField("n_samples", T.IntegerType(), False),
    T.StructField("fmt", T.StringType(), False),
])

VIDEO_SCHEMA = T.StructType([
    T.StructField("video_id", T.LongType(), False),
    T.StructField("bytes", T.BinaryType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField("fmt", T.StringType(), False),
])


# --------------------------------------------------------------------------
# WAV (RIFF PCM16) codec — real parser, no libraries
# --------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """16-bit mono PCM RIFF/WAVE bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16,
        1,                    # PCM
        1,                    # mono
        rate,
        rate * 2,             # byte rate
        2,                    # block align
        16,                   # bits/sample
        b"data", len(pcm))
    return hdr + pcm


def wav_decode(data: bytes):
    """(samples int16 array, rate).  Validates RIFF/WAVE magic, walks
    chunks to fmt/data, accepts only 16-bit mono PCM."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if tag != 1 or ch != 1 or bits != 16:
                raise NotImplementedError(
                    f"wav: only 16-bit mono PCM supported "
                    f"(tag={tag}, ch={ch}, bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("wav: missing fmt or data chunk")
    return samples, rate


# --------------------------------------------------------------------------
# rawv multiframe container
# --------------------------------------------------------------------------

def rawv_encode(frames: np.ndarray) -> bytes:
    """frames: uint8 (n_frames, h, w, 3) -> container bytes."""
    n, h, w, c = frames.shape
    assert c == 3
    return (b"RAWV" + struct.pack("<HHH", w, h, n)
            + np.ascontiguousarray(frames, dtype=np.uint8).tobytes())


def rawv_decode(data: bytes) -> np.ndarray:
    """container bytes -> uint8 (n_frames, h, w, 3); validates magic
    and exact payload length."""
    if len(data) < 10 or data[:4] != b"RAWV":
        raise ValueError("not a RAWV stream")
    w, h, n = struct.unpack("<HHH", data[4:10])
    want = n * h * w * 3
    body = data[10:]
    if len(body) != want:
        raise ValueError(f"rawv: payload {len(body)} != expected {want}")
    return np.frombuffer(body, dtype=np.uint8).reshape(n, h, w, 3)


# --------------------------------------------------------------------------
# deterministic generators (integer recurrences, oracle-reproducible)
# --------------------------------------------------------------------------

def audio_samples_for(aid: int, n: int = AUDIO_SAMPLES) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    return (((aid * 2654435761 + i * 40503 + 12345) % 65536)
            - 32768).astype(np.int16)


def video_frames_for(vid: int, n: int = VIDEO_FRAMES, h: int = VIDEO_H,
                     w: int = VIDEO_W) -> np.ndarray:
    f, y, x, c = np.meshgrid(np.arange(n), np.arange(h), np.arange(w),
                             np.arange(3), indexing="ij")
    return ((vid * 7 + f * 13 + y * 3 + x * 5 + c * 11) % 256) \
        .astype(np.uint8)


def generate_audio(spark: SparkSession, n: int,
                   n_samples: int = AUDIO_SAMPLES,
                   rate: int = AUDIO_RATE) -> DataFrame:
    """n deterministic WAV clips, built distributedly (mapInPandas
    over spark.range — no driver-side byte generation)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            yield pd.DataFrame({
                "audio_id": ids,
                "bytes": [wav_encode(audio_samples_for(int(a), n_samples),
                                     rate) for a in ids],
                "sr": np.full(ids.size, rate, dtype=np.int32),
                "n_samples": np.full(ids.size, n_samples, dtype=np.int32),
                "fmt": ["wav"] * ids.size,
            })

    return spark.range(n).mapInPandas(gen, AUDIO_SCHEMA)


def generate_videos(spark: SparkSession, n: int,
                    n_frames: int = VIDEO_FRAMES, h: int = VIDEO_H,
                    w: int = VIDEO_W) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            yield pd.DataFrame({
                "video_id": ids,
                "bytes": [rawv_encode(video_frames_for(int(v), n_frames,
                                                       h, w))
                          for v in ids],
                "w": np.full(ids.size, w, dtype=np.int32),
                "h": np.full(ids.size, h, dtype=np.int32),
                "n_frames": np.full(ids.size, n_frames, dtype=np.int32),
                "fmt": ["rawv"] * ids.size,
            })

    return spark.range(n).mapInPandas(gen, VIDEO_SCHEMA)
