"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns with typed metadata (w, h, fmt).
All pixel work runs through ``mapInPandas`` so whole Arrow batches of
binaries hit numpy at once.  The sandbox ships no media libraries, so
the real codecs are stubbed: the PPM / jpeg-sim codecs
(sources/images.py) are fully implemented and exercise the identical
Spark plumbing (schema, batch shape, partitioning); jpeg/png/audio
decode raises NotImplementedError behind the same dispatch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geographiclib_go_spark.sources import images as im

FEATURE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("mean_r", T.DoubleType(), True),
    T.StructField("mean_g", T.DoubleType(), True),
    T.StructField("mean_b", T.DoubleType(), True),
    T.StructField("std_luma", T.DoubleType(), True),
    T.StructField("edge_energy", T.DoubleType(), True),
    T.StructField("phash_check", T.LongType(), True),
    T.StructField("decode_ok", T.BooleanType(), False),
])


def extract_features(images: DataFrame) -> DataFrame:
    """Decode + per-image feature extraction over Arrow batches.

    Selects only (image_id, bytes, fmt) so Catalyst prunes captions
    etc. out of the scan — bytes dominate I/O, nothing else should
    ride along.
    """
    cols = images.select("image_id", "bytes", "fmt")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("image_id", "mean_r", "mean_g", "mean_b", "std_luma",
                    "edge_energy", "phash_check", "decode_ok")}
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"],
                                      pdf["fmt"]):
                out["image_id"].append(iid)
                try:
                    pix = im.decode_image(bytes(data), fmt)
                except NotImplementedError:
                    for k in ("mean_r", "mean_g", "mean_b", "std_luma",
                              "edge_energy"):
                        out[k].append(None)
                    out["phash_check"].append(None)
                    out["decode_ok"].append(False)
                    continue
                fl = pix.astype(np.float64)
                luma = fl.mean(axis=-1)
                gx = np.abs(np.diff(luma, axis=1)).mean()
                gy = np.abs(np.diff(luma, axis=0)).mean()
                out["mean_r"].append(fl[..., 0].mean())
                out["mean_g"].append(fl[..., 1].mean())
                out["mean_b"].append(fl[..., 2].mean())
                out["std_luma"].append(luma.std())
                out["edge_energy"].append(gx + gy)
                out["phash_check"].append(int(im.phash64(pix)))
                out["decode_ok"].append(True)
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded as PPM.  Demonstrates the
    binary->binary transform shape (decode, transform, encode inside
    one Arrow batch)."""
    schema = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ])
    cols = images.select("image_id", "bytes", "fmt")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt")}
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"],
                                      pdf["fmt"]):
                try:
                    pix = im.decode_image(bytes(data), fmt)
                except NotImplementedError:
                    rows["image_id"].append(iid)
                    rows["bytes"].append(None)
                    rows["w"].append(out_w)
                    rows["h"].append(out_h)
                    rows["fmt"].append("ppm")
                    continue
                h, w = pix.shape[:2]
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                small = pix[yi][:, xi]
                rows["image_id"].append(iid)
                rows["bytes"].append(im.ppm_encode(small))
                rows["w"].append(out_w)
                rows["h"].append(out_h)
                rows["fmt"].append("ppm")
            yield pd.DataFrame(rows)

    return cols.mapInPandas(run, schema)


def decode_audio_stub(data: bytes, fmt: str):
    """Audio decode — no audio libraries in this container."""
    raise NotImplementedError(
        f"audio codec {fmt!r}: decoder libraries not available in this "
        "environment; Spark-side plumbing is identical to image decode")


def sample_video_frames_stub(data: bytes, fmt: str, every_n: int = 30):
    """Video frame sampling — no video libraries in this container."""
    raise NotImplementedError(
        f"video codec {fmt!r}: decoder libraries not available in this "
        "environment; use mapInPandas with a frame-index explode once "
        "a decoder is present")
