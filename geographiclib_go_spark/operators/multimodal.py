"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns with typed metadata (w, h, fmt).
All pixel/sample work runs through ``mapInPandas`` so whole Arrow
batches of binaries hit numpy at once.

RAW formats are decoded for real — no codec libraries needed:
PPM / jpeg-sim images (sources/images.py), RIFF/PCM WAV audio and
the rawv multiframe video container (sources/media.py), with real
DSP/pixel features (RMS, zero crossings, rFFT dominant frequency,
frame sampling, motion energy) on top.  Only COMPRESSED codecs
(jpeg/png/mp3/h264/...) are unavailable in this sandbox and raise
NotImplementedError behind the identical dispatch — schema, batch
shape, and partitioning are exercised either way.
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


EMBED_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("embedding", T.ArrayType(T.LongType(), False), True),
])

# 8x8 block-pooled grid -> fixed vector width; consumers that unroll
# per-component expressions (similarity.int_sq_l2_unrolled) key on this.
PIXEL_EMBED_DIM = 64


def pixel_embeddings(images: DataFrame) -> DataFrame:
    """Decode -> 64-dim INTEGER pixel embedding over Arrow batches:
    an 8x8 grid of per-block sums of (r+g+b) on the decoded pixels,
    scaled by 1024 // (w*h) so different source resolutions share one
    magnitude (the same average-pool construction as the perceptual
    hash, kept real-valued instead of thresholded to bits).  Exact
    int64 components mean squared-L2 distances between any two
    embeddings are exact BIGINTs — the property the image_embed_knn
    hash oracle leans on.  Rows whose codec is unavailable degrade to
    a NULL embedding instead of failing the batch (the flip_images
    contract).

    Scale shape: ONE map-only Python stage (decode dominates; bytes
    never shuffle), and the output is a plain (id, vector) column —
    the existing ANN scale paths (similarity.ivf_topk, the IVF-PQ
    snapshot) consume it unchanged.  Batches group by (h, w) so the
    pooling is whole-batch numpy, not per-row."""
    cols = images.select("image_id", "bytes", "fmt", "w", "h")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf["image_id"].to_numpy(object)
            emb = np.empty(n, dtype=object)
            for (hh, ww), grp in pdf.groupby(["h", "w"], sort=False):
                dec, ok = [], []
                for t in grp.index:
                    try:
                        dec.append(im.decode_image(
                            bytes(grp["bytes"].loc[t]),
                            grp["fmt"].loc[t]))
                        ok.append(t)
                    except NotImplementedError:
                        pass  # NULL embedding, row kept
                if not ok:
                    continue
                pix = np.stack(dec)                       # (g, h, w, 3)
                rgb = pix.astype(np.int64).sum(axis=-1)
                bh, bw = hh // 8, ww // 8
                blocks = rgb.reshape(-1, 8, bh, 8, bw).sum(axis=(2, 4))
                vecs = blocks.reshape(-1, 64) * (1024 // (hh * ww))
                pos = {t: i for i, t in enumerate(pdf.index)}
                for gi, t in enumerate(ok):
                    emb[pos[t]] = vecs[gi].tolist()
            yield pd.DataFrame({"image_id": ids, "embedding": emb})

    return cols.mapInPandas(run, EMBED_SCHEMA)


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


def decode_audio(data: bytes, fmt: str):
    """(samples int16, rate).  WAV/PCM is parsed for real
    (sources/media.py — struct/numpy RIFF walker); compressed codecs
    are unavailable in this container and raise behind the identical
    dispatch."""
    from geographiclib_go_spark.sources import media as md
    if fmt == "wav":
        return md.wav_decode(data)
    raise NotImplementedError(
        f"audio codec {fmt!r}: decoder libraries not available in this "
        "environment; wav/PCM exercises the identical Spark plumbing")


def decode_video(data: bytes, fmt: str):
    """uint8 (n_frames, h, w, 3).  The rawv multiframe container is
    parsed for real; compressed codecs raise behind the same
    dispatch."""
    from geographiclib_go_spark.sources import media as md
    if fmt == "rawv":
        return md.rawv_decode(data)
    raise NotImplementedError(
        f"video codec {fmt!r}: decoder libraries not available in this "
        "environment; rawv exercises the identical Spark plumbing")


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("audio_id", T.LongType(), False),
    T.StructField("sr", T.IntegerType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("peak", T.LongType(), True),
    T.StructField("zcr", T.LongType(), True),
    T.StructField("dom_freq_hz", T.DoubleType(), True),
    T.StructField("decode_ok", T.BooleanType(), False),
])


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """Decode + per-clip DSP features over Arrow batches: RMS, peak,
    zero-crossing count (sign convention s >= 0), and the dominant
    frequency from a numpy rFFT.  Everything but dom_freq_hz is
    integer-exact arithmetic over the PCM samples, which is what lets
    the audio_features query carry a full SQL oracle."""
    cols = audio.select("audio_id", "bytes", "fmt")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "sr", "n_samples",
                                   "duration_s", "rms", "peak", "zcr",
                                   "dom_freq_hz", "decode_ok")}
            for aid, data, fmt in zip(pdf["audio_id"], pdf["bytes"],
                                      pdf["fmt"]):
                out["audio_id"].append(int(aid))
                try:
                    s, rate = decode_audio(bytes(data), fmt)
                except (NotImplementedError, ValueError):
                    for k in ("sr", "n_samples", "duration_s", "rms",
                              "peak", "zcr", "dom_freq_hz"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
                    continue
                x = s.astype(np.int64)
                n = x.size
                nonneg = x >= 0
                spec = np.abs(np.fft.rfft(x.astype(np.float64)))
                spec[0] = 0.0  # ignore DC
                out["sr"].append(int(rate))
                out["n_samples"].append(n)
                out["duration_s"].append(n / rate)
                out["rms"].append(float(np.sqrt((x * x).sum() / n)))
                out["peak"].append(int(np.abs(x).max()) if n else 0)
                out["zcr"].append(int((nonneg[1:] != nonneg[:-1]).sum()))
                out["dom_freq_hz"].append(
                    float(spec.argmax()) * rate / n if n else 0.0)
                out["decode_ok"].append(True)
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("video_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("bytes", T.BinaryType(), True),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("fmt", T.StringType(), False),
])


def sample_video_frames(videos: DataFrame, every_n: int = 2) -> DataFrame:
    """Every every_n-th frame of each clip as a PPM image row — the
    video -> image fan-out a caption/vision pipeline feeds from.  One
    Arrow batch of containers in, frame rows out; undecodable formats
    are dropped (count them upstream via extract-style decode_ok if
    needed)."""
    cols = videos.select("video_id", "bytes", "fmt")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("video_id", "frame_idx", "bytes",
                                    "w", "h", "fmt")}
            for vid, data, fmt in zip(pdf["video_id"], pdf["bytes"],
                                      pdf["fmt"]):
                try:
                    frames = decode_video(bytes(data), fmt)
                except (NotImplementedError, ValueError):
                    continue
                n, h, w = frames.shape[:3]
                for idx in range(0, n, every_n):
                    rows["video_id"].append(int(vid))
                    rows["frame_idx"].append(idx)
                    rows["bytes"].append(im.ppm_encode(frames[idx]))
                    rows["w"].append(w)
                    rows["h"].append(h)
                    rows["fmt"].append("ppm")
            yield pd.DataFrame(rows) if rows["video_id"] else pd.DataFrame(
                {k: pd.Series([], dtype=o) for k, o in (
                    ("video_id", "int64"), ("frame_idx", "int32"),
                    ("bytes", "object"), ("w", "int32"), ("h", "int32"),
                    ("fmt", "object"))})

    return cols.mapInPandas(run, FRAME_SCHEMA)


MOTION_SCHEMA = T.StructType([
    T.StructField("video_id", T.LongType(), False),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("motion", T.DoubleType(), True),
    T.StructField("decode_ok", T.BooleanType(), False),
])


def video_motion_energy(videos: DataFrame) -> DataFrame:
    """Mean absolute per-channel difference between consecutive
    frames — the cheap temporal feature used to drop static clips.
    Integer-exact over raw frames (sum of |diffs| / count), so the
    video_motion query is fully SQL-oracled."""
    cols = videos.select("video_id", "bytes", "fmt")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("video_id", "n_frames", "motion",
                                   "decode_ok")}
            for vid, data, fmt in zip(pdf["video_id"], pdf["bytes"],
                                      pdf["fmt"]):
                out["video_id"].append(int(vid))
                try:
                    frames = decode_video(bytes(data), fmt)
                except (NotImplementedError, ValueError):
                    out["n_frames"].append(None)
                    out["motion"].append(None)
                    out["decode_ok"].append(False)
                    continue
                d = np.abs(np.diff(frames.astype(np.int64), axis=0))
                out["n_frames"].append(int(frames.shape[0]))
                out["motion"].append(float(d.sum()) / d.size
                                     if d.size else 0.0)
                out["decode_ok"].append(True)
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, MOTION_SCHEMA)


def ppm_pixel_stats(frames: DataFrame, id_cols: list) -> DataFrame:
    """(id_cols..., w, h, pix_sum): exact int64 decoded-pixel sum of
    every PPM payload, keyed by whatever id columns the caller carries
    (image_id for resize output, video_id+frame_idx for sampled
    frames).  The verification tail of a binary->binary transform —
    appended to the producer's map-only chain, no shuffle of bytes."""
    fields = [frames.schema[c] for c in id_cols]
    schema = T.StructType(fields + [
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("pix_sum", T.LongType(), False),
    ])
    cols = frames.select(*id_cols, "bytes")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # degrade per-row, not per-job: upstream transforms emit
            # bytes=NULL for payloads they could not decode (unknown
            # codec) — those rows are dropped here instead of letting
            # bytes(None) fail the whole stage
            pdf = pdf[pdf["bytes"].notna()].reset_index(drop=True)
            nb = len(pdf)
            if nb == 0:
                continue
            ws = np.zeros(nb, np.int32)
            hs = np.zeros(nb, np.int32)
            ps = np.zeros(nb, np.int64)
            for t in range(nb):
                pix = im.ppm_decode(bytes(pdf["bytes"].iloc[t]))
                hs[t], ws[t] = pix.shape[:2]
                ps[t] = pix.astype(np.int64).sum()
            out = {c: pdf[c] for c in id_cols}
            out.update({"w": ws, "h": hs, "pix_sum": ps})
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, schema)


def flip_images(images: DataFrame) -> DataFrame:
    """Horizontal-mirror augmentation, re-encoded as PPM — the
    cheapest label-preserving image augmentation a vision training
    pipeline applies.  Same binary->binary shape as resize_images:
    decode, transform, encode inside one Arrow batch, map-only."""
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
            rows = {k: [] for k in ("image_id", "bytes", "w", "h",
                                    "fmt")}
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"],
                                      pdf["fmt"]):
                try:
                    pix = im.decode_image(bytes(data), fmt)
                except NotImplementedError:
                    rows["image_id"].append(iid)
                    rows["bytes"].append(None)
                    rows["w"].append(0)
                    rows["h"].append(0)
                    rows["fmt"].append("ppm")
                    continue
                h, w = pix.shape[:2]
                rows["image_id"].append(iid)
                rows["bytes"].append(im.ppm_encode(pix[:, ::-1]))
                rows["w"].append(w)
                rows["h"].append(h)
                rows["fmt"].append("ppm")
            yield pd.DataFrame(rows)

    return cols.mapInPandas(run, schema)


def ppm_weighted_stats(frames: DataFrame, id_cols: list) -> DataFrame:
    """(id_cols..., w, h, wsum): column-position-weighted exact int64
    checksum wsum = sum(pix[y,x,c] * (x+1)) of every PPM payload.
    Unlike a plain pixel sum this is NOT mirror-invariant, so it pins
    the flip transform's actual pixel movement, not just conservation
    of mass.  Appended to the producer's map-only chain."""
    fields = [frames.schema[c] for c in id_cols]
    schema = T.StructType(fields + [
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("wsum", T.LongType(), False),
    ])
    cols = frames.select(*id_cols, "bytes")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # same per-row degradation contract as ppm_pixel_stats:
            # bytes=NULL (producer's decode failure marker) -> row
            # dropped, never bytes(None)
            pdf = pdf[pdf["bytes"].notna()].reset_index(drop=True)
            nb = len(pdf)
            if nb == 0:
                continue
            ws = np.zeros(nb, np.int32)
            hs = np.zeros(nb, np.int32)
            ss = np.zeros(nb, np.int64)
            for t in range(nb):
                pix = im.ppm_decode(bytes(pdf["bytes"].iloc[t]))
                hs[t], ws[t] = pix.shape[:2]
                wgt = np.arange(1, pix.shape[1] + 1,
                                dtype=np.int64)[None, :, None]
                ss[t] = (pix.astype(np.int64) * wgt).sum()
            out = {c: pdf[c] for c in id_cols}
            out.update({"w": ws, "h": hs, "wsum": ss})
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, schema)
