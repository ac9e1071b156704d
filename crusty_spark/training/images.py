"""Multimodal (image/audio/video) operators over binary payload columns.

The payload contract is BASELINE.json's input_hint: opaque ``binary``
bytes plus typed metadata (w, h, fmt). Real media libraries are not in
this container, so decode goes through crusty_spark.codec (the
clearly-documented deterministic stand-in with a ``HAVE_PIL`` seam);
the Spark-side plumbing — schemas, Arrow batch shapes, partition
behaviour — is real and tested, and swaps to real codecs untouched.

Operators:
- ``image_stats``: decode + per-image feature extraction (channel
  means/std, gray entropy) as one ``mapInPandas`` pass.
- ``image_resize``: deterministic nearest-neighbour resize, re-encoded
  to the same container format — output rows carry the new bytes and
  dims, ready to feed any downstream consumer of the payload contract.
- ``sample_frames``: frame sampling for video payloads. No video codec
  exists in this container: with ``fmt='fakevid'`` (a concatenation of
  image frames produced by ``encode_fake_video``) it samples real
  frames; any other container raises the documented
  ``NotImplementedError`` at the decode seam.

All per-row compute is numpy over Arrow batches — no per-row Python in
the Spark plan.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..codec import decode_image, encode_image

STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("std_gray", T.DoubleType(), False),
        T.StructField("entropy", T.DoubleType(), False),
    ]
)


def image_stats(images: DataFrame) -> DataFrame:
    """Decode + feature-extract every payload row: channel means, gray
    std, 8-bit gray histogram entropy. One Arrow pass, numpy kernels."""

    def stats(batches):
        for pdf in batches:
            out = []
            for image_id, b in zip(pdf["image_id"], pdf["bytes"]):
                px, fmt = decode_image(bytes(b))
                h, w, _ = px.shape
                means = px.reshape(-1, 3).mean(axis=0)
                gray = px.astype(np.float32).mean(axis=2)
                hist = np.bincount(
                    gray.astype(np.uint8).ravel(), minlength=256
                ).astype(np.float64)
                p = hist / hist.sum()
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                out.append(
                    (
                        image_id, w, h, fmt,
                        float(means[0]), float(means[1]), float(means[2]),
                        float(gray.std()), entropy,
                    )
                )
            yield pd.DataFrame(out, columns=STATS_SCHEMA.fieldNames())

    return images.select("image_id", "bytes").mapInPandas(stats, STATS_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def _resize_nn(px: np.ndarray, w: int, h: int) -> np.ndarray:
    sh, sw, _ = px.shape
    yi = (np.arange(h) * sh // h).clip(0, sh - 1)
    xi = (np.arange(w) * sw // w).clip(0, sw - 1)
    return px[yi[:, None], xi[None, :], :]

def image_resize(images: DataFrame, w: int, h: int) -> DataFrame:
    """Deterministic nearest-neighbour resize to (w, h), re-encoded in
    the source container format. The output satisfies the same payload
    contract (bytes decode to exactly (h, w, 3))."""

    def resize(batches):
        for pdf in batches:
            out = []
            for image_id, b in zip(pdf["image_id"], pdf["bytes"]):
                px, fmt = decode_image(bytes(b))
                small = np.ascontiguousarray(_resize_nn(px, w, h))
                out.append((image_id, encode_image(small, fmt), w, h, fmt))
            yield pd.DataFrame(out, columns=RESIZED_SCHEMA.fieldNames())

    return images.select("image_id", "bytes").mapInPandas(resize, RESIZED_SCHEMA)


# --- video: deterministic fake container + frame sampling --------------

_VID_MAGIC = b"FVID1"


def encode_fake_video(frames: list[np.ndarray], fmt: str = "png") -> bytes:
    """Deterministic stand-in video container: frame count + length-
    prefixed encoded frames. (No video codec exists in this sandbox —
    the container exists so the SAMPLING plumbing is real.)"""
    enc = [encode_image(f, fmt) for f in frames]
    out = [_VID_MAGIC, struct.pack("<I", len(enc))]
    for e in enc:
        out.append(struct.pack("<I", len(e)))
        out.append(e)
    return b"".join(out)


def decode_fake_video(data: bytes) -> list[bytes]:
    if data[:5] != _VID_MAGIC:
        raise NotImplementedError(
            "no real video codec in this container — only the 'fakevid' "
            "deterministic stand-in container is decodable (swap this seam "
            "for pyav/ffmpeg in a full deployment)"
        )
    (n,) = struct.unpack("<I", data[5:9])
    frames, off = [], 9
    for _ in range(n):
        (ln,) = struct.unpack("<I", data[off : off + 4])
        off += 4
        frames.append(data[off : off + ln])
        off += ln
    return frames


# --- audio: deterministic fake PCM container + feature extraction -----

_AUD_MAGIC = b"FAUD1"


def encode_fake_audio(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 mono PCM in a deterministic stand-in container (no audio
    codec exists in this sandbox; the feature plumbing is real)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("expected 1-D int16 samples")
    return _AUD_MAGIC + struct.pack("<II", rate, len(samples)) + samples.tobytes()


def decode_fake_audio(data: bytes) -> tuple[np.ndarray, int]:
    if data[:5] != _AUD_MAGIC:
        raise NotImplementedError(
            "no real audio codec in this container — only the 'fakeaud' "
            "deterministic stand-in is decodable (swap this seam for "
            "soundfile/ffmpeg in a full deployment)"
        )
    rate, n = struct.unpack("<II", data[5:13])
    return np.frombuffer(data[13 : 13 + 2 * n], dtype=np.int16), rate


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rate", T.IntegerType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossings", T.IntegerType(), False),
    ]
)


def audio_stats(audio: DataFrame) -> DataFrame:
    """Decode + per-clip features (duration, RMS level, zero-crossing
    count) in one Arrow pass — the audio leg of the multimodal
    feature-extraction surface."""

    def stats(batches):
        for pdf in batches:
            out = []
            for audio_id, b in zip(pdf["audio_id"], pdf["bytes"]):
                s, rate = decode_fake_audio(bytes(b))
                f = s.astype(np.float64)
                zc = int(((s[:-1] < 0) != (s[1:] < 0)).sum()) if len(s) > 1 else 0
                out.append(
                    (
                        audio_id, len(s), rate, len(s) / rate,
                        float(np.sqrt((f * f).mean())) if len(s) else 0.0, zc,
                    )
                )
            yield pd.DataFrame(out, columns=AUDIO_STATS_SCHEMA.fieldNames())

    return audio.select("audio_id", "bytes").mapInPandas(stats, AUDIO_STATS_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
    ]
)


def sample_frames(videos: DataFrame, every: int = 2) -> DataFrame:
    """1->N expansion: every `every`-th frame of each video payload as
    its own image row (the training-pipeline frame-sampling shape)."""

    def sample(batches):
        for pdf in batches:
            out = []
            for video_id, b in zip(pdf["video_id"], pdf["bytes"]):
                frames = decode_fake_video(bytes(b))
                for i in range(0, len(frames), every):
                    px, _ = decode_image(frames[i])
                    h, w, _ = px.shape
                    out.append((video_id, i, frames[i], w, h))
            yield pd.DataFrame(out, columns=FRAMES_SCHEMA.fieldNames())

    return videos.select("video_id", "bytes").mapInPandas(sample, FRAMES_SCHEMA)
