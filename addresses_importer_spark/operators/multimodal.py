"""Multimodal column operators: decode / feature-extract / frame-sample
over opaque binary payloads (the training-data-pipeline surface).

Audio (RIFF/WAVE PCM16) decodes for real — numpy only. Compressed
codecs (flac/opus) and image/video decode need external libraries not
present in this container; those paths are STUBBED behind
NotImplementedError with the Spark-side plumbing (schemas, Arrow batch
shapes, mapInPandas iteration) fully real and tested, so dropping in a
real decoder is a one-function change.

All operators are mapInPandas / pandas UDFs over Arrow batches — binary
payloads never pass through row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..config import DedupConfig
from ..functions import audio as A

DECODED_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("sr_hz", T.IntegerType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("decode_error", T.StringType()),
])

FRAMES_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.ArrayType(T.FloatType())),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("logmel_mean", T.ArrayType(T.FloatType())),
    T.StructField("n_frames", T.IntegerType()),
])


def _decode(blob, codec):
    """Real for PCM16 WAV; NotImplementedError for codecs needing
    external decoders (the codec gate, functions/audio.py)."""
    return A.decode_clip(bytes(blob), codec)


def decode_stats(clips: DataFrame) -> DataFrame:
    """bytes → per-clip audio stats; decode failures become a
    decode_error row, not a crash (errors side-channel discipline,
    tools/src/lib.rs:262-277)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for clip_id, blob, sr, codec in zip(
                pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["codec"]
            ):
                base = {"clip_id": clip_id, "sr_hz": sr, "n_samples": None,
                        "duration_ms": None, "rms": None, "peak": None,
                        "decode_error": None}
                try:
                    if blob is None:
                        raise ValueError("null payload")
                    s = _decode(blob, codec)
                    base.update(
                        n_samples=int(len(s)),
                        duration_ms=int(len(s) * 1000 // int(sr)) if sr else None,
                        rms=float(np.sqrt(np.mean(s**2))) if len(s) else 0.0,
                        peak=float(np.max(np.abs(s))) if len(s) else 0.0,
                    )
                except NotImplementedError as e:
                    base["decode_error"] = f"unsupported_codec: {e}"
                except ValueError as e:
                    base["decode_error"] = f"corrupt: {e}"
                rows.append(base)
            yield pd.DataFrame(rows)

    return clips.select("clip_id", "bytes", "sr_hz", "codec").mapInPandas(
        gen, schema=DECODED_SCHEMA
    )


def frame_sample(clips: DataFrame, n_frames: int = 4,
                 frame_len: int = 512) -> DataFrame:
    """Deterministic frame sampling: n_frames windows evenly spaced over
    the clip (the video-keyframe-sampling analog). 1 row in → up to
    n_frames rows out."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for clip_id, blob, codec in zip(pdf["clip_id"], pdf["bytes"], pdf["codec"]):
                if blob is None:
                    continue
                try:
                    s = _decode(blob, codec)
                except (NotImplementedError, ValueError):
                    continue
                if len(s) < frame_len:
                    continue
                starts = np.linspace(0, len(s) - frame_len, n_frames).astype(int)
                for i, st in enumerate(starts):
                    out.append({
                        "clip_id": clip_id,
                        "frame_idx": i,
                        "frame": s[st:st + frame_len].astype(np.float32),
                    })
            yield pd.DataFrame(out, columns=["clip_id", "frame_idx", "frame"])

    return clips.select("clip_id", "bytes", "codec").mapInPandas(
        gen, schema=FRAMES_SCHEMA
    )


def extract_logmel_features(clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """bytes → pooled log-mel feature vector (the embedding-extraction
    stage shape; swap the body for a real model encoder on a cluster)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for clip_id, blob, sr, codec in zip(
                pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["codec"]
            ):
                if blob is None or sr is None:
                    continue
                try:
                    s = _decode(blob, codec)
                except (NotImplementedError, ValueError):
                    continue
                feats = A.log_mel_features(
                    s, int(sr), cfg.n_mels, cfg.frame_len, cfg.hop_len
                )
                out.append({
                    "clip_id": clip_id,
                    "logmel_mean": feats.mean(axis=0).astype(np.float32),
                    "n_frames": int(feats.shape[0]),
                })
            yield pd.DataFrame(out, columns=["clip_id", "logmel_mean", "n_frames"])

    return clips.select("clip_id", "bytes", "sr_hz", "codec").mapInPandas(
        gen, schema=FEATURES_SCHEMA
    )


def image_decode_stub(images: DataFrame) -> DataFrame:
    """Image-decode plumbing: schema and batch iteration are real; the
    pixel decode raises until an imaging library is available. A
    DataFrame with (id string, bytes binary) is expected."""

    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decode_error", T.StringType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, _blob in zip(pdf["id"], pdf["bytes"]):
                try:
                    raise NotImplementedError(
                        "image decode requires an imaging library (PIL/cv2) "
                        "not present in this container"
                    )
                except NotImplementedError as e:
                    rows.append({"id": rid, "width": None, "height": None,
                                 "decode_error": str(e)})
            yield pd.DataFrame(rows)

    return images.select("id", "bytes").mapInPandas(gen, schema=schema)
