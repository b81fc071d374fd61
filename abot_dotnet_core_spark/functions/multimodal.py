"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns + typed metadata structs; all
per-item work runs as Arrow-batched ``mapInPandas`` so batches stream through
executors without materializing a partition of blobs in memory at once.

The actual decode (PIL/ffmpeg/torchaudio) is NOT available in this container,
so the decode step is STUBBED — ``decode_stub=True`` (default) produces
deterministic fake features; ``decode_stub=False`` raises NotImplementedError
at the point where a real decoder would be called. Everything around the stub
— schema, batch iteration, partitioning, UDF signatures — is real and tested.

Operators:
  sniff_media_type    magic-byte detection (real — no decoder needed)
  with_media_meta     size/type metadata columns
  extract_features    decode -> fixed-dim feature vector (stubbed decode)
  sample_frames       video frame sampling plan (stubbed decode)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "audio/wav"),        # (RIFF....WAVE — close enough for sniffing)
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),  # ftyp boxes start with size prefix
]


def sniff_media_type(raw: bytes | None) -> str:
    if not raw:
        return "application/octet-stream"
    for magic, mime in _MAGIC:
        if raw.startswith(magic):
            return mime
    return "application/octet-stream"


MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("mime", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_md5", T.StringType()),
])


def with_media_meta(df: DataFrame, id_col: str = "media_id",
                    bin_col: str = "payload") -> DataFrame:
    """Metadata pass — mapInPandas over Arrow batches (real, no decode)."""
    def gen(batches):
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf[id_col],
                "mime": pdf[bin_col].map(
                    lambda b: sniff_media_type(bytes(b) if b is not None else None)),
                "n_bytes": pdf[bin_col].map(
                    lambda b: len(b) if b is not None else 0),
                "content_md5": pdf[bin_col].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                    if b is not None else None),
            })
            yield out
    return df.mapInPandas(gen, schema=MEDIA_META_SCHEMA)


FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def extract_features(df: DataFrame, dim: int = 16, id_col: str = "media_id",
                     bin_col: str = "payload",
                     decode_stub: bool = True) -> DataFrame:
    """Decode + featurize. Decode is STUBBED: the deterministic fake derives
    ``dim`` floats from md5(payload) — stable, testable plumbing; swap
    ``_decode`` for a PIL/ffmpeg call in production."""
    def _decode(raw: bytes) -> np.ndarray:
        if decode_stub:
            h = hashlib.md5(raw).digest()
            reps = (dim * 4 // len(h)) + 1
            buf = (h * reps)[: dim]
            return (np.frombuffer(bytes(buf), dtype=np.uint8)
                    .astype(np.float32) / 255.0)
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg — not in this container")

    def gen(batches):
        for pdf in batches:
            feats = [None if b is None else _decode(bytes(b)).tolist()
                     for b in pdf[bin_col]]
            yield pd.DataFrame({"media_id": pdf[id_col], "feature": feats})

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def resize_images(df: DataFrame, width: int = 64, height: int = 64,
                  id_col: str = "media_id", bin_col: str = "payload",
                  decode_stub: bool = True) -> DataFrame:
    """Image resize over the binary column (mapInPandas, Arrow-batched).
    Decode/resample is STUBBED: the deterministic fake emits width*height
    bytes derived by repeating md5(payload) (stable, size-correct plumbing);
    ``decode_stub=False`` raises where PIL's ``Image.resize`` would run."""
    n_out = width * height

    def _resize(raw: bytes) -> bytes:
        if decode_stub:
            h = hashlib.md5(raw).digest()
            return (h * (n_out // len(h) + 1))[:n_out]
        raise NotImplementedError(
            "real image resize requires PIL — not in this container")

    def gen(batches):
        for pdf in batches:
            out = [None if b is None else _resize(bytes(b))
                   for b in pdf[bin_col]]
            yield pd.DataFrame({"media_id": pdf[id_col],
                                "width": width, "height": height,
                                "payload": out})

    return df.mapInPandas(gen, schema=RESIZE_SCHEMA)


FRAME_PLAN_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.ArrayType(T.IntegerType())),
])


def sample_frames(df: DataFrame, fps_out: int = 1, id_col: str = "media_id",
                  duration_col: str = "duration_s") -> DataFrame:
    """Frame-sampling plan (which frame indices to decode) — pure arithmetic,
    real; the decode of those frames is the stubbed step."""
    def gen(batches):
        for pdf in batches:
            idx = [list(range(0, max(int(d or 0), 0) * fps_out))
                   for d in pdf[duration_col]]
            yield pd.DataFrame({"media_id": pdf[id_col], "frame_idx": idx})
    return df.mapInPandas(gen, schema=FRAME_PLAN_SCHEMA)
