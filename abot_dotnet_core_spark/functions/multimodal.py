"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns + typed metadata structs; all
per-item work runs as Arrow-batched ``mapInPandas`` so batches stream through
executors without materializing a partition of blobs in memory at once.

PIL/ffmpeg are NOT available in this container, but PNG/BMP/PPM/GIF
(incl. Adam7/GIF interlace), baseline JPEG (jpegcodec.py — pure-numpy
ITU-T.81), RIFF/WAVE integer PCM + G.711 A-law/mu-law + IMA ADPCM, and
uncompressed-DIB or Motion-JPEG AVI are decodable with stdlib
zlib/struct + numpy — ``imagecodec.decode_image`` / ``decode_wav`` /
``decode_avi`` do real decode for those formats, so
``decode_stub=False`` computes real dimensions/means/resizes and real
audio stats. Arithmetic JPEG and other compressed codecs
(mp3, non-MJPEG video) still raise NotImplementedError — a deliberate,
frozen scope decision (README "Media codec scope"): MPEG audio/H.264
are defined by large normative tabulated data (ISO 11172-3 Table C.1
synthesis window, B.2a-d allocation tables; CABAC tables) that cannot
be reconstructed from first principles nor validated in this sandbox
(no network, no sample files, no reference decoder) — a self-round-trip
decoder with a wrong table would pass green while corrupting every
real-world file. Rows are kept with NULL stats, never faked;
``decode_stub=True`` (default) keeps the deterministic md5 fake for
format-agnostic plumbing tests.

Operators:
  sniff_media_type    magic-byte detection (real — no decoder needed)
  with_media_meta     size/type metadata columns
  decode_image_meta   real decode -> (mime, width, height, mean_millis)
  decode_audio_meta   real WAV/PCM decode -> rate/channels/frames/
                      duration + exact amplitude stats
  extract_features    decode -> fixed-dim feature vector (real for
                      PNG/BMP/PPM/GIF when decode_stub=False)
  resize_images       nearest-neighbor resample (real when decode_stub=False)
  extract_frames      REAL per-frame decode of sampled AVI frames
                      (DIB or Motion-JPEG) -> one row per frame
  sample_frames       index-only frame sampling plan from durations
"""

from __future__ import annotations

import hashlib
import zlib
from struct import error as struct_error

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# Everything a junk/truncated/corrupt payload can raise out of the pure-
# stdlib decoders: struct.error (short headers), zlib.error (corrupt PNG
# IDAT), KeyError/IndexError (corrupt LZW/chunk tables). The decode_*_meta
# contract is "undecodable payloads yield NULL", so the net must cover all
# of them or one bad blob fails the whole Spark job.
_DECODE_ERRORS = (ValueError, NotImplementedError, TypeError, IndexError,
                  KeyError, struct_error, zlib.error)

_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),  # ftyp boxes start with size prefix
    (b"BM", "image/bmp"),
    (b"P5", "image/x-portable-graymap"),
    (b"P6", "image/x-portable-pixmap"),
]

# RIFF is a container: the mime lives in the subtype at bytes 8..12
_RIFF_SUBTYPES = {b"WAVE": "audio/wav", b"AVI ": "video/x-msvideo"}


def sniff_media_type(raw: bytes | None) -> str:
    if not raw:
        return "application/octet-stream"
    if raw[:4] == b"RIFF":
        return _RIFF_SUBTYPES.get(bytes(raw[8:12]),
                                  "application/octet-stream")
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


DECODE_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("mean_millis", T.IntegerType()),
])


def decode_image_meta(df: DataFrame, id_col: str = "media_id",
                      bin_col: str = "payload") -> DataFrame:
    """REAL pixel decode (PNG/BMP/PPM/GIF/JPEG via imagecodec) ->
    dimensions and the exact integer sample mean: mean_millis = (sum of all
    samples * 1000) // sample count. Integer arithmetic end-to-end, so a
    SQL oracle that knows the fixture's pixel-generation rule reproduces it
    bit-exactly. Undecodable payloads (arithmetic JPEG, junk) yield NULL
    width/height/mean — the row is kept, the error is not swallowed
    silently into zeros."""
    def gen(batches):
        from .imagecodec import decode_image
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[bin_col]):
                mime = sniff_media_type(bytes(b) if b is not None else None)
                try:
                    px = decode_image(bytes(b))
                    h, w, ch = px.shape
                    tot = int(px.astype(np.int64).sum())
                    rows.append((mid, mime, w, h, ch,
                                 (tot * 1000) // (h * w * ch)))
                except _DECODE_ERRORS:
                    rows.append((mid, mime, None, None, None, None))
            yield pd.DataFrame(rows, columns=[
                "media_id", "mime", "width", "height", "channels",
                "mean_millis"])
    return df.mapInPandas(gen, schema=DECODE_META_SCHEMA)


VIDEO_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("fps_millis", T.IntegerType()),
    T.StructField("mean_millis", T.IntegerType()),
])


def decode_video_meta(df: DataFrame, id_col: str = "media_id",
                      bin_col: str = "payload") -> DataFrame:
    """REAL video decode for RIFF/AVI (imagecodec.decode_avi — raw
    24-bit DIB frames, or Motion-JPEG via jpegcodec) and animated GIF
    (composited frames; frame rate from the first GCE delay): dimensions,
    frame count, frame rate in milli-fps, and the exact integer sample
    mean over ALL frames' pixels. Other compressed video yields NULL
    stats — the stub stays honest."""
    def gen(batches):
        from .imagecodec import decode_avi, decode_gif_frames
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[bin_col]):
                mime = sniff_media_type(bytes(b) if b is not None else None)
                try:
                    bb = bytes(b)
                    if bb[:6] in (b"GIF87a", b"GIF89a"):
                        frames, delays = decode_gif_frames(
                            bb, max_frames=256)
                        us = (delays[0] if delays else 0) * 10_000
                    else:
                        frames, us = decode_avi(bb)
                    n, h, w, ch = frames.shape
                    tot = int(frames.astype(np.int64).sum())
                    rows.append((mid, mime, w, h, n,
                                 1_000_000_000 // max(us, 1),
                                 (tot * 1000) // frames.size))
                except _DECODE_ERRORS:
                    rows.append((mid, mime, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=[
                "media_id", "mime", "width", "height", "n_frames",
                "fps_millis", "mean_millis"])
    return df.mapInPandas(gen, schema=VIDEO_META_SCHEMA)


AUDIO_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("mime", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("duration_micros", T.IntegerType()),
    T.StructField("sum_abs", T.LongType()),
    T.StructField("peak", T.IntegerType()),
])


def decode_audio_meta(df: DataFrame, id_col: str = "media_id",
                      bin_col: str = "payload") -> DataFrame:
    """REAL audio decode for RIFF/WAVE (imagecodec.decode_wav —
    8/16/24/32-bit integer PCM, G.711 A-law/mu-law, IMA ADPCM): sample
    rate, channel count, frame count, duration and exact integer
    amplitude stats (sum of |sample|, peak). Other compressed audio
    (mp3) yields NULL stats — kept, not faked."""
    def gen(batches):
        from .imagecodec import decode_wav
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[bin_col]):
                mime = sniff_media_type(bytes(b) if b is not None else None)
                try:
                    samples, rate = decode_wav(bytes(b))
                    frames, ch = samples.shape
                    a = np.abs(samples.astype(np.int64))
                    rows.append((mid, mime, rate, ch, frames,
                                 frames * 1_000_000 // max(rate, 1),
                                 int(a.sum()), int(a.max()) if a.size else 0))
                except _DECODE_ERRORS:
                    rows.append((mid, mime, None, None, None, None,
                                 None, None))
            yield pd.DataFrame(rows, columns=[
                "media_id", "mime", "sample_rate", "channels", "n_frames",
                "duration_micros", "sum_abs", "peak"])
    return df.mapInPandas(gen, schema=AUDIO_META_SCHEMA)


FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def extract_features(df: DataFrame, dim: int = 16, id_col: str = "media_id",
                     bin_col: str = "payload",
                     decode_stub: bool = True) -> DataFrame:
    """Decode + featurize. ``decode_stub=True`` derives ``dim`` floats from
    md5(payload) (format-agnostic plumbing fake); ``decode_stub=False`` does
    REAL decode for PNG/BMP/PPM/GIF/JPEG (incl. progressive) via
    imagecodec (arithmetic JPEG / video raise)."""
    def _decode(raw: bytes) -> np.ndarray:
        if decode_stub:
            h = hashlib.md5(raw).digest()
            reps = (dim * 4 // len(h)) + 1
            buf = (h * reps)[: dim]
            return (np.frombuffer(bytes(buf), dtype=np.uint8)
                    .astype(np.float32) / 255.0)
        # real decode (PNG/BMP/PPM/GIF/baseline JPEG — imagecodec):
        # feature = [h, w, ch, global mean/255] + (dim-4) horizontal-band
        # means of the grayscale /255 — deterministic, library-free
        from .imagecodec import decode_image
        px = decode_image(raw)
        hh, ww, ch = px.shape
        gray = px.astype(np.float64).mean(axis=2)
        bands = np.array_split(gray, max(dim - 4, 1), axis=0)
        feat = [float(hh), float(ww), float(ch),
                float(gray.mean() / 255.0)]
        feat += [float(b.mean() / 255.0) if b.size else 0.0 for b in bands]
        return np.asarray(feat[:dim], dtype=np.float32)

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
    ``decode_stub=True`` emits width*height bytes derived by repeating
    md5(payload) (size-correct plumbing fake); ``decode_stub=False`` does a
    REAL decode + nearest-neighbor resample (packed grayscale output) for
    PNG/BMP/PPM/GIF/JPEG (incl. progressive) via imagecodec — arithmetic
    JPEG and video still raise."""
    n_out = width * height

    def _resize(raw: bytes) -> bytes:
        if decode_stub:
            h = hashlib.md5(raw).digest()
            return (h * (n_out // len(h) + 1))[:n_out]
        # real nearest-neighbor resample over the decoded pixels; output is
        # packed grayscale (one byte per output pixel), format-independent
        from .imagecodec import decode_image, nn_resize
        px = nn_resize(decode_image(raw), width, height)
        gray = px.astype(np.float64).mean(axis=2)
        return np.floor(gray).astype(np.uint8).tobytes()

    def gen(batches):
        for pdf in batches:
            out = [None if b is None else _resize(bytes(b))
                   for b in pdf[bin_col]]
            yield pd.DataFrame({"media_id": pdf[id_col],
                                "width": width, "height": height,
                                "payload": out})

    return df.mapInPandas(gen, schema=RESIZE_SCHEMA)


FRAME_EXTRACT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_millis", T.IntegerType()),
])


def extract_frames(df: DataFrame, every_n: int = 1,
                   id_col: str = "media_id",
                   bin_col: str = "payload",
                   max_gif_frames: int = 256) -> DataFrame:
    """REAL frame extraction from video-ish payloads — RIFF/AVI
    (uncompressed DIB or Motion-JPEG) and animated GIF (composited per
    the disposal model): one output row per sampled frame (indices 0,
    every_n, 2*every_n, ...) with dimensions and the exact integer
    sample mean of THAT frame — the frame-sampling step of a vision
    training-data pipeline. Undecodable payloads yield a single
    NULL-stats row so the error is visible, not dropped. Row explosion
    happens inside the Arrow batch; the binary column never shuffles."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def gen(batches):
        from .imagecodec import decode_avi, decode_gif_frames
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[bin_col]):
                try:
                    bb = bytes(b)
                    if bb[:6] in (b"GIF87a", b"GIF89a"):
                        frames, _delays = decode_gif_frames(
                            bb, max_frames=max_gif_frames)
                    else:
                        frames, _us = decode_avi(bb)
                    n, h, w, _ch = frames.shape
                    for f in range(0, n, every_n):
                        fr = frames[f].astype(np.int64)
                        rows.append((mid, f, w, h,
                                     (int(fr.sum()) * 1000) // fr.size))
                except _DECODE_ERRORS:
                    rows.append((mid, None, None, None, None))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "width", "height", "mean_millis"])
    return df.mapInPandas(gen, schema=FRAME_EXTRACT_SCHEMA)


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
