"""Pure-Python + numpy image codecs for the multimodal decode step.

No PIL/ffmpeg exists in this environment, but several formats are fully
decodable with the stdlib (zlib) + numpy, which closes the multimodal
decode stub for real pipelines that ship PNG/BMP/PPM/GIF payloads:

  decode_image(raw) -> (height, width, channels) uint8 ndarray
    PNG  : 8-bit depth, color types 0/2/3/4/6, filter types 0-4,
           non-interlaced (Adam7 raises)
  BMP  : BITMAPINFOHEADER, uncompressed 8/24/32-bit, bottom-up or top-down
  PPM  : binary P5 (gray) / P6 (RGB), maxval <= 255
  GIF  : 87a/89a, global or local color table, first frame, LZW,
         non-interlaced

Baseline/extended-sequential JPEG decodes for real via jpegcodec.py (the
from-scratch ITU-T.81 implementation — Huffman + matrix IDCT in numpy);
progressive/arithmetic JPEG and compressed video stay honestly
unimplemented (NotImplementedError).

Encoders (encode_png / encode_ppm / encode_bmp) exist so tests and catalog
fixtures can synthesize deterministic payloads without any library either;
encode_png writes filter-type-0 scanlines (full zlib round-trip on decode).

Everything is per-item Python — these run INSIDE Arrow-batched mapInPandas
tasks (see multimodal.py), so the engine-level contract (stream batches,
never materialize a partition of blobs) is unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (spec §9, types 0-4)."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:                                   # None
            out[y] = line
        elif ftype == 1:                                 # Sub
            for x in range(stride):
                left = out[y, x - ch] if x >= ch else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif ftype == 2:                                 # Up
            out[y] = line + prev                         # uint8 wraps mod 256
        elif ftype == 3:                                 # Average
            for x in range(stride):
                left = int(out[y, x - ch]) if x >= ch else 0
                out[y, x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:                                 # Paeth
            for x in range(stride):
                a = int(out[y, x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[y, x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
    return out.reshape(h, w, ch)


def decode_png(raw: bytes) -> np.ndarray:
    if not raw.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, idat, plte, ihdr = len(_PNG_SIG), bytearray(), None, None
    while pos + 8 <= len(raw):
        length, ctype = struct.unpack(">I4s", raw[pos:pos + 8])
        data = raw[pos + 8:pos + 8 + length]
        pos += 12 + length                               # +4 CRC (unchecked)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: no IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG: bit depth {depth} (only 8)")
    if interlace:
        raise NotImplementedError("PNG: Adam7 interlacing")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"PNG: color type {color}")
    ch = _PNG_CHANNELS[color]
    px = _png_unfilter(zlib.decompress(bytes(idat)), h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        px = plte[px[:, :, 0]]
    return px


def encode_png(px: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit gray/RGB/RGBA, filter type 0 scanlines."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    scan = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b""))


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------

def decode_bmp(raw: bytes) -> np.ndarray:
    if raw[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", raw[10:14])[0]
    hdr_size = struct.unpack("<I", raw[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError("BMP: pre-BITMAPINFOHEADER core header")
    w, h = struct.unpack("<ii", raw[18:26])
    bpp = struct.unpack("<H", raw[28:30])[0]
    comp = struct.unpack("<I", raw[30:34])[0]
    if comp not in (0, 3):
        raise NotImplementedError(f"BMP: compression {comp}")
    top_down = h < 0
    h = abs(h)
    if bpp == 24 or bpp == 32:
        nch = bpp // 8
        stride = ((w * nch) + 3) & ~3
        px = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            row = np.frombuffer(raw, dtype=np.uint8, count=w * nch,
                                offset=data_off + y * stride)
            row = row.reshape(w, nch)
            py = y if top_down else h - 1 - y
            px[py] = row[:, 2::-1]                       # BGR(A) -> RGB
        return px
    if bpp == 8:
        pal_off = 14 + hdr_size
        pal = np.frombuffer(raw, dtype=np.uint8, count=256 * 4,
                            offset=pal_off).reshape(256, 4)[:, 2::-1]
        stride = (w + 3) & ~3
        px = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            row = np.frombuffer(raw, dtype=np.uint8, count=w,
                                offset=data_off + y * stride)
            py = y if top_down else h - 1 - y
            px[py] = pal[row]
        return px
    raise NotImplementedError(f"BMP: {bpp} bpp")


def encode_bmp(px: np.ndarray) -> bytes:
    """24-bit uncompressed bottom-up BMP."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, _ = px.shape
    stride = ((w * 3) + 3) & ~3
    body = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):
        body += px[y, :, ::-1].tobytes() + pad           # RGB -> BGR
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    return hdr + bytes(body)


# --------------------------------------------------------------------------
# PPM / PGM (binary)
# --------------------------------------------------------------------------

def decode_ppm(raw: bytes) -> np.ndarray:
    if raw[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    ch = 3 if raw[:2] == b"P6" else 1
    # header: magic, width, height, maxval — ASCII tokens, # comments
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(raw) and raw[pos:pos + 1].isspace():
            pos += 1
        if raw[pos:pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(raw[start:pos]))
    pos += 1                                             # single whitespace
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("PPM: 16-bit samples")
    return (np.frombuffer(raw, dtype=np.uint8, count=w * h * ch, offset=pos)
            .reshape(h, w, ch).copy())


def encode_ppm(px: np.ndarray) -> bytes:
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    magic = b"P6" if ch == 3 else b"P5"
    if ch not in (1, 3):
        raise ValueError("PPM: 1 or 3 channels only")
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


# --------------------------------------------------------------------------
# GIF (first frame)
# --------------------------------------------------------------------------

def _gif_lzw(min_code: int, data: bytes, n_expected: int) -> np.ndarray:
    clear, end = 1 << min_code, (1 << min_code) + 1
    table = {i: (i,) for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    out: list[int] = []
    prev: tuple | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = {i: (i,) for i in range(clear)}
                next_code, width, prev = end + 1, min_code + 1, None
                continue
            if code == end:
                return np.array(out[:n_expected], dtype=np.uint8)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                if next_code < 4096:                     # encoder caps at 12 bits
                    table[next_code] = prev + (entry[0],)
                    next_code += 1
            else:                                        # KwKwK case
                if code != next_code or next_code >= 4096:
                    raise ValueError("GIF: corrupt LZW stream")
                entry = prev + (prev[0],)
                table[next_code] = entry
                next_code += 1
            out.extend(entry)
            prev = entry
            # The decoder's next_code lags the encoder's by one (no table
            # entry is added for the first code after a clear), so code width
            # must grow one code EARLIER than the naive next_code == 2**width
            # rule or the bit reader desyncs at every 9->10/10->11/11->12
            # boundary (any frame with >= ~254 emitted codes).
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
    return np.array(out[:n_expected], dtype=np.uint8)


def decode_gif(raw: bytes) -> np.ndarray:
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = raw[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(raw, dtype=np.uint8, count=n * 3,
                            offset=pos).reshape(n, 3)
        pos += n * 3
    while pos < len(raw):
        b0 = raw[pos]
        if b0 == 0x21:                                   # extension: skip
            pos += 2
            while raw[pos]:
                pos += 1 + raw[pos]
            pos += 1
        elif b0 == 0x2C:                                 # image descriptor
            w, h = struct.unpack("<HH", raw[pos + 5:pos + 9])
            iflags = raw[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(raw, dtype=np.uint8, count=n * 3,
                                   offset=pos).reshape(n, 3)
                pos += n * 3
            if iflags & 0x40:
                raise NotImplementedError("GIF: interlaced frame")
            if ct is None:
                raise ValueError("GIF: no color table")
            min_code = raw[pos]
            pos += 1
            blocks = bytearray()
            while raw[pos]:
                blocks += raw[pos + 1:pos + 1 + raw[pos]]
                pos += 1 + raw[pos]
            idx = _gif_lzw(min_code, bytes(blocks), w * h)
            if len(idx) < w * h:
                idx = np.pad(idx, (0, w * h - len(idx)))
            return ct[idx.reshape(h, w)]
        elif b0 == 0x3B:                                 # trailer
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{b0:02x}")
    raise ValueError("GIF: no image data")


def _gif_lzw_encode(idx: np.ndarray, min_code: int = 8) -> bytes:
    """Reference GIF-LZW compressor (matches _gif_lzw's width-growth rule;
    round-trip pinned by tests)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    table = {(i,): i for i in range(clear)}
    next_code, codes, prev = end + 1, [clear], ()
    for v in idx.reshape(-1).tolist():
        cand = prev + (v,)
        if cand in table:
            prev = cand
        else:
            codes.append(table[prev])
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
            prev = (v,)
    if prev:
        codes.append(table[prev])
    codes.append(end)
    out, acc, nbits = bytearray(), 0, 0
    width, n_entries = min_code + 1, end + 1
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == clear:
            n_entries, width = end + 1, min_code + 1
        else:
            n_entries += 1
            if n_entries == (1 << width) and width < 12:
                width += 1
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(idx: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """Minimal GIF89a writer: one frame of 8-bit indexed pixels with a
    256-entry global color table (default: grayscale k -> (k,k,k))."""
    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape
    if palette is None:
        ramp = np.arange(256, dtype=np.uint8)
        palette = np.stack([ramp, ramp, ramp], axis=1)
    lzw = _gif_lzw_encode(idx)
    blocks = bytearray()
    i = 0
    while i < len(lzw):
        n = min(255, len(lzw) - i)
        blocks += bytes([n]) + lzw[i:i + n]
        i += n
    blocks += b"\x00"
    return (b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x80 | 7, 0, 0])
            + np.asarray(palette, dtype=np.uint8).tobytes()
            + b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
            + bytes([8]) + bytes(blocks) + b"\x3B")


# --------------------------------------------------------------------------
# WAV (RIFF PCM) — the audio leg of the multimodal decode
# --------------------------------------------------------------------------

def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM payload to ((n_samples, channels) int32
    array, sample_rate). 8-bit unsigned and 16/24/32-bit signed PCM
    (format tag 1); compressed formats (mp3-in-wav, float, ADPCM) raise."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, size = raw[pos:pos + 4], struct.unpack(
            "<I", raw[pos + 4:pos + 8])[0]
        body = raw[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)                     # chunks are padded
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    tag, channels, rate, _br, _ba, bits = fmt
    if tag != 1:
        raise NotImplementedError(f"WAV: format tag {tag} (PCM only)")
    if bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8)
                   .astype(np.int32) - 128)
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 24:
        b3 = np.frombuffer(data, dtype=np.uint8)
        b3 = b3[: (len(b3) // 3) * 3].reshape(-1, 3).astype(np.int32)
        samples = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        samples = np.where(samples >= 1 << 23, samples - (1 << 24), samples)
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.int32)
    else:
        raise NotImplementedError(f"WAV: {bits}-bit PCM")
    n = (len(samples) // channels) * channels
    return samples[:n].reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal 16-bit PCM WAV writer ((n, channels) or (n,) input)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    data = s.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


# --------------------------------------------------------------------------
# AVI (RIFF, uncompressed DIB frames) — the video leg
# --------------------------------------------------------------------------

def decode_avi(raw: bytes) -> tuple[np.ndarray, int]:
    """Decode an uncompressed RIFF/AVI (raw 24-bit DIB '00db' frames,
    bottom-up BGR like BMP) to ((n_frames, h, w, 3) uint8 array,
    micros_per_frame). Compressed streams (anything whose strh handler is
    not DIB/raw and whose frames aren't 00db) raise NotImplementedError."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    w = h = None
    us_per_frame = 0
    frames: list[np.ndarray] = []

    def walk(buf: bytes) -> None:
        nonlocal w, h, us_per_frame
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            body = buf[pos + 8:pos + 8 + size]
            pos += 8 + size + (size & 1)
            if cid == b"LIST":
                walk(body[4:])                       # skip the list type id
            elif cid == b"avih":
                us_per_frame = struct.unpack("<I", body[0:4])[0]
                w = struct.unpack("<I", body[32:36])[0]
                h = struct.unpack("<I", body[36:40])[0]
            elif cid == b"strh":
                if body[:4] == b"vids" and body[4:8] not in (
                        b"DIB ", b"\x00\x00\x00\x00"):
                    raise NotImplementedError(
                        f"AVI: compressed video handler {body[4:8]!r}")
            elif cid in (b"00db", b"01db"):
                frames.append(np.frombuffer(body, dtype=np.uint8))
            elif cid in (b"00dc", b"01dc"):
                raise NotImplementedError("AVI: compressed frame chunk")

    walk(raw[12:])
    if w is None or h is None or not frames:
        raise ValueError("AVI: missing avih header or frames")
    stride = ((w * 3) + 3) & ~3
    out = np.zeros((len(frames), h, w, 3), dtype=np.uint8)
    for f, data in enumerate(frames):
        for y in range(h):
            row = data[y * stride: y * stride + w * 3].reshape(w, 3)
            out[f, h - 1 - y] = row[:, ::-1]          # BGR -> RGB, bottom-up
    return out, us_per_frame


def encode_avi(frames: np.ndarray, us_per_frame: int = 40_000) -> bytes:
    """Minimal uncompressed AVI writer: (n, h, w, 3) uint8 RGB frames as
    raw bottom-up BGR '00db' chunks with a DIB vids stream header."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    stride = ((w * 3) + 3) & ~3
    pad = b"\x00" * (stride - w * 3)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<IIIIIIIIII", us_per_frame, stride * h * 25, 0,
                       0x10, n, 0, 1, stride * h, w, h) + b"\x00" * 16
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            us_per_frame, 1_000_000, 0, n,
                                            stride * h, 0, 0)
            + struct.pack("<hhhh", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                       2835, 2835, 0, 0)
    movi_body = b"".join(
        chunk(b"00db", b"".join(
            frames[f, h - 1 - y, :, ::-1].tobytes() + pad
            for y in range(h)))
        for f in range(n))
    body = (lst(b"hdrl", chunk(b"avih", avih)
                + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
            + lst(b"movi", movi_body))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def decode_image(raw: bytes) -> np.ndarray:
    """Decode a PNG/BMP/PPM/GIF/JPEG payload to an (h, w, ch) uint8 array.
    Baseline/extended-sequential Huffman JPEG decodes for real
    (jpegcodec.py, pure numpy); progressive/arithmetic JPEG and video
    formats raise NotImplementedError."""
    if raw.startswith(_PNG_SIG):
        return decode_png(raw)
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    if raw[:2] in (b"P5", b"P6"):
        return decode_ppm(raw)
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(raw)
    if raw[:3] == b"\xff\xd8\xff":
        from .jpegcodec import decode_jpeg
        return decode_jpeg(raw)
    raise ValueError("unrecognized image format")


def nn_resize(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (the deterministic, library-free resampler)."""
    h, w = px.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return px[ys][:, xs]
