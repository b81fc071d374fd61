"""Pure-Python + numpy image codecs for the multimodal decode step.

No PIL/ffmpeg exists in this environment, but several formats are fully
decodable with the stdlib (zlib) + numpy, which closes the multimodal
decode stub for real pipelines that ship PNG/BMP/PPM/GIF payloads:

  decode_image(raw) -> (height, width, channels) uint8 ndarray
    PNG  : 8/16-bit depth (16-bit downconverts to the high byte),
           color types 0/2/3/4/6, filter types 0-4, sequential or
           Adam7-interlaced
  BMP  : BITMAPINFOHEADER, uncompressed 8/24/32-bit or RLE8,
         bottom-up or top-down
  PPM  : binary P5 (gray) / P6 (RGB), 8- or 16-bit samples
  GIF  : 87a/89a, global or local color table, first frame, LZW,
         sequential or interlaced

Audio: WAV integer PCM, IEEE float, G.711 A-law/mu-law, IMA ADPCM,
MS-ADPCM (plus WAVE_FORMAT_EXTENSIBLE wrappers).  Video:
uncompressed-DIB AVI and Motion-JPEG AVI (via jpegcodec).

Baseline, extended-sequential and progressive JPEG decode for real via
jpegcodec.py (the from-scratch ITU-T.81 implementation — Huffman +
matrix IDCT in numpy); arithmetic JPEG and non-MJPEG compressed video
stay honestly unimplemented (NotImplementedError).

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

# Adam7 interlace passes: (x_origin, y_origin, x_step, y_step), spec §8.2
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: bytes, h: int, w: int, ch: int,
                  sb: int = 1) -> np.ndarray:
    """Reverse the per-scanline PNG filters (spec §9, types 0-4). ``sb``
    is bytes per sample (2 for 16-bit depth); filters reference the pixel
    ``ch*sb`` bytes to the left. Returns (h, w, ch) uint8 — 16-bit
    samples downconvert to their high (big-endian first) byte."""
    bpp = ch * sb
    stride = w * bpp
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
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif ftype == 2:                                 # Up
            out[y] = line + prev                         # uint8 wraps mod 256
        elif ftype == 3:                                 # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:                                 # Paeth
            for x in range(stride):
                a = int(out[y, x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[y, x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
    px = out.reshape(h, w, ch, sb)
    return px[..., 0] if sb == 2 else px.reshape(h, w, ch)


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
    if depth not in (8, 16):
        raise NotImplementedError(f"PNG: bit depth {depth} (8/16 only)")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"PNG: color type {color}")
    if depth == 16 and color == 3:
        raise ValueError("PNG: 16-bit palette images are invalid")
    ch = _PNG_CHANNELS[color]
    sb = depth // 8
    data = zlib.decompress(bytes(idat))
    if interlace:                                        # Adam7 (spec §8.2)
        px = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue                  # empty pass contributes no bytes
            # each pass filtered independently
            nbytes = ph * (1 + pw * ch * sb)
            px[y0::dy, x0::dx] = _png_unfilter(
                data[off:off + nbytes], ph, pw, ch, sb)
            off += nbytes
    else:
        px = _png_unfilter(data, h, w, ch, sb)
    if color == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        px = plte[px[:, :, 0]]
    return px


def encode_png(px: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal PNG writer: 8-bit gray/RGB/RGBA, filter type 0 scanlines;
    interlace=True writes the seven Adam7 pass subimages in order."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(b"\x00" + sub[y].tobytes()
                         for y in range(sub.shape[0]))
        scan = b"".join(parts)
    else:
        scan = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0,
                       1 if interlace else 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b""))


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------

def _bmp_rle8(data: bytes, h: int, w: int) -> np.ndarray:
    """Decode the BMP RLE8 stream to an (h, w) index array in STORED row
    order (bottom-up for positive heights; caller flips). Escapes: 00 00
    end-of-line, 00 01 end-of-bitmap, 00 02 dx dy delta, 00 n absolute
    run (word-aligned); else count/value run."""
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = pos = 0
    while pos + 1 < len(data) and y < h:
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:                                        # run of n x v
            end = min(x + n, w)
            idx[y, x:end] = v
            x = end
        elif v == 0:                                     # end of line
            x, y = 0, y + 1
        elif v == 1:                                     # end of bitmap
            break
        elif v == 2:                                     # delta
            if pos + 1 >= len(data):
                raise ValueError("BMP: truncated RLE delta")
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
        else:                                            # absolute mode
            end = min(x + v, w)
            count = end - x
            if pos + v > len(data):
                raise ValueError("BMP: truncated RLE absolute run")
            idx[y, x:end] = np.frombuffer(data, dtype=np.uint8,
                                          count=count, offset=pos)
            x = end
            pos += v + (v & 1)                           # word alignment
    return idx


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
    if comp not in (0, 1, 3):
        raise NotImplementedError(f"BMP: compression {comp}")
    top_down = h < 0
    h = abs(h)
    if comp == 1:                                        # RLE8 (8 bpp only)
        if bpp != 8:
            raise ValueError("BMP: RLE8 requires 8 bpp")
        pal = np.frombuffer(raw, dtype=np.uint8, count=256 * 4,
                            offset=14 + hdr_size).reshape(256, 4)[:, 2::-1]
        idx = _bmp_rle8(raw[data_off:], h, w)
        if not top_down:
            idx = idx[::-1]
        return pal[idx]
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


def encode_bmp_rle8(idx: np.ndarray,
                    palette: np.ndarray | None = None) -> bytes:
    """RLE8-compressed 8-bit indexed BMP writer (bottom-up, 256-entry
    color table; default grayscale ramp). Emits run-length packets plus
    an absolute-mode packet whenever a row starts with >= 3 distinct
    values, so both decode paths get exercised."""
    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape
    if palette is None:
        ramp = np.arange(256, dtype=np.uint8)
        palette = np.stack([ramp, ramp, ramp], axis=1)
    body = bytearray()
    for y in range(h - 1, -1, -1):                       # stored bottom-up
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            if run >= 2 or x + 1 >= w:
                body += bytes([run, row[x]])
                x += run
            else:                                        # absolute mode
                lit = x
                while (lit < w and lit - x < 255
                       and (lit + 1 >= w or row[lit + 1] != row[lit])):
                    lit += 1
                cnt = lit - x
                if cnt < 3:                              # too short: runs
                    body += bytes([1, row[x]])
                    x += 1
                else:
                    body += bytes([0, cnt]) + row[x:x + cnt].tobytes()
                    if cnt & 1:
                        body += b"\x00"                  # word alignment
                    x += cnt
        body += b"\x00\x00"                              # end of line
    body += b"\x00\x01"                                  # end of bitmap
    pal = np.zeros((256, 4), dtype=np.uint8)
    pal[:, :3] = np.asarray(palette, dtype=np.uint8)[:, ::-1]  # BGR0
    data_off = 14 + 40 + 1024
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0,
                               data_off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(body),
                         2835, 2835, 256, 0))
    return hdr + pal.tobytes() + bytes(body)


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
    if maxval > 65535:
        raise ValueError("PPM: maxval out of range")
    if maxval > 255:                    # 16-bit big-endian -> high byte
        s16 = np.frombuffer(raw, dtype=">u2", count=w * h * ch, offset=pos)
        return (s16 >> 8).astype(np.uint8).reshape(h, w, ch)
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


def _gif_interlace_rows(h: int) -> np.ndarray:
    """Row order of an interlaced GIF frame (GIF89a appendix E: four
    passes starting at rows 0/4/2/1 with steps 8/8/4/2). Scanline k of
    the stream lands on image row _gif_interlace_rows(h)[k]."""
    return np.concatenate([np.arange(start, h, step)
                           for start, step in ((0, 8), (4, 8),
                                               (2, 4), (1, 2))])


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
            idx = idx.reshape(h, w)
            if iflags & 0x40:                            # interlaced frame
                out = np.empty_like(idx)
                out[_gif_interlace_rows(h)] = idx
                idx = out
            return ct[idx]
        elif b0 == 0x3B:                                 # trailer
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{b0:02x}")
    raise ValueError("GIF: no image data")


def decode_gif_frames(raw: bytes,
                      max_frames: int | None = None
                      ) -> tuple[np.ndarray, list[int]]:
    """Decode frames of a (possibly animated) GIF, composited onto
    the logical screen per the GIF89a disposal model: disposal 0/1 keep
    the canvas, 2 restores the frame rect to the background color, 3
    restores the previous canvas; transparent pixels leave the canvas
    through. Returns ((n, h, w, 3) uint8, per-frame delay list in
    centiseconds). ``max_frames`` bounds memory on pathological
    many-frame payloads (decoding stops after that many frames)."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", raw[6:10])
    flags, bg = raw[10], raw[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(raw, dtype=np.uint8, count=n * 3,
                            offset=pos).reshape(n, 3)
        pos += n * 3
    bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
              else np.zeros(3, dtype=np.uint8))
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    disposal, delay, transparent = 0, 0, None
    while pos < len(raw):
        b0 = raw[pos]
        if b0 == 0x21:                                   # extension
            label = raw[pos + 1]
            pos += 2
            if label == 0xF9:                            # GCE
                gflags = raw[pos + 1]
                disposal = (gflags >> 2) & 7
                delay = struct.unpack("<H", raw[pos + 2:pos + 4])[0]
                transparent = raw[pos + 4] if gflags & 1 else None
            while raw[pos]:
                pos += 1 + raw[pos]
            pos += 1
        elif b0 == 0x2C:                                 # image descriptor
            fx, fy, fw, fh = struct.unpack("<HHHH", raw[pos + 1:pos + 9])
            iflags = raw[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(raw, dtype=np.uint8, count=n * 3,
                                   offset=pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF: no color table")
            min_code = raw[pos]
            pos += 1
            blocks = bytearray()
            while raw[pos]:
                blocks += raw[pos + 1:pos + 1 + raw[pos]]
                pos += 1 + raw[pos]
            pos += 1                                     # block terminator
            idx = _gif_lzw(min_code, bytes(blocks), fw * fh)
            if len(idx) < fw * fh:
                idx = np.pad(idx, (0, fw * fh - len(idx)))
            idx = idx.reshape(fh, fw)
            if iflags & 0x40:
                out = np.empty_like(idx)
                out[_gif_interlace_rows(fh)] = idx
                idx = out
            saved = canvas.copy() if disposal == 3 else None
            rect = canvas[fy:fy + fh, fx:fx + fw]
            vis = (np.ones(idx.shape, dtype=bool) if transparent is None
                   else idx != transparent)
            vis = vis[:rect.shape[0], :rect.shape[1]]
            rect[vis] = ct[idx[:rect.shape[0], :rect.shape[1]][vis]]
            frames.append(canvas.copy())
            delays.append(delay)
            if max_frames is not None and len(frames) >= max_frames:
                break
            if disposal == 2:                            # restore to bg
                canvas[fy:fy + fh, fx:fx + fw] = bg_rgb
            elif disposal == 3 and saved is not None:    # restore previous
                canvas = saved
            disposal, delay, transparent = 0, 0, None
        elif b0 == 0x3B:                                 # trailer
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF: no image data")
    return np.stack(frames), delays


def encode_gif_frames(frames: np.ndarray,
                      palette: np.ndarray | None = None,
                      delay_cs: int = 10,
                      disposals: list[int] | None = None,
                      offsets: list[tuple[int, int]] | None = None,
                      sizes: list[tuple[int, int]] | None = None,
                      transparent: int | None = None) -> bytes:
    """Animated GIF89a writer for tests: (n, h, w) 8-bit indexed frames
    (sub-rects via offsets/sizes crop each frame), one global 256-entry
    color table, a GCE per frame (delay, disposal, optional transparent
    index)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    if palette is None:
        ramp = np.arange(256, dtype=np.uint8)
        palette = np.stack([ramp, ramp, ramp], axis=1)
    out = bytearray(b"GIF89a" + struct.pack("<HH", w, h)
                    + bytes([0x80 | 7, 0, 0])
                    + np.asarray(palette, dtype=np.uint8).tobytes())
    for f in range(n):
        disp = disposals[f] if disposals else 0
        fx, fy = offsets[f] if offsets else (0, 0)
        fw, fh = sizes[f] if sizes else (w, h)
        gflags = (disp & 7) << 2 | (1 if transparent is not None else 0)
        out += (b"\x21\xf9\x04" + bytes([gflags])
                + struct.pack("<H", delay_cs)
                + bytes([transparent or 0]) + b"\x00")
        sub = frames[f, fy:fy + fh, fx:fx + fw]
        lzw = _gif_lzw_encode(sub)
        out += b"\x2C" + struct.pack("<HHHH", fx, fy, fw, fh) + b"\x00"
        out += bytes([8])
        i = 0
        while i < len(lzw):
            k = min(255, len(lzw) - i)
            out += bytes([k]) + lzw[i:i + k]
            i += k
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


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


def encode_gif(idx: np.ndarray, palette: np.ndarray | None = None,
               interlace: bool = False) -> bytes:
    """Minimal GIF89a writer: one frame of 8-bit indexed pixels with a
    256-entry global color table (default: grayscale k -> (k,k,k)).
    interlace=True stores scanlines in the four-pass appendix-E order
    with the descriptor interlace bit set."""
    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape
    if palette is None:
        ramp = np.arange(256, dtype=np.uint8)
        palette = np.stack([ramp, ramp, ramp], axis=1)
    if interlace:
        lzw = _gif_lzw_encode(idx[_gif_interlace_rows(h)])
    else:
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
            + b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
            + bytes([0x40 if interlace else 0x00])
            + bytes([8]) + bytes(blocks) + b"\x3B")


# --------------------------------------------------------------------------
# WAV (RIFF PCM) — the audio leg of the multimodal decode
# --------------------------------------------------------------------------

# --- G.711 companded PCM (format tags 6 = A-law, 7 = mu-law) ------------
# Table-free ITU-T G.711 decode to 16-bit-scale linear (the classic
# CCITT reference values: mu-law 0x00 -> -32124, A-law 0xD5 -> +8).

_ULAW_BIAS = 0x84
_ULAW_SEG_END = np.array([0xFF, 0x1FF, 0x3FF, 0x7FF,
                          0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], dtype=np.int32)
_ALAW_SEG_END = np.array([0x1F, 0x3F, 0x7F, 0xFF,
                          0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32)


def _ulaw_decode(b: np.ndarray) -> np.ndarray:
    u = (~b.astype(np.int32)) & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(u & 0x80, -mag, mag)


def _ulaw_encode(x: np.ndarray) -> np.ndarray:
    pcm = np.clip(np.asarray(x, dtype=np.int32), -32768, 32767)
    sign = np.where(pcm < 0, 0x80, 0)
    mag = np.minimum(np.abs(pcm), 32635) + _ULAW_BIAS
    seg = np.searchsorted(_ULAW_SEG_END, mag)
    mant = (mag >> (seg + 3)) & 0x0F
    return ((~(sign | (seg << 4) | mant)) & 0xFF).astype(np.uint8)


def _alaw_decode(b: np.ndarray) -> np.ndarray:
    a = b.astype(np.int32) ^ 0x55
    exp = (a >> 4) & 7
    mant = a & 0x0F
    base = (mant << 4) + 8
    mag = np.where(exp > 0, (base + 0x100) << np.maximum(exp - 1, 0), base)
    return np.where(a & 0x80, mag, -mag)            # A-law sign bit 1 = +


def _alaw_encode(x: np.ndarray) -> np.ndarray:
    pcm16 = np.clip(np.asarray(x, dtype=np.int32), -32768, 32767)
    mask = np.where(pcm16 >= 0, 0xD5, 0x55)
    pcm = np.abs(pcm16) >> 3                        # 13-bit magnitude
    seg = np.searchsorted(_ALAW_SEG_END, pcm)
    over = seg >= 8
    seg = np.minimum(seg, 7)
    mant = np.where(seg < 2, (pcm >> 1) & 0x0F, (pcm >> seg) & 0x0F)
    aval = np.where(over, 0x7F, (seg << 4) | mant)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


# --- IMA ADPCM (format tag 0x11) ----------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEPS_PY = tuple(int(s) for s in _IMA_STEPS)


def _ima_step(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA-ADPCM decode step (IMA ADPCM spec / MS WAVE tag 0x11)."""
    step = _IMA_STEPS_PY[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor += -diff if nibble & 8 else diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX[nibble & 7]))
    return predictor, index


def _adpcm_decode_block(block: bytes, channels: int) -> np.ndarray:
    """Decode one IMA-ADPCM WAVE block to (samples, channels) int32.
    The predictor walk is the _ima_step recurrence inlined with native
    ints (pinned equivalent by the reference-step-walk test) — the
    recurrence is inherently sequential, so the constant factor is what
    matters inside an Arrow batch."""
    if len(block) < 4 * channels:
        raise ValueError("WAV: truncated ADPCM block header")
    steps, itab = _IMA_STEPS_PY, _IMA_INDEX
    data = block[4 * channels:]
    group = 4 * channels
    chans = []
    for c in range(channels):
        pred, idx = struct.unpack_from("<hBx", block, c * 4)
        idx = min(88, max(0, idx))
        out = [pred]
        append = out.append
        for g in range(c * 4, len(data) - len(data) % group, group):
            for byte in data[g:g + 4]:
                for nib in (byte & 0x0F, byte >> 4):  # low nibble first
                    step = steps[idx]
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    pred = pred - diff if nib & 8 else pred + diff
                    if pred > 32767:
                        pred = 32767
                    elif pred < -32768:
                        pred = -32768
                    idx += itab[nib & 7]
                    if idx < 0:
                        idx = 0
                    elif idx > 88:
                        idx = 88
                    append(pred)
        chans.append(out)
    n = min(len(ch) for ch in chans)
    return np.stack([np.array(ch[:n], dtype=np.int32)
                     for ch in chans], axis=1)


# --- MS-ADPCM (format tag 2) --------------------------------------------

_MS_COEFS = ((256, 0), (512, -256), (0, 0), (192, 64),
             (240, 0), (460, -208), (392, -232))
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)


def _msadpcm_decode_block(block: bytes, channels: int) -> np.ndarray:
    """Decode one MS-ADPCM block (MS WAVE tag 2): per-channel header
    (predictor index, initial delta, two seed samples), then 4-bit codes
    HIGH nibble first, channels interleaved per nibble."""
    hdr = 7 * channels
    if len(block) < hdr:
        raise ValueError("WAV: truncated MS-ADPCM block header")
    pred_idx = [min(6, block[c]) for c in range(channels)]
    deltas = [struct.unpack_from("<h", block, channels + 2 * c)[0]
              for c in range(channels)]
    s1 = [struct.unpack_from("<h", block, 3 * channels + 2 * c)[0]
          for c in range(channels)]
    s2 = [struct.unpack_from("<h", block, 5 * channels + 2 * c)[0]
          for c in range(channels)]
    chans = [[s2[c], s1[c]] for c in range(channels)]
    coefs = [_MS_COEFS[i] for i in pred_idx]
    c_i = 0
    for byte in block[hdr:]:
        for nib in (byte >> 4, byte & 0x0F):             # high nibble first
            c1, c2 = coefs[c_i]
            predictor = (s1[c_i] * c1 + s2[c_i] * c2) >> 8
            signed = nib - 16 if nib >= 8 else nib
            sample = predictor + signed * deltas[c_i]
            if sample > 32767:
                sample = 32767
            elif sample < -32768:
                sample = -32768
            s2[c_i] = s1[c_i]
            s1[c_i] = sample
            deltas[c_i] = max(16, (_MS_ADAPT[nib] * deltas[c_i]) >> 8)
            chans[c_i].append(sample)
            c_i = (c_i + 1) % channels
    n = min(len(ch) for ch in chans)
    return np.stack([np.array(ch[:n], dtype=np.int32)
                     for ch in chans], axis=1)


def encode_msadpcm_wav(samples: np.ndarray, rate: int = 8000,
                       block_align: int = 64) -> bytes:
    """MS-ADPCM (tag 2) WAV writer: fixed predictor 0 (coef {256, 0} —
    predictor = previous sample), initial delta 16, the standard
    quantize-and-adapt walk mirroring _msadpcm_decode_block exactly."""
    s = np.asarray(samples, dtype=np.int32)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    hdr = 7 * channels
    if block_align <= hdr:
        raise ValueError("block_align too small")
    spb = (block_align - hdr) * 2 // channels + 2
    out = bytearray()
    # the adapted delta persists across blocks THROUGH the block header
    # (blocks stay independently decodable), seeded from the first diff
    # so neither the first block nor any later one pays an
    # adapt-from-16 transient
    deltas = [max(16, abs(int(s[min(2, s.shape[0] - 1), c])
                          - int(s[min(1, s.shape[0] - 1), c])) // 4)
              for c in range(channels)]
    for start in range(0, s.shape[0], spb):
        blk = s[start:start + spb]
        cols = [blk[:, c].tolist() for c in range(channels)]
        nblk = blk.shape[0]

        def samp(c, k):
            return (min(32767, max(-32768, cols[c][k])) if k < nblk
                    else cols[c][nblk - 1])

        s2 = [samp(c, 0) for c in range(channels)]
        s1 = [samp(c, 1) if spb > 1 else s2[c] for c in range(channels)]
        out += bytes([0] * channels)
        for arr in (deltas, s1, s2):
            for c in range(channels):
                out += struct.pack("<h", arr[c])
        nibbles = []
        st1, st2, std = s1[:], s2[:], deltas[:]
        for k in range(2, spb):
            for c in range(channels):
                x = samp(c, k)
                predictor = st1[c]                       # coef {256, 0}
                diff = x - predictor
                nib = max(-8, min(7, int(round(diff / std[c])))) & 0x0F
                signed = nib - 16 if nib >= 8 else nib
                sample = predictor + signed * std[c]
                sample = min(32767, max(-32768, sample))
                st2[c] = st1[c]
                st1[c] = sample
                std[c] = max(16, (_MS_ADAPT[nib] * std[c]) >> 8)
                nibbles.append(nib)
        if len(nibbles) & 1:
            nibbles.append(0)
        for j in range(0, len(nibbles), 2):
            out.append((nibbles[j] << 4) | nibbles[j + 1])
        deltas = std                     # next block's header starts here
    return _wav_container(2, channels, rate, block_align, 4, bytes(out))


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to ((n_samples, channels) int32 array,
    sample_rate). Real paths: 8-bit unsigned / 16/24/32-bit signed PCM
    (format tag 1), G.711 A-law (tag 6) / mu-law (tag 7) to 16-bit-scale
    linear, IMA ADPCM (tag 0x11) and MS-ADPCM (tag 2) blocks, IEEE
    float (tag 3, scaled to 16-bit-range integers) and
    WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrappers. Other compressed formats
    (mp3-in-wav) raise NotImplementedError."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, fmt_body, data = 12, None, b"", None
    while pos + 8 <= len(raw):
        cid, size = raw[pos:pos + 4], struct.unpack(
            "<I", raw[pos + 4:pos + 8])[0]
        body = raw[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)                     # chunks are padded
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    tag, channels, rate, _br, block_align, bits = fmt
    if tag == 0xFFFE:                # WAVE_FORMAT_EXTENSIBLE: the real
        if len(fmt_body) < 26:       # tag leads the SubFormat GUID
            raise ValueError("WAV: truncated extensible fmt chunk")
        tag = struct.unpack("<H", fmt_body[24:26])[0]
    if tag == 3:                                         # IEEE float
        if bits == 32:
            f = np.frombuffer(data, dtype="<f4")
        elif bits == 64:
            f = np.frombuffer(data, dtype="<f8")
        else:
            raise NotImplementedError(f"WAV: {bits}-bit float")
        samples = np.round(np.clip(f, -1.0, 1.0) * 32767.0) \
            .astype(np.int32)
        n = (len(samples) // channels) * channels
        return samples[:n].reshape(-1, channels), rate
    if tag in (6, 7):                                # G.711 A-law / mu-law
        dec = _alaw_decode if tag == 6 else _ulaw_decode
        samples = dec(np.frombuffer(data, dtype=np.uint8))
        n = (len(samples) // channels) * channels
        return samples[:n].reshape(-1, channels), rate
    if tag == 0x11:                                  # IMA ADPCM
        if block_align < 4 * channels + 4:
            raise ValueError("WAV: ADPCM block align too small")
        blocks = [data[i:i + block_align]
                  for i in range(0, len(data), block_align)]
        parts = [_adpcm_decode_block(b, channels)
                 for b in blocks if len(b) >= 4 * channels]
        if not parts:
            raise ValueError("WAV: no ADPCM blocks")
        return np.concatenate(parts, axis=0), rate
    if tag == 2:                                     # MS-ADPCM
        if block_align <= 7 * channels:
            raise ValueError("WAV: MS-ADPCM block align too small")
        blocks = [data[i:i + block_align]
                  for i in range(0, len(data), block_align)]
        parts = [_msadpcm_decode_block(b, channels)
                 for b in blocks if len(b) >= 7 * channels]
        if not parts:
            raise ValueError("WAV: no MS-ADPCM blocks")
        return np.concatenate(parts, axis=0), rate
    if tag != 1:
        raise NotImplementedError(f"WAV: format tag {tag}")
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


def _wav_container(tag: int, channels: int, rate: int, block_align: int,
                   bits: int, data: bytes) -> bytes:
    fmt = struct.pack("<HHIIHH", tag, channels, rate,
                      rate * block_align, block_align, bits)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def encode_g711_wav(samples: np.ndarray, rate: int = 8000,
                    law: str = "ulaw") -> bytes:
    """G.711 companded WAV writer ((n,) or (n, channels) 16-bit-scale
    linear input; law = 'ulaw' (tag 7) or 'alaw' (tag 6))."""
    s = np.asarray(samples, dtype=np.int32)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    enc = _ulaw_encode if law == "ulaw" else _alaw_encode
    data = enc(s.reshape(-1)).tobytes()
    return _wav_container(7 if law == "ulaw" else 6, channels, rate,
                          channels, 8, data)


def encode_adpcm_wav(samples: np.ndarray, rate: int = 8000,
                     block_align: int = 256) -> bytes:
    """IMA-ADPCM (tag 0x11) WAV writer: the standard quantize-and-track
    encoder, exact mirror of _ima_step so decode(encode(x)) reproduces
    the decoder's predictor path bit-for-bit."""
    s = np.asarray(samples, dtype=np.int32)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    if block_align < 4 * channels + 4 * channels:
        raise ValueError("block_align too small")
    spb = (block_align - 4 * channels) * 2 // channels + 1
    out = bytearray()
    # seed the step index near the first sample delta (encoder-side
    # choice only — the decoder reads it from the block header), which
    # kills the index-0 attack transient on steep signals
    first_diff = [abs(int(s[1, c]) - int(s[0, c])) if s.shape[0] > 1 else 0
                  for c in range(channels)]
    idxs = [min(88, int(np.searchsorted(_IMA_STEPS, d)))
            for d in first_diff]
    for start in range(0, s.shape[0], spb):
        blk = s[start:start + spb]
        cols = [blk[:, c].tolist() for c in range(channels)]
        preds = [min(32767, max(-32768, cols[c][0]))
                 for c in range(channels)]
        for c in range(channels):
            out += struct.pack("<hBx", preds[c], idxs[c])
        nibbles: list[list[int]] = [[] for _ in range(channels)]
        nblk = blk.shape[0]
        for k in range(1, spb):
            for c in range(channels):
                x = cols[c][k] if k < nblk else preds[c]
                step = _IMA_STEPS_PY[idxs[c]]
                diff = x - preds[c]
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                nibbles[c].append(nib)
        # pack: 4-byte groups per channel, interleaved, low nibble first
        per_ch = len(nibbles[0])
        for g in range(0, per_ch, 8):
            for c in range(channels):
                grp = nibbles[c][g:g + 8] + [0] * max(0, 8 - (per_ch - g))
                for j in range(0, 8, 2):
                    out.append(grp[j] | (grp[j + 1] << 4))
    return _wav_container(0x11, channels, rate, block_align, 4,
                          bytes(out))


# --------------------------------------------------------------------------
# AVI (RIFF, uncompressed DIB frames) — the video leg
# --------------------------------------------------------------------------

_MJPEG_FOURCC = (b"MJPG", b"mjpg", b"dmb1")


def decode_avi(raw: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/AVI to ((n_frames, h, w, 3) uint8 array,
    micros_per_frame). Real paths: uncompressed 24-bit DIB '00db' frames
    (bottom-up BGR like BMP) and Motion-JPEG ('MJPG' handler, one
    baseline JPEG per '00dc' chunk, decoded via jpegcodec). Any other
    compressed handler raises NotImplementedError."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    w = h = None
    us_per_frame = 0
    handler = b"\x00\x00\x00\x00"
    frames: list[np.ndarray] = []
    cframes: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal w, h, us_per_frame, handler
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
                if body[:4] == b"vids":
                    handler = body[4:8]
                    if handler not in (b"DIB ", b"\x00\x00\x00\x00",
                                       *_MJPEG_FOURCC):
                        raise NotImplementedError(
                            f"AVI: compressed video handler {handler!r}")
            elif cid in (b"00db", b"01db"):
                frames.append(np.frombuffer(body, dtype=np.uint8))
            elif cid in (b"00dc", b"01dc"):
                cframes.append(bytes(body))

    walk(raw[12:])
    if w is None or h is None or not (frames or cframes):
        raise ValueError("AVI: missing avih header or frames")
    if cframes:
        if handler not in _MJPEG_FOURCC:
            raise NotImplementedError(
                f"AVI: compressed frame chunk (handler {handler!r})")
        from .jpegcodec import decode_jpeg
        out = np.zeros((len(cframes), h, w, 3), dtype=np.uint8)
        for f, blob in enumerate(cframes):
            px = decode_jpeg(blob)                   # (fh, fw, 1|3) top-down
            if px.shape[2] == 1:
                px = np.repeat(px, 3, axis=2)
            fh, fw = min(px.shape[0], h), min(px.shape[1], w)
            out[f, :fh, :fw] = px[:fh, :fw]
        return out, us_per_frame
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


def encode_mjpeg_avi(frames: np.ndarray, us_per_frame: int = 40_000,
                     **jpeg_kwargs) -> bytes:
    """Motion-JPEG AVI writer: (n, h, w, 3) uint8 RGB or (n, h, w)
    grayscale frames, each a baseline JPEG (jpegcodec.encode_jpeg, extra
    kwargs passed through — e.g. quant_luma) in a '00dc' chunk with an
    'MJPG' vids stream header."""
    from .jpegcodec import encode_jpeg
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        n, h, w = frames.shape
    else:
        n, h, w, _ = frames.shape

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<IIIIIIIIII", us_per_frame, w * h * 25, 0,
                       0x10, n, 0, 1, w * h * 3, w, h) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            us_per_frame, 1_000_000, 0, n,
                                            w * h * 3, 0, 0)
            + struct.pack("<hhhh", 0, 0, w, h))
    strf = struct.pack("<IiiHHII", 40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
                       w * h * 3) + struct.pack("<iiII", 0, 0, 0, 0)
    movi_body = b"".join(chunk(b"00dc", encode_jpeg(frames[f],
                                                    **jpeg_kwargs))
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
    Baseline, extended-sequential and progressive Huffman JPEG decode
    for real (jpegcodec.py, pure numpy); arithmetic JPEG and video
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
