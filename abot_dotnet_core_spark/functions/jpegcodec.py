"""Pure-numpy baseline JPEG codec (ITU-T.81 / ISO 10918-1, public spec).

Baseline sequential DCT, Huffman entropy coding, 8-bit precision:
grayscale (1 component) and YCbCr color (3 components, 4:4:4 or 4:2:0).
No codec library exists in this environment (no PIL/libjpeg/ffmpeg), so
this implements the published standard from scratch: canonical Huffman
code construction (Annex C), zigzag ordering (Figure 5), the Annex K
example quantization/Huffman tables, byte stuffing + restart markers
(F.1.2.3), and an orthonormal matrix IDCT (A.3.3) batched per component
through one numpy matmul.

Honest limits (each raises NotImplementedError): arithmetic coding
(SOF9+), 12-bit precision, 16-bit quant tables, hierarchical modes.
Baseline (SOF0), extended sequential (SOF1) and progressive (SOF2 —
spectral selection + successive approximation, Annex G.1.2) Huffman
decode for real.

Exactness contract used by the catalog oracle: a flat 8x8 block round-
trips bit-exactly whenever the DC quantizer divides 8*(v-128) (all-ones
tables always do) — the DCT of a constant block is DC-only, and DC-only
IDCT is constant with no float error. General photographic content is
lossy like any JPEG; tests bound it against an independent per-pixel
reference IDCT.

Reference behavior cited from Abot's media handling: the reference
crawler (Abot/src/Abot, CrawledPage.cs) carries page bytes opaquely and
never decodes media — decode here serves the multimodal pipeline
operators (functions/multimodal.py), not crawl parity.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# spec constants
# --------------------------------------------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1 example quantization tables (natural order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 example Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: coef = A @ block @ A.T,
    block = A.T @ coef @ A."""
    x = np.arange(8, dtype=np.float64)
    u = x[:, None]
    a = np.cos((2 * x[None, :] + 1) * u * np.pi / 16) / 2.0
    a[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return a


_A = _dct_matrix()


# --------------------------------------------------------------------------
# canonical Huffman (Annex C)
# --------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# --------------------------------------------------------------------------
# bit I/O with byte stuffing
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:               # byte stuffing (F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """Reads the entropy-coded segment: un-stuffs FF00, byte-aligns and
    resets at RSTn markers, stops at any other marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d, p = self.data, self.pos
        while p < len(d):
            b = d[p]
            if b == 0xFF:
                nxt = d[p + 1] if p + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos = p + 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    return True
                self.marker = nxt        # RSTn / EOI / next segment
                return False
            self.pos = p + 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
            return True
        return False

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0                      # spec: pad past marker with 0s
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def sync_restart(self, n: int) -> None:
        """Discard pad bits, consume the expected RSTn marker, realign.
        _fill leaves pos AT the marker's FF byte when it stops on one."""
        self.acc = 0
        self.nbits = 0
        self.marker = None
        d, p = self.data, self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        if p + 1 >= len(d) or not (0xD0 <= d[p + 1] <= 0xD7):
            raise ValueError("JPEG: expected restart marker")
        if (d[p + 1] - 0xD0) != (n & 7):
            raise ValueError("JPEG: restart marker out of sequence")
        self.pos = p + 2


def _extend(v: int, t: int) -> int:
    """DIFF/AC value extension (F.2.2.1): map t-bit magnitude to signed."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Bit size of |v| (0 for 0)."""
    return int(abs(v)).bit_length()


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _fdct_quant(blocks: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """blocks (n,8,8) float64 level-shifted -> quantized coefs (n,64) int,
    natural order."""
    coef = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)
    q = quant.reshape(8, 8).astype(np.float64)
    return np.round(coef / q).astype(np.int64).reshape(-1, 64)


def _encode_block(w: _BitWriter, coef64: np.ndarray, dc_pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Huffman-encode one quantized block (natural order). Returns new DC."""
    zz = coef64[ZIGZAG]
    dc = int(zz[0])
    diff = dc - dc_pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]    # ZRL
            w.write(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_codes[(run << 4) | t]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]        # EOB
        w.write(code, ln)
    return dc


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """Pad a (h,w) float plane to 8-multiples by edge replication and
    return (n_blocks, 8, 8) in raster block order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (plane.reshape(hh // 8, 8, ww // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _subsample_factors(subsample) -> tuple[int, int]:
    """Luma sampling factors (h, v) for a ``subsample`` argument:
    False/None -> 4:4:4, True/'420' -> 4:2:0, '422' -> 4:2:2."""
    if subsample in (False, None):
        return 1, 1
    if subsample in (True, "420"):
        return 2, 2
    if subsample == "422":
        return 2, 1
    raise ValueError(f"JPEG: unknown subsampling {subsample!r}")


def encode_jpeg(px: np.ndarray, quant_luma: np.ndarray | None = None,
                quant_chroma: np.ndarray | None = None,
                subsample=False, restart_interval: int = 0,
                interleave: bool = True) -> bytes:
    """Baseline JFIF writer. ``px`` is (h, w) / (h, w, 1) grayscale or
    (h, w, 3) RGB. ``subsample`` is False (4:4:4), True/'420' (2x2
    chroma) or '422' (2x1 chroma); quant tables default to Annex K
    (natural order, 64 ints). ``restart_interval`` (grayscale path only)
    emits DRI + RSTn markers every that many MCUs. ``interleave=False``
    (color only) writes one non-interleaved scan per component — the
    T.81 multi-scan sequential layout — instead of a single interleaved
    scan."""
    px = np.asarray(px)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("JPEG: empty image")
    sh_, sv_ = (1, 1) if gray else _subsample_factors(subsample)
    ql = (QUANT_LUMA if quant_luma is None
          else np.asarray(quant_luma, dtype=np.int64))
    qc = (QUANT_CHROMA if quant_chroma is None
          else np.asarray(quant_chroma, dtype=np.int64))

    out = bytearray(b"\xff\xd8")                       # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))

    def seg(marker: bytes, body: bytes) -> None:
        out.extend(marker + struct.pack(">H", len(body) + 2) + body)

    seg(b"\xff\xdb", bytes([0]) + bytes(int(x) for x in ql[ZIGZAG]))
    if not gray:
        seg(b"\xff\xdb", bytes([1]) + bytes(int(x) for x in qc[ZIGZAG]))

    # SOF0
    if gray:
        comps = bytes([1, 0x11, 0])
        ncomp = 1
    else:
        samp = (sh_ << 4) | sv_
        comps = bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1])
        ncomp = 3
    seg(b"\xff\xc0", bytes([8]) + struct.pack(">HH", h, w)
        + bytes([ncomp]) + comps)

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> None:
        seg(b"\xff\xc4", bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval and gray:
        seg(b"\xff\xdd", struct.pack(">H", restart_interval))

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        seg(b"\xff\xda", bytes([1, 1, 0x00]) + bytes([0, 63, 0]))
        bw = _BitWriter()
        blocks = _blocks_of(px.astype(np.float64) - 128.0)
        coefs = _fdct_quant(blocks, ql)
        pred = 0
        n_rst = 0
        for i in range(coefs.shape[0]):
            if (restart_interval and i
                    and i % restart_interval == 0):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (n_rst & 7)])
                n_rst += 1
                pred = 0
            pred = _encode_block(bw, coefs[i], pred, dc_l, ac_l)
        bw.flush()
        out += bw.out
        out += b"\xff\xd9"                             # EOI
        return bytes(out)

    ycc = _rgb_to_ycbcr(px)
    yp = ycc[..., 0] - 128.0
    if (sh_, sv_) != (1, 1):
        # subsample chroma by (sv_ x sh_) mean over the MCU-padded image
        mh, mw = -h % (8 * sv_), -w % (8 * sh_)
        ypad = np.pad(yp, ((0, mh), (0, mw)), mode="edge")
        cbp = np.pad(ycc[..., 1], ((0, mh), (0, mw)), mode="edge")
        crp = np.pad(ycc[..., 2], ((0, mh), (0, mw)), mode="edge")
        cb = cbp.reshape(cbp.shape[0] // sv_, sv_,
                         cbp.shape[1] // sh_, sh_).mean(axis=(1, 3)) - 128.0
        cr = crp.reshape(crp.shape[0] // sv_, sv_,
                         crp.shape[1] // sh_, sh_).mean(axis=(1, 3)) - 128.0
    else:
        ypad = yp
        cb = ycc[..., 1] - 128.0
        cr = ycc[..., 2] - 128.0

    if interleave:
        seg(b"\xff\xda",
            bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0]))
        bw = _BitWriter()
        yc = _fdct_quant(_blocks_of(ypad), ql)
        nbr = -(-ypad.shape[0] // 8)
        nbc = -(-ypad.shape[1] // 8)
        yc = yc.reshape(nbr, nbc, 64)
        ny, nx = nbr // sv_, nbc // sh_
        cbc = _fdct_quant(_blocks_of(cb), qc).reshape(ny, nx, 64)
        crc = _fdct_quant(_blocks_of(cr), qc).reshape(ny, nx, 64)
        py = pcb = pcr = 0
        for my in range(ny):
            for mx in range(nx):
                for by in range(sv_):
                    for bx in range(sh_):
                        py = _encode_block(
                            bw, yc[my * sv_ + by, mx * sh_ + bx],
                            py, dc_l, ac_l)
                pcb = _encode_block(bw, cbc[my, mx], pcb, dc_c, ac_c)
                pcr = _encode_block(bw, crc[my, mx], pcr, dc_c, ac_c)
        bw.flush()
        out += bw.out
    else:
        # one non-interleaved scan per component, each over the
        # component's real (unpadded) block grid in raster order, DC
        # predictor reset per scan (T.81 multi-scan sequential layout)
        for plane, q, dcod, acod, cid in (
                (yp, ql, dc_l, ac_l, 1),
                (cb, qc, dc_c, ac_c, 2),
                (cr, qc, dc_c, ac_c, 3)):
            td_ta = 0x00 if cid == 1 else 0x11
            seg(b"\xff\xda", bytes([1, cid, td_ta]) + bytes([0, 63, 0]))
            bw = _BitWriter()
            coefs = _fdct_quant(_blocks_of(plane), q)
            pred = 0
            for i in range(coefs.shape[0]):
                pred = _encode_block(bw, coefs[i], pred, dcod, acod)
            bw.flush()
            out += bw.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def decode_jpeg(raw: bytes) -> np.ndarray:
    """Decode a baseline, extended-sequential or progressive (SOF2)
    Huffman JPEG to (h, w, 1) grayscale or (h, w, 3) RGB uint8.
    Arithmetic/12-bit raise NotImplementedError; malformed input raises
    ValueError."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    prog = None
    seq_planes: dict[int, np.ndarray] = {}
    restart_interval = 0
    n = len(raw)
    while pos + 4 <= n:
        if raw[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:                             # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                                   # standalone
        (seglen,) = struct.unpack(">H", raw[pos:pos + 2])
        if seglen < 2:          # would walk pos backwards: corrupt header
            raise ValueError("JPEG: bad segment length")
        body = raw[pos + 2:pos + seglen]
        end = pos + seglen
        if marker == 0xDB:                             # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant table")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=bpos + 1)
                qt[tq] = tbl
                bpos += 65
        elif marker == 0xC4:                           # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1:bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17:bpos + 17 + nv])
                tbl = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                bpos += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):             # SOF0/SOF1/SOF2
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("JPEG: 12-bit precision")
            fh, fw = struct.unpack(">HH", body[1:5])
            if fh == 0 or fw == 0:
                raise ValueError("JPEG: zero frame dimension")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                ch, cv = samp >> 4, samp & 0x0F
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError("JPEG: bad sampling factors")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: unsupported frame type SOF{marker - 0xC0}")
        elif marker == 0xDD:                           # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                           # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scomps = []
            for c in range(ns):
                cs, tda = body[1 + 2 * c:3 + 2 * c]
                comp = next((x for x in frame["comps"] if x["id"] == cs),
                            None)
                if comp is None:
                    raise ValueError("JPEG: scan references unknown comp")
                scomps.append((comp, tda >> 4, tda & 0x0F))
            # MJPEG convention: frames may omit DHT entirely; decoders
            # supply the ITU T.81 Annex K typical tables (table 0 = luma,
            # table 1 = chroma) for any id the scan references but no DHT
            # defined (OpenDML AVI spec / RFC 2435 §4.2).
            for _comp, td, ta in scomps:
                if td not in huff_dc:
                    huff_dc[td] = _build_decode_table(
                        *((DC_LUMA_BITS, DC_LUMA_VALS) if td == 0
                          else (DC_CHROMA_BITS, DC_CHROMA_VALS)))
                if ta not in huff_ac:
                    huff_ac[ta] = _build_decode_table(
                        *((AC_LUMA_BITS, AC_LUMA_VALS) if ta == 0
                          else (AC_CHROMA_BITS, AC_CHROMA_VALS)))
            if frame.get("progressive"):
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
                if prog is None:
                    prog = _prog_alloc(frame)
                br = _BitReader(raw, end)
                if ss == 0:
                    if se != 0:
                        raise ValueError("JPEG: bad DC spectral range")
                    _prog_dc_scan(br, prog, scomps, huff_dc, ah, al,
                                  restart_interval)
                else:
                    _prog_ac_scan(br, prog, scomps, huff_ac, ss, se,
                                  ah, al, restart_interval)
                # resume the marker loop at the next true marker (skip
                # residual pad bytes / stuffed FF00 the scan left behind)
                p = br.pos
                while p + 1 < n and not (raw[p] == 0xFF
                                         and raw[p + 1] != 0x00):
                    p += 1
                pos = p
                continue
            # Sequential frames may split components across several
            # non-interleaved scans (T.81 allows any partition of the
            # frame's components into scans): accumulate planes until
            # every frame component has been decoded.
            planes, spos = _decode_scan(raw, end, frame, scomps, qt,
                                        huff_dc, huff_ac, restart_interval)
            seq_planes.update(planes)
            if all(c["id"] in seq_planes for c in frame["comps"]):
                return _assemble(frame, seq_planes)
            p = spos
            while p + 1 < n and not (raw[p] == 0xFF
                                     and raw[p + 1] != 0x00):
                p += 1
            pos = p
            continue
        # else: APPn/COM/unknown -> skip
        pos = end
    if prog is not None:
        return _prog_finish(frame, prog, qt)
    if seq_planes:
        raise ValueError("JPEG: missing component scans")
    raise ValueError("JPEG: no scan data")


def _decode_scan(raw: bytes, pos: int, frame: dict, scomps: list,
                 qt: dict, huff_dc: dict, huff_ac: dict,
                 restart_interval: int) -> tuple[dict, int]:
    """Decode one sequential scan; returns (planes for the scan's
    components, stream position after the entropy-coded segment)."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    for c in frame["comps"]:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError("JPEG: bad sampling factors")
    # per-component coefficient storage (block grid padded to MCU size)
    store: dict[int, np.ndarray] = {}
    grids: dict[int, tuple[int, int]] = {}
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    interleaved = len(scomps) > 1
    for comp, _, _ in scomps:
        cid = comp["id"]
        if interleaved:
            bw_, bh_ = mcux * comp["h"], mcuy * comp["v"]
        else:
            cw = (w * comp["h"] + hmax - 1) // hmax
            ch = (h * comp["v"] + vmax - 1) // vmax
            bw_, bh_ = (cw + 7) // 8, (ch + 7) // 8
        grids[cid] = (bh_, bw_)
        store[cid] = np.zeros((bh_ * bw_, 64), dtype=np.int64)

    br = _BitReader(raw, pos)
    preds = {comp["id"]: 0 for comp, _, _ in scomps}
    zz_inv = ZIGZAG  # zz index k -> natural position

    def read_block(comp, td, ta) -> np.ndarray:
        dct = huff_dc.get(td)
        act = huff_ac.get(ta)
        if dct is None or act is None:
            raise ValueError("JPEG: missing Huffman table")
        coef = np.zeros(64, dtype=np.int64)
        t = br.decode_symbol(dct)
        if t > 15:
            raise ValueError("JPEG: bad DC category")
        diff = _extend(br.receive(t), t)
        preds[comp["id"]] += diff
        coef[0] = preds[comp["id"]]
        k = 1
        while k <= 63:
            rs = br.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break                                   # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG: AC index out of range")
            coef[zz_inv[k]] = _extend(br.receive(s), s)
            k += 1
        return coef

    n_restart = 0
    mcus_done = 0
    if interleaved:
        total_mcus = mcux * mcuy
        for m in range(total_mcus):
            if restart_interval and mcus_done == restart_interval:
                br.sync_restart(n_restart)
                n_restart += 1
                mcus_done = 0
                for comp, _, _ in scomps:
                    preds[comp["id"]] = 0
            my, mx = divmod(m, mcux)
            for comp, td, ta in scomps:
                cid = comp["id"]
                bh_, bw_ = grids[cid]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        store[cid][row * bw_ + col] = read_block(
                            comp, td, ta)
            mcus_done += 1
    else:
        comp, td, ta = scomps[0]
        cid = comp["id"]
        bh_, bw_ = grids[cid]
        for i in range(bh_ * bw_):
            if restart_interval and mcus_done == restart_interval:
                br.sync_restart(n_restart)
                n_restart += 1
                mcus_done = 0
                preds[cid] = 0
            store[cid][i] = read_block(comp, td, ta)
            mcus_done += 1

    # dequantize + IDCT, batched per component
    planes = {}
    for comp, _, _ in scomps:
        cid = comp["id"]
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError("JPEG: missing quant table")
        bh_, bw_ = grids[cid]
        coefs = (store[cid] * q).reshape(-1, 8, 8).astype(np.float64)
        blocks = np.einsum("xu,nuv,yv->nxy", _A.T, coefs, _A.T)
        plane = (blocks.reshape(bh_, bw_, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8))
        plane = np.clip(np.round(plane + 128.0), 0, 255)
        planes[cid] = plane
    return planes, br.pos


# --------------------------------------------------------------------------
# progressive (SOF2) — spectral selection + successive approximation,
# T.81 Annex G.1.2 / the classic jdphuff control structure
# --------------------------------------------------------------------------

# Progressive AC scans need EOBn symbols (n = run-length category of an
# end-of-band run), which the Annex K typical tables do not contain —
# real encoders ship custom tables for progressive. This fixed table
# gives every symbol the writer can emit an 8-bit code: 15 EOBn, ZRL,
# and (run, size) pairs for size 1-10 = 176 codes (the all-ones 8-bit
# code stays unused, as T.81 requires).
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
AC_PROG_VALS = ([r << 4 for r in range(15)] + [0xF0]
                + [(r << 4) | s for r in range(16) for s in range(1, 11)])


def _emit_eobrun(w: _BitWriter, ac: dict, eobrun: int,
                 be_bits: list[int]) -> None:
    """Flush a pending end-of-band run + its deferred correction bits."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, ln = ac[nbits << 4]
        w.write(code, ln)
        if nbits:
            w.write(eobrun - (1 << nbits), nbits)
    for b in be_bits:
        w.write(b, 1)


def _rst(w: _BitWriter, n_rst: int) -> int:
    """Byte-align and emit RSTn between restart intervals."""
    w.flush()
    w.out += bytes([0xFF, 0xD0 + (n_rst & 7)])
    return n_rst + 1


def _enc_ac_first(w: _BitWriter, ac: dict, zz_blocks: list[np.ndarray],
                  ss: int, se: int, al: int, restart: int = 0) -> None:
    """First AC scan of a band (Ah=0): magnitudes >> Al, EOB-run coded."""
    eobrun = 0
    n_rst = 0
    for bi, zz in enumerate(zz_blocks):
        if restart and bi and bi % restart == 0:
            if eobrun:
                _emit_eobrun(w, ac, eobrun, [])
                eobrun = 0
            n_rst = _rst(w, n_rst)
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = (-v if v < 0 else v) >> al
            if t == 0:
                r += 1
                continue
            if eobrun:
                _emit_eobrun(w, ac, eobrun, [])
                eobrun = 0
            while r > 15:
                code, ln = ac[0xF0]
                w.write(code, ln)
                r -= 16
            s = t.bit_length()
            code, ln = ac[(r << 4) | s]
            w.write(code, ln)
            w.write((t if v >= 0 else ~t) & ((1 << s) - 1), s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                _emit_eobrun(w, ac, eobrun, [])
                eobrun = 0
    if eobrun:
        _emit_eobrun(w, ac, eobrun, [])


def _enc_ac_refine(w: _BitWriter, ac: dict, zz_blocks: list[np.ndarray],
                   ss: int, se: int, al: int, restart: int = 0) -> None:
    """AC refinement scan (Ah=Al+1): newly-significant coefs become
    (run, 1) symbols + sign, already-nonzero coefs ride as correction
    bits — deferred across EOB runs exactly as jcphuff buffers them."""
    eobrun = 0
    n_rst = 0
    be: list[int] = []
    for bi, zz in enumerate(zz_blocks):
        if restart and bi and bi % restart == 0:
            if eobrun or be:
                _emit_eobrun(w, ac, eobrun, be)
                eobrun, be = 0, []
            n_rst = _rst(w, n_rst)
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = 0                     # 1 + relative index of last new coef
        for j, t in enumerate(absv):
            if t == 1:
                eob = j + 1
        r = 0
        pend: list[int] = []
        for j, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and j < eob:   # ZRL not foldable into the EOB
                _emit_eobrun(w, ac, eobrun, be)
                eobrun, be = 0, []
                code, ln = ac[0xF0]
                w.write(code, ln)
                r -= 16
                for b in pend:
                    w.write(b, 1)
                pend = []
            if t > 1:                   # visible before: correction bit
                pend.append(t & 1)
                continue
            _emit_eobrun(w, ac, eobrun, be)
            eobrun, be = 0, []
            code, ln = ac[(r << 4) | 1]
            w.write(code, ln)
            w.write(0 if int(zz[ss + j]) < 0 else 1, 1)
            for b in pend:
                w.write(b, 1)
            pend = []
            r = 0
        if r > 0 or pend:
            eobrun += 1
            be.extend(pend)
            if eobrun == 0x7FFF or len(be) > 900:
                _emit_eobrun(w, ac, eobrun, be)
                eobrun, be = 0, []
    if eobrun or be:
        _emit_eobrun(w, ac, eobrun, be)


def encode_jpeg_progressive(px: np.ndarray,
                            quant_luma: np.ndarray | None = None,
                            quant_chroma: np.ndarray | None = None,
                            subsample: bool = False,
                            restart_interval: int = 0) -> bytes:
    """Progressive (SOF2) JFIF writer — grayscale, 4:4:4 or 4:2:0 color.
    Scan script: DC first (Al=1), per-component spectral-selection AC
    first scans (Al=1), DC refinement, per-component AC refinements
    (Al=0) — one successive-approximation level, exercising every decode
    path. ``restart_interval`` (grayscale only, like encode_jpeg) emits
    DRI + RSTn in every scan. Encodes the SAME quantized coefficients as
    ``encode_jpeg`` with the same options, so both decodes are
    pixel-identical on the visible region."""
    px = np.asarray(px)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("JPEG: empty image")
    ql = (QUANT_LUMA if quant_luma is None
          else np.asarray(quant_luma, dtype=np.int64))
    qc = (QUANT_CHROMA if quant_chroma is None
          else np.asarray(quant_chroma, dtype=np.int64))

    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))

    def seg(marker: bytes, body: bytes) -> None:
        out.extend(marker + struct.pack(">H", len(body) + 2) + body)

    seg(b"\xff\xdb", bytes([0]) + bytes(int(x) for x in ql[ZIGZAG]))
    if not gray:
        seg(b"\xff\xdb", bytes([1]) + bytes(int(x) for x in qc[ZIGZAG]))
    if gray:
        comps, ncomp = bytes([1, 0x11, 0]), 1
    else:
        samp = 0x22 if subsample else 0x11
        comps, ncomp = bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]), 3
    seg(b"\xff\xc2", bytes([8]) + struct.pack(">HH", h, w)
        + bytes([ncomp]) + comps)

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> None:
        seg(b"\xff\xc4", bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    dht(1, 0, AC_PROG_BITS, AC_PROG_VALS)
    if not gray:
        dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    rst = restart_interval if gray else 0
    if rst:
        seg(b"\xff\xdd", struct.pack(">H", rst))

    # Per component: zigzag blocks over the MCU-PADDED grid (gh, gw),
    # plus the REAL grid (rh, rw) non-interleaved AC scans cover. For
    # gray/4:4:4 the two grids coincide; for 4:2:0 luma the padded grid
    # can be wider (image dims not multiples of 16) and chroma's real
    # grid always equals its padded one (ceil(ceil(h/2)/8) == ceil(h/16)).
    comp_zz: list[list[np.ndarray]] = []
    grids: list[tuple[int, int]] = []
    reals: list[tuple[int, int]] = []
    sampling: list[tuple[int, int]] = []
    if gray:
        coefs = _fdct_quant(_blocks_of(px.astype(np.float64) - 128.0), ql)
        comp_zz.append([coefs[i][ZIGZAG] for i in range(coefs.shape[0])])
        g = ((h + 7) // 8, (w + 7) // 8)
        grids.append(g)
        reals.append(g)
        sampling.append((1, 1))
    else:
        ycc = _rgb_to_ycbcr(px)
        if subsample:
            mh, mw = -h % 16, -w % 16
            ypad = np.pad(ycc[..., 0] - 128.0, ((0, mh), (0, mw)),
                          mode="edge")
            cbp = np.pad(ycc[..., 1], ((0, mh), (0, mw)), mode="edge")
            crp = np.pad(ycc[..., 2], ((0, mh), (0, mw)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3)) - 128.0
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3)) - 128.0
            for plane, q, sf in ((ypad, ql, (2, 2)), (cb, qc, (1, 1)),
                                 (cr, qc, (1, 1))):
                coefs = _fdct_quant(_blocks_of(plane), q)
                comp_zz.append([coefs[i][ZIGZAG]
                                for i in range(coefs.shape[0])])
                grids.append((plane.shape[0] // 8, plane.shape[1] // 8))
                sampling.append(sf)
            reals = [((h + 7) // 8, (w + 7) // 8),
                     grids[1], grids[2]]
        else:
            for band, q in ((0, ql), (1, qc), (2, qc)):
                coefs = _fdct_quant(
                    _blocks_of(ycc[..., band] - 128.0), q)
                comp_zz.append([coefs[i][ZIGZAG]
                                for i in range(coefs.shape[0])])
                g = ((h + 7) // 8, (w + 7) // 8)
                grids.append(g)
                sampling.append((1, 1))
            reals = list(grids)

    dc_codes = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    if not gray:
        dcc = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        dc_codes += [dcc, dcc]
    ac = _build_codes(AC_PROG_BITS, AC_PROG_VALS)

    def sos(scomps: list[tuple[int, int, int]], ss: int, se: int,
            ah: int, al: int) -> None:
        body = bytes([len(scomps)])
        for cid, td, ta in scomps:
            body += bytes([cid, (td << 4) | ta])
        seg(b"\xff\xda", body + bytes([ss, se, (ah << 4) | al]))

    # MCU-interleaved DC block order: (comp, padded-grid index) pairs
    vmax = max(v for v, _ in sampling)
    hmax = max(hh for _, hh in sampling)
    mcuy = (grids[0][0] + sampling[0][0] - 1) // sampling[0][0] \
        if gray else (h + 8 * vmax - 1) // (8 * vmax)
    mcux = (grids[0][1] + sampling[0][1] - 1) // sampling[0][1] \
        if gray else (w + 8 * hmax - 1) // (8 * hmax)
    dc_order: list[list[tuple[int, int]]] = []      # per MCU
    for my in range(mcuy):
        for mx in range(mcux):
            mcu = []
            for c in range(ncomp):
                v, hh = sampling[c]
                _, gw = grids[c]
                for by in range(v):
                    for bx in range(hh):
                        mcu.append((c, (my * v + by) * gw
                                    + mx * hh + bx))
            dc_order.append(mcu)

    def real_blocks(c: int) -> list[np.ndarray]:
        rh, rw = reals[c]
        _, gw = grids[c]
        return [comp_zz[c][r * gw + col]
                for r in range(rh) for col in range(rw)]

    # scan 1: DC first (interleaved over MCUs)
    sos([(c + 1, (1 if c and not gray else 0), 0)
         for c in range(ncomp)], 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * ncomp
    n_rst = 0
    for mi, mcu in enumerate(dc_order):
        if rst and mi and mi % rst == 0:
            n_rst = _rst(bw, n_rst)
            preds = [0] * ncomp
        for c, idx in mcu:
            temp = int(comp_zz[c][idx][0]) >> 1
            diff = temp - preds[c]
            preds[c] = temp
            t = _category(diff)
            code, ln = dc_codes[c][t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bw.flush()
    out += bw.out

    # AC first scans per component (luma in two spectral bands)
    bands = {0: [(1, 5), (6, 63)]}
    for c in range(ncomp):
        for ss, se in bands.get(c, [(1, 63)]):
            sos([(c + 1, 0, 0)], ss, se, 0, 1)
            bw = _BitWriter()
            _enc_ac_first(bw, ac, real_blocks(c), ss, se, 1, restart=rst)
            bw.flush()
            out += bw.out

    # DC refinement (interleaved, one bit per block)
    sos([(c + 1, 0, 0) for c in range(ncomp)], 0, 0, 1, 0)
    bw = _BitWriter()
    n_rst = 0
    for mi, mcu in enumerate(dc_order):
        if rst and mi and mi % rst == 0:
            n_rst = _rst(bw, n_rst)
        for c, idx in mcu:
            bw.write(int(comp_zz[c][idx][0]) & 1, 1)
    bw.flush()
    out += bw.out

    # AC refinement scans
    for c in range(ncomp):
        for ss, se in bands.get(c, [(1, 63)]):
            sos([(c + 1, 0, 0)], ss, se, 1, 0)
            bw = _BitWriter()
            _enc_ac_refine(bw, ac, real_blocks(c), ss, se, 0, restart=rst)
            bw.flush()
            out += bw.out

    out += b"\xff\xd9"
    return bytes(out)

def _prog_alloc(frame: dict) -> dict:
    """Per-component coefficient stores for a progressive frame: padded to
    the MCU grid (interleaved DC scans cover padding blocks), with the
    real (unpadded) block counts used by non-interleaved scans."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    store, meta = {}, {}
    for c in comps:
        bwp, bhp = mcux * c["h"], mcuy * c["v"]
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        bwr, bhr = (cw + 7) // 8, (ch + 7) // 8
        store[c["id"]] = np.zeros((bhp * bwp, 64), dtype=np.int64)
        meta[c["id"]] = (bhp, bwp, bhr, bwr)
    return {"store": store, "meta": meta, "mcux": mcux, "mcuy": mcuy}


def _prog_dc_scan(br: _BitReader, prog: dict, scomps: list, huff_dc: dict,
                  ah: int, al: int, restart_interval: int) -> None:
    store, meta = prog["store"], prog["meta"]
    preds = {comp["id"]: 0 for comp, _, _ in scomps}

    def dc_block(comp, td, idx):
        blk = store[comp["id"]][idx]
        if ah == 0:                                    # first scan
            tbl = huff_dc.get(td)
            if tbl is None:
                raise ValueError("JPEG: missing Huffman table")
            t = br.decode_symbol(tbl)
            if t > 15:
                raise ValueError("JPEG: bad DC category")
            preds[comp["id"]] += _extend(br.receive(t), t)
            blk[0] = preds[comp["id"]] << al
        elif br.read_bit():                            # refinement bit
            blk[0] |= 1 << al

    n_rst = units = 0
    if len(scomps) > 1:                                # interleaved MCUs
        mcux, mcuy = prog["mcux"], prog["mcuy"]
        for m in range(mcux * mcuy):
            if restart_interval and units == restart_interval:
                br.sync_restart(n_rst)
                n_rst += 1
                units = 0
                for comp, _, _ in scomps:
                    preds[comp["id"]] = 0
            my, mx = divmod(m, mcux)
            for comp, td, _ in scomps:
                _, bwp, _, _ = meta[comp["id"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        dc_block(comp, td,
                                 (my * comp["v"] + by) * bwp
                                 + mx * comp["h"] + bx)
            units += 1
    else:                                              # single component
        comp, td, _ = scomps[0]
        _, bwp, bhr, bwr = meta[comp["id"]]
        for i in range(bhr * bwr):
            if restart_interval and units == restart_interval:
                br.sync_restart(n_rst)
                n_rst += 1
                units = 0
                preds[comp["id"]] = 0
            dc_block(comp, td, (i // bwr) * bwp + i % bwr)
            units += 1


def _prog_ac_scan(br: _BitReader, prog: dict, scomps: list, huff_ac: dict,
                  ss: int, se: int, ah: int, al: int,
                  restart_interval: int) -> None:
    if len(scomps) != 1:
        raise ValueError("JPEG: progressive AC scan must be one component")
    comp, _, ta = scomps[0]
    act = huff_ac.get(ta)
    if act is None:
        raise ValueError("JPEG: missing Huffman table")
    blk_rows = prog["store"][comp["id"]]
    _, bwp, bhr, bwr = prog["meta"][comp["id"]]
    p1, m1 = 1 << al, -(1 << al)
    eobrun = 0

    def ac_first(blk):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = br.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:                            # EOBn
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.receive(r)
                    return
                k += 16                                # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG: AC index out of range")
            blk[ZIGZAG[k]] = _extend(br.receive(s), s) << al
            k += 1

    def ac_refine(blk):
        # G.1.2.3 / jdphuff decode_mcu_AC_refine: corrections ride along
        # while skipping runs, and continue through the EOB tail.
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = br.decode_symbol(act)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s:
                    if s != 1:
                        raise ValueError("JPEG: bad refinement magnitude")
                    val = p1 if br.read_bit() else m1
                elif r != 15:                          # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # advance over r zero-history coefs, correcting nonzeroes
                while k <= se:
                    pos = ZIGZAG[k]
                    if blk[pos] != 0:
                        if br.read_bit() and (blk[pos] & p1) == 0:
                            blk[pos] += p1 if blk[pos] >= 0 else m1
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if val and k <= se:
                    blk[ZIGZAG[k]] = val
                k += 1
        if eobrun > 0:
            while k <= se:                             # EOB tail corrections
                pos = ZIGZAG[k]
                if blk[pos] != 0:
                    if br.read_bit() and (blk[pos] & p1) == 0:
                        blk[pos] += p1 if blk[pos] >= 0 else m1
                k += 1
            eobrun -= 1

    decode = ac_first if ah == 0 else ac_refine
    n_rst = units = 0
    for i in range(bhr * bwr):
        if restart_interval and units == restart_interval:
            br.sync_restart(n_rst)
            n_rst += 1
            units = 0
            eobrun = 0
        decode(blk_rows[(i // bwr) * bwp + i % bwr])
        units += 1


def _prog_finish(frame: dict, prog: dict, qt: dict) -> np.ndarray:
    planes = {}
    for comp in frame["comps"]:
        cid = comp["id"]
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError("JPEG: missing quant table")
        bhp, bwp, _, _ = prog["meta"][cid]
        coefs = (prog["store"][cid] * q).reshape(-1, 8, 8).astype(np.float64)
        blocks = np.einsum("xu,nuv,yv->nxy", _A.T, coefs, _A.T)
        plane = (blocks.reshape(bhp, bwp, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bhp * 8, bwp * 8))
        planes[cid] = np.clip(np.round(plane + 128.0), 0, 255)
    return _assemble(frame, planes)


def _assemble(frame: dict, planes: dict) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(comps) == 1:
        plane = planes[comps[0]["id"]][:h, :w]
        return plane.astype(np.uint8)[:, :, None]
    if len(comps) != 3:
        raise NotImplementedError("JPEG: only 1- or 3-component frames")
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    y, cb, cr = (f.astype(np.float64) for f in full)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
