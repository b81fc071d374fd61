"""Baseline JPEG codec (functions/jpegcodec.py): transform correctness
against an independent naive IDCT, entropy-coding losslessness via tight
round-trip bounds, flat-tile bit-exactness (the catalog oracle contract),
subsampling/restart/odd-size handling, and honest failures."""

import math
import struct

import numpy as np
import pytest

from abot_dotnet_core_spark.functions import jpegcodec as J

ONES = np.ones(64, dtype=np.int64)


def _naive_idct(coef: np.ndarray) -> np.ndarray:
    """Straight-from-the-spec (A.3.3) double-loop IDCT — independent of
    the matrix implementation."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * coef[u, v]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            out[x, y] = s / 4
    return out


class TestTransforms:
    def test_matrix_idct_matches_spec_formula(self):
        rng = np.random.default_rng(1)
        coef = rng.integers(-200, 200, size=(8, 8)).astype(np.float64)
        via_matrix = J._A.T @ coef @ J._A
        assert np.allclose(via_matrix, _naive_idct(coef), atol=1e-9)

    def test_fdct_idct_inverse(self):
        rng = np.random.default_rng(2)
        block = rng.uniform(-128, 127, size=(1, 8, 8))
        coef = np.einsum("ux,nxy,vy->nuv", J._A, block, J._A)
        back = np.einsum("xu,nuv,yv->nxy", J._A.T, coef, J._A.T)
        assert np.allclose(back, block, atol=1e-9)

    def test_huffman_canonical_tables(self):
        # encode table and decode table must be inverse, for all 4 tables
        for bits, vals in [(J.DC_LUMA_BITS, J.DC_LUMA_VALS),
                           (J.AC_LUMA_BITS, J.AC_LUMA_VALS),
                           (J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
                           (J.AC_CHROMA_BITS, J.AC_CHROMA_VALS)]:
            enc = J._build_codes(bits, vals)
            dec = J._build_decode_table(bits, vals)
            assert len(enc) == len(vals) == len(dec)
            for sym, (code, ln) in enc.items():
                assert dec[(ln, code)] == sym

    def test_extend_category_inverse(self):
        for v in list(range(-300, 301)) + [-2047, 2047, -1024, 1016]:
            t = J._category(v)
            if v == 0:
                assert t == 0
                continue
            raw = v if v >= 0 else v + (1 << t) - 1
            assert J._extend(raw, t) == v


class TestRoundTrip:
    def test_flat_tiles_bit_exact(self):
        """The catalog-oracle contract: flat 8x8 blocks with all-ones
        quant round-trip EXACTLY (DC-only blocks, no float error)."""
        rng = np.random.default_rng(3)
        tiles = rng.integers(0, 256, size=(4, 5)).astype(np.uint8)
        img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
        dec = J.decode_jpeg(J.encode_jpeg(img, quant_luma=ONES))
        assert dec.shape == (32, 40, 1)
        assert np.array_equal(dec[:, :, 0], img)

    def test_gray_q1_within_one(self):
        """All-ones quant: the ONLY loss is FDCT/IDCT float rounding, so
        every pixel must come back within +-1 — this bound fails loudly if
        entropy coding drops or corrupts a single coefficient."""
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, size=(40, 56)).astype(np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg(img, quant_luma=ONES))
        assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 1

    def test_gray_default_tables_reasonable(self):
        x, y = np.arange(64), np.arange(48)
        img = ((np.add.outer(y * 2, x) % 200) + 20).astype(np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg(img))
        err = np.abs(dec[:, :, 0].astype(int) - img.astype(int))
        assert err.max() <= 12 and err.mean() < 2.5

    def test_color_444_q1(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(24, 40, 3)).astype(np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg(img, quant_luma=ONES,
                                          quant_chroma=ONES))
        assert dec.shape == img.shape
        # YCbCr forward/backward rounding costs a few counts, never more
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4

    def test_color_420_subsampled(self):
        # chroma-flat image: 4:2:0 averaging loses nothing
        img = np.zeros((32, 48, 3), np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = 90, 140, 200
        dec = J.decode_jpeg(J.encode_jpeg(img, quant_luma=ONES,
                                          quant_chroma=ONES,
                                          subsample=True))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1
        # luma detail survives subsampling (gray content in color frame)
        rng = np.random.default_rng(6)
        g = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
        img2 = np.stack([g, g, g], axis=-1)
        dec2 = J.decode_jpeg(J.encode_jpeg(img2, quant_luma=ONES,
                                           quant_chroma=ONES,
                                           subsample=True))
        assert np.abs(dec2.astype(int) - img2.astype(int)).max() <= 3

    def test_odd_sizes(self):
        rng = np.random.default_rng(7)
        for shape in [(1, 1), (7, 9), (13, 19), (8, 17)]:
            img = rng.integers(0, 256, size=shape).astype(np.uint8)
            dec = J.decode_jpeg(J.encode_jpeg(img, quant_luma=ONES))
            assert dec.shape == shape + (1,)
            assert np.abs(dec[:, :, 0].astype(int)
                          - img.astype(int)).max() <= 1
        img = rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
        assert J.decode_jpeg(J.encode_jpeg(img, subsample=True)).shape \
            == (17, 23, 3)

    def test_restart_markers(self):
        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, size=(32, 64)).astype(np.uint8)
        raw = J.encode_jpeg(img, quant_luma=ONES, restart_interval=5)
        assert b"\xff\xdd" in raw and b"\xff\xd0" in raw
        dec = J.decode_jpeg(raw)
        assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 1

    def test_byte_stuffing_survives(self):
        # an image tuned to emit many 0xFF entropy bytes still round-trips
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
        raw = J.encode_jpeg(img, quant_luma=ONES)
        assert b"\xff\x00" in raw  # stuffing actually exercised
        dec = J.decode_jpeg(raw)
        assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 1


class TestHonestFailures:
    def test_baseline_scan_in_progressive_frame_rejected(self):
        # SOF0 relabeled SOF2 leaves a full-band (Ss=0, Se=63) scan, which
        # is illegal for a progressive DC scan
        img = np.full((8, 8), 100, np.uint8)
        raw = J.encode_jpeg(img)
        patched = raw.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(ValueError, match="spectral"):
            J.decode_jpeg(patched)

    def test_16bit_quant_raises(self):
        img = np.full((8, 8), 100, np.uint8)
        raw = bytearray(J.encode_jpeg(img))
        i = raw.find(b"\xff\xdb")
        raw[i + 4] = 0x10  # Pq=1
        with pytest.raises(NotImplementedError, match="16-bit"):
            J.decode_jpeg(bytes(raw))

    def test_truncated_and_junk(self):
        img = np.full((16, 16), 77, np.uint8)
        raw = J.encode_jpeg(img)
        with pytest.raises((ValueError, struct.error)):
            J.decode_jpeg(raw[:20])
        with pytest.raises(ValueError):
            J.decode_jpeg(b"\x00\x01\x02")
        # zero segment length must raise, not loop forever
        bad = bytearray(raw)
        i = bad.find(b"\xff\xdb")
        bad[i + 2:i + 4] = b"\x00\x00"
        with pytest.raises(ValueError, match="segment length"):
            J.decode_jpeg(bytes(bad))

    def test_dispatch_and_meta(self, spark):
        """decode_image routes JPEG; decode_image_meta returns real stats
        for baseline JPEG and NULLs for a (patched) progressive one."""
        from pyspark.sql import Row
        from abot_dotnet_core_spark.functions.imagecodec import decode_image
        from abot_dotnet_core_spark.functions.multimodal import (
            decode_image_meta)
        tiles = np.array([[10, 200], [30, 90]], dtype=np.uint8)
        img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
        raw = J.encode_jpeg(img, quant_luma=ONES)
        assert np.array_equal(decode_image(raw)[:, :, 0], img)
        prog = raw.replace(b"\xff\xc0", b"\xff\xc2", 1)
        df = spark.createDataFrame([
            Row(media_id=0, payload=bytearray(raw)),
            Row(media_id=1, payload=bytearray(prog)),
        ])
        rows = {r["media_id"]: r for r in decode_image_meta(df).collect()}
        assert rows[0]["mime"] == "image/jpeg"
        assert (rows[0]["width"], rows[0]["height"],
                rows[0]["channels"]) == (16, 16, 1)
        want = (int(img.astype(np.int64).sum()) * 1000) // img.size
        assert rows[0]["mean_millis"] == want
        assert rows[1]["width"] is None  # progressive -> NULL, not a crash


class TestMjpegTableFallback:
    def test_missing_dht_uses_annex_k_defaults(self):
        """MJPEG frames commonly ship without DHT segments (RFC 2435
        convention); the decoder must fall back to the T.81 Annex K
        typical tables — which are exactly what encode_jpeg writes, so
        the stripped stream must decode identically."""
        import struct
        import numpy as np
        from abot_dotnet_core_spark.functions.jpegcodec import (
            decode_jpeg, encode_jpeg)
        px = (np.arange(24 * 16 * 3, dtype=np.int64) * 31 % 256) \
            .astype(np.uint8).reshape(24, 16, 3)
        raw = encode_jpeg(px)
        out, pos = bytearray(raw[:2]), 2
        while pos + 4 <= len(raw):
            marker = raw[pos + 1]
            if marker == 0xDA:
                out += raw[pos:]
                break
            (seglen,) = struct.unpack(">H", raw[pos + 2:pos + 4])
            if marker != 0xC4:                       # drop every DHT
                out += raw[pos:pos + 2 + seglen]
            pos += 2 + seglen
        stripped = bytes(out)
        assert len(stripped) < len(raw)
        assert (decode_jpeg(stripped) == decode_jpeg(raw)).all()


class TestProgressive:
    """SOF2: spectral selection + successive approximation (G.1.2)."""

    def test_parity_with_baseline_random(self):
        rng = np.random.default_rng(42)
        for h, w, gray in [(8, 8, True), (16, 24, True), (17, 9, True),
                           (8, 8, False), (24, 16, False), (33, 21, False)]:
            px = rng.integers(0, 256, (h, w) if gray else (h, w, 3),
                              dtype=np.uint8)
            base = J.decode_jpeg(J.encode_jpeg(px))
            prog = J.decode_jpeg(J.encode_jpeg_progressive(px))
            assert np.array_equal(base, prog), (h, w, gray)

    def test_parity_ones_quant_max_categories(self):
        rng = np.random.default_rng(3)
        ones = np.ones(64, dtype=np.int64)
        px = rng.integers(0, 256, (32, 24, 3), dtype=np.uint8)
        base = J.decode_jpeg(J.encode_jpeg(px, quant_luma=ones,
                                           quant_chroma=ones))
        prog = J.decode_jpeg(J.encode_jpeg_progressive(
            px, quant_luma=ones, quant_chroma=ones))
        assert np.array_equal(base, prog)

    def test_eob_run_and_zrl_paths(self):
        # mostly-flat with isolated spikes: long EOB runs across blocks,
        # ZRL inside blocks, corrections riding the runs in refinement
        px = np.full((128, 128), 128, np.uint8)
        px[::17, ::13] = 255
        base = J.decode_jpeg(J.encode_jpeg(px))
        prog = J.decode_jpeg(J.encode_jpeg_progressive(px))
        assert np.array_equal(base, prog)

    def test_flat_tiles_bit_exact(self):
        # DC-only blocks with ones quant: progressive decode recovers the
        # tile values exactly (the catalog-oracle exactness contract)
        ones = np.ones(64, dtype=np.int64)
        tiles = ((np.arange(12, dtype=np.int64) * 37) % 256) \
            .astype(np.uint8).reshape(3, 4)
        img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
        got = J.decode_jpeg(J.encode_jpeg_progressive(img, quant_luma=ones))
        assert np.array_equal(got[:, :, 0], img)

    def test_decodes_via_dispatch(self):
        from abot_dotnet_core_spark.functions.imagecodec import decode_image
        px = (np.arange(16 * 16, dtype=np.int64) * 7 % 256) \
            .astype(np.uint8).reshape(16, 16)
        assert decode_image(J.encode_jpeg_progressive(px)).shape \
            == (16, 16, 1)

    def test_truncated_progressive_is_partial_not_crash(self):
        # dropping the tail scans must still yield a full-size image
        # (coarse approximation), like any progressive viewer
        px = (np.arange(24 * 24, dtype=np.int64) * 11 % 256) \
            .astype(np.uint8).reshape(24, 24)
        raw = J.encode_jpeg_progressive(px)
        # cut right before the DC refinement scan (4th SOS)
        cut = -1
        n_sos = 0
        i = 2
        while i + 4 <= len(raw):
            if raw[i] == 0xFF and raw[i + 1] == 0xDA:
                n_sos += 1
                if n_sos == 4:
                    cut = i
                    break
            i += 1
        assert cut > 0
        got = J.decode_jpeg(raw[:cut] + b"\xff\xd9")
        assert got.shape == (24, 24, 1)
        full = J.decode_jpeg(raw)
        # coarse decode approximates the full one: one missing bit level
        # can move a pixel by ~sum(q_k/2) locally, but on average the
        # image must track closely
        err = np.abs(got.astype(int) - full.astype(int))
        assert err.mean() < 16 and err.max() <= 160


class TestProgressiveSubsampledAndRestart:
    def test_420_parity_with_baseline_420(self):
        # includes widths where luma's real block grid is narrower than
        # its MCU-padded grid (stride mapping in the coefficient store)
        rng = np.random.default_rng(9)
        for h, w in [(32, 48), (20, 24), (36, 40), (17, 23), (50, 56)]:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            b = J.decode_jpeg(J.encode_jpeg(px, subsample=True))
            p = J.decode_jpeg(J.encode_jpeg_progressive(px,
                                                        subsample=True))
            assert np.array_equal(b, p), (h, w)

    def test_restart_markers_in_every_scan(self):
        rng = np.random.default_rng(10)
        px = rng.integers(0, 256, (32, 64), dtype=np.uint8)
        raw = J.encode_jpeg_progressive(px, restart_interval=3)
        assert b"\xff\xdd" in raw
        assert raw.count(b"\xff\xd0") >= 6   # RST0 reused across scans
        assert np.array_equal(J.decode_jpeg(J.encode_jpeg(px)),
                              J.decode_jpeg(raw))

    def test_restart_with_ones_quant(self):
        rng = np.random.default_rng(11)
        ones = np.ones(64, dtype=np.int64)
        px = rng.integers(0, 256, (24, 40), dtype=np.uint8)
        a = J.decode_jpeg(J.encode_jpeg(px, quant_luma=ones))
        b = J.decode_jpeg(J.encode_jpeg_progressive(
            px, quant_luma=ones, restart_interval=2))
        assert np.array_equal(a, b)


class TestProgressiveRandomSweep:
    def test_fifty_random_geometries(self):
        """Randomized parity battery: near-flat images with ones quant
        put most AC coefficients in {0, +-1, +-2}, which maximizes
        traffic on the refinement scan's newly-significant path (long
        insignificant runs -> ZRL-in-refinement) and correction bits
        riding EOB runs; loud mismatch on any control-path bug."""
        rng = np.random.default_rng(123)
        for trial in range(50):
            h = int(rng.integers(1, 41))
            w = int(rng.integers(1, 41))
            gray = bool(rng.integers(0, 2))
            near_flat = bool(rng.integers(0, 2))
            if near_flat:
                px = rng.integers(126, 131,
                                  (h, w) if gray else (h, w, 3))
            else:
                px = rng.integers(0, 256, (h, w) if gray else (h, w, 3))
            px = px.astype(np.uint8)
            kw = {}
            if rng.integers(0, 2):
                kw["quant_luma"] = ONES
                if not gray:
                    kw["quant_chroma"] = ONES
            a = J.decode_jpeg(J.encode_jpeg(px, **kw))
            b = J.decode_jpeg(J.encode_jpeg_progressive(px, **kw))
            assert np.array_equal(a, b), (trial, h, w, gray, near_flat)


class TestMultiScanSequential:
    """T.81 allows a sequential frame to split its components across
    several non-interleaved scans (one SOS per component); decoders must
    accumulate planes until the frame is complete instead of assembling
    after the first scan."""

    def test_444_multi_scan_matches_interleaved(self):
        rng = np.random.default_rng(20)
        for shape in [(8, 8), (17, 23), (24, 40), (1, 1)]:
            px = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
            a = J.decode_jpeg(J.encode_jpeg(px))
            b = J.decode_jpeg(J.encode_jpeg(px, interleave=False))
            assert np.array_equal(a, b), shape
            # the layout really is three scans
            assert J.encode_jpeg(px, interleave=False).count(b"\xff\xda") == 3

    def test_420_and_422_multi_scan(self):
        rng = np.random.default_rng(21)
        for sub in (True, "422"):
            for shape in [(16, 16), (17, 23), (9, 31)]:
                px = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
                a = J.decode_jpeg(J.encode_jpeg(px, subsample=sub))
                b = J.decode_jpeg(
                    J.encode_jpeg(px, subsample=sub, interleave=False))
                assert a.shape == b.shape == shape + (3,)
                # identical quantized coefficients -> identical pixels
                assert np.array_equal(a, b), (sub, shape)

    def test_incomplete_multi_scan_raises(self):
        px = np.full((8, 8, 3), 100, np.uint8)
        raw = J.encode_jpeg(px, interleave=False)
        # truncate after the second scan's SOS: drop everything from the
        # third SOS marker on, then re-append EOI
        third = raw.find(b"\xff\xda", raw.find(
            b"\xff\xda", raw.find(b"\xff\xda") + 2) + 2)
        assert third > 0
        with pytest.raises(ValueError, match="missing component"):
            J.decode_jpeg(raw[:third] + b"\xff\xd9")


class TestChroma422:
    def test_422_chroma_flat_exact(self):
        # chroma-flat content loses nothing to 2x1 subsampling
        img = np.zeros((24, 48, 3), np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = 90, 140, 200
        dec = J.decode_jpeg(J.encode_jpeg(img, quant_luma=ONES,
                                          quant_chroma=ONES,
                                          subsample="422"))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1

    def test_422_sof_sampling_bytes(self):
        raw = J.encode_jpeg(np.zeros((8, 16, 3), np.uint8), subsample="422")
        i = raw.find(b"\xff\xc0")
        # component 1 sampling byte is h<<4|v = 0x21
        assert raw[i + 11] == 0x21

    def test_unknown_subsample_rejected(self):
        with pytest.raises(ValueError, match="subsampling"):
            J.encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsample="411")


class TestDecodeRobustness:
    def test_zero_sampling_factor_raises_valueerror(self):
        # a mutated SOF sampling byte of 0x00 must not reach the MCU-grid
        # division (ZeroDivisionError escaped the progressive path once)
        for prog in (False, True):
            px = np.full((8, 8, 3), 50, np.uint8)
            raw = bytearray(J.encode_jpeg_progressive(px) if prog
                            else J.encode_jpeg(px))
            i = raw.find(b"\xff\xc2" if prog else b"\xff\xc0")
            raw[i + 11] = 0x00  # component 1 sampling byte
            with pytest.raises(ValueError, match="sampling"):
                J.decode_jpeg(bytes(raw))

    def test_zero_frame_dimension_raises(self):
        raw = bytearray(J.encode_jpeg(np.full((8, 8), 9, np.uint8)))
        i = raw.find(b"\xff\xc0")
        raw[i + 5:i + 7] = b"\x00\x00"  # height = 0
        with pytest.raises(ValueError, match="dimension"):
            J.decode_jpeg(bytes(raw))

    def test_mutation_fuzz_error_envelope(self):
        """300 random mutations of valid JPEGs either decode or raise one
        of multimodal._DECODE_ERRORS — nothing escapes to fail a Spark
        job (the decode_*_meta NULL contract)."""
        from abot_dotnet_core_spark.functions.multimodal import _DECODE_ERRORS
        rng = np.random.default_rng(1598)
        px = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
        bases = [J.encode_jpeg(px), J.encode_jpeg(px, interleave=False),
                 J.encode_jpeg(px, subsample=True),
                 J.encode_jpeg_progressive(px)]
        for trial in range(300):
            raw = bytearray(bases[trial % len(bases)])
            for _ in range(int(rng.integers(1, 6))):
                op = rng.integers(0, 3)
                if op == 0:
                    raw[int(rng.integers(2, len(raw)))] = \
                        int(rng.integers(0, 256))
                elif op == 1 and len(raw) > 10:
                    raw = raw[:int(rng.integers(4, len(raw)))]
                else:
                    i = int(rng.integers(2, len(raw)))
                    raw = (raw[:i]
                           + bytes(rng.integers(0, 256, 3, dtype=np.uint8))
                           + raw[i:])
            try:
                J.decode_jpeg(bytes(raw))
            except _DECODE_ERRORS:
                pass


class TestMultiScanRandomSweep:
    def test_thirty_random_geometries(self):
        """Randomized battery over the multi-scan sequential and 4:2:2
        encode paths: every (subsample, interleave) combination must
        decode pixel-identically to the single-scan interleaved layout of
        the same quantized coefficients."""
        rng = np.random.default_rng(321)
        for trial in range(30):
            h = int(rng.integers(1, 41))
            w = int(rng.integers(1, 41))
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            sub = [False, True, "422"][int(rng.integers(0, 3))]
            kw = {}
            if rng.integers(0, 2):
                kw["quant_luma"] = ONES
                kw["quant_chroma"] = ONES
            a = J.decode_jpeg(J.encode_jpeg(px, subsample=sub, **kw))
            b = J.decode_jpeg(J.encode_jpeg(px, subsample=sub,
                                            interleave=False, **kw))
            assert np.array_equal(a, b), (trial, h, w, sub)
