"""Lossy VP8 (RFC 6386) decoder tests.

Verification strategy (strongest available in this sandbox): the system
libwebp (the reference VP8 implementation) is driven through ctypes as a
TEST-ONLY oracle — never imported by product code.  Streams produced by
libwebp's own encoder across qualities / sizes / filter types /
partition counts / segment counts, plus the reference repo's
tests/data/webp/webp-test.webp fixture, are decoded by functions/vp8.py
and by libwebp side-by-side and must yield BIT-IDENTICAL Y/U/V planes.
That proves the transcribed RFC 6386 constant tables and every stage of
the pipeline (bool decoder, mode/token trees, dequant, WHT/IDCT, all
intra predictors, both loop filters) exactly — a single wrong constant
desyncs the arithmetic decoder within a few macroblocks.

The from-scratch encoder (sources/synth_webp.encode_vp8_flat) is tested
without libwebp (closed-form output) AND against libwebp when present.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from pathlib import Path

import numpy as np
import pytest

from doc_parser_spark.functions.media_decode import (
    MediaDecodeError,
    _webp_chunks,
    decode_webp,
)
from doc_parser_spark.functions.vp8 import (
    _BoolDec,
    _idct4x4_batch,
    _iwht4x4,
    _parse_header,
    decode_vp8_frame,
)
from doc_parser_spark.sources.synth_webp import (
    build_webp_lossy,
    encode_vp8_flat,
    encode_webp_lossy,
)

REF_WEBP = "/root/reference/tests/data/webp/webp-test.webp"


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library(
            "webp") or ""):
        if not name:
            continue
        try:
            lw = ctypes.CDLL(name)
            lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
            lw.WebPDecodeYUV.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lw.WebPEncodeRGB.restype = ctypes.c_size_t
            lw.WebPEncodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ]
            return lw
        except OSError:
            continue
    return None


_LW = _load_libwebp()
needs_libwebp = pytest.mark.skipif(
    _LW is None, reason="system libwebp not available for oracle decode"
)


def _libwebp_yuv(data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)()
    v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = _LW.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h), ctypes.byref(u),
        ctypes.byref(v), ctypes.byref(stride), ctypes.byref(uv_stride)
    )
    assert y, "libwebp decode failed"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    Y = np.ctypeslib.as_array(y, shape=(H, S))[:, :W].copy()
    UU = np.ctypeslib.as_array(u, shape=(ch, US))[:, :cw].copy()
    VV = np.ctypeslib.as_array(v, shape=(ch, US))[:, :cw].copy()
    _LW.WebPFree(y)
    return Y, UU, VV


def _libwebp_encode(img: np.ndarray, q: float) -> bytes:
    h, w, _ = img.shape
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = _LW.WebPEncodeRGB(img.tobytes(), w, h, w * 3, float(q),
                          ctypes.byref(out))
    assert n > 0
    data = bytes(bytearray(out[i] for i in range(n)))
    _LW.WebPFree(out)
    return data


def _ours_yuv(data: bytes):
    body = dict(_webp_chunks(data))[b"VP8 "]
    return decode_vp8_frame(body)


def _assert_planes_equal(data: bytes):
    Y1, U1, V1 = _libwebp_yuv(data)
    Y2, U2, V2 = _ours_yuv(data)
    for name, a, b in (("Y", Y1, Y2), ("U", U1, U2), ("V", V1, V2)):
        assert a.shape == b.shape, (name, a.shape, b.shape)
        diff = np.flatnonzero(a != b)
        assert diff.size == 0, (
            f"{name}: {diff.size}/{a.size} px differ, first flat idx "
            f"{diff[0]}"
        )


@needs_libwebp
class TestLibwebpParity:
    def test_reference_fixture_bit_exact(self):
        """The reference repo's own lossy fixture (2000x2829, segmented,
        normal loop filter, 96 updated token probs): all 8.5M samples
        must equal libwebp's."""
        _assert_planes_equal(open(REF_WEBP, "rb").read())

    def test_encoder_sweep_bit_exact(self):
        rng = np.random.default_rng(7)
        imgs = {
            "noise33x17": rng.integers(0, 256, (17, 33, 3), dtype=np.uint8),
            "noise64x48": rng.integers(0, 256, (48, 64, 3), dtype=np.uint8),
            "row48": rng.integers(0, 256, (1, 48, 3), dtype=np.uint8),
            "col48": rng.integers(0, 256, (48, 1, 3), dtype=np.uint8),
            "tiny": rng.integers(0, 256, (5, 7, 3), dtype=np.uint8),
        }
        grad = np.tile(
            np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None],
            (40, 1, 3),
        )
        imgs["gradient"] = np.ascontiguousarray(grad)
        text = np.full((60, 100, 3), 255, np.uint8)
        text[10:13, 5:95] = 0
        text[20:50, 30:33] = 0
        imgs["textlike"] = text
        for name, img in imgs.items():
            for q in (0, 35, 75, 100):
                _assert_planes_equal(_libwebp_encode(img, q))

    def test_synth_encoder_streams_accepted_by_libwebp(self):
        """Our own minimal VP8 encoder must be spec-valid, not merely
        self-consistent: libwebp decodes its output to the same uniform
        frame."""
        for w, h, v, n_parts in [(32, 16, 40, 1), (17, 5, 240, 1),
                                 (64, 33, 77, 2), (16, 16, 128, 4)]:
            data = encode_webp_lossy(w, h, v, n_parts)
            Y1, U1, V1 = _libwebp_yuv(data)
            assert (Y1 == v).all() and (U1 == 128).all() and (V1 == 128).all()
            _assert_planes_equal(data)


@needs_libwebp
class TestLibwebpParityAdvanced:
    """Features WebPEncodeRGB never emits: the simple loop filter,
    sharpness levels, multi-partition streams, forced segment counts.
    Uses the advanced WebPEncode API via ctypes structs (ABI-gated:
    skips if WebPConfigInit rejects our struct version)."""

    ABI = 0x020F

    class _Config(ctypes.Structure):
        _fields_ = [
            ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
            ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
            ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
            ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
            ("filter_strength", ctypes.c_int),
            ("filter_sharpness", ctypes.c_int),
            ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
            ("alpha_compression", ctypes.c_int),
            ("alpha_filtering", ctypes.c_int),
            ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
            ("show_compressed", ctypes.c_int),
            ("preprocessing", ctypes.c_int),
            ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
            ("emulate_jpeg_size", ctypes.c_int),
            ("thread_level", ctypes.c_int),
            ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
            ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
            ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
            ("qmax", ctypes.c_int),
        ]

    class _MemWriter(ctypes.Structure):
        _fields_ = [("mem", ctypes.POINTER(ctypes.c_ubyte)),
                    ("size", ctypes.c_size_t),
                    ("max_size", ctypes.c_size_t),
                    ("pad", ctypes.c_uint32 * 1)]

    class _Picture(ctypes.Structure):
        _fields_ = [
            ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
            ("width", ctypes.c_int), ("height", ctypes.c_int),
            ("y", ctypes.c_void_p), ("u", ctypes.c_void_p),
            ("v", ctypes.c_void_p),
            ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
            ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
            ("pad1", ctypes.c_uint32 * 2),
            ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
            ("pad2", ctypes.c_uint32 * 3),
            ("writer", ctypes.c_void_p), ("custom_ptr", ctypes.c_void_p),
            ("extra_info_type", ctypes.c_int),
            ("extra_info", ctypes.c_void_p),
            ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
            ("progress_hook", ctypes.c_void_p),
            ("user_data", ctypes.c_void_p),
            ("pad3", ctypes.c_uint32 * 3),
            ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
            ("pad6", ctypes.c_uint32 * 8),
            # PRIVATE fields (encode.h): omitting them lets
            # WebPPictureAlloc write past the ctypes buffer
            ("memory_", ctypes.c_void_p),
            ("memory_argb_", ctypes.c_void_p),
            ("pad7", ctypes.c_void_p * 2),
        ]

    def _encode_adv(self, img, **opts):
        _LW.WebPConfigInitInternal.argtypes = [
            ctypes.POINTER(self._Config), ctypes.c_int, ctypes.c_float,
            ctypes.c_int,
        ]
        _LW.WebPPictureInitInternal.argtypes = [
            ctypes.POINTER(self._Picture), ctypes.c_int,
        ]
        _LW.WebPPictureImportRGB.argtypes = [
            ctypes.POINTER(self._Picture), ctypes.c_char_p, ctypes.c_int,
        ]
        _LW.WebPEncode.argtypes = [
            ctypes.POINTER(self._Config), ctypes.POINTER(self._Picture),
        ]
        _LW.WebPMemoryWriterInit.argtypes = [ctypes.POINTER(self._MemWriter)]
        _LW.WebPMemoryWriterClear.argtypes = [ctypes.POINTER(self._MemWriter)]
        _LW.WebPPictureFree.argtypes = [ctypes.POINTER(self._Picture)]
        cfg = self._Config()
        if not _LW.WebPConfigInitInternal(
            ctypes.byref(cfg), 0, 75.0, self.ABI
        ):
            pytest.skip("libwebp encoder ABI mismatch for advanced API")
        for k, v in opts.items():
            setattr(cfg, k, v)
        pic = self._Picture()
        if not _LW.WebPPictureInitInternal(ctypes.byref(pic), self.ABI):
            pytest.skip("libwebp picture ABI mismatch")
        h, w, _ = img.shape
        pic.width, pic.height = w, h
        wr = self._MemWriter()
        _LW.WebPMemoryWriterInit(ctypes.byref(wr))
        pic.writer = ctypes.cast(_LW.WebPMemoryWrite, ctypes.c_void_p).value
        pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
        try:
            assert _LW.WebPPictureImportRGB(
                ctypes.byref(pic), img.tobytes(), w * 3
            )
            assert _LW.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic)), (
                pic.error_code
            )
            return bytes(bytearray(wr.mem[i] for i in range(wr.size)))
        finally:
            _LW.WebPPictureFree(ctypes.byref(pic))
            _LW.WebPMemoryWriterClear(ctypes.byref(wr))

    @pytest.mark.parametrize(
        "opts",
        [
            dict(filter_type=0, filter_strength=30),  # simple filter
            dict(filter_type=0, filter_strength=63, filter_sharpness=7),
            dict(filter_type=1, filter_strength=50, filter_sharpness=3),
            dict(autofilter=1),
            dict(partitions=3, filter_type=0, filter_strength=10),
            dict(segments=4, sns_strength=90),
            dict(method=6, quality=95.0),
        ],
    )
    def test_advanced_features_bit_exact(self, opts):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
        _assert_planes_equal(self._encode_adv(img, **opts))


class TestSynthNoOracle:
    """Everything here runs WITHOUT libwebp: our encoder's closed-form
    output pins the decoder's arithmetic by independent hand derivation
    (v2 = 8(V-128)-4 -> WHT -> IDCT -> V; see encode_vp8_flat)."""

    @pytest.mark.parametrize(
        "w,h,v,parts",
        [(32, 16, 40, 1), (48, 48, 128, 1), (17, 5, 240, 1),
         (64, 32, 77, 2), (80, 33, 16, 1), (16, 16, 200, 4)],
    )
    def test_flat_roundtrip(self, w, h, v, parts):
        Y, U, V = _ours_yuv(encode_webp_lossy(w, h, v, parts))
        assert Y.shape == (h, w)
        assert U.shape == V.shape == ((h + 1) // 2, (w + 1) // 2)
        assert (Y == v).all()
        assert (U == 128).all() and (V == 128).all()

    def test_decode_webp_status_and_luma(self):
        w, h, luma, status = decode_webp(encode_webp_lossy(40, 24, 77))
        assert (w, h, status) == (40, 24, "decoded")
        assert luma == pytest.approx(77 / 255.0, abs=1e-12)

    def test_filtered_fixture_pinned(self):
        """tests/data/webp_lossy_filtered.webp: a checked-in libwebp-
        encoded stream (96x128 blocky random image at q=60) that runs the
        NORMAL loop filter at level 10 — the synth flat streams above all
        carry filter_level 0, so this is the one libwebp-free regression
        anchor for the filter arithmetic (mean luma pinned from the
        decode that passed the ctypes plane-parity matrix)."""
        data = (Path(__file__).parent
                / "data" / "webp_lossy_filtered.webp").read_bytes()
        body = dict(_webp_chunks(data))[b"VP8 "]
        hdr, _ = _parse_header(body)
        assert hdr.filter_level == 10 and not hdr.filter_simple
        w, h, luma, status = decode_webp(data)
        assert (w, h, status) == (128, 96, "decoded")
        assert luma == pytest.approx(0.48000025531045754, abs=1e-12)

    def test_build_webp_lossy_closed_form(self):
        for doc_id in (0, 1, 6, 34, 1009):
            w, h, luma, status = decode_webp(build_webp_lossy(doc_id))
            assert (w, h, status) == (
                32 + (doc_id % 5) * 16, 16 + (doc_id % 3) * 16, "decoded"
            )
            v = 40 + (doc_id * 13) % 180
            assert round(luma, 4) == round(v / 255.0, 4)

    def test_idct_dc_only_closed_form(self):
        # inverse DCT of a lone DC K is uniform (K+4)>>3 (hand-derived)
        for K in (-2048, -9, 0, 5, 100, 2047):
            blk = np.zeros((1, 16), np.int64)
            blk[0, 0] = K
            out = _idct4x4_batch(blk)
            assert (out == ((K + 4) >> 3)).all(), K

    def test_iwht_dc_only_closed_form(self):
        # inverse WHT of a lone DC K is uniform (K+3)>>3 (hand-derived)
        for K in (-1028, -5, 0, 7, 1028):
            c = np.zeros(16, np.int64)
            c[0] = K
            assert (_iwht4x4(c) == ((K + 3) >> 3)).all(), K

    def test_bool_coder_roundtrip_and_spec_vector(self):
        """Encoder<->decoder roundtrip over skewed probs (including the
        extreme 1/254 probabilities where renormalization runs longest).
        Spec conformance of both halves is separately pinned by the
        libwebp cross-checks above."""
        from doc_parser_spark.sources.synth_webp import _VP8BoolEnc

        import random

        rng = random.Random(5)
        bits = [(rng.randrange(256), rng.randrange(2)) for _ in range(4000)]
        bits += [(1, 1), (1, 0), (254, 0), (254, 1), (128, 1)] * 50
        enc = _VP8BoolEnc()
        for p, b in bits:
            enc.put(max(1, p), b)
        data = enc.stop()
        bd = _BoolDec(data, 0, len(data))
        for i, (p, b) in enumerate(bits):
            assert bd.bool(max(1, p)) == b, f"bit {i}"

    def test_truncated_raises(self):
        data = encode_webp_lossy(48, 48, 90)
        with pytest.raises(MediaDecodeError):
            _ours_yuv(data[: len(data) // 2])

    def test_interframe_rejected(self):
        body = bytearray(encode_vp8_flat(16, 16, 100))
        body[0] |= 1  # frame_type = inter
        with pytest.raises(MediaDecodeError):
            decode_vp8_frame(bytes(body))

    def test_dimension_bomb_rejected_fast(self):
        import time

        # 8191x8191 declared in a ~40-byte stream: must be refused by the
        # CPU budget, not decoded slowly (policy cap, same as VP8L/JPEG)
        body = bytearray(encode_vp8_flat(16, 16, 100))
        body[6], body[7] = 0xFF, 0x1F
        body[8], body[9] = 0xFF, 0x1F
        t0 = time.monotonic()
        with pytest.raises(MediaDecodeError):
            decode_vp8_frame(bytes(body))
        assert time.monotonic() - t0 < 1.0
