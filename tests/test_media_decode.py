"""Real stdlib media decoders (functions/media_decode.py) and their
multimodal-operator wiring.

The PNG proof is encoder↔decoder roundtrip exactness: sources/synth_media.py
encodes arbitrary pixels under every scanline filter (None/Sub/Up/Average/
Paeth) and colortype (gray, gray+alpha, RGB, RGBA), and the decoder must
recover dimensions and BT.601 luma bit-exactly. WAV/BMP/MP4 check against
closed-form features. The operator layer must route real formats to
status='decoded', junk to 'failure'/'stub_decoded', nulls to 'skipped'.
"""

from __future__ import annotations

import numpy as np
import pytest

from doc_parser_spark.functions.media_decode import (
    MediaDecodeError,
    decode_bmp,
    decode_png,
    decode_wav,
    parse_mp4_meta,
)
from doc_parser_spark.sources.synth_media import (
    build_bmp,
    build_mp4,
    build_png,
    build_wav,
    encode_png,
)


class TestPngRoundtrip:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_all_filters_all_colortypes(self, channels):
        rng = np.random.RandomState(channels)
        for _ in range(6):
            h, w = int(rng.randint(1, 14)), int(rng.randint(1, 14))
            px = rng.randint(0, 256, (h, w, channels)).astype(np.uint8)
            filters = list(rng.randint(0, 5, h))
            data = encode_png(px if channels > 1 else px[:, :, 0], filters)
            gw, gh, luma = decode_png(data)
            assert (gw, gh) == (w, h)
            if channels in (1, 2):
                exp = px[:, :, 0].astype(float).mean() / 255.0
            else:
                exp = (
                    px[:, :, :3].astype(float) @ [0.299, 0.587, 0.114]
                ).mean() / 255.0
            assert luma == pytest.approx(exp, abs=1e-12)

    def test_single_filter_types_pinned(self):
        # one deterministic image through each filter type individually —
        # a failure here names the broken unfilter branch
        rng = np.random.RandomState(7)
        px = rng.randint(0, 256, (9, 11, 3)).astype(np.uint8)
        want = decode_png(encode_png(px, [0] * 9))
        for f in (1, 2, 3, 4):
            assert decode_png(encode_png(px, [f] * 9)) == want

    def test_rejects_garbage(self):
        with pytest.raises(MediaDecodeError):
            decode_png(b"\x89PNG\r\n\x1a\n" + b"junk")
        with pytest.raises(MediaDecodeError):
            decode_png(b"not a png at all")


class TestClosedForms:
    @pytest.mark.parametrize("doc_id", [0, 7, 123, 999, 4242])
    def test_png_bmp_wav_mp4(self, doc_id):
        w, h, luma = decode_png(build_png(doc_id))
        assert (w, h) == (16 + doc_id % 32, 8 + doc_id % 16)
        assert luma == pytest.approx((doc_id % 256) / 255.0, abs=1e-12)

        w, h, luma = decode_bmp(build_bmp(doc_id))
        assert (w, h) == (12 + doc_id % 20, 6 + doc_id % 10)
        assert luma == pytest.approx((doc_id % 256) / 255.0, abs=1e-9)

        f = decode_wav(build_wav(doc_id))
        amp = 1000 + (doc_id % 50) * 100
        assert f["channels"] == 1 + doc_id % 2
        assert f["sample_rate"] == 16000
        assert f["n_frames"] == 8000 + (doc_id % 100) * 40
        assert f["rms"] == pytest.approx(amp / 32768.0, abs=1e-12)
        assert f["peak"] == pytest.approx(amp / 32768.0, abs=1e-12)

        m = parse_mp4_meta(build_mp4(doc_id))
        assert m["brand"] == "isom"
        assert m["n_tracks"] == 1 + doc_id % 3
        assert m["duration_s"] == pytest.approx(
            (2000 + (doc_id % 60) * 500) / 1000.0, abs=1e-12
        )

    def test_wav_rejects_non_riff(self):
        with pytest.raises(MediaDecodeError):
            decode_wav(b"\x00\x01\x02\x03" * 32)

    def test_mp4_rejects_non_bmff(self):
        with pytest.raises(MediaDecodeError):
            parse_mp4_meta(b"\x00" * 64)


class TestOperators:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = []
        for i in range(12):
            rows.append((i, f"c{i}", 0, "image", build_png(i), None))
        rows.append((100, "c", 0, "image", b"RIFF....WEBPvp8-ish", None))
        from doc_parser_spark.sources.synth_webp import build_webp

        rows.append((108, "c", 0, "image", build_webp(9), None))
        rows.append((106, "c", 0, "image", b"II*\x00 tiff-ish", None))
        rows.append((107, "c", 0, "image", build_tiff(9), None))
        rows.append((101, "c", 0, "image", None, None))
        rows.append((104, "c", 0, "image", b"\xff\xd8\xff\xe0 truncated jpeg", None))
        rows.append((105, "c", 0, "image", build_jpeg(77), None))
        for i in range(12, 20):
            rows.append((i, f"c{i}", 0, "audio", build_wav(i), None))
        rows.append((102, "c", 0, "audio", b"not audio", None))
        for i in range(20, 26):
            rows.append((i, f"c{i}", 0, "video", build_mp4(i), None))
        rows.append((103, "c", 0, "video", b"\x00" * 64, None))
        from doc_parser_spark.operators.multimodal import MEDIA_SCHEMA

        return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    def test_image_statuses_and_values(self, media):
        from doc_parser_spark.operators.multimodal import decode_images

        out = {r["media_id"]: r for r in decode_images(media).collect()}
        for i in range(12):
            r = out[i]
            assert r["decode_status"] == "decoded"
            assert (r["width"], r["height"]) == (16 + i % 32, 8 + i % 16)
            assert r["mean_luma"] == pytest.approx((i % 256) / 255.0, abs=1e-6)
        assert out[100]["decode_status"] == "failure"  # broken WebP is a
        # failure now that the real VP8L decoder owns the magic, never a stub
        r = out[108]  # real lossless WebP decodes for real
        import numpy as _np8
        exp_w = _np8.fromfunction(
            lambda y, x: (9 + 3 * y + 7 * x) % 256, (12 + 9 % 7, 16 + 9 % 5)
        ).mean() / 255.0
        assert r["decode_status"] == "decoded"
        assert (r["width"], r["height"]) == (16 + 9 % 5, 12 + 9 % 7)
        assert r["mean_luma"] == pytest.approx(exp_w, abs=1e-6)
        assert out[106]["decode_status"] == "failure"  # broken TIFF is a
        # failure now that the real decoder owns the magic, never a stub
        r = out[107]  # real TIFF decodes for real
        import numpy as _np
        exp_t = _np.fromfunction(
            lambda y, x: (9 + 5 * y + 11 * x) % 256, (5 + 9 % 6, 9 + 9 % 7)
        ).mean() / 255.0
        assert r["decode_status"] == "decoded"
        assert (r["width"], r["height"]) == (9 + 9 % 7, 5 + 9 % 6)
        assert r["mean_luma"] == pytest.approx(exp_t, abs=1e-6)
        assert out[101]["decode_status"] == "skipped"
        assert out[104]["decode_status"] == "failure"  # broken JPEG is a
        # failure now that the real decoder owns the magic, never a stub
        r = out[105]  # real baseline JPEG decodes for real
        exp = sum(2 * ((77 * 7 + k * 11) % 128) for k in range(6)) / 6 / 255
        assert r["decode_status"] == "decoded"
        assert (r["width"], r["height"]) == (24, 16)
        assert r["mean_luma"] == pytest.approx(exp, abs=1e-6)  # float32 column

    def test_audio_statuses_and_values(self, media):
        from doc_parser_spark.operators.multimodal import audio_features

        out = {r["media_id"]: r for r in audio_features(media).collect()}
        for i in range(12, 20):
            r = out[i]
            amp = 1000 + (i % 50) * 100
            assert r["decode_status"] == "decoded"
            assert r["channels"] == 1 + i % 2
            assert r["rms"] == pytest.approx(amp / 32768.0, abs=1e-12)
        assert out[102]["decode_status"] == "failure"
        assert out[102]["rms"] is None

    def test_video_statuses_and_values(self, media):
        from doc_parser_spark.operators.multimodal import video_metadata

        out = {r["media_id"]: r for r in video_metadata(media).collect()}
        for i in range(20, 26):
            r = out[i]
            assert r["decode_status"] == "decoded"
            assert r["brand"] == "isom"
            assert r["n_tracks"] == 1 + i % 3
        assert out[103]["decode_status"] == "failure"


# ---------------------------------------------------------------------------
# baseline JPEG (T.81): real-sample pin + exact roundtrip fuzz
# ---------------------------------------------------------------------------
from pathlib import Path

from hypothesis import given as h_given
from hypothesis import settings as h_settings
from hypothesis import strategies as h_st

from doc_parser_spark.functions.media_decode import decode_jpeg
from doc_parser_spark.sources.synth_media import (
    build_jpeg,
    encode_jpeg_gray_blocks,
)

_JPEG_SAMPLE = Path(
    "/root/reference/genon/preprocessor/sample_files/jpeg_sample.jpeg"
)


class TestJpeg:
    @pytest.mark.skipif(not _JPEG_SAMPLE.exists(), reason="no reference jpeg")
    def test_reference_sample_decodes(self):
        # real 4:2:0 3-component baseline JPEG with the dims its SOF0
        # declares; luma pinned (regression guard for the decoder)
        w, h, luma = decode_jpeg(_JPEG_SAMPLE.read_bytes())
        assert (w, h) == (204, 192)
        assert abs(luma - 0.519336) < 1e-4

    @h_settings(max_examples=60, deadline=None)
    @h_given(
        h_st.lists(
            h_st.lists(h_st.integers(0, 127).map(lambda v: 2 * v),
                       min_size=1, max_size=4),
            min_size=1, max_size=4,
        ).filter(lambda g: len({len(r) for r in g}) == 1)
    )
    def test_blockwise_constant_roundtrip_exact(self, grid):
        # per-block-constant + even values => DC-only, exact quantization:
        # the full Huffman + DCT pipeline must reproduce the exact mean
        w, h, luma = decode_jpeg(encode_jpeg_gray_blocks(grid))
        flat = [v for row in grid for v in row]
        assert (w, h) == (len(grid[0]) * 8, len(grid) * 8)
        assert abs(luma - sum(flat) / len(flat) / 255.0) < 1e-12

    def test_build_jpeg_closed_form(self):
        for d in (0, 3, 99, 5000):
            w, h, luma = decode_jpeg(build_jpeg(d))
            exp = sum(2 * ((d * 7 + k * 11) % 128) for k in range(6)) / 6 / 255
            assert (w, h) == (24, 16) and abs(luma - exp) < 1e-12

    def test_progressive_and_garbage_raise(self):
        data = bytearray(_JPEG_SAMPLE.read_bytes()) if _JPEG_SAMPLE.exists() else None
        if data is not None:
            i = data.find(b"\xff\xc0")
            data[i + 1] = 0xC2  # pretend progressive
            with pytest.raises(MediaDecodeError):
                decode_jpeg(bytes(data))
        with pytest.raises(MediaDecodeError):
            decode_jpeg(b"\x00\x11garbage")


# ---------------------------------------------------------------------------
# GIF (LZW): exact roundtrip fuzz incl. dictionary growth
# ---------------------------------------------------------------------------
import numpy as np

from doc_parser_spark.functions.media_decode import decode_gif
from doc_parser_spark.sources.synth_media import build_gif, encode_gif_gray


class TestGif:
    @h_settings(max_examples=40, deadline=None)
    @h_given(h_st.integers(0, 2**32 - 1))
    def test_roundtrip_exact(self, seed):
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        px = rng.integers(0, 256, (h, w)).astype(np.uint8)
        W, H, luma = decode_gif(encode_gif_gray(px))
        assert (W, H) == (w, h)
        assert abs(luma - px.astype(np.float64).mean() / 255.0) < 1e-12

    def test_dictionary_growth_and_clear(self):
        # 60k pixels forces codes past 12-bit max → encoder emits CLEAR,
        # decoder must reset mid-stream and still reproduce exactly
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (200, 300)).astype(np.uint8)
        W, H, luma = decode_gif(encode_gif_gray(px))
        assert (W, H) == (300, 200)
        assert abs(luma - px.astype(np.float64).mean() / 255.0) < 1e-12

    def test_build_gif_closed_form(self):
        for d in (0, 5, 42, 999):
            W, H, luma = decode_gif(build_gif(d))
            w, h = 8 + d % 8, 6 + d % 5
            exp = np.fromfunction(
                lambda y, x: (d + 3 * y + 7 * x) % 256, (h, w)
            ).mean() / 255.0
            assert (W, H) == (w, h) and abs(luma - exp) < 1e-12

    def test_garbage_raises(self):
        with pytest.raises(MediaDecodeError):
            decode_gif(b"GIF87a\x00")
        with pytest.raises(MediaDecodeError):
            decode_gif(b"not a gif")


# ---------------------------------------------------------------------------
# TIFF (6.0 baseline): exact roundtrip fuzz over byte order × compression ×
# photometric × samples-per-pixel; both supported compressions are lossless
# ---------------------------------------------------------------------------
from doc_parser_spark.functions.media_decode import decode_tiff
from doc_parser_spark.sources.synth_media import (
    _packbits_encode,
    build_tiff,
    encode_tiff,
)


class TestTiff:
    @h_settings(max_examples=40, deadline=None)
    @h_given(h_st.integers(0, 2**32 - 1))
    def test_roundtrip_exact_all_variants(self, seed):
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(1, 24)), int(rng.integers(1, 24))
        bo = "<" if rng.integers(0, 2) == 0 else ">"
        packbits = bool(rng.integers(0, 2))
        strips = int(rng.integers(1, 4))
        if rng.integers(0, 2):  # RGB
            px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            exp = (
                px.astype(np.float64) @ [0.299, 0.587, 0.114]
            ).mean() / 255.0
        else:  # gray, either photometric interpretation
            px = rng.integers(0, 256, (h, w)).astype(np.uint8)
            exp = px.astype(np.float64).mean() / 255.0
        photometric = None
        if px.ndim == 2 and rng.integers(0, 2):
            photometric = 0  # WhiteIsZero: stored inverted, decoded back
        data = encode_tiff(px, byteorder=bo, packbits=packbits,
                           photometric=photometric, strips=strips)
        W, H, luma = decode_tiff(data)
        assert (W, H) == (w, h)
        assert abs(luma - exp) < 1e-9

    def test_packbits_inverse_property(self):
        from doc_parser_spark.functions.media_decode import _packbits

        rng = np.random.default_rng(11)
        for _ in range(50):
            n = int(rng.integers(0, 400))
            # runs-heavy data to exercise both run and literal branches
            raw = bytes(rng.integers(0, 4, n).astype(np.uint8))
            assert _packbits(_packbits_encode(raw), n) == raw

    def test_build_tiff_closed_form(self):
        for d in (0, 1, 2, 3, 42, 999):  # covers II/MM × packbits/none
            W, H, luma = decode_tiff(build_tiff(d))
            w, h = 9 + d % 7, 5 + d % 6
            exp = np.fromfunction(
                lambda y, x: (d + 5 * y + 11 * x) % 256, (h, w)
            ).mean() / 255.0
            assert (W, H) == (w, h) and abs(luma - exp) < 1e-12

    def test_unsupported_and_garbage_raise(self):
        with pytest.raises(MediaDecodeError):
            decode_tiff(b"II*\x00 truncated")
        with pytest.raises(MediaDecodeError):
            decode_tiff(b"not a tiff")
        # unsupported compression (LZW=5) must raise, not stub
        px = np.zeros((4, 4), dtype=np.uint8)
        data = bytearray(encode_tiff(px))
        i = data.find((259).to_bytes(2, "little"))
        data[i + 8] = 5
        with pytest.raises(MediaDecodeError):
            decode_tiff(bytes(data))


# ---------------------------------------------------------------------------
# AVI / MJPEG: real frame extraction (RIFF walk + T.81 per-frame decode)
# ---------------------------------------------------------------------------
from doc_parser_spark.functions.media_decode import decode_avi_mjpeg
from doc_parser_spark.sources.synth_media import build_avi, encode_avi_mjpeg


class TestAviMjpeg:
    @h_settings(max_examples=30, deadline=None)
    @h_given(h_st.integers(0, 2**32 - 1))
    def test_frame_roundtrip_exact(self, seed):
        # arbitrary even block-constant frames → DC-only JPEGs quantize
        # exactly → every sampled frame's luma must be bit-exact
        rng = np.random.default_rng(seed)
        nf = int(rng.integers(1, 8))
        bw, bh = int(rng.integers(1, 4)), int(rng.integers(1, 3))
        every = int(rng.integers(1, 4))
        grids = [
            (2 * rng.integers(0, 128, (bh, bw))).tolist() for _ in range(nf)
        ]
        avi = encode_avi_mjpeg(
            [encode_jpeg_gray_blocks(g) for g in grids], bw * 8, bh * 8
        )
        res = decode_avi_mjpeg(avi, every_n=every)
        assert [r[0] for r in res] == list(range(0, nf, every))
        for idx, w, h, luma in res:
            flat = [v for row in grids[idx] for v in row]
            assert (w, h) == (bw * 8, bh * 8)
            assert abs(luma - sum(flat) / len(flat) / 255.0) < 1e-12

    def test_build_avi_closed_form(self):
        for d in (0, 1, 2, 3, 42, 999):
            res = decode_avi_mjpeg(build_avi(d), every_n=2)
            assert [r[0] for r in res] == list(range(0, 3 + d % 4, 2))
            for idx, w, h, luma in res:
                exp = sum(
                    2 * ((d * 7 + idx * 13 + k * 11) % 128) for k in range(6)
                ) / 6 / 255.0
                assert (w, h) == (24, 16) and abs(luma - exp) < 1e-12

    def test_garbage_and_truncation_raise(self):
        with pytest.raises(MediaDecodeError):
            decode_avi_mjpeg(b"RIFF\x10\x00\x00\x00WAVEdata")  # not AVI
        with pytest.raises(MediaDecodeError):
            decode_avi_mjpeg(b"not even riff")
        avi = bytearray(build_avi(5))
        with pytest.raises(MediaDecodeError):
            decode_avi_mjpeg(bytes(avi[: len(avi) - 40]))  # truncated chunk

    def test_operator_statuses(self, spark):
        from doc_parser_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            video_frames,
        )

        rows = [
            (0, "c", 0, "video", build_avi(3), None),       # real AVI
            (1, "c", 0, "video", build_mp4(1), None),       # MP4 → stub seam
            (2, "c", 0, "video", b"RIFF\x08\x00\x00\x00AVI junk", None),
            (3, "c", 0, "video", None, None),               # skipped
        ]
        media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
        out = video_frames(media, every_n=2).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r["media_id"], []).append(r)
        assert [r["frame_idx"] for r in by_id[0]] == [0, 2, 4]
        assert all(r["decode_status"] == "decoded" and
                   (r["width"], r["height"]) == (24, 16) for r in by_id[0])
        exp0 = sum(2 * ((3 * 7 + k * 11) % 128) for k in range(6)) / 6 / 255.0
        assert by_id[0][0]["mean_luma"] == pytest.approx(exp0, abs=1e-12)
        assert all(r["decode_status"] == "stub_decoded" for r in by_id[1])
        assert [r["decode_status"] for r in by_id[2]] == ["failure"]
        assert [r["decode_status"] for r in by_id[3]] == ["skipped"]


class TestMp3:
    def test_reference_fixture_header_walk(self):
        """sample_10s.mp3 (the reference's ASR fixture): the frame walk
        must report exactly what the filename and encoder promise — ~10 s
        of 128 kbps CBR mono at 44.1 kHz."""
        from pathlib import Path

        from doc_parser_spark.functions.media_decode import parse_mp3_meta

        d = Path("/root/reference/tests/data/audio/sample_10s.mp3").read_bytes()
        m = parse_mp3_meta(d)
        assert m["channels"] == 1
        assert m["sample_rate"] == 44100
        assert m["bitrate_kbps"] == 128.0
        assert m["vbr"] is False
        # 384 physical frames, the first being a LAME "Info" tag frame
        # (not audio): 383 * 1152 samples / 44100 Hz = 10.005 s — what a
        # real decoder reports for this file
        assert m["n_frames"] == 383
        assert m["duration_s"] == pytest.approx(383 * 1152 / 44100, abs=1e-9)

    def test_synth_builder_closed_form(self):
        from doc_parser_spark.functions.media_decode import (
            is_mp3,
            parse_mp3_meta,
        )
        from doc_parser_spark.sources.synth_media import build_mp3

        for doc_id in (0, 1, 17, 29, 59):
            d = build_mp3(doc_id)
            assert is_mp3(d)
            m = parse_mp3_meta(d)
            assert m["n_frames"] == 20 + doc_id % 30
            assert m["channels"] == (1 if doc_id % 2 == 0 else 2)
            assert m["duration_s"] == pytest.approx(
                (20 + doc_id % 30) * 1152 / 48000, abs=1e-12
            )

    def test_not_mp3_raises(self):
        from doc_parser_spark.functions.media_decode import parse_mp3_meta

        with pytest.raises(MediaDecodeError):
            parse_mp3_meta(b"\x00" * 64)
        with pytest.raises(MediaDecodeError):
            parse_mp3_meta(b"ID3\x04\x00\x00\x00\x00\x00\x05hello")

    def test_operator_routes_mp3_header_only(self, spark):
        from doc_parser_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            audio_features,
        )
        from doc_parser_spark.sources.synth_media import build_mp3

        media = spark.createDataFrame(
            [(0, "c", 0, "audio", build_mp3(4), None)], schema=MEDIA_SCHEMA
        )
        r = audio_features(media).collect()[0]
        assert r["decode_status"] == "header_only"
        assert r["channels"] == 1 and r["sample_rate"] == 48000
        assert r["n_frames"] == 24
        assert r["rms"] is None and r["peak"] is None
