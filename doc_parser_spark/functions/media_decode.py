"""Real stdlib media decoders for the multimodal surface.

The container has no PIL/ffmpeg, but three mainstream container formats are
decodable from scratch on the stdlib — the same approach as the %PDF
decoder (functions/pdf_decode.py):

- PNG: zlib inflate + the five scanline filters (None/Sub/Up/Average/
  Paeth, RFC 2083 §6), 8-bit gray / gray+alpha / RGB / RGBA / palette,
  non-interlaced → (width, height, mean_luma).
- BMP: BITMAPINFOHEADER, uncompressed 24/32-bit bottom-up or top-down
  rows → (width, height, mean_luma).
- WAV: stdlib ``wave`` (RIFF/PCM) → channels / sample rate / duration +
  RMS and peak amplitude over the PCM samples.
- MP4: ISO-BMFF box walk → ftyp brand, mvhd timescale/duration, trak
  count (metadata only — no codec work, which genuinely needs ffmpeg).

Luma follows the ITU-R BT.601 weights PIL's ``convert("L")`` uses
(0.299 R + 0.587 G + 0.114 B), so a future PIL swap-in is value-compatible
for the covered formats.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


class MediaDecodeError(Exception):
    pass


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse the per-scanline filters into recon pixel bytes."""
    stride = width * bpp
    if len(raw) < (stride + 1) * height:
        raise MediaDecodeError("truncated IDAT")
    recon = bytearray(stride * height)
    prev_off = -stride
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        off = y * stride
        if ftype == 0:  # None
            recon[off : off + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = recon[off + x - bpp] if x >= bpp else 0
                recon[off + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            if y == 0:
                recon[off : off + stride] = line
            else:
                for x in range(stride):
                    recon[off + x] = (line[x] + recon[prev_off + off + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = recon[off + x - bpp] if x >= bpp else 0
                up = recon[prev_off + off + x] if y > 0 else 0
                recon[off + x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = recon[off + x - bpp] if x >= bpp else 0
                up = recon[prev_off + off + x] if y > 0 else 0
                ul = recon[prev_off + off + x - bpp] if (y > 0 and x >= bpp) else 0
                recon[off + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise MediaDecodeError(f"bad filter type {ftype}")
    return recon


def decode_png(payload: bytes) -> tuple[int, int, float]:
    """PNG bytes → (width, height, mean_luma in [0,1])."""
    if payload[:8] != PNG_MAGIC:
        raise MediaDecodeError("not a PNG")
    pos = 8
    width = height = None
    bitdepth = colortype = interlace = None
    idat = bytearray()
    palette = None
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise MediaDecodeError("missing IHDR/IDAT")
    if bitdepth != 8 or interlace != 0 or colortype not in _CHANNELS:
        raise MediaDecodeError(
            f"unsupported PNG (depth={bitdepth} color={colortype} "
            f"interlace={interlace})"
        )
    bpp = _CHANNELS[colortype]
    raw = zlib.decompress(bytes(idat))
    recon = _unfilter(raw, width, height, bpp)
    px = np.frombuffer(bytes(recon), dtype=np.uint8).reshape(height, width, bpp)
    if colortype == 0:
        luma = px[:, :, 0].astype(np.float64)
    elif colortype == 4:
        luma = px[:, :, 0].astype(np.float64)  # alpha ignored, like convert("L")
    elif colortype == 3:
        if palette is None:
            raise MediaDecodeError("palette image without PLTE")
        rgb = palette[px[:, :, 0]].astype(np.float64)
        luma = rgb @ np.array([0.299, 0.587, 0.114])
    else:  # 2 (RGB) / 6 (RGBA)
        luma = px[:, :, :3].astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    return int(width), int(height), float(luma.mean() / 255.0)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------
def decode_bmp(payload: bytes) -> tuple[int, int, float]:
    """Uncompressed 24/32-bit BMP → (width, height, mean_luma)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise MediaDecodeError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise MediaDecodeError("unsupported BMP header")
    # height is signed: negative = top-down rows
    width, height_s = struct.unpack_from("<ii", payload, 18)
    (bits,) = struct.unpack_from("<H", payload, 28)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if comp != 0 or bits not in (24, 32):
        raise MediaDecodeError(f"unsupported BMP (bits={bits} comp={comp})")
    height = abs(height_s)
    bottom_up = height_s > 0
    bytepp = bits // 8
    stride = (width * bytepp + 3) & ~3
    need = data_off + stride * height
    if len(payload) < need:
        raise MediaDecodeError("truncated BMP")
    rows = np.frombuffer(
        payload[data_off : data_off + stride * height], dtype=np.uint8
    ).reshape(height, stride)[:, : width * bytepp].reshape(height, width, bytepp)
    if bottom_up:
        rows = rows[::-1]
    # BMP stores BGR(A)
    luma = rows[:, :, :3].astype(np.float64) @ np.array([0.114, 0.587, 0.299])
    return int(width), int(height), float(luma.mean() / 255.0)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------
_WAV_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(payload: bytes) -> dict:
    """RIFF/PCM WAV → channels, sample_rate, n_frames, duration_s, rms,
    peak (rms/peak normalized to [0,1] full-scale)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            channels = w.getnchannels()
            rate = w.getframerate()
            sampwidth = w.getsampwidth()
            n_frames = w.getnframes()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError) as ex:
        raise MediaDecodeError(f"bad WAV: {ex}") from ex
    if sampwidth not in _WAV_DTYPES:
        raise MediaDecodeError(f"unsupported sample width {sampwidth}")
    x = np.frombuffer(frames, dtype=_WAV_DTYPES[sampwidth]).astype(np.float64)
    if sampwidth == 1:  # unsigned 8-bit PCM is offset-binary
        x = x - 128.0
    full_scale = float(2 ** (8 * sampwidth - 1))
    rms = float(np.sqrt(np.mean(x * x)) / full_scale) if x.size else 0.0
    peak = float(np.max(np.abs(x)) / full_scale) if x.size else 0.0
    return {
        "channels": channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_s": n_frames / rate if rate else 0.0,
        "rms": rms,
        "peak": peak,
    }


# ---------------------------------------------------------------------------
# MP4 (ISO-BMFF) metadata
# ---------------------------------------------------------------------------
def parse_mp4_meta(payload: bytes) -> dict:
    """Walk top-level + moov boxes: ftyp brand, mvhd duration, trak count.

    Metadata only — decoding frames needs real codecs (ffmpeg), which stays
    behind the injectable-decoder seam."""
    brand = None
    duration_s = None
    n_tracks = 0

    def walk(lo: int, hi: int, depth: int) -> None:
        nonlocal brand, duration_s, n_tracks
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack_from(">I", payload, pos)
            btype = payload[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit size
                if pos + 16 > hi:
                    break
                (size,) = struct.unpack_from(">Q", payload, pos + 8)
                body = pos + 16
            elif size == 0:
                size = hi - pos
            if size < 8 or pos + size > hi:
                raise MediaDecodeError("bad box size")
            if btype == b"ftyp":
                brand = payload[body : body + 4].decode("latin-1")
            elif btype == b"moov" and depth == 0:
                walk(body, pos + size, 1)
            elif btype == b"mvhd":
                version = payload[body]
                if version == 1:
                    timescale, dur = struct.unpack_from(">IQ", payload, body + 20)
                else:
                    timescale, dur = struct.unpack_from(">II", payload, body + 12)
                duration_s = dur / timescale if timescale else 0.0
            elif btype == b"trak":
                n_tracks += 1
            pos += size

    if len(payload) < 8 or payload[4:8] not in (b"ftyp", b"moov", b"free", b"mdat"):
        raise MediaDecodeError("not an ISO-BMFF file")
    walk(0, len(payload), 0)
    if duration_s is None:
        raise MediaDecodeError("no mvhd box")
    return {"brand": brand, "duration_s": duration_s, "n_tracks": n_tracks}
