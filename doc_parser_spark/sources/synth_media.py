"""Deterministic REAL media payload builders (PNG/BMP/WAV/MP4) for tests
and by-construction oracles — the media analog of sources/synth_office.py
(OOXML) and sources/synth_pdf.py (%PDF). Every builder is bit-stable in its
input, and every derived feature (dims, luma, duration, rms) has a closed
form in ``doc_id`` so a DuckDB oracle can recompute it with arithmetic.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

from doc_parser_spark.functions.media_decode import PNG_MAGIC


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """8-bit PNG encoder (gray HxW or color HxWxC for C in 2/3/4).

    ``filters``: per-row filter types 0-4 (default all 0) — lets tests
    exercise every unfilter branch with exact roundtrips.
    """
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    px = pixels.astype(np.int64)
    filters = filters if filters is not None else [0] * h
    raw = bytearray()
    for y in range(h):
        f = filters[y]
        row = px[y].reshape(-1)
        prev = px[y - 1].reshape(-1) if y > 0 else np.zeros_like(row)
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if f == 0:
            out = row
        elif f == 1:
            out = row - left
        elif f == 2:
            out = row - prev
        elif f == 3:
            out = row - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            out = row - pred
        else:
            raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw.extend((out & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def build_png(doc_id: int) -> bytes:
    """Solid-gray PNG with closed-form features:
    width = 16 + doc_id % 32, height = 8 + doc_id % 16,
    mean_luma = (doc_id % 256) / 255."""
    w, h, v = 16 + doc_id % 32, 8 + doc_id % 16, doc_id % 256
    return encode_png(np.full((h, w), v, dtype=np.uint8))


def build_bmp(doc_id: int) -> bytes:
    """Solid-color 24-bit bottom-up BMP: width = 12 + doc_id % 20,
    height = 6 + doc_id % 10, all pixels (B,G,R) = (v,v,v) with
    v = doc_id % 256 → mean_luma = v / 255."""
    w, h, v = 12 + doc_id % 20, 6 + doc_id % 10, doc_id % 256
    stride = (w * 3 + 3) & ~3
    data_off = 54
    size = data_off + stride * h
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
    row = (bytes([v, v, v]) * w).ljust(stride, b"\x00")
    return hdr + row * h


def build_wav(doc_id: int) -> bytes:
    """PCM16 square wave with closed-form features:
    channels = 1 + doc_id % 2, sample_rate = 16000,
    n_frames = 8000 + (doc_id % 100) * 40 → duration = n_frames / 16000,
    amplitude = 1000 + (doc_id % 50) * 100 → rms = peak = amp / 32768
    (±amp square wave, 50% duty by construction)."""
    channels = 1 + doc_id % 2
    rate = 16000
    n_frames = 8000 + (doc_id % 100) * 40
    amp = 1000 + (doc_id % 50) * 100
    # alternate +amp/-amp every 8 frames: exactly half the samples each sign
    t = np.arange(n_frames)
    mono = np.where((t // 8) % 2 == 0, amp, -amp).astype("<i2")
    frames = np.repeat(mono, channels).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def build_mp4(doc_id: int) -> bytes:
    """Minimal ISO-BMFF with closed-form metadata: brand 'isom',
    timescale 1000, duration_ms = 2000 + (doc_id % 60) * 500,
    n_tracks = 1 + doc_id % 3."""
    dur = 2000 + (doc_id % 60) * 500
    n_tracks = 1 + doc_id % 3

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", 1000, dur)  # timescale, duration
        + b"\x00" * 80,
    )
    traks = b"".join(box(b"trak", b"\x00" * 8) for _ in range(n_tracks))
    moov = box(b"moov", mvhd + traks)
    mdat = box(b"mdat", bytes((doc_id + i) % 256 for i in range(32)))
    return ftyp + moov + mdat
