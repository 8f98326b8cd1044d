"""From-scratch lossy VP8 keyframe decoder (RFC 6386) — pure stdlib + numpy.

Closes the last image ``header_only`` seam in the media layer: WebP's lossy
half (``VP8 `` chunks; the lossless half is functions/vp8l.py).  A WebP
lossy file is by definition a single VP8 *keyframe*, so a keyframe decoder
covers every valid input — no inter-frame machinery (motion vectors,
reference buffers, golden/altref) exists in this path.

Implements the full still-image pipeline of the spec:

- boolean arithmetic decoder (§7) and tree decoding (§8);
- keyframe frame header: segmentation, loop-filter header, token
  partitions, quantizer indices, coefficient-probability updates (§9);
- per-macroblock intra modes with the keyframe contextual 4x4 mode
  probabilities (§11);
- DCT/WHT coefficient token decoding with band/context probabilities
  (§13), dequantization (§14.1), inverse WHT + inverse DCT with the
  spec's exact fixed-point arithmetic (§14.3-14.4);
- intra prediction, whole-MB (DC/V/H/TM with edge variants) and the ten
  contextual 4x4 modes, including the frozen above-right replication
  quirk for right-column subblocks (§12);
- both loop filters (normal/simple) with segment + delta adjusted
  per-MB levels, high-edge-variance logic and the 27/18/9-tap MB-edge
  filter (§15), applied in spec MB-raster order *after* reconstruction
  (intra prediction reads unfiltered pixels).

All constant tables live in vp8_tables.py (published RFC 6386 data).
Output is the native Y/U/V planes (no RGB conversion — downstream
features want luma, and YUV is what the codec defines), which makes the
decoder bit-comparable against libwebp: tests/test_vp8.py decodes
libwebp-encoded streams of every flavor plus the reference repo's
tests/data/webp/webp-test.webp fixture with both decoders and requires
IDENTICAL planes.

Reference parity target: docling's backend treats WebP via PIL
(docling/backend/*image*); this repo decodes the bytes itself.
"""

from __future__ import annotations

import struct

import numpy as np

from doc_parser_spark.functions.media_decode import (
    MediaDecodeError,
    _check_cpu_budget,
    _check_dims,
)
from doc_parser_spark.functions.vp8_tables import (
    AC_QLOOKUP,
    CAT_PROBS,
    COEFF_BANDS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    DEFAULT_COEFF_PROBS,
    KF_B_MODE_PROBS,
    KF_UV_MODE_PROB,
    KF_YMODE_PROB,
    ZIGZAG,
)

# intra modes (whole-MB): spec enum order
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
# 4x4 modes: spec enum order (§11.5)
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)
# whole-MB mode -> implied subblock mode for 4x4 context (§11.5)
_MB_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


class _BoolDec:
    """RFC 6386 §7 boolean decoder.  Reads past the partition end feed
    zeroes (encoders flush up to 2 bytes short); more than 8 phantom
    bytes means a truncated/desynced stream and raises."""

    __slots__ = ("buf", "pos", "end", "value", "range", "count", "phantom")

    def __init__(self, buf: bytes, start: int, end: int):
        if end - start < 1:
            raise MediaDecodeError("VP8: empty bool partition")
        self.buf = buf
        self.pos = start
        self.end = end
        self.value = 0
        self.range = 255
        self.count = -8  # bits of `value` not yet consumed, top-aligned below
        self.phantom = 0
        # big-value variant: keep up to 24 fresh bits above a 16-bit window
        v = 0
        for _ in range(2):
            v = (v << 8) | self._next_byte()
        self.value = v

    def _next_byte(self) -> int:
        pos = self.pos
        if pos < self.end:
            self.pos = pos + 1
            return self.buf[pos]
        self.phantom += 1
        if self.phantom > 8:
            raise MediaDecodeError("VP8: bool decoder ran off partition end")
        self.pos = pos + 1
        return 0

    def bool(self, prob: int) -> int:
        rng = self.range
        split = 1 + (((rng - 1) * prob) >> 8)
        big = split << 8
        v = self.value
        if v >= big:
            bit = 1
            rng -= split
            v -= big
        else:
            bit = 0
            rng = split
        # renormalize
        while rng < 128:
            v <<= 1
            rng <<= 1
            self.count += 1
            if self.count == 0:
                v |= self._next_byte()
                self.count = -8
        self.range = rng
        self.value = v
        return bit

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def sign_val(self, n: int) -> int:
        """n-bit magnitude then sign flag (header 'L(n) + sign' fields)."""
        v = self.literal(n)
        return -v if self.bool(128) else v


def _tree(bd: _BoolDec, tree: tuple, probs) -> int:
    i = 0
    while True:
        i = tree[i + bd.bool(probs[i >> 1])]
        if i <= 0:
            return -i


# trees (§8.2, §11.3, §11.5): negated values are leaves
_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_BMODE_TREE = (
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10,
    -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU,
)
_SEG_TREE = (2, 4, -0, -1, -2, -3)


def _clamp_q(i: int, hi: int = 127) -> int:
    return 0 if i < 0 else hi if i > hi else i


class _FrameHeader:
    __slots__ = (
        "w", "h", "mb_w", "mb_h", "seg_enabled", "seg_update_map",
        "seg_tree_probs", "seg_abs", "seg_q", "seg_lf", "filter_simple",
        "filter_level", "sharpness", "lf_delta", "ref_lf_delta",
        "mode_lf_delta", "parts", "quant", "probs", "mb_no_skip",
        "prob_skip",
    )


def _parse_header(body: bytes) -> tuple[_FrameHeader, _BoolDec]:
    if len(body) < 10:
        raise MediaDecodeError("truncated VP8 frame header")
    tag = body[0] | (body[1] << 8) | (body[2] << 16)
    if tag & 1:
        raise MediaDecodeError("VP8 inter-frame cannot stand alone")
    version = (tag >> 1) & 7
    if version > 3:
        raise MediaDecodeError(f"bad VP8 version {version}")
    part1_size = tag >> 5
    if body[3:6] != b"\x9d\x01\x2a":
        raise MediaDecodeError("bad VP8 start code")
    hdr = _FrameHeader()
    hdr.w = (body[6] | (body[7] << 8)) & 0x3FFF
    hdr.h = (body[8] | (body[9] << 8)) & 0x3FFF
    _check_dims(hdr.w, hdr.h)
    _check_cpu_budget(hdr.w, hdr.h, len(body), "VP8")
    hdr.mb_w = (hdr.w + 15) // 16
    hdr.mb_h = (hdr.h + 15) // 16
    if 10 + part1_size > len(body):
        raise MediaDecodeError("VP8 first partition overruns frame")
    bd = _BoolDec(body, 10, 10 + part1_size)

    bd.bool(128)  # color_space (keyframe)
    bd.bool(128)  # clamping_type

    # --- segmentation (§9.3)
    hdr.seg_tree_probs = [255, 255, 255]
    hdr.seg_abs = 0
    hdr.seg_q = [0, 0, 0, 0]
    hdr.seg_lf = [0, 0, 0, 0]
    hdr.seg_update_map = False
    hdr.seg_enabled = bool(bd.bool(128))
    if hdr.seg_enabled:
        hdr.seg_update_map = bool(bd.bool(128))
        if bd.bool(128):  # update_segment_feature_data
            hdr.seg_abs = bd.bool(128)
            for i in range(4):
                if bd.bool(128):
                    hdr.seg_q[i] = bd.sign_val(7)
            for i in range(4):
                if bd.bool(128):
                    hdr.seg_lf[i] = bd.sign_val(6)
        if hdr.seg_update_map:
            for i in range(3):
                if bd.bool(128):
                    hdr.seg_tree_probs[i] = bd.literal(8)

    # --- loop filter header (§9.4)
    hdr.filter_simple = bd.bool(128)
    hdr.filter_level = bd.literal(6)
    hdr.sharpness = bd.literal(3)
    hdr.ref_lf_delta = [0, 0, 0, 0]
    hdr.mode_lf_delta = [0, 0, 0, 0]
    hdr.lf_delta = bool(bd.bool(128))
    if hdr.lf_delta and bd.bool(128):  # mode_ref_lf_delta_update
        for i in range(4):
            if bd.bool(128):
                hdr.ref_lf_delta[i] = bd.sign_val(6)
        for i in range(4):
            if bd.bool(128):
                hdr.mode_lf_delta[i] = bd.sign_val(6)

    # --- token partitions (§9.5): sizes live OUTSIDE the bool stream
    n_parts = 1 << bd.literal(2)
    sizes_at = 10 + part1_size
    toks_at = sizes_at + 3 * (n_parts - 1)
    if toks_at > len(body):
        raise MediaDecodeError("VP8 partition size table overruns frame")
    hdr.parts = []
    pos = toks_at
    for i in range(n_parts - 1):
        (sz,) = struct.unpack_from("<I", body[sizes_at + 3 * i:] + b"\0", 0)
        sz &= 0xFFFFFF
        if pos + sz > len(body):
            raise MediaDecodeError("VP8 token partition overruns frame")
        hdr.parts.append((pos, pos + sz))
        pos += sz
    hdr.parts.append((pos, len(body)))

    # --- quantizers (§9.6)
    yac_qi = bd.literal(7)
    ydc_d = bd.sign_val(4) if bd.bool(128) else 0
    y2dc_d = bd.sign_val(4) if bd.bool(128) else 0
    y2ac_d = bd.sign_val(4) if bd.bool(128) else 0
    uvdc_d = bd.sign_val(4) if bd.bool(128) else 0
    uvac_d = bd.sign_val(4) if bd.bool(128) else 0
    hdr.quant = []
    for seg in range(4):
        if hdr.seg_enabled:
            qi = hdr.seg_q[seg] if hdr.seg_abs else yac_qi + hdr.seg_q[seg]
        else:
            qi = yac_qi
        qi = _clamp_q(qi)
        y2ac = (AC_QLOOKUP[_clamp_q(qi + y2ac_d)] * 155) // 100
        hdr.quant.append(
            (
                DC_QLOOKUP[_clamp_q(qi + ydc_d)],  # y1 dc
                AC_QLOOKUP[qi],  # y1 ac
                DC_QLOOKUP[_clamp_q(qi + y2dc_d)] * 2,  # y2 dc
                y2ac if y2ac >= 8 else 8,  # y2 ac
                DC_QLOOKUP[_clamp_q(qi + uvdc_d, 117)],  # uv dc
                AC_QLOOKUP[_clamp_q(qi + uvac_d)],  # uv ac
            )
        )

    bd.bool(128)  # refresh_entropy_probs (irrelevant for a still)

    # --- coefficient probability updates (§13.4)
    probs = [
        [[list(ctx) for ctx in band] for band in plane]
        for plane in DEFAULT_COEFF_PROBS
    ]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                up = COEFF_UPDATE_PROBS[t][b][c]
                tgt = probs[t][b][c]
                for l in range(11):
                    if bd.bool(up[l]):
                        tgt[l] = bd.literal(8)
    hdr.probs = probs

    hdr.mb_no_skip = bool(bd.bool(128))
    hdr.prob_skip = bd.literal(8) if hdr.mb_no_skip else 0
    return hdr, bd


def _parse_modes(hdr: _FrameHeader, bd: _BoolDec):
    """Per-MB mode pass over the tail of partition 1.  Returns parallel
    lists: segment[], skip[], ymode[], uvmode[], bmodes[] (16 per MB or
    None)."""
    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    segments = []
    skips = []
    ymodes = []
    uvmodes = []
    bmodes_all = []
    # 4x4-mode context rows (spec: out-of-frame subblocks read B_DC)
    above = [[B_DC] * 4 for _ in range(mb_w)]
    for _y in range(mb_h):
        left = [B_DC] * 4
        for x in range(mb_w):
            seg = 0
            if hdr.seg_update_map:
                seg = _tree(bd, _SEG_TREE, hdr.seg_tree_probs)
            segments.append(seg)
            skips.append(bd.bool(hdr.prob_skip) if hdr.mb_no_skip else 0)
            ymode = _tree(bd, _KF_YMODE_TREE, KF_YMODE_PROB)
            ymodes.append(ymode)
            if ymode == B_PRED:
                bm = [0] * 16
                ab = above[x]
                for i in range(16):
                    a = bm[i - 4] if i >= 4 else ab[i]
                    l = bm[i - 1] if i & 3 else left[i >> 2]
                    bm[i] = _tree(bd, _BMODE_TREE, KF_B_MODE_PROBS[a][l])
                bmodes_all.append(bm)
                ab[0], ab[1], ab[2], ab[3] = bm[12], bm[13], bm[14], bm[15]
                left[0], left[1], left[2], left[3] = (
                    bm[3], bm[7], bm[11], bm[15],
                )
            else:
                b = _MB_TO_B[ymode]
                bmodes_all.append(None)
                above[x] = [b, b, b, b]
                left = [b, b, b, b]
            uvmodes.append(_tree(bd, _UV_MODE_TREE, KF_UV_MODE_PROB))
    return segments, skips, ymodes, uvmodes, bmodes_all


def _get_coeffs(bd, plane_probs, first, ctx, dq_dc, dq_ac, out) -> int:
    """Token-decode one 4x4 block (§13.2-13.3) into out[16] (raster,
    dequantized).  Returns the stop position n; the caller derives the
    context flag as (n > first)."""
    n = first
    p = plane_probs[COEFF_BANDS[n]][ctx]
    skip_eob = False
    while True:
        if not skip_eob and not bd.bool(p[0]):
            break
        if not bd.bool(p[1]):  # ZERO
            n += 1
            if n == 16:
                break
            p = plane_probs[COEFF_BANDS[n]][0]
            skip_eob = True
            continue
        if not bd.bool(p[2]):
            val = 1
            tctx = 1
        else:
            tctx = 2
            if not bd.bool(p[3]):
                if not bd.bool(p[4]):
                    val = 2
                else:
                    val = 4 if bd.bool(p[5]) else 3
            else:
                if not bd.bool(p[6]):
                    cat = 1 if bd.bool(p[7]) else 0
                elif not bd.bool(p[8]):
                    cat = 3 if bd.bool(p[9]) else 2
                else:
                    cat = 5 if bd.bool(p[10]) else 4
                base, cps = CAT_PROBS[cat]
                e = 0
                for cp in cps:
                    e = (e << 1) | bd.bool(cp)
                val = base + e
        if bd.bool(128):
            val = -val
        out[ZIGZAG[n]] = val * (dq_dc if n == 0 else dq_ac)
        n += 1
        if n == 16:
            break
        skip_eob = False
        p = plane_probs[COEFF_BANDS[n]][tctx]
    return n


# --- inverse transforms (§14.3, §14.4) --------------------------------------

_COS = 20091  # cospi8sqrt2 - 1, Q16
_SIN = 35468  # sinpi8sqrt2, Q16


def _idct4x4_batch(blocks: np.ndarray) -> np.ndarray:
    """blocks: (n, 16) int64 raster coefficient rows -> (n, 4, 4) residuals."""
    b = blocks.astype(np.int64).reshape(-1, 4, 4)
    # pass 1: columns
    ip0, ip1, ip2, ip3 = b[:, 0, :], b[:, 1, :], b[:, 2, :], b[:, 3, :]
    a1 = ip0 + ip2
    b1 = ip0 - ip2
    c1 = ((ip1 * _SIN) >> 16) - (ip3 + ((ip3 * _COS) >> 16))
    d1 = (ip1 + ((ip1 * _COS) >> 16)) + ((ip3 * _SIN) >> 16)
    t = np.empty_like(b)
    t[:, 0, :] = a1 + d1
    t[:, 1, :] = b1 + c1
    t[:, 2, :] = b1 - c1
    t[:, 3, :] = a1 - d1
    # pass 2: rows
    ip0, ip1, ip2, ip3 = t[:, :, 0], t[:, :, 1], t[:, :, 2], t[:, :, 3]
    a1 = ip0 + ip2
    b1 = ip0 - ip2
    c1 = ((ip1 * _SIN) >> 16) - (ip3 + ((ip3 * _COS) >> 16))
    d1 = (ip1 + ((ip1 * _COS) >> 16)) + ((ip3 * _SIN) >> 16)
    out = np.empty_like(b)
    out[:, :, 0] = (a1 + d1 + 4) >> 3
    out[:, :, 1] = (b1 + c1 + 4) >> 3
    out[:, :, 2] = (b1 - c1 + 4) >> 3
    out[:, :, 3] = (a1 - d1 + 4) >> 3
    return out


def _iwht4x4(coeffs: np.ndarray) -> np.ndarray:
    """Inverse WHT of the Y2 block -> 16 luma-subblock DCs (raster).
    Pure-python butterflies: one 4x4 of small ints sits far below numpy's
    per-op dispatch floor, so the scalar form is ~4x faster (python >> on
    negatives floors, same as numpy's arithmetic shift)."""
    ip = coeffs.tolist()
    t = [0] * 16
    for i in range(4):  # columns
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        t[i] = a1 + b1
        t[4 + i] = c1 + d1
        t[8 + i] = a1 - b1
        t[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(0, 16, 4):  # rows
        a1 = t[i] + t[i + 3]
        b1 = t[i + 1] + t[i + 2]
        c1 = t[i + 1] - t[i + 2]
        d1 = t[i] - t[i + 3]
        out[i] = (a1 + b1 + 3) >> 3
        out[i + 1] = (c1 + d1 + 3) >> 3
        out[i + 2] = (a1 - b1 + 3) >> 3
        out[i + 3] = (d1 - c1 + 3) >> 3
    return np.fromiter(out, np.int64, 16)


# --- intra prediction (§12) -------------------------------------------------


def _pred_mb(plane, y0, x0, size, mode, have_above, have_left):
    """Whole-MB prediction (DC/V/H/TM) into an int32 (size, size) array."""
    if have_above:
        above = plane[y0 - 1, x0:x0 + size].astype(np.int32)
    else:
        above = np.full(size, 127, np.int32)
    if have_left:
        left = plane[y0:y0 + size, x0 - 1].astype(np.int32)
    else:
        left = np.full(size, 129, np.int32)
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4
            )
        elif have_above:
            dc = (int(above.sum()) + size // 2) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + size // 2) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, np.int32)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    # TM
    if not have_above:
        corner = 127
    elif not have_left:
        corner = 129
    else:
        corner = int(plane[y0 - 1, x0 - 1])
    return np.clip(left[:, None] + above[None, :] - corner, 0, 255)


def _pred4(mode, A, L, P, AR):
    """One 4x4 prediction.  A: above[4], AR: above-right[4], L: left[4],
    P: above-left.  All python ints; returns 4x4 int list-of-lists."""
    E = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]  # §12.3 edge
    o = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        dc = (A[0] + A[1] + A[2] + A[3] + L[0] + L[1] + L[2] + L[3] + 4) >> 3
        for r in range(4):
            for c in range(4):
                o[r][c] = dc
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                v = L[r] + A[c] - P
                o[r][c] = 0 if v < 0 else 255 if v > 255 else v
    elif mode == B_VE:
        X = [P, A[0], A[1], A[2], A[3], AR[0]]
        row = [(X[i] + 2 * X[i + 1] + X[i + 2] + 2) >> 2 for i in range(4)]
        for r in range(4):
            o[r] = row[:]
    elif mode == B_HE:
        Xs = [P, L[0], L[1], L[2], L[3], L[3]]
        for r in range(4):
            v = (Xs[r] + 2 * Xs[r + 1] + Xs[r + 2] + 2) >> 2
            o[r] = [v, v, v, v]
    elif mode == B_LD:
        X = [A[0], A[1], A[2], A[3], AR[0], AR[1], AR[2], AR[3]]
        for r in range(4):
            for c in range(4):
                v = r + c
                if v == 6:
                    o[r][c] = (X[6] + 3 * X[7] + 2) >> 2
                else:
                    o[r][c] = (X[v] + 2 * X[v + 1] + X[v + 2] + 2) >> 2
    elif mode == B_RD:
        # o[r][c] = 3-tap over E centred at c - r + 4 (§12.3)
        for r in range(4):
            for c in range(4):
                i = c - r + 4
                o[r][c] = (E[i - 1] + 2 * E[i] + E[i + 1] + 2) >> 2
    elif mode == B_VR:
        f2 = [(E[i - 1] + E[i] + 1) >> 1 for i in range(1, 9)]
        f3 = [(E[i - 1] + 2 * E[i] + E[i + 1] + 2) >> 2 for i in range(1, 8)]
        o[0] = [f2[4], f2[5], f2[6], f2[7]]
        o[1] = [f3[3], f3[4], f3[5], f3[6]]
        o[2] = [f3[2], f2[4], f2[5], f2[6]]
        o[3] = [f3[1], f3[3], f3[4], f3[5]]
    elif mode == B_VL:
        X = [A[0], A[1], A[2], A[3], AR[0], AR[1], AR[2], AR[3]]
        for r in range(4):
            for c in range(4):
                v = r + 2 * c
                if (r & 1) == 0:
                    i = c + (r >> 1)
                    o[r][c] = (X[i] + X[i + 1] + 1) >> 1
                else:
                    i = c + (r >> 1)
                    o[r][c] = (X[i] + 2 * X[i + 1] + X[i + 2] + 2) >> 2
        # spec: the last pixels of rows 2/3 use dedicated taps
        o[2][3] = (X[4] + 2 * X[5] + X[6] + 2) >> 2
        o[3][3] = (X[5] + 2 * X[6] + X[7] + 2) >> 2
    elif mode == B_HD:
        f2 = [(E[i] + E[i + 1] + 1) >> 1 for i in range(8)]
        f3 = [(E[i - 1] + 2 * E[i] + E[i + 1] + 2) >> 2 for i in range(1, 8)]
        o[0] = [f2[3], f3[3], f3[4], f3[5]]
        o[1] = [f2[2], f3[2], f2[3], f3[3]]
        o[2] = [f2[1], f3[1], f2[2], f3[2]]
        o[3] = [f2[0], f3[0], f2[1], f3[1]]
    elif mode == B_HU:
        X = [L[0], L[1], L[2], L[3]]
        vals = [
            (X[0] + X[1] + 1) >> 1,
            (X[0] + 2 * X[1] + X[2] + 2) >> 2,
            (X[1] + X[2] + 1) >> 1,
            (X[1] + 2 * X[2] + X[3] + 2) >> 2,
            (X[2] + X[3] + 1) >> 1,
            (X[2] + 3 * X[3] + 2) >> 2,
            X[3], X[3], X[3], X[3],
        ]
        for r in range(4):
            for c in range(4):
                o[r][c] = vals[2 * r + c]
    else:
        raise MediaDecodeError(f"bad intra 4x4 mode {mode}")
    return o

# --- loop filter (§15) ------------------------------------------------------
# All filter math runs on int16 arrays in the signed domain (pixel - 128),
# vectorized across the pixel lines of one or MORE edges: edges of the Y/U/V
# planes at the same MB position share every filter parameter and touch
# disjoint memory, so they stack side-by-side into ONE (8, n_total) slab —
# the normative §15.2 raster order only constrains edges of the SAME plane.
# (This call-batching plus raw-ufunc arithmetic is what makes the filter —
# formerly ~75% of frame decode time — affordable in pure numpy; the per-MB
# loop itself is irreducible: each edge reads pixels the previous edge wrote.)


def _c128(x):
    """Clamp a fresh int16 temporary to [-128, 127] in place (ufunc calls —
    np.clip's dispatch overhead dominates small-array filter math)."""
    np.minimum(x, 127, out=x)
    np.maximum(x, -128, out=x)
    return x


def _normal_filter(px, mb_edge, limit, ilim, hev_t):
    """px: int16 array (8, n) of signed pixel lines [p3..p0, q0..q3]
    ACROSS the edge; filtered in place."""
    rawd = px[1:] - px[:-1]  # rows: p2-p3, p1-p2, p0-p1, q0-p0, …, q3-q2
    ad = np.abs(rawd)
    inner = np.maximum(ad[0], ad[1])
    np.maximum(inner, ad[2], out=inner)
    np.maximum(inner, ad[4], out=inner)
    np.maximum(inner, ad[5], out=inner)
    np.maximum(inner, ad[6], out=inner)
    p1q1 = px[2] - px[5]
    mask = (ad[3] * 2 + (np.abs(p1q1) >> 1) <= limit) & (inner <= ilim)
    hev = (ad[2] > hev_t) | (ad[4] > hev_t)
    _c128(p1q1)
    if mb_edge:
        w = _c128(p1q1 + rawd[3] * 3)
        w *= mask
        whev = w * hev  # hev lines: narrow filter with outer tap
        f1 = _c128(whev + 4)
        f1 >>= 3
        f2 = _c128(whev + 3)
        f2 >>= 3
        q0n = _c128(px[4] - f1)
        p0n = _c128(px[3] + f2)
        w *= ~hev  # non-hev lines: 27/18/9 wide taps
        # (k*w + 63) >> 7 for k <= 27, |w| <= 128 stays within [-27, 27]:
        # the spec's post-shift clamp is a no-op, dropped
        a = (27 * w + 63) >> 7
        px[4] = _c128(q0n - a)
        px[3] = _c128(p0n + a)
        a = (18 * w + 63) >> 7
        px[5] = _c128(px[5] - a)
        px[2] = _c128(px[2] + a)
        a = (9 * w + 63) >> 7
        px[6] = _c128(px[6] - a)
        px[1] = _c128(px[1] + a)
    else:
        p1q1 *= hev
        w = _c128(p1q1 + rawd[3] * 3)
        w *= mask
        f1 = _c128(w + 4)
        f1 >>= 3
        f2 = _c128(w + 3)
        f2 >>= 3
        px[4] = _c128(px[4] - f1)
        px[3] = _c128(px[3] + f2)
        f1 += 1
        f1 >>= 1
        f1 *= ~hev
        px[5] = _c128(px[5] - f1)
        px[2] = _c128(px[2] + f1)


def _simple_filter(px, limit):
    """§15.1 simple filter: luma only, p0/q0 only, always outer taps.
    px rows are [p1, p0, q0, q1]."""
    p1q1 = px[0] - px[3]
    q0p0 = px[2] - px[1]
    mask = (np.abs(q0p0) * 2 + (np.abs(p1q1) >> 1)) <= limit
    w = _c128(_c128(p1q1) + q0p0 * 3)
    w *= mask
    f1 = _c128(w + 4)
    f1 >>= 3
    f2 = _c128(w + 3)
    f2 >>= 3
    px[2] = _c128(px[2] - f1)
    px[1] = _c128(px[1] + f2)


def _filter_v_batch(segs, mb_edge, limit, ilim, hev_t):
    """Normal-filter the vertical edges (plane, y0, x, n) in segs as one
    stacked (8, sum n) slab; planes in segs must be distinct."""
    total = 0
    for _, _, _, n in segs:
        total += n
    px = np.empty((8, total), np.int16)
    off = 0
    for plane, y0, x, n in segs:
        px[:, off:off + n] = plane[y0:y0 + n, x - 4:x + 4].T
        off += n
    px -= 128
    _normal_filter(px, mb_edge, limit, ilim, hev_t)
    px += 128
    off = 0
    for plane, y0, x, n in segs:
        plane[y0:y0 + n, x - 4:x + 4] = px[:, off:off + n].T
        off += n


def _filter_h_batch(segs, mb_edge, limit, ilim, hev_t):
    """Normal-filter the horizontal edges (plane, y, x0, n) in segs as one
    stacked (8, sum n) slab; planes in segs must be distinct."""
    total = 0
    for _, _, _, n in segs:
        total += n
    px = np.empty((8, total), np.int16)
    off = 0
    for plane, y, x0, n in segs:
        px[:, off:off + n] = plane[y - 4:y + 4, x0:x0 + n]
        off += n
    px -= 128
    _normal_filter(px, mb_edge, limit, ilim, hev_t)
    px += 128
    off = 0
    for plane, y, x0, n in segs:
        plane[y - 4:y + 4, x0:x0 + n] = px[:, off:off + n]
        off += n


def _filter_v_edge(plane, y0, x, n, simple, mb_edge, limit, ilim, hev_t):
    """Filter across the vertical edge at column x (pixels x-4..x+3)."""
    if simple:
        px = plane[y0:y0 + n, x - 2:x + 2].T.astype(np.int16)
        px -= 128
        _simple_filter(px, limit)
        px += 128
        plane[y0:y0 + n, x - 2:x + 2] = px.T
    else:
        _filter_v_batch(((plane, y0, x, n),), mb_edge, limit, ilim, hev_t)


def _filter_h_edge(plane, y, x0, n, simple, mb_edge, limit, ilim, hev_t):
    """Filter across the horizontal edge at row y (pixels y-4..y+3)."""
    if simple:
        px = plane[y - 2:y + 2, x0:x0 + n].astype(np.int16)
        px -= 128
        _simple_filter(px, limit)
        px += 128
        plane[y - 2:y + 2, x0:x0 + n] = px
    else:
        _filter_h_batch(((plane, y, x0, n),), mb_edge, limit, ilim, hev_t)


def _loop_filter(Y, U, V, hdr, segments, ymodes, has_coeffs):
    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    simple = bool(hdr.filter_simple)
    # per-segment base levels (precomputable: keyframe MBs are all intra)
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            i = mb_y * mb_w + mb_x
            seg = segments[i]
            if hdr.seg_enabled:
                level = (hdr.seg_lf[seg] if hdr.seg_abs
                         else hdr.filter_level + hdr.seg_lf[seg])
            else:
                level = hdr.filter_level
            level = max(0, min(63, level))
            if hdr.lf_delta:
                level += hdr.ref_lf_delta[0]  # keyframe: INTRA_FRAME
                if ymodes[i] == B_PRED:
                    level += hdr.mode_lf_delta[0]
                level = max(0, min(63, level))
            if level == 0:
                continue
            ilim = level
            if hdr.sharpness:
                ilim >>= 2 if hdr.sharpness > 4 else 1
                ilim = min(ilim, 9 - hdr.sharpness)
            ilim = max(ilim, 1)
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            lim_sub = level * 2 + ilim
            lim_mb = lim_sub + 4
            inner = has_coeffs[i] or ymodes[i] == B_PRED
            y0, x0 = mb_y * 16, mb_x * 16
            cy0, cx0 = mb_y * 8, mb_x * 8
            # all vertical edges first, then horizontal (§15.1 order);
            # Y/U/V edges sharing parameters stack into one filter call
            if mb_x > 0:
                if simple:
                    _filter_v_edge(Y, y0, x0, 16, True, True, lim_mb,
                                   ilim, hev_t)
                else:
                    _filter_v_batch(
                        ((Y, y0, x0, 16), (U, cy0, cx0, 8),
                         (V, cy0, cx0, 8)),
                        True, lim_mb, ilim, hev_t)
            if inner:
                for dx in (4, 8, 12):
                    _filter_v_edge(Y, y0, x0 + dx, 16, simple, False,
                                   lim_sub, ilim, hev_t)
                if not simple:
                    _filter_v_batch(
                        ((U, cy0, cx0 + 4, 8), (V, cy0, cx0 + 4, 8)),
                        False, lim_sub, ilim, hev_t)
            if mb_y > 0:
                if simple:
                    _filter_h_edge(Y, y0, x0, 16, True, True, lim_mb,
                                   ilim, hev_t)
                else:
                    _filter_h_batch(
                        ((Y, y0, x0, 16), (U, cy0, cx0, 8),
                         (V, cy0, cx0, 8)),
                        True, lim_mb, ilim, hev_t)
            if inner:
                for dy in (4, 8, 12):
                    _filter_h_edge(Y, y0 + dy, x0, 16, simple, False,
                                   lim_sub, ilim, hev_t)
                if not simple:
                    _filter_h_batch(
                        ((U, cy0 + 4, cx0, 8), (V, cy0 + 4, cx0, 8)),
                        False, lim_sub, ilim, hev_t)


# --- frame reconstruction ---------------------------------------------------


def _add_residual(plane, y0, x0, pred, blocks, nz_dc_blocks):
    """pred: int32 (S, S); blocks: int32 (nb, 16) raster coeffs per 4x4
    block in raster block order (nb = (S//4)**2).  Adds IDCT residuals of
    blocks flagged in nz_dc_blocks (bool per block), clips, stores."""
    per_row = pred.shape[1] // 4
    live = np.flatnonzero(nz_dc_blocks)
    if live.size:
        res = _idct4x4_batch(blocks[live])
        for k, bi in enumerate(live):
            r, c = (bi // per_row) * 4, (bi % per_row) * 4
            pred[r:r + 4, c:c + 4] += res[k].astype(np.int32)
    np.minimum(pred, 255, out=pred)
    np.maximum(pred, 0, out=pred)
    plane[y0:y0 + pred.shape[0], x0:x0 + pred.shape[1]] = pred


def decode_vp8_frame(body: bytes):
    """Decode a standalone VP8 keyframe (the payload of a WebP ``VP8 ``
    chunk) -> (Y, U, V) uint8 numpy planes, cropped to frame dims."""
    hdr, bd = _parse_header(body)
    segments, skips, ymodes, uvmodes, bmodes_all = _parse_modes(hdr, bd)
    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    Y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    V = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    parts = [_BoolDec(body, s, e) for s, e in hdr.parts]
    nparts = len(parts)
    probs = hdr.probs
    # nonzero-flag context rows: per MB column, [4 y, 2 u, 2 v] + y2
    above_nz = [[0] * 8 for _ in range(mb_w)]
    above_nz2 = [0] * mb_w
    has_coeffs = [False] * (mb_w * mb_h)
    coeffs = np.zeros((24, 16), np.int64)
    nz_blocks = np.zeros(24, bool)

    for mb_y in range(mb_h):
        td = parts[mb_y % nparts]
        left_nz = [0] * 8
        left_nz2 = 0
        for mb_x in range(mb_w):
            i = mb_y * mb_w + mb_x
            ymode = ymodes[i]
            quant = hdr.quant[segments[i]]
            has_y2 = ymode != B_PRED
            anz = above_nz[mb_x]
            if skips[i]:
                nz_blocks[:] = False
                coeffs[:] = 0
                dc16 = None
                for k in range(8):
                    anz[k] = 0
                    left_nz[k] = 0
                if has_y2:
                    above_nz2[mb_x] = 0
                    left_nz2 = 0
            else:
                coeffs[:] = 0
                dc16 = None
                any_nz = False
                if has_y2:
                    y2 = np.zeros(16, np.int64)
                    ctx = above_nz2[mb_x] + left_nz2
                    n = _get_coeffs(td, probs[1], 0, ctx, quant[2],
                                    quant[3], y2)
                    nz2 = 1 if n > 0 else 0
                    above_nz2[mb_x] = left_nz2 = nz2
                    if nz2:
                        any_nz = True
                    dc16 = _iwht4x4(y2)
                    first, pl = 1, probs[0]
                else:
                    first, pl = 0, probs[3]
                for b in range(16):
                    r, c = b >> 2, b & 3
                    ctx = anz[c] + left_nz[r]
                    n = _get_coeffs(td, pl, first, ctx, quant[0], quant[1],
                                    coeffs[b])
                    nz = 1 if n > first else 0
                    anz[c] = left_nz[r] = nz
                    nz_blocks[b] = bool(nz)
                    if nz:
                        any_nz = True
                for p, base in ((0, 16), (1, 20)):  # u, v
                    for b in range(4):
                        r, c = (b >> 1), (b & 1)
                        ai, li = 4 + 2 * p + c, 4 + 2 * p + r
                        ctx = anz[ai] + left_nz[li]
                        n = _get_coeffs(td, probs[2], 0, ctx, quant[4],
                                        quant[5], coeffs[base + b])
                        nz = 1 if n > 0 else 0
                        anz[ai] = left_nz[li] = nz
                        nz_blocks[base + b] = bool(nz)
                        if nz:
                            any_nz = True
                has_coeffs[i] = any_nz
            # --- reconstruct luma
            y0, x0 = mb_y * 16, mb_x * 16
            if has_y2 and dc16 is not None:
                coeffs[0:16, 0] = dc16
                y_live = nz_blocks[0:16] | (dc16 != 0)
            elif has_y2:
                y_live = np.zeros(16, bool)
            else:
                y_live = nz_blocks[0:16].copy()
            if ymode == B_PRED:
                _recon_bpred(Y, y0, x0, mb_x, mb_y, mb_w, bmodes_all[i],
                             coeffs, y_live)
            else:
                pred = _pred_mb(Y, y0, x0, 16, ymode, mb_y > 0, mb_x > 0)
                _add_residual(Y, y0, x0, pred, coeffs[0:16], y_live)
            # --- reconstruct chroma
            cy0, cx0 = mb_y * 8, mb_x * 8
            for plane, base in ((U, 16), (V, 20)):
                pred = _pred_mb(plane, cy0, cx0, 8, uvmodes[i], mb_y > 0,
                                mb_x > 0)
                _add_residual(plane, cy0, cx0, pred, coeffs[base:base + 4],
                              nz_blocks[base:base + 4])

    if hdr.filter_level > 0:
        _loop_filter(Y, U, V, hdr, segments, ymodes, has_coeffs)
    cw, ch = (hdr.w + 1) // 2, (hdr.h + 1) // 2
    return Y[:hdr.h, :hdr.w], U[:ch, :cw], V[:ch, :cw]


def _recon_bpred(Y, y0, x0, mb_x, mb_y, mb_w, bmodes, coeffs, y_live):
    """B_PRED luma reconstruction: sequential 4x4 predict+add inside a
    padded working buffer (1 border row/col + 4 above-right columns)."""
    wb = np.empty((17, 21), np.int32)
    # above row (incl. corner and 4 top-right)
    if mb_y > 0:
        wb[0, 1:17] = Y[y0 - 1, x0:x0 + 16]
        if mb_x < mb_w - 1:
            wb[0, 17:21] = Y[y0 - 1, x0 + 16:x0 + 20]
        else:
            wb[0, 17:21] = Y[y0 - 1, x0 + 15]  # replicate last top pixel
    else:
        wb[0, :] = 127
    # left column
    if mb_x > 0:
        wb[1:17, 0] = Y[y0:y0 + 16, x0 - 1]
    else:
        wb[1:17, 0] = 129
    # corner
    if mb_y == 0:
        wb[0, 0] = 127
    elif mb_x == 0:
        wb[0, 0] = 129
    else:
        wb[0, 0] = Y[y0 - 1, x0 - 1]
    # §12.3 quirk: right-column subblocks below the top row read the
    # FROZEN above-MB-row top-right, not reconstructed pixels
    tr = wb[0, 17:21].copy()
    res = _idct4x4_batch(coeffs[0:16])
    for b in range(16):
        r, c = b >> 2, b & 3
        ry, rx = 1 + 4 * r, 1 + 4 * c
        arow = wb[ry - 1]
        if c == 3 and r > 0:
            A = list(arow[rx:rx + 4])
            AR = list(tr)
        else:
            A = list(arow[rx:rx + 4])
            AR = list(arow[rx + 4:rx + 8])
        L = list(wb[ry:ry + 4, rx - 1])
        P = int(arow[rx - 1])
        pred = _pred4(bmodes[b], A, L, P, AR)
        blk = np.array(pred, np.int32)
        if y_live[b]:
            blk += res[b].astype(np.int32)
            np.clip(blk, 0, 255, out=blk)
        wb[ry:ry + 4, rx:rx + 4] = blk
    Y[y0:y0 + 16, x0:x0 + 16] = wb[1:17, 1:17].astype(np.uint8)
